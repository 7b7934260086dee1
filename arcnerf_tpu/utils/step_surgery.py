"""In-context train-step stage attribution (VERDICT r3 item 4).

Times the REAL training computation truncated at successive stages, each
as its own jitted dispatch at the live trainer's shapes — standalone
per-op probes mis-predict the fused program, so attribution must ride
the actual graphs. Consecutive differences name where the step goes:

  A   sampling (near/far + fix-step ladder + occupancy mask)
  B0  A + compaction select + point gather
  B   B0 + geo/radiance nets value_and_grad (encoder fwd+bwd dominates)
  C   B + scatter-back to the (B, N) grid
  D   C + ray marching
  E1  the REAL loss_fn value_and_grad (full forward + loss + grads)
  E2  E1 + adam (tx.update + apply_updates)
  E   the full step (E2 + ema + occupancy cond + batch sampling) —
      measured by the caller; E - E2 is the unnamed residue.

Used by bench.py (stage_* keys in BENCH_r*.json) and
scripts/probe_step_surgery.py.
"""

import time

import numpy as np


def _timed(fn, *args, iters=4):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def stage_table(trainer, feed, n_sample, budget, step_ms=None, iters=4):
    """-> dict of stage_* millisecond attributions (diff-based, named).

    ``feed``: a sharded train feed dict (get_model_feed_in output).
    ``step_ms``: externally measured full-step time; when given, the
    remainder (optimizer/loss/occupancy) and a named-coverage fraction
    are included.
    """
    import jax
    import jax.numpy as jnp

    model = trainer.model
    params = trainer.state["params"]
    bound_state = trainer.state["bound_state"]
    key = jax.random.PRNGKey(0)

    def flat(feed):
        out = {}
        for k, v in feed.items():
            if hasattr(v, "ndim") and v.ndim >= 2:
                out[k] = v.reshape((-1,) + v.shape[2:])
        return out

    def sampling(m, feed2, bs):
        bs = bs.get("fg", bs)
        fg = m.fg_model
        near, far, mask_rays = fg.get_near_far_from_rays(feed2, bs)
        near = jax.lax.stop_gradient(near)
        far = jax.lax.stop_gradient(far)
        zvals, mask_pts = fg.get_zvals_from_near_far(
            near, far, n_sample, False, feed2["rays_o"], feed2["rays_d"], bs)
        return jax.lax.stop_gradient(zvals), mask_pts, mask_rays

    def stageA(p, feed, k):
        feed2 = flat(feed)
        zvals, mask_pts, _ = model.apply(
            {"params": p}, feed2, bound_state, method=sampling, rngs={"sampling": k})
        return jnp.sum(zvals) + jnp.sum(mask_pts)

    def run_to_mlp(m, feed2, bs, k):
        fg = m.fg_model
        zvals, mask_pts, _ = sampling(m, feed2, bs)
        n_rays, n_pts = zvals.shape
        sel, sel_valid = fg._compact_sel(mask_pts, budget)
        ray_id = sel // n_pts
        z_sel = jnp.take(zvals.reshape(-1), sel)
        o_sel = jnp.take(feed2["rays_o"], ray_id, axis=0)
        d_sel = jnp.take(feed2["rays_d"], ray_id, axis=0)
        pts_sel = o_sel + z_sel[:, None] * d_sel
        geo, rad = fg.get_coarse_net()
        sigma_c, radiance_c = fg._forward_pts_dir(geo, rad, pts_sel, d_sel)
        return sigma_c, radiance_c, sel, sel_valid, zvals, mask_pts

    def stageB0(p, feed, k):
        feed2 = flat(feed)

        def fn(m, feed2, bs, k):
            fg = m.fg_model
            zvals, mask_pts, _ = sampling(m, feed2, bs)
            n_rays, n_pts = zvals.shape
            sel, sel_valid = fg._compact_sel(mask_pts, budget)
            ray_id = sel // n_pts
            z_sel = jnp.take(zvals.reshape(-1), sel)
            o_sel = jnp.take(feed2["rays_o"], ray_id, axis=0)
            d_sel = jnp.take(feed2["rays_d"], ray_id, axis=0)
            return jnp.sum(o_sel + z_sel[:, None] * d_sel) + jnp.sum(d_sel)

        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    def stageB(p, feed, k):
        feed2 = flat(feed)

        def fn(m, feed2, bs, k):
            sigma_c, radiance_c, *_ = run_to_mlp(m, feed2, bs, k)
            return jnp.sum(sigma_c) * 1e-3 + jnp.sum(radiance_c) * 1e-3

        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    def scatter_back(sigma_c, radiance_c, sel, sel_valid, total):
        sel_safe = jnp.where(sel_valid, sel, total)
        sigma = jnp.zeros((total + 1,)).at[sel_safe].set(sigma_c)[:total]
        chans = [jnp.zeros((total + 1,)).at[sel_safe].set(radiance_c[:, c])[:total]
                 for c in range(3)]
        return sigma, chans

    def stageC(p, feed, k):
        feed2 = flat(feed)

        def fn(m, feed2, bs, k):
            sigma_c, radiance_c, sel, sel_valid, zvals, mask_pts = run_to_mlp(m, feed2, bs, k)
            n_rays, n_pts = zvals.shape
            sigma, chans = scatter_back(sigma_c, radiance_c, sel, sel_valid, n_rays * n_pts)
            return jnp.sum(sigma) * 1e-3 + sum(jnp.sum(c) for c in chans) * 1e-3

        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    def stageD(p, feed, k):
        feed2 = flat(feed)

        def fn(m, feed2, bs, k):
            fg = m.fg_model
            sigma_c, radiance_c, sel, sel_valid, zvals, mask_pts = run_to_mlp(m, feed2, bs, k)
            n_rays, n_pts = zvals.shape
            sigma, chans = scatter_back(sigma_c, radiance_c, sel, sel_valid, n_rays * n_pts)
            sigma = sigma.reshape(n_rays, n_pts)
            radiance = jnp.stack([c.reshape(n_rays, n_pts) for c in chans], axis=-1)
            out = fg.ray_marching_wrap(sigma, radiance, zvals, mask_pts=mask_pts)
            return jnp.sum(out["rgb"]) * 1e-3 + jnp.sum(out["depth"]) * 1e-3

        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    def loss_fn(p, feed, k):
        out = model.apply(
            {"params": p}, feed, inference_only=False, get_progress=False,
            cur_epoch=0, bound_state=bound_state, rngs={"sampling": k})
        return trainer.loss_factory(feed, out)["sum"]

    def stageE2(p, feed, k):
        import optax

        loss, grads = jax.value_and_grad(loss_fn)(p, feed, k)
        updates, opt_state = trainer.tx.update(grads, trainer.state["opt_state"], p)
        new_p = optax.apply_updates(p, updates)
        return loss, new_p, opt_state

    tA = _timed(jax.jit(stageA), params, feed, key, iters=iters)
    tB0 = _timed(jax.jit(stageB0), params, feed, key, iters=iters)
    tB = _timed(jax.jit(jax.value_and_grad(stageB)), params, feed, key, iters=iters)
    tC = _timed(jax.jit(jax.value_and_grad(stageC)), params, feed, key, iters=iters)
    tD = _timed(jax.jit(jax.value_and_grad(stageD)), params, feed, key, iters=iters)
    tE1 = _timed(jax.jit(jax.value_and_grad(loss_fn)), params, feed, key, iters=iters)
    tE2 = _timed(jax.jit(stageE2), params, feed, key, iters=iters)

    out = {
        "stage_sampling_ms": round(tA * 1e3, 1),
        "stage_select_gather_ms": round((tB0 - tA) * 1e3, 1),
        "stage_nets_vg_ms": round((tB - tB0) * 1e3, 1),
        "stage_scatterback_ms": round((tC - tB) * 1e3, 1),
        "stage_marching_ms": round((tD - tC) * 1e3, 1),
        "stage_cum_through_marching_ms": round(tD * 1e3, 1),
        "stage_loss_grads_ms": round((tE1 - tD) * 1e3, 1),
        "stage_adam_ms": round((tE2 - tE1) * 1e3, 1),
        "stage_cum_through_adam_ms": round(tE2 * 1e3, 1),
    }
    if step_ms is not None:
        # residue = ema + occupancy cond + on-device batch sampling + scan
        # bookkeeping; coverage = how far the NAMED ladder reaches into the
        # measured step
        out["stage_residue_ms"] = round(step_ms - tE2 * 1e3, 1)
        out["stage_named_coverage"] = round(min(tE2 * 1e3 / max(step_ms, 1e-9), 1.0), 3)
    return out
