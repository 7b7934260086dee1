"""In-context attribution of the NGP train step (r3).

Standalone per-op probes mis-predict the fused program (XLA fuses across
stage boundaries), so this probe times the REAL training computation
truncated at successive stages, each as its own jitted value_and_grad
dispatch at the bench shapes. Differences between consecutive stages
attribute cost in context.

Stages:
  A  sampling only (near/far + fix-step zvals + occupancy mask)
  B  A + compaction sel + point gather + geo/radiance MLPs (grads flow)
  C  B + scatter-back to the (B, N) grid
  D  C + ray marching (rgb/depth/mask)
  E  full train step (loss + adam + ema + occupancy cond)

Run: cd /root/repo && python scripts/probe_step_surgery.py [--rays 32768]
"""

import argparse
import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo (breaks axon plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=4):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_surgery", "--dir.expr_dir", "/tmp/probe_surgery",
        "--progress.epoch", "8", "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
        "--n_rays", str(args.rays),
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(), "rays:", args.rays, flush=True)

    from arcnerf_tpu.datasets import get_model_feed_in
    from arcnerf_tpu.parallel.mesh import shard_batch

    batch = trainer.pipeline.get_train_batch(0)
    feed, _ = get_model_feed_in(batch)
    feed = shard_batch(feed, trainer.mesh)
    params = trainer.state["params"]
    bound_state = trainer.state["bound_state"]
    model = trainer.model
    key = jax.random.PRNGKey(0)
    n_sample = 128
    budget = 1 << 18

    def flat(feed):
        out = {}
        for k, v in feed.items():
            if hasattr(v, "ndim") and v.ndim >= 2:
                out[k] = v.reshape((-1,) + v.shape[2:])
        return out

    def sampling(m, feed2, bs):
        bs = bs.get("fg", bs)  # trainer state nests fg/bkg bound states
        fg = m.fg_model
        near, far, mask_rays = fg.get_near_far_from_rays(feed2, bs)
        near = jax.lax.stop_gradient(near)
        far = jax.lax.stop_gradient(far)
        zvals, mask_pts = fg.get_zvals_from_near_far(
            near, far, n_sample, False, feed2["rays_o"], feed2["rays_d"], bs)
        return jax.lax.stop_gradient(zvals), mask_pts, mask_rays

    # ---------------------------------------------------------------- stage A
    def stageA(p, feed, k):
        feed2 = flat(feed)
        zvals, mask_pts, _ = model.apply(
            {"params": p}, feed2, bound_state, method=sampling, rngs={"sampling": k})
        return jnp.sum(zvals) + jnp.sum(mask_pts)

    tA = timed(jax.jit(stageA), params, feed, key)
    print("A sampling fwd:          {:7.1f} ms".format(tA * 1e3), flush=True)

    # ---------------------------------------------------------------- stage B
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

    def stageB(p, feed, k):
        feed2 = flat(feed)
        def fn(m, feed2, bs, k):
            sigma_c, radiance_c, *_ = run_to_mlp(m, feed2, bs, k)
            return jnp.sum(sigma_c) * 1e-3 + jnp.sum(radiance_c) * 1e-3
        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    vB = jax.jit(jax.value_and_grad(stageB))
    tB = timed(vB, params, feed, key)
    print("B +compact+MLP v&g:      {:7.1f} ms".format(tB * 1e3), flush=True)

    # ---------------------------------------------------------------- stage C
    def stageC(p, feed, k):
        feed2 = flat(feed)
        def fn(m, feed2, bs, k):
            sigma_c, radiance_c, sel, sel_valid, zvals, mask_pts = run_to_mlp(m, feed2, bs, k)
            n_rays, n_pts = zvals.shape
            total = n_rays * n_pts
            sel_safe = jnp.where(sel_valid, sel, total)
            sigma = jnp.zeros((total + 1,)).at[sel_safe].set(sigma_c)[:total]
            chans = [jnp.zeros((total + 1,)).at[sel_safe].set(radiance_c[:, c])[:total]
                     for c in range(3)]
            return jnp.sum(sigma) * 1e-3 + sum(jnp.sum(c) for c in chans) * 1e-3
        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    vC = jax.jit(jax.value_and_grad(stageC))
    tC = timed(vC, params, feed, key)
    print("C +scatter-back v&g:     {:7.1f} ms".format(tC * 1e3), flush=True)

    # ---------------------------------------------------------------- stage D
    def stageD(p, feed, k):
        feed2 = flat(feed)
        def fn(m, feed2, bs, k):
            fg = m.fg_model
            sigma_c, radiance_c, sel, sel_valid, zvals, mask_pts = run_to_mlp(m, feed2, bs, k)
            n_rays, n_pts = zvals.shape
            total = n_rays * n_pts
            sel_safe = jnp.where(sel_valid, sel, total)
            sigma = jnp.zeros((total + 1,)).at[sel_safe].set(sigma_c)[:total].reshape(n_rays, n_pts)
            chans = [jnp.zeros((total + 1,)).at[sel_safe].set(radiance_c[:, c])[:total]
                     for c in range(3)]
            radiance = jnp.stack([c.reshape(n_rays, n_pts) for c in chans], axis=-1)
            out = fg.ray_marching_wrap(sigma, radiance, zvals, mask_pts=mask_pts)
            return jnp.sum(out["rgb"]) * 1e-3 + jnp.sum(out["depth"]) * 1e-3
        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    vD = jax.jit(jax.value_and_grad(stageD))
    tD = timed(vD, params, feed, key)
    print("D +marching v&g:         {:7.1f} ms".format(tD * 1e3), flush=True)

    # ------------------------------------------------- B decomposition extras
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
            pts_sel = o_sel + z_sel[:, None] * d_sel
            return jnp.sum(pts_sel) + jnp.sum(d_sel)
        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    tB0 = timed(jax.jit(stageB0), params, feed, key)
    print("B0 sel+gather fwd:       {:7.1f} ms".format(tB0 * 1e3), flush=True)

    # ------------------------------------- B sub-splits, IN CONTEXT (r3b):
    # B1 = B0 + hashgrid encoder, B2 = B0 + full geo net (encoder + MLP).
    # B - B2 is then the radiance half (SH + radiance MLP + d_sel plumbing).
    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder as _HGE
    from arcnerf_tpu.utils.cfgs import obj_to_dict as _o2d

    _ecfg = {k: v for k, v in _o2d(cfgs.model.geometry.encoder).items() if k != "type"}
    if "xyz_len" in _ecfg and isinstance(_ecfg["xyz_len"], list):
        _ecfg["xyz_len"] = tuple(_ecfg["xyz_len"])
    enc_ctx = _HGE(**_ecfg)

    def to_pts(m, feed2, bs, k):
        fg = m.fg_model
        zvals, mask_pts, _ = sampling(m, feed2, bs)
        n_rays, n_pts = zvals.shape
        sel, sel_valid = fg._compact_sel(mask_pts, budget)
        ray_id = sel // n_pts
        z_sel = jnp.take(zvals.reshape(-1), sel)
        o_sel = jnp.take(feed2["rays_o"], ray_id, axis=0)
        d_sel = jnp.take(feed2["rays_d"], ray_id, axis=0)
        return o_sel + z_sel[:, None] * d_sel, d_sel

    def stageB1(p, feed, k):
        feed2 = flat(feed)
        pts_sel, _ = model.apply(
            {"params": p}, feed2, bound_state, k, method=to_pts, rngs={"sampling": k})
        emb = enc_ctx.apply({"params": p["fg_model"]["coarse_geo_net"]["HashGridEmbedder_0"]}, pts_sel)
        return jnp.sum(emb) * 1e-3

    tB1f = timed(jax.jit(stageB1), params, feed, key)
    print("B1 +encoder fwd:         {:7.1f} ms".format(tB1f * 1e3), flush=True)
    tB1 = timed(jax.jit(jax.value_and_grad(stageB1)), params, feed, key)
    print("B1 +encoder v&g:         {:7.1f} ms".format(tB1 * 1e3), flush=True)

    def stageB2(p, feed, k):
        feed2 = flat(feed)
        def fn(m, feed2, bs, k):
            fg = m.fg_model
            pts_sel, _ = to_pts(m, feed2, bs, k)
            geo, _rad = fg.get_coarse_net()
            sigma, feat = geo(pts_sel)
            return jnp.sum(sigma) * 1e-3 + (jnp.sum(feat) * 1e-3 if feat is not None else 0.0)
        return model.apply({"params": p}, feed2, bound_state, k, method=fn, rngs={"sampling": k})

    tB2 = timed(jax.jit(jax.value_and_grad(stageB2)), params, feed, key)
    print("B2 +geo-net v&g:         {:7.1f} ms".format(tB2 * 1e3), flush=True)

    # encoder alone at the budget, same config as the model's geo encoder
    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder
    from arcnerf_tpu.utils.cfgs import obj_to_dict

    enc_cfg = {k: v for k, v in obj_to_dict(cfgs.model.geometry.encoder).items() if k != "type"}
    if "xyz_len" in enc_cfg and isinstance(enc_cfg["xyz_len"], list):
        enc_cfg["xyz_len"] = tuple(enc_cfg["xyz_len"])
    enc = HashGridEmbedder(**enc_cfg)
    pts_fix = jax.random.uniform(jax.random.PRNGKey(3), (budget, 3), minval=-0.95, maxval=0.95)
    enc_vars = enc.init(jax.random.PRNGKey(4), pts_fix[:128])
    enc_fwd = jax.jit(lambda v, x: jnp.sum(enc.apply(v, x)))
    tEncF = timed(enc_fwd, enc_vars, pts_fix)
    print("Benc encoder fwd:        {:7.1f} ms".format(tEncF * 1e3), flush=True)
    enc_vg = jax.jit(jax.grad(lambda v, x: jnp.sum(enc.apply(v, x)) * 1e-3))
    tEncG = timed(enc_vg, enc_vars, pts_fix)
    print("Benc encoder v&g:        {:7.1f} ms".format(tEncG * 1e3), flush=True)

    # ------------------------------------------------------- scan vs single
    stride = 8
    feeds = []
    for t in range(stride):
        b = trainer.pipeline.get_train_batch(t)
        fi, _ = get_model_feed_in(b)
        feeds.append(fi)
    feed_stack = {k: np.stack([np.asarray(f[k]) for f in feeds]) for k in feeds[0]}
    from arcnerf_tpu.parallel.mesh import shard_stacked_batch

    feed_stack = shard_stacked_batch(feed_stack, trainer.mesh)
    keys = jax.random.split(key, stride)
    scan_fn = jax.jit(trainer._scan_steps_impl)
    state2 = jax.tree_util.tree_map(lambda x: x, trainer.state)
    out_state, _ = scan_fn(state2, feed_stack, keys, 0)  # compile
    np.asarray(jax.device_get(out_state["step"]))
    t0 = time.perf_counter()
    out_state, _ = scan_fn(out_state, feed_stack, keys, 100)
    np.asarray(jax.device_get(out_state["step"]))
    tScan = (time.perf_counter() - t0) / stride
    print("scan stride per-step:    {:7.1f} ms".format(tScan * 1e3), flush=True)

    # ---------------------------------------------------------------- stage E
    full = jax.jit(trainer._train_step_impl)
    state = jax.tree_util.tree_map(lambda x: x, trainer.state)
    tE = timed(lambda s, b, k: full(s, b, k, 1), state, feed, key)
    print("E full train step:       {:7.1f} ms".format(tE * 1e3), flush=True)

    print("\nattribution: A={:.0f} B-A={:.0f} C-B={:.0f} D-C={:.0f} E-D={:.0f}".format(
        tA * 1e3, (tB - tA) * 1e3, (tC - tB) * 1e3, (tD - tC) * 1e3, (tE - tD) * 1e3), flush=True)


if __name__ == "__main__":
    main()
