"""RenderEngine: every inference/interactive render path, extracted from
the trainer (VERDICT r4 item 6 — the reference splits rendering into its
eval/infer layer too, /root/reference/arcnerf/eval/infer_func.py:31).

The engine owns the render tiers and their jitted executables:

- render_image        — exact full-image render, ONE scan-batched dispatch
- render_image_fast   — occupancy-prepass ray compaction + per-ray cap
- render_image_interactive — adaptive-resolution subgrid + bilinear upsample
- render_image_windowed    — transmittance-continuation windows (eps-exact)
- set_render_cap      — per-ray sample cap / coarse ladder / window mode,
                        re-jitting so the traced cap actually changes

It is deliberately stateless about training: construction takes the model,
the device mesh, the experiment cfgs, and a ``state_fn`` returning the live
(eval_params, bound_state) so every frame renders the current training
state (EMA shadow included) without the engine holding references to the
optimizer state.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.cfgs import get_value_from_cfgs_field


def _bilinear_upsample(img, h, w, off, scale):
    """Upsample a (hs, ws, ...) subgrid — full-res pixel (off + i*scale)
    maps to subgrid pixel i — back to (h, w, ...), bilinear, edge-clamped.
    Host-side numpy: frames are already on the host for compositing, and
    the interp is ~ms at 800x800."""
    img = np.asarray(img)
    hs, ws = img.shape[:2]
    ys = (np.arange(h, dtype=np.float64) - off) / scale
    xs = (np.arange(w, dtype=np.float64) - off) / scale
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, hs - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, ws - 1)
    y1 = np.minimum(y0 + 1, hs - 1)
    x1 = np.minimum(x0 + 1, ws - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    extra = img.ndim - 2
    wy = wy.reshape(wy.shape + (1,) * extra)
    wx = wx.reshape(wx.shape + (1,) * extra)
    top = img[y0][:, x0] * (1.0 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1.0 - wx) + img[y1][:, x1] * wx
    return (top * (1.0 - wy) + bot * wy).astype(img.dtype)


class RenderEngine:
    """Full/fast/interactive/windowed render tiers over a jitted model.

    ``state_fn() -> (params, bound_state)`` supplies the live weights per
    frame; ``mesh`` shards ray chunks on its 'data' axis."""

    def __init__(self, model, mesh, cfgs, state_fn):
        self.model = model
        self.mesh = mesh
        self.cfgs = cfgs
        self._state_fn = state_fn
        self._jit_render_paths()

    def _jit_render_paths(self):
        self._render_chunk = jax.jit(self._render_chunk_impl)
        self._render_scan = jax.jit(self._render_scan_impl)
        self._hit_prepass = jax.jit(self._hit_prepass_impl, static_argnums=(3,))
        self._count_prepass = jax.jit(self._count_prepass_impl)
        self._fast_fused = jax.jit(self._fast_fused_impl, static_argnums=(4, 5, 6))
        self._windowed_fused = jax.jit(
            self._windowed_fused_impl, static_argnums=(5, 6, 7, 8, 9, 10))

    def set_render_cap(self, cap, n_sample=None, window=False):
        """Set the inference per-ray sample cap (obj_bound.eval_max_pts_per_ray)
        — and optionally an inference-only coarse-ladder size
        (obj_bound.eval_n_sample, fewer fix-step samples per ray) — then
        re-jit the render paths so the new values actually re-trace.

        Both are read at TRACE time (Python ints baked into the jitted
        graph), so mutating the config alone keeps serving the old compiled
        executable from jit's cache — the viewer's adaptive-quality ladder
        and eval_render_cap.py both go through here. cap=None disables
        capping (full sample count); n_sample=None keeps the training
        ladder."""
        obj_bound = get_value_from_cfgs_field(self.cfgs.model, "obj_bound", None)
        if obj_bound is None:
            return
        setattr(obj_bound, "eval_max_pts_per_ray", cap)
        setattr(obj_bound, "eval_n_sample", n_sample)
        # window=True turns the cap into a rank WINDOW (traced offset) and
        # makes the sampler return the pre-cap march mask — the
        # transmittance-continuation renderer's contract
        setattr(obj_bound, "eval_cap_window", bool(window))
        # the bound cache keys on the obj_bound cfg repr, so the next
        # get_obj_bound() builds a bound carrying the new cap; every render
        # path (incl. the prepass ladder reading eval_n_sample) re-traces
        self._jit_render_paths()

    # ------------------------------------------------------------- helpers
    def eval_params(self):
        return self._state_fn()[0]

    def bound_state(self):
        return self._state_fn()[1]

    def _render_chunk_impl(self, params, bound_state, feed_in):
        return self.model.apply(
            {"params": params}, feed_in, inference_only=True, bound_state=bound_state
        )

    def _render_scan_impl(self, params, bound_state, feed_stack):
        """Full-image render as ONE device dispatch: lax.scan over the
        (T, 1, chunk, ...) ray-chunk stack instead of T sequential host
        round trips (the r2 eval path paid ~27 ms dispatch + sync per
        chunk — 40 chunks per 800x800 image). Only per-ray outputs are
        stacked; per-point progress tensors never leave the device."""

        def body(carry, feed):
            out = self.model.apply(
                {"params": params}, feed, inference_only=True, bound_state=bound_state
            )
            keep = {
                k: v for k, v in out.items()
                if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[:2] == (1, feed["rays_o"].shape[1])
            }
            return carry, keep

        _, outs = jax.lax.scan(body, 0, feed_stack)
        return outs

    def _render_rays_stacked(self, sample, n, chunk_rays, bkg_color=None):
        """Scan-render ``n`` rays from ``sample`` in one device dispatch;
        returns dict of flat (n, ...) arrays (padding chopped)."""
        from ..parallel.mesh import shard_stacked_batch

        n_chunks = (n + chunk_rays - 1) // chunk_rays
        total = n_chunks * chunk_rays
        stack = {}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
            if k in sample and sample[k] is not None:
                arr = np.asarray(sample[k])
                if arr.shape[0] < total:  # pad tail chunk for static shape
                    arr = np.concatenate([arr, np.repeat(arr[-1:], total - arr.shape[0], axis=0)], axis=0)
                stack[k] = arr.reshape((n_chunks, 1, chunk_rays) + arr.shape[1:])
        if bkg_color is not None:
            stack["bkg_color"] = np.broadcast_to(
                np.asarray(bkg_color, dtype=np.float32), (n_chunks, 1, chunk_rays, 3)
            ).copy()
        stack = shard_stacked_batch(stack, self.mesh)  # rays shard on axis 2
        params, bound_state = self._state_fn()
        outs = self._render_scan(params, bound_state, stack)
        return {k: np.asarray(v).reshape((total,) + v.shape[3:])[:n] for k, v in outs.items()}

    def _chunk_for_mesh(self, chunk_rays):
        """Keep the (padded) chunk divisible by the mesh so full-image eval
        shards at ANY resolution instead of silently replicating, and cap
        chunk*cap at the static point budget: a chunk whose capped-valid
        points exceed the budget CLIPS silently — prefix compaction takes
        the first-budget valid points in ray order, so TAIL rays of dense
        chunks lose all their samples (measured: full 800x800 render at
        32k chunks x cap 16 had chunks at 274,918 capped-valid vs the
        2^18 budget — 21.8k blanked rays, 29.6 dB vs the clip-free
        render; scripts/probe_chunk_diff2 section of docs/benchmark.md)."""
        if chunk_rays is None:
            chunk_rays = min(int(self.model.get_chunk_rays()), 16384)
        cap = self.model.fg_model.get_obj_bound().get_optim_cfgs().get("eval_max_pts_per_ray")
        pt_budget = self.model.fg_model.get_render_cfgs("max_allowance")
        if cap and isinstance(pt_budget, int) and pt_budget > 0:
            chunk_rays = min(chunk_rays, pt_budget // int(cap))
        n_dev = self.mesh.devices.size
        return max(n_dev, (chunk_rays // n_dev) * n_dev)

    # -------------------------------------------------------- exact render
    def render_image(self, sample, chunk_rays=None, bkg_color=None):
        """Render a full image in ONE scan-batched device dispatch
        (chunk_rays rays per scan step); returns dict of (H, W, ...)."""
        chunk_rays = self._chunk_for_mesh(chunk_rays)
        h, w = int(sample["H"]), int(sample["W"])
        n = sample["rays_o"].shape[0]
        flat = self._render_rays_stacked(sample, n, chunk_rays, bkg_color=bkg_color)
        return {k: v.reshape((h, w) + v.shape[1:]) for k, v in flat.items()}

    # ------------------------------------------------- interactive render
    def _hit_prepass_impl(self, bound_state, rays_o, rays_d, n_probe):
        """Per-ray can-hit test: AABB/sphere intersect + an occupancy probe
        along [near, far]. Measured on the bench scene at 800x800, p50 of
        rays have ZERO valid samples (scripts/probe_render.py) — skipping
        them halves the full sampler's work before any quality tradeoff.

        ``n_probe <= 0`` probes at the sampler's OWN fix-step ladder
        (n_sample samples, diag/n_sample step), which makes the test
        EXACT: hit == "the full sampler would find >= 1 valid sample", so
        the compacted render is pixel-identical for no-bkg models. A
        positive n_probe uses a coarser linspace probe (cheaper, but a
        ray can slip between probe samples — measured 24.7 dB vs the
        full render on the bench scene; use the exact mode)."""
        from ..models.base_modules.obj_bound import _occ_mask_soa
        from .ray_helper import get_zvals_from_near_far_fix_step

        bound = self.model.fg_model.get_obj_bound()
        fg_state = bound_state.get("fg", bound_state)
        near, far, hit = bound.get_near_far_from_rays(
            fg_state, {"rays_o": rays_o, "rays_d": rays_d})
        near = near if near.ndim == 2 else near[:, None]
        far = far if far.ndim == 2 else far[:, None]
        # probe occupancy ONLY when the real sampler culls by it on the
        # fix-step ladder (ray_sample_acc + ray_sample_fix_step) — for any
        # other sampler the bitfield is not part of the render contract
        # and culling by it would blank rays the full render shades
        use_occ = (
            "bitfield" in fg_state and hasattr(bound, "volume")
            and bound.get_optim_cfgs("epoch_optim") is not None
            and bound.get_optim_cfgs("ray_sample_acc")
            and bound.get_optim_cfgs("ray_sample_fix_step")
        )
        if use_occ:
            if n_probe <= 0:  # exact: the sampler's fix-step ladder
                ns_eval = bound.get_optim_cfgs().get("eval_n_sample")
                n_pts = int(ns_eval) if ns_eval else int(self.model.fg_model.get_ray_cfgs("n_sample"))
                fix_t = bound.volume.get_diag_len() / n_pts
                zvals, mask = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts)
            else:
                t = jnp.linspace(0.0, 1.0, n_probe, dtype=jnp.float32)[None, :]
                zvals = near + (far - near) * t  # (B, n_probe)
                mask = jnp.ones_like(zvals, dtype=bool)
            occ = mask & _occ_mask_soa(bound.volume, fg_state["bitfield"], rays_o, rays_d, zvals)
            occ_hit = jnp.any(occ, axis=1)
            hit = occ_hit if hit is None else (hit & occ_hit)
        return hit

    def _count_prepass_impl(self, bound_state, rays_o, rays_d):
        """Per-ray VALID-SAMPLE count on the sampler's own fix-step ladder
        (the exact-mode hit prepass extended to a count). Sizes the
        windowed render's pass ladder: a ray is alive entering pass p only
        if its first p windows came back full, i.e. count >= p*cap — so
        per-pass budgets of #(count >= p*cap) rays can NEVER clip an alive
        ray, and passes whose bound is zero are dropped statically (the
        16-pass geometric ladder paid ~15 one-chunk floor passes on
        settled scenes where p99 of rays finish in 1-2 windows).
        Returns None when the bound has no occupancy contract."""
        from ..models.base_modules.obj_bound import _occ_mask_soa
        from .ray_helper import get_zvals_from_near_far_fix_step

        bound = self.model.fg_model.get_obj_bound()
        fg_state = bound_state.get("fg", bound_state)
        use_occ = (
            "bitfield" in fg_state and hasattr(bound, "volume")
            and bound.get_optim_cfgs("epoch_optim") is not None
            and bound.get_optim_cfgs("ray_sample_acc")
            and bound.get_optim_cfgs("ray_sample_fix_step")
        )
        if not use_occ:
            return None
        near, far, hit = bound.get_near_far_from_rays(
            fg_state, {"rays_o": rays_o, "rays_d": rays_d})
        near = near if near.ndim == 2 else near[:, None]
        far = far if far.ndim == 2 else far[:, None]
        ns_eval = bound.get_optim_cfgs().get("eval_n_sample")
        n_pts = int(ns_eval) if ns_eval else int(self.model.fg_model.get_ray_cfgs("n_sample"))
        fix_t = bound.volume.get_diag_len() / n_pts
        zvals, mask = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts)
        occ = mask & _occ_mask_soa(bound.volume, fg_state["bitfield"], rays_o, rays_d, zvals)
        counts = jnp.sum(occ.astype(jnp.int32), axis=1)
        if hit is not None:
            counts = jnp.where(hit, counts, 0)
        return counts

    def _fast_fused_impl(self, params, bound_state, feed, miss_rgb, n_probe, n_chunks, chunk):
        """One-dispatch fast render: prepass -> ray budget select -> scan
        render -> scatter into the flat image, all on device. The host
        path pays two tunnel dispatches (prepass, scan) plus nonzero/pad/
        composite over every ray per frame; fused, a frame is ONE jitted
        call whose host work is reshaping the result."""
        rays_o, rays_d = feed["rays_o"], feed["rays_d"]
        n = rays_o.shape[0]
        hit = self._hit_prepass_impl(bound_state, rays_o, rays_d, n_probe)
        if hit is None:
            hit = jnp.ones((n,), bool)
        budget = n_chunks * chunk
        # first-`budget` hit rays by ray order: rank element-scatter (same
        # form as fg_model._compact_sel, over rays instead of samples)
        g = jnp.cumsum(hit.astype(jnp.int32)) - 1
        g = jnp.where(hit, jnp.clip(g, 0, budget), budget)
        sel = jnp.zeros((budget + 1,), jnp.int32).at[g].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget]
        n_hit = jnp.sum(hit.astype(jnp.int32))
        sel_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(n_hit, budget)

        stack = {
            k: jnp.take(v, sel, axis=0).reshape((n_chunks, 1, chunk) + v.shape[1:])
            for k, v in feed.items()
        }
        outs = self._render_scan_impl(params, bound_state, stack)

        sel_safe = jnp.where(sel_valid, sel, n)  # invalid rows -> pad slot
        imgs = {}
        for k, v in outs.items():
            flat = v.reshape((budget,) + v.shape[3:])
            if k == "rgb":
                init = jnp.broadcast_to(miss_rgb, (n + 1, 3)).astype(flat.dtype)
            else:
                init = jnp.zeros((n + 1,) + flat.shape[1:], flat.dtype)
            imgs[k] = init.at[sel_safe].set(flat)[:n]
        return imgs, n_hit

    def render_image_fast(self, sample, chunk_rays=None, bkg_color=None, hit_frac=0.5, n_probe=0,
                          fused=None):
        """Interactive-mode full-image render: the occupancy pre-pass
        compacts the rays that can hit anything into a FIXED budget of
        ``hit_frac * n`` rays (static chunk count -> no per-frame
        retrace), only those run the full sampler (at the inference
        per-ray cap, set_render_cap), and missed rays composite the
        background directly. Pair with set_render_cap(4..8) for the
        speed/quality ladder; quality vs render_image is measured in
        bench.py (psnr_fast_vs_full). Returns (imgs dict, stats dict).

        Reference analogue: the CUDA renderer compacts alive rays each
        marching round (ns_viewer adaptive rendering / instant-ngp ray
        compaction); one static pre-pass is the TPU-shaped version."""
        # a model-owned background (learned bkg model) must be rendered on
        # every ray — compacting misses would leave black holes where the
        # full render paints bkg radiance; fall back to the exact path
        if getattr(self.model, "has_bkg", False):
            imgs = self.render_image(sample, chunk_rays=chunk_rays, bkg_color=bkg_color)
            return imgs, {"hit_frac": 1.0, "budget_rays": sample["rays_o"].shape[0],
                          "clipped_rays": 0, "fallback": "has_bkg"}
        chunk_rays = self._chunk_for_mesh(chunk_rays)  # incl. budget/cap clamp
        h, w = int(sample["H"]), int(sample["W"])
        n = sample["rays_o"].shape[0]

        # fused single-dispatch path: default on a single device (the
        # sharded eval path shards ray chunks across the mesh; the fused
        # select is a global cumsum, so multi-device keeps the host path)
        if fused is None:
            fused = self.mesh.devices.size == 1
        if fused:
            budget = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
            n_chunks = budget // chunk_rays
            feed = {}
            for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
                if k in sample and sample[k] is not None:
                    feed[k] = jnp.asarray(np.asarray(sample[k]))
            if bkg_color is not None:
                feed["bkg_color"] = jnp.broadcast_to(
                    jnp.asarray(bkg_color, dtype=jnp.float32), (n, 3))
            if bkg_color is not None:
                miss = np.asarray(bkg_color, dtype=np.float32)
            elif self.model.fg_model.get_ray_cfgs("white_bkg"):
                miss = np.ones(3, dtype=np.float32)
            else:
                miss = np.zeros(3, dtype=np.float32)
            params, bound_state = self._state_fn()
            flat, n_hit = self._fast_fused(
                params, bound_state, feed,
                jnp.asarray(miss), n_probe, n_chunks, chunk_rays)
            n_hit = int(n_hit)
            imgs = {k: np.asarray(v).reshape((h, w) + v.shape[1:]) for k, v in flat.items()}
            stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget,
                     "clipped_rays": max(0, n_hit - budget)}
            return imgs, stats

        rays_o = jnp.asarray(np.asarray(sample["rays_o"]))
        rays_d = jnp.asarray(np.asarray(sample["rays_d"]))
        hit = self._hit_prepass(self.bound_state(), rays_o, rays_d, n_probe)
        hit = np.ones(n, dtype=bool) if hit is None else np.asarray(hit)

        budget = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
        idx = np.nonzero(hit)[0]
        n_hit, n_clip = len(idx), max(0, len(idx) - budget)
        idx = idx[:budget]
        if len(idx) < budget:  # pad with the last hit ray (or ray 0)
            fill = idx[-1] if len(idx) else 0
            idx = np.concatenate([idx, np.full(budget - len(idx), fill, dtype=idx.dtype)])

        sub = {k: np.asarray(sample[k])[idx] for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time")
               if k in sample and sample[k] is not None}
        flat_sub = self._render_rays_stacked(sub, budget, chunk_rays, bkg_color=bkg_color)

        valid_n = min(n_hit, budget)
        imgs = {}
        for k, v in flat_sub.items():
            full = np.zeros((n,) + v.shape[1:], dtype=v.dtype)
            if k == "rgb":
                if bkg_color is not None:
                    full[:] = np.asarray(bkg_color, dtype=v.dtype)
                elif self.model.fg_model.get_ray_cfgs("white_bkg"):
                    full[:] = 1.0  # match render_image's white fill on empty rays
            full[idx[:valid_n]] = v[:valid_n]
            imgs[k] = full.reshape((h, w) + v.shape[1:])
        stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget, "clipped_rays": n_clip}
        return imgs, stats

    def render_image_interactive(self, sample, scale=2, chunk_rays=None, bkg_color=None,
                                 hit_frac=0.5, n_probe=0):
        """Adaptive-resolution interactive render: shade a stride-``scale``
        subgrid of the image's rays through the compacted fast path
        (occupancy pre-pass + per-ray sample cap, render_image_fast), then
        bilinear-upsample every per-ray output back to the full frame.

        Resolution is the honest interactive lever on this workload: the
        eval path's cost scales with shaded slots = hit_rays * cap, so at
        a fixed cap a half-res frame costs ~4x less than any per-sample
        knob can recover at full res (measured: cap 4 / ns 64 / 64k-chunk
        sweeps all land within 1.1x of the cap-4 bench tier —
        scripts/probe_render_surgery.py). This mirrors the reference
        viewer's interaction-time adaptive rendering
        (ns_viewer/server/viewer_utils.py:657): low-res while moving,
        full-res on settle. Pair with set_render_cap(cap, n_sample=...)
        for the quality ladder; returns (imgs dict at FULL (H, W), stats).
        """
        h, w = int(sample["H"]), int(sample["W"])
        scale = max(1, int(scale))
        if scale == 1:
            return self.render_image_fast(sample, chunk_rays=chunk_rays,
                                          bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe)
        off = scale // 2  # subgrid pixel centers sit mid-stride
        hs, ws = len(range(off, h, scale)), len(range(off, w, scale))
        sub = {"H": hs, "W": ws}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time", "img", "mask"):
            if k in sample and sample[k] is not None:
                arr = np.asarray(sample[k])
                grid = arr.reshape((h, w) + arr.shape[1:])
                sub[k] = grid[off::scale, off::scale].reshape((hs * ws,) + arr.shape[1:])
        imgs_s, stats = self.render_image_fast(sub, chunk_rays=chunk_rays,
                                               bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe)
        imgs = {k: _bilinear_upsample(v, h, w, off, scale) for k, v in imgs_s.items()}
        stats = dict(stats, scale=scale, shaded_rays=hs * ws)
        return imgs, stats

    # ------------------------------------- transmittance-continuation render
    def _windowed_fused_impl(self, params, bound_state, feed, miss_rgb, hit_bkg,
                             n_probe, n_chunks1, n_chunks_passes, chunk, cap, eps):
        """One-dispatch transmittance-continuation render — the TPU-shaped
        equivalent of the reference CUDA renderer's alive-ray compaction
        rounds (instant-ngp marches rays in rounds, dropping rays whose
        transmittance passed the cutoff; ns_viewer's adaptive renderer
        rides the same kernel).

        Pass 0 shades every hit ray's first ``cap`` valid samples (the
        window). Rays whose residual transmittance T still exceeds ``eps``
        are rank-compacted into a smaller budget and shaded for the NEXT
        window of ``cap`` valid samples (cap_offset = pass * cap), their
        contribution weighted by carried T. Because windows march with the
        PRE-cap occupancy mask's deltas (fg_model mask_march), per-sample
        alphas are bit-identical to the full render's, and the T-weighted
        sum telescopes: the composition is exact for every ray that
        finishes within the pass ladder (T <= eps bounds the rest).

        ``n_chunks_passes`` is a static tuple of per-pass chunk counts —
        alive rays DRAIN geometrically as transmittance saturates, so
        later passes ride shrinking budgets instead of paying pass-1's
        ray count every round (the reference CUDA renderer's alive-ray
        compaction shrinks the launch the same way each round).
        """
        rays_o, rays_d = feed["rays_o"], feed["rays_d"]
        n = rays_o.shape[0]
        hit = self._hit_prepass_impl(bound_state, rays_o, rays_d, n_probe)
        if hit is None:
            hit = jnp.ones((n,), bool)
        budget1 = n_chunks1 * chunk
        g = jnp.cumsum(hit.astype(jnp.int32)) - 1
        g = jnp.where(hit, jnp.clip(g, 0, budget1), budget1)
        sel = jnp.zeros((budget1 + 1,), jnp.int32).at[g].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget1]
        n_hit = jnp.sum(hit.astype(jnp.int32))
        sel_valid = jnp.arange(budget1, dtype=jnp.int32) < jnp.minimum(n_hit, budget1)

        feed1 = {k: jnp.take(v, sel, axis=0) for k, v in feed.items()}

        def run_pass(feed_p, offset, n_chunks_p, chunk_p):
            stack = {k: v.reshape((n_chunks_p, 1, chunk_p) + v.shape[1:]) for k, v in feed_p.items()}
            stack["cap_offset"] = jnp.full((n_chunks_p,), offset, jnp.int32)
            outs = self._render_scan_impl(params, bound_state, stack)
            return {k: v.reshape((n_chunks_p * chunk_p,) + v.shape[3:]) for k, v in outs.items()}

        def pass_shape(spec):
            # spec: chunk count (rides the main chunk) or (n_chunks, chunk) —
            # the counted ladder hands later passes SMALLER chunks so a
            # 2k-alive tail pass stops paying a full 32k-ray chunk floor
            return spec if isinstance(spec, tuple) else (spec, chunk)

        out1 = run_pass(feed1, 0, n_chunks1, chunk)
        rgb, depth, mask = out1["rgb"], out1["depth"], out1["mask"]
        T = jnp.clip(1.0 - mask, 0.0, 1.0)
        T = jnp.where(sel_valid, T, 0.0)  # padded rows are dead
        # a ray can have more samples only if its window came back FULL —
        # escaping rays never saturate T and must not hold pass budgets
        may_more = out1.get("n_win_pts", jnp.full((budget1,), cap)) >= cap

        clipped = jnp.zeros((), jnp.int32)
        alive_counts = []
        for p, spec in enumerate(n_chunks_passes, start=1):
            n_chunks2, chunk2 = pass_shape(spec)
            budget2 = n_chunks2 * chunk2
            alive = (T > eps) & may_more
            n_alive = jnp.sum(alive.astype(jnp.int32))
            alive_counts.append(n_alive)
            clipped = clipped + jnp.maximum(n_alive - budget2, 0)
            rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
            # an alive ray whose rank exceeds this pass's budget cannot be
            # shaded this round — RETIRE it (consistent truncation: partial
            # integral so far + T*bkg) instead of leaving it alive to render
            # window p+1 with window p missing; clipped_alive still reports
            # the quality event to the caller
            may_more = may_more & ~(alive & (rank >= budget2))
            g2 = jnp.where(alive, jnp.clip(rank, 0, budget2), budget2)
            sel2 = jnp.zeros((budget2 + 1,), jnp.int32).at[g2].set(
                jnp.arange(budget1, dtype=jnp.int32), mode="drop")[:budget2]
            valid2 = jnp.arange(budget2, dtype=jnp.int32) < jnp.minimum(n_alive, budget2)
            feed2 = {k: jnp.take(v, sel2, axis=0) for k, v in feed1.items()}
            out2 = run_pass(feed2, p * cap, n_chunks2, chunk2)
            w2 = jnp.where(valid2, jnp.take(T, sel2), 0.0)
            sel2_safe = jnp.where(valid2, sel2, budget1)

            def _acc(acc, contrib, wgt):
                pad = jnp.zeros((1,) + acc.shape[1:], acc.dtype)
                wb = wgt.reshape((-1,) + (1,) * (acc.ndim - 1))
                return jnp.concatenate([acc, pad]).at[sel2_safe].add(wb * contrib)[:budget1]

            rgb = _acc(rgb, out2["rgb"], w2)
            depth = _acc(depth, out2["depth"], w2)
            mask = _acc(mask, out2["mask"], w2)
            t_next = w2 * jnp.clip(1.0 - out2["mask"], 0.0, 1.0)
            T = jnp.concatenate([T, jnp.zeros((1,), T.dtype)]).at[sel2_safe].set(t_next)[:budget1]
            if "n_win_pts" in out2:
                full2 = (out2["n_win_pts"] >= cap) & valid2
                may_more = jnp.concatenate(
                    [may_more, jnp.zeros((1,), bool)]).at[sel2_safe].set(full2)[:budget1] & may_more

        if hit_bkg is not None:
            # the full render composites rgb += T_end * bkg inside marching;
            # windowed passes run bkg-free and composite once here
            rgb = rgb + T[:, None] * hit_bkg

        sel_safe = jnp.where(sel_valid, sel, n)
        # miss fills match render_image's update_values_for_invalid_rays:
        # bkg color for rgb, the model's depth_far for depth, 0 for mask
        miss_depth = jnp.asarray(
            float(self.model.fg_model.get_render_cfgs()["depth_far"]), jnp.float32)
        if "n_win_pts" in out1:
            # a prepass-HIT ray with zero valid samples in its first window
            # must fill like the exact renderer's invalid rays (depth_far +
            # miss color), not keep the zero-fill partial integral
            empty = out1["n_win_pts"] <= 0
            depth = jnp.where(empty, miss_depth, depth)
            if hit_bkg is None:  # else T=1 already composited the bkg above
                rgb = jnp.where(empty[:, None], miss_rgb[None].astype(rgb.dtype), rgb)
        imgs = {}
        for k, flat in (("rgb", rgb), ("depth", depth), ("mask", mask)):
            if k == "rgb":
                init = jnp.broadcast_to(miss_rgb, (n + 1, 3)).astype(flat.dtype)
            elif k == "depth":
                init = jnp.full((n + 1,), miss_depth, flat.dtype)
            else:
                init = jnp.zeros((n + 1,) + flat.shape[1:], flat.dtype)
            imgs[k] = init.at[sel_safe].set(flat)[:n]
        alive_arr = (jnp.stack(alive_counts) if alive_counts
                     else jnp.zeros((0,), jnp.int32))
        return (imgs, n_hit, jnp.sum(((T > eps) & may_more).astype(jnp.int32)),
                clipped, alive_arr)

    def render_image_windowed(self, sample, n_pass=3, alive_frac=0.5, chunk_rays=None,
                              bkg_color=None, hit_frac=0.5, n_probe=0, scale=1, eps=1e-3,
                              adaptive_budget=True, refine_frac=0.0, pass_budget_rays=None,
                              budget_rays=None):
        """Full-image transmittance-continuation render (see
        _windowed_fused_impl). Requires set_render_cap(cap, window=True)
        first — the cap becomes the per-pass window length. ``scale`` > 1
        shades a stride-``scale`` pixel subgrid and bilinear-upsamples
        (render_image_interactive's adaptive-resolution lever) — the
        subgrid samples themselves stay eps-exact.

        ``adaptive_budget`` sizes the pass-1 ray budget from a real hit
        COUNT (one cheap prepass dispatch, bucketed to power-of-2 chunk
        counts so at most log2 shapes ever compile) instead of the blind
        ``hit_frac`` guess — a dense view can exceed hit_frac*n hit rays,
        and clipped hit rays render as background (the silent 25 dB
        cliff measured in scripts/probe_upsample_bound.py).

        ``refine_frac`` > 0 (with scale > 1) re-renders the top
        refine_frac fraction of NON-subgrid pixels ranked by upsampled
        luminance gradient through the same eps-exact windowed path and
        scatters them into the frame — edges are where bilinear
        upsampling errs (measured +1.4 dB at scale 2 refining 20%).
        Returns (imgs, stats)."""
        if getattr(self.model, "has_bkg", False) or self.model.fg_model.get_ray_cfgs("white_bkg"):
            # model-owned backgrounds composite inside marching per pass —
            # that breaks the T-weighted composition; use the exact path
            imgs = self.render_image(sample, chunk_rays=chunk_rays, bkg_color=bkg_color)
            return imgs, {"fallback": "bkg-owning model"}
        bound = self.model.fg_model.get_obj_bound()
        assert bound.get_optim_cfgs().get("eval_cap_window"), \
            "call set_render_cap(cap, window=True) before render_image_windowed"
        cap = int(bound.get_optim_cfgs("eval_max_pts_per_ray"))

        h, w = int(sample["H"]), int(sample["W"])
        scale = max(1, int(scale))
        if scale > 1:
            off = scale // 2
            hs, ws = len(range(off, h, scale)), len(range(off, w, scale))
            sub = {"H": hs, "W": ws}
            arrs = {}
            for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
                if k in sample and sample[k] is not None:
                    arr = np.asarray(sample[k])
                    arrs[k] = arr
                    grid = arr.reshape((h, w) + arr.shape[1:])
                    sub[k] = grid[off::scale, off::scale].reshape((hs * ws,) + arr.shape[1:])
            imgs_s, stats = self.render_image_windowed(
                sub, n_pass=n_pass, alive_frac=alive_frac, chunk_rays=chunk_rays,
                bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe, eps=eps,
                adaptive_budget=adaptive_budget, pass_budget_rays=pass_budget_rays,
                budget_rays=budget_rays)
            imgs = {k: _bilinear_upsample(v, h, w, off, scale) for k, v in imgs_s.items()}
            stats = dict(stats, scale=scale, shaded_rays=hs * ws)
            if refine_frac > 0.0:
                ridx = self._refine_pixel_select(imgs["rgb"], h, w, off, scale, refine_frac)
                if ridx.size:
                    rsub = {"H": 1, "W": int(ridx.size)}
                    for k, arr in arrs.items():
                        rsub[k] = arr[ridx]
                    rimgs, rstats = self.render_image_windowed(
                        rsub, n_pass=n_pass, alive_frac=alive_frac, chunk_rays=chunk_rays,
                        bkg_color=bkg_color, hit_frac=1.0, n_probe=n_probe, eps=eps,
                        adaptive_budget=adaptive_budget)
                    for k in imgs:
                        if k in rimgs:
                            flat_img = imgs[k].reshape((h * w,) + imgs[k].shape[2:])
                            flat_img[ridx] = rimgs[k].reshape((ridx.size,) + imgs[k].shape[2:])
                            imgs[k] = flat_img.reshape(imgs[k].shape)
                    stats = dict(stats, refined_rays=int(ridx.size),
                                 refine_hit_frac=rstats.get("hit_frac"))
            return imgs, stats

        chunk_rays = self._chunk_for_mesh(chunk_rays)
        n = sample["rays_o"].shape[0]

        feed = {}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
            if k in sample and sample[k] is not None:
                feed[k] = jnp.asarray(np.asarray(sample[k]))

        n_chunks_max = int(-(-n // chunk_rays))

        def _pow2_chunks(count):
            need = max(1, int(-(-count // chunk_rays)))
            c = 1
            while c < need:
                c *= 2
            return min(c, n_chunks_max)

        def _ray_budget_specs(budgets):
            """Ray budgets -> static (n_chunks, chunk) pass specs, pow2-
            bucketed with a 4096-ray chunk floor (bounded compile set)."""
            min_chunk = min(4096, chunk_rays)
            specs = []
            for b in budgets:
                if b <= 0:
                    break
                budget_p = min_chunk
                while budget_p < b:
                    budget_p *= 2
                budget_p = min(budget_p, n_chunks_max * chunk_rays)
                chunk_p = min(chunk_rays, budget_p)
                specs.append((budget_p // chunk_p, chunk_p))
            return tuple(specs)

        n_chunks_passes = None
        if pass_budget_rays is not None:
            # CALIBRATED ladder: the caller rides a previous frame's
            # measured per-pass alive counts (stats["alive_per_pass"],
            # temporal coherence — the reference viewer adapts its render
            # settings across frames the same way). Exactness is still
            # guarded per frame: clipped_alive / hit_clipped > 0 in the
            # returned stats flag a budget the scene outgrew. budget_rays
            # (stats["budget_rays"] of the calibration frame) skips the
            # per-frame hit-count prepass dispatch entirely.
            if budget_rays is not None:
                n_chunks1 = max(1, min(n_chunks_max,
                                       int(-(-budget_rays // chunk_rays))))
            else:
                hit = self._hit_prepass(
                    self.bound_state(), feed["rays_o"], feed["rays_d"], n_probe)
                n_chunks1 = n_chunks_max if hit is None else _pow2_chunks(
                    int(jnp.sum(hit.astype(jnp.int32))))
            n_chunks_passes = _ray_budget_specs(pass_budget_rays)
        elif adaptive_budget:
            # COUNTED pass ladder: per-ray valid-sample counts from one
            # cheap prepass dispatch. A ray is alive entering pass p only
            # if all p prior windows were full (count >= p*cap), so
            # budgets of #(count >= p*cap) never clip and passes whose
            # bound is 0 vanish — the geometric alive_frac ladder paid
            # ~(n_pass-1) one-chunk floor passes on settled scenes and
            # CLIPPED alive rays when a pass outgrew its guess (the 32.8
            # dB windowed-s1 ceiling in BENCH r4's first cut).
            counts = self._count_prepass(
                self.bound_state(), feed["rays_o"], feed["rays_d"])
            if counts is None:
                n_chunks1 = n_chunks_max
            else:
                counts = np.asarray(counts)
                n_chunks1 = _pow2_chunks(int((counts > 0).sum()))
                # later passes ride pow2 ray budgets with their OWN chunk
                # size — a 2k-alive tail pass must not pay a full
                # main-chunk floor (measured s3: 5 floor passes of 32k rays
                # behind a 29k-hit frame, scripts/probe_windowed_tiers.py)
                n_chunks_passes = _ray_budget_specs(
                    [int((counts >= p * cap).sum()) for p in range(1, n_pass)])
        else:
            budget1 = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
            n_chunks1 = budget1 // chunk_rays
        budget1 = n_chunks1 * chunk_rays
        if n_chunks_passes is None:
            # fallback: alive rays drain geometrically
            n_chunks_passes = tuple(
                max(1, int(-(-(n_chunks1 * (alive_frac ** p)) // 1)))
                for p in range(1, n_pass))

        # NOTE: bkg_color deliberately NOT fed to the model (see impl)
        if bkg_color is not None:
            miss = np.asarray(bkg_color, dtype=np.float32)
        else:
            miss = np.zeros(3, dtype=np.float32)
        hit_bkg = jnp.asarray(miss) if np.any(miss != 0.0) else None

        params, bound_state = self._state_fn()
        flat, n_hit, n_alive_end, clipped, alive_arr = self._windowed_fused(
            params, bound_state, feed, jnp.asarray(miss),
            hit_bkg, n_probe, n_chunks1, n_chunks_passes, chunk_rays, cap, float(eps))
        imgs = {k: np.asarray(v).reshape((h, w) + v.shape[1:]) for k, v in flat.items()}
        n_hit = int(n_hit)
        stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget1,
                 "hit_clipped": max(0, n_hit - budget1),
                 "pass_budget_rays": tuple(
                     (s[0] * s[1]) if isinstance(s, tuple) else s * chunk_rays
                     for s in n_chunks_passes),
                 "alive_per_pass": tuple(int(a) for a in np.asarray(alive_arr)),
                 "n_pass": n_pass, "cap": cap,
                 "alive_at_end": int(n_alive_end), "clipped_alive": int(clipped)}
        return imgs, stats

    @staticmethod
    def _refine_pixel_select(rgb, h, w, off, scale, refine_frac):
        """Top-``refine_frac`` NON-subgrid pixel indices ranked by the
        upsampled frame's luminance gradient — the pixels bilinear
        interpolation got most wrong. -> flat (k,) int64 indices."""
        lum = np.asarray(rgb, dtype=np.float32)
        if lum.ndim == 3:
            lum = lum @ np.asarray([0.299, 0.587, 0.114], np.float32)
        gy = np.abs(np.diff(lum, axis=0, prepend=lum[:1]))
        gx = np.abs(np.diff(lum, axis=1, prepend=lum[:, :1]))
        score = (gy + gx).reshape(-1)
        onsub = np.zeros((h, w), bool)
        onsub[off::scale, off::scale] = True
        score[onsub.reshape(-1)] = -1.0
        k = int(refine_frac * h * w)
        if k <= 0:
            return np.zeros((0,), np.int64)
        # always exactly k indices: the refine render's shapes stay
        # frame-stable (no recompiles); a subgrid pixel sneaking in when
        # fewer than k edges exist just re-renders an exact pixel
        return np.argpartition(score, -k)[-k:]
