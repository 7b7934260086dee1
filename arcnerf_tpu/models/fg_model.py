"""Foreground model with pluggable object bound.

Capability parity with /root/reference/arcnerf/models/fg_model.py (forward
:153-229, get_sigma_radiance_by_mask_pts :264-318,
update_values_for_invalid_rays :320-387, merge_full_mask :389-406,
optimize :408-410, surface_render :412-464).

TPU-first differences:
- no dynamic ray partitioning: all rays are evaluated with static shapes;
  invalid rays get defaults via jnp.where (update_values_for_invalid_rays),
- point compaction at a STATIC budget: instead of the CUDA dynamic-length
  boolean compaction, the k-th globally-valid point is located by a
  cumsum+searchsorted over per-ray prefix masks (no total-size sort) and
  only ``obj_bound.log_max_allowance`` points feed the MLP, results
  scattered back (see compact_point_eval). Invalid points keep sigma=0
  (or repeat the last valid value for sdf); their left-compacted zvals
  duplicate the last valid sample so ray marching assigns them zero
  weight either way,
- dynamic batch size becomes a measured valid-point count reported in
  output['n_valid_pts'] for the trainer's recompile-free ray-bucket logic.
"""

import os

import jax
import jax.numpy as jnp

from ..geometry.ray import get_ray_points_by_zvals, surface_ray_intersection
from ..geometry.transformation import normalize
from ..utils.cfgs import get_value_from_cfgs_field
from .base_3d_model import Base3dModel
from .base_modules.obj_bound import build_obj_bound


# obj-bound objects are stateless (functional state passes separately), so
# one instance per obj_bound config suffices; rebuilding per call is pure
# trace-time waste (get_obj_bound is hit several times per forward trace).
# Keyed by the serialized obj_bound subtree so in-place cfg edits still
# rebuild correctly.
_BOUND_CACHE = {}

# _compact_sel construction form: "rowgather" (two-level row-gather, 13.0 ms
# at bench shapes) or "rank" (one element-scatter of flat indices by global
# rank, 29.4 ms) — scripts/probe_compact_sel.py. Both are exact for the
# valid prefix; they differ only in which arbitrary in-range index padding
# rows carry (consumers must mask via sel_valid either way).
_COMPACT_SEL_FORM = os.environ.get("ARCNERF_COMPACT_SEL", "rowgather")


def _cached_obj_bound(model_cfgs):
    from ..utils.cfgs import obj_to_dict

    bound_cfgs = getattr(model_cfgs, "obj_bound", None)
    key = repr(obj_to_dict(bound_cfgs)) if bound_cfgs is not None else None
    hit = _BOUND_CACHE.get(key)
    if hit is None:
        # bounded LRU: long test sessions build many models with distinct
        # configs; each bound holds numpy volumes, so cap the cache
        while len(_BOUND_CACHE) >= 32:
            _BOUND_CACHE.pop(next(iter(_BOUND_CACHE)))
        hit = build_obj_bound(model_cfgs)
        _BOUND_CACHE[key] = hit
    else:
        _BOUND_CACHE[key] = _BOUND_CACHE.pop(key)  # refresh LRU order
    return hit


class FgModel(Base3dModel):
    """Foreground model; subclasses implement _forward over valid zvals."""

    # ------------------------------------------------------------ obj bound
    def get_obj_bound(self):
        bound, _ = _cached_obj_bound(self.cfgs.model)
        return bound

    def get_obj_bound_type(self):
        _, bound_type = _cached_obj_bound(self.cfgs.model)
        return bound_type

    def init_bound_state(self):
        return self.get_obj_bound().init_state()

    def get_render_cfgs(self, key=None):
        obj_bound = get_value_from_cfgs_field(self.cfgs.model, "obj_bound")
        if obj_bound is None:
            params = {"bkg_color": [1.0, 1.0, 1.0], "depth_far": 10.0, "normal": [0.0, 1.0, 0.0],
                      "max_allowance": -1}
        else:
            params = {
                "bkg_color": get_value_from_cfgs_field(obj_bound, "bkg_color", [0.0, 0.0, 0.0]),
                "depth_far": get_value_from_cfgs_field(obj_bound, "depth_far", 10.0),
                "normal": get_value_from_cfgs_field(obj_bound, "normal", [0.0, 1.0, 0.0]),
                "max_allowance": get_value_from_cfgs_field(obj_bound, "log_max_allowance", -1),
                "eval_max_pts_per_ray": get_value_from_cfgs_field(obj_bound, "eval_max_pts_per_ray", None),
            }
            if params["max_allowance"] > 0:
                params["max_allowance"] = 1 << params["max_allowance"]
        params.setdefault("eval_max_pts_per_ray", None)
        return params if key is None else params[key]

    def get_n_coarse_sample(self):
        return self.get_ray_cfgs("n_sample")

    # ------------------------------------------------------------- sampling
    def get_near_far_from_rays(self, inputs, bound_state=None):
        bound = self.get_obj_bound()
        near, far, mask_rays = bound.get_near_far_from_rays(
            bound_state or {},
            inputs,
            near_hardcode=self.get_ray_cfgs("near"),
            far_hardcode=self.get_ray_cfgs("far"),
            bounding_radius=self.get_ray_cfgs("bounding_radius"),
        )
        # optional per-ray crop window (viewer crop box; reference
        # ns_viewer/server/viewer_utils.py crop controls): clamp the march
        # segment to [t0, t1] and send misses to the background compositor
        # via mask_rays. Distinct from the dataset 'bounds' key, whose
        # semantics each bound type owns.
        crop = inputs.get("crop_bounds")
        if crop is not None:
            near2 = jnp.maximum(near, crop[:, 0:1])
            far2 = jnp.minimum(far, crop[:, 1:2])
            hit = (far2 > near2)[:, 0]
            far2 = jnp.maximum(far2, near2)
            mask_rays = hit if mask_rays is None else (mask_rays & hit)
            near, far = near2, far2
        return near, far, mask_rays

    def use_scattered_masks(self):
        """Scattered (unsorted) occupancy masks let the volume/bitfield
        sampler skip handle_valid_mask_zvals's per-ray stable argsort
        (281 ms at the 32k bucket); ray_marching(mask_pts=...) reproduces
        the compacted numerics exactly. Valid only when nothing downstream
        assumes left-compacted zvals: density models (zero-fill is exact),
        no importance upsampling (merge_full_mask keeps valid-first), no
        sigma-blend background (joint re-marching concatenates fg zvals)."""
        if self.sigma_reverse() or self.get_ray_cfgs("n_importance") > 0:
            return False
        bkg = get_value_from_cfgs_field(self.cfgs.model, "background", None)
        if bkg is not None and get_value_from_cfgs_field(bkg, "bkg_blend", "rgb") == "sigma":
            return False
        return True

    def get_zvals_from_near_far(self, near, far, n_pts, inference_only=False, rays_o=None, rays_d=None,
                                bound_state=None, cap_offset=None):
        bound = self.get_obj_bound()
        return bound.get_zvals_from_near_far(
            bound_state or {},
            near,
            far,
            n_pts,
            inference_only,
            self.get_ray_cfgs("inverse_linear"),
            self.get_ray_cfgs("perturb"),
            key=self._sample_key(inference_only),
            rays_o=rays_o,
            rays_d=rays_d,
            keep_order=self.use_scattered_masks(),
            cap_offset=cap_offset,
        )

    # -------------------------------------------------------------- forward
    def __call__(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000,
                 bound_state=None):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        bkg_color = inputs.get("bkg_color", None)

        near, far, mask_rays = self.get_near_far_from_rays(inputs, bound_state)
        near = jax.lax.stop_gradient(near)
        far = jax.lax.stop_gradient(far)
        n_coarse = self.get_n_coarse_sample()
        if inference_only:
            # inference ladder override (trainer.set_render_cap n_sample):
            # coarser fix-step marching for interactive rendering
            ns_eval = self.get_obj_bound().get_optim_cfgs().get("eval_n_sample")
            n_coarse = int(ns_eval) if ns_eval else n_coarse
        zvals, mask_pts = self.get_zvals_from_near_far(
            near, far, n_coarse, inference_only, rays_o, rays_d, bound_state,
            cap_offset=inputs.get("cap_offset"),
        )
        zvals = jax.lax.stop_gradient(zvals)

        # window mode (transmittance-continuation renderer): the bound
        # returns (eval window mask, pre-cap march mask) — marching deltas
        # must span gaps like the FULL render's so windows compose exactly
        mask_march = None
        windowed = isinstance(mask_pts, tuple)
        if windowed:
            mask_pts, mask_march = mask_pts

        inputs = dict(inputs)
        inputs["zvals"] = zvals
        inputs["mask_pts"] = mask_pts
        # static flag: mask is in ladder order (not left-compacted) — models
        # must pass it to ray_marching for mask-aware deltas
        inputs["mask_scattered"] = self.use_scattered_masks() and mask_pts is not None
        if mask_march is not None:
            inputs["mask_march"] = mask_march

        if mask_pts is not None:
            ray_has_pts = jnp.any(mask_pts, axis=1)
            mask_rays = ray_has_pts if mask_rays is None else (mask_rays & ray_has_pts)

        output = self._forward(inputs, inference_only, get_progress, cur_epoch, total_epoch)

        if mask_rays is not None:
            # windowed passes report PARTIAL integrals: rays with an empty
            # window (or no hit) must contribute exactly zero so the
            # trainer's T-weighted composition stays exact — no bkg/depth
            # fills mid-composition
            output = self.update_values_for_invalid_rays(
                output, mask_rays, bkg_color, zero_fill=windowed)
        if mask_pts is not None:
            output["n_valid_pts"] = jnp.sum(mask_pts)
        if windowed:
            # per-ray window fill count: the continuation renderer keeps a
            # ray alive only while its window came back FULL (a partial
            # window means the ray exhausted its valid samples — escaping
            # rays never saturate T and must not occupy pass budgets)
            output["n_win_pts"] = jnp.sum(mask_pts.astype(jnp.int32), axis=1)
        return output

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        raise NotImplementedError("implement _forward in the concrete model")

    @staticmethod
    def _compact_sel_aux(mask_pts, budget):
        """_compact_sel plus the segment geometry of the compacted stream:
        ``off`` (B,) unclipped exclusive start rank per ray and ``cnt``
        (B,) in-stream sample count (clipped to the budget) — what
        ``segment_march`` needs to integrate the stream without ever
        scattering back to the (B, N) grid."""
        n_rays, n_pts = mask_pts.shape
        total = n_rays * n_pts
        row = jnp.cumsum(mask_pts.astype(jnp.int32), axis=1)  # (B, N) inclusive
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot  # (B,) exclusive ray offsets
        if _COMPACT_SEL_FORM == "rowgather":
            # two-level ROW-GATHER form (scripts/probe_compact_sel.py form f:
            # 13.0 vs the rank element-scatter's 29.4 ms at bench shapes,
            # exact parity). Level 1 — the owning ray of output rank k:
            # scatter a mark at each ray's start rank, cumsum over ranks
            # (== searchsorted(off, k, 'right') - 1, without 15x262k binary-
            # search gathers; XLA's searchsorted alone measured 45 ms).
            # Level 2 — the within-row slot: gather the ray's inclusive
            # cumsum ROW (the fast 128-lane primitive) and count positions
            # with cumsum <= local rank.
            k = jnp.arange(budget, dtype=jnp.int32)
            mark = jnp.zeros((budget + 1,), jnp.int32).at[
                jnp.clip(off, 0, budget)].add(1, mode="drop")
            r = jnp.clip(jnp.cumsum(mark[:budget]) - 1, 0, n_rays - 1)
            j = (k - jnp.take(off, r))[:, None]
            row_g = jnp.take(row, r, axis=0)  # (budget, N) row gather
            slot = jnp.sum((row_g <= j).astype(jnp.int32), axis=1)
            sel = jnp.clip(r * n_pts + slot, 0, total - 1)
        else:  # "rank": one element-scatter of flat indices by global rank
            g = (row + off[:, None] - 1).reshape(-1)  # global rank per slot
            g = jnp.where(mask_pts.reshape(-1), jnp.clip(g, 0, budget), budget)
            sel = jnp.zeros((budget + 1,), jnp.int32).at[g].set(
                jnp.arange(total, dtype=jnp.int32), mode="drop")[:budget]
        sel_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.sum(tot)
        cnt = jnp.clip(budget - off, 0, tot)
        return sel, sel_valid, off, cnt

    @staticmethod
    def _compact_sel(mask_pts, budget):
        """Flat indices of the first ``budget`` valid points under ANY
        (B, N) mask pattern (prefix or scattered); see _COMPACT_SEL_FORM
        for the two measured constructions. Returns (sel (budget,) int32,
        sel_valid (budget,) bool). sel rows past the valid count carry an
        arbitrary in-range index (0 under the rank form, a clipped
        neighbor under rowgather) — consumers MUST mask via sel_valid."""
        sel, sel_valid, _, _ = FgModel._compact_sel_aux(mask_pts, budget)
        return sel, sel_valid

    def compact_point_eval(self, fn, pts, dirs, mask_pts, budget, fill="zero"):
        """Evaluate ``fn(pts, dirs) -> tuple of (N, ...) arrays`` on only the
        first ``budget`` valid points, scattering results back to the full
        (N,) layout. fill='zero' leaves invalid slots at 0 (matches the
        reference's zero-sigma fill); fill='repeat_last' repeats each ray's
        last valid value — exact for left-compacted zvals whose invalid
        slots duplicate the last valid sample (required for sdf, where 0
        means "on the surface").

        Static-shape replacement of the reference's dynamic boolean
        compaction + scatter-back (fg_model.py:264).
        """
        n_rays, n_pts = mask_pts.shape
        total = n_rays * n_pts
        sel, sel_valid = self._compact_sel(mask_pts, budget)

        outs_c = fn(pts[sel], dirs[sel])
        # out-of-budget rows come back as sel=0 (rank-scatter leaves unset
        # slots at 0) and would collide with flat index 0 — divert them to
        # a dump slot at `total`
        sel_safe = jnp.where(sel_valid, sel, total)
        outs = []
        iota = jnp.arange(n_pts, dtype=jnp.int32)[None, :]
        last_idx = jnp.maximum(jnp.max(jnp.where(mask_pts, iota, -1), axis=1), 0)  # (B,)
        for o in outs_c:
            buf = jnp.zeros((total + 1,) + o.shape[1:], dtype=o.dtype)
            full = buf.at[sel_safe].set(o)[:total]
            if fill == "repeat_last":
                grid = full.reshape((n_rays, n_pts) + o.shape[1:])
                last = jnp.take_along_axis(
                    grid, last_idx.reshape((n_rays, 1) + (1,) * (o.ndim - 1)), axis=1
                )
                m = mask_pts.reshape((n_rays, n_pts) + (1,) * (o.ndim - 1))
                full = jnp.where(m, grid, last).reshape(full.shape)
            outs.append(full)
        return tuple(outs)

    def _compact_budget(self, n_rays, inference_only):
        """Static compaction budget (obj_bound.log_max_allowance), shrunk
        at inference to the per-ray sample cap when one is set."""
        budget = self.get_render_cfgs("max_allowance")
        if inference_only and isinstance(budget, int) and budget > 0:
            # the per-ray sample cap (_cap_pts_per_ray) bounds the valid
            # count at n_rays * cap — shrink the STATIC compaction budget to
            # match so capped eval renders do proportionally less encoder/MLP
            # work (the cap alone changes no shapes and saves nothing)
            cap = self.get_render_cfgs("eval_max_pts_per_ray")
            if cap:
                budget = min(budget, -(-(n_rays * int(cap)) // 1024) * 1024)
        return budget

    def get_sigma_radiance_by_mask_pts(
        self, geo_net, radiance_net, rays_o, rays_d, zvals, mask_pts=None, inference_only=False
    ):
        """Evaluate sigma/radiance at the (ray, sample) points; compacted to
        the static point budget (obj_bound.log_max_allowance) when masks
        mark most points invalid. Invalid points keep sigma=0 — zero weight
        in ray marching whether the mask is left-compacted (duplicate
        zvals) or scattered (mask-aware deltas)."""
        n_rays, n_pts = zvals.shape
        total = n_rays * n_pts

        budget = self._compact_budget(n_rays, inference_only)
        use_compact = (
            mask_pts is not None and isinstance(budget, int) and 0 < budget < total
        )
        if not use_compact:
            pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
            dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_pts, 3)).reshape(-1, 3)
            sigma, radiance = self._forward_pts_dir(geo_net, radiance_net, pts, dirs)
            return sigma.reshape(n_rays, n_pts), radiance.reshape(n_rays, n_pts, 3)

        # SoA compaction: never materialize the (B*N, 3) point tensor (its
        # minor dim tile-pads 3->128 on TPU — measured 191 ms at the 32k
        # bucket). Gather the budgeted points' z values flat and rebuild
        # (budget, 3) pts from the per-ray origins/dirs.
        sel, sel_valid = self._compact_sel(mask_pts, budget)
        ray_id = sel // n_pts
        z_sel = jnp.take(zvals.reshape(-1), sel)  # (budget,)
        o_sel = jnp.take(rays_o, ray_id, axis=0)  # (budget, 3)
        d_sel = jnp.take(rays_d, ray_id, axis=0)
        pts_sel = o_sel + z_sel[:, None] * d_sel

        sigma_c, radiance_c = self._forward_pts_dir(geo_net, radiance_net, pts_sel, d_sel)
        sel_safe = jnp.where(sel_valid, sel, total)
        # 4 flat channel scatters instead of one (total, 3) scatter: the
        # rank-2 tiny-minor-dim buffer lays out badly on TPU and its VJP
        # gather costs 2x (28.6 -> 13.6 ms, scripts/probe_hotpath2.py)
        sigma = jnp.zeros((total + 1,), dtype=sigma_c.dtype).at[sel_safe].set(sigma_c)[:total]
        chans = [
            jnp.zeros((total + 1,), dtype=radiance_c.dtype).at[sel_safe].set(radiance_c[:, c])[:total]
            for c in range(3)
        ]
        radiance = jnp.stack([c.reshape(n_rays, n_pts) for c in chans], axis=-1)
        return sigma.reshape(n_rays, n_pts), radiance

    def fused_render_by_mask_pts(
        self, geo_net, radiance_net, rays_o, rays_d, zvals, mask_pts, inference_only=False,
        bkg_color=None
    ):
        """Compacted-stream render: evaluate sigma/radiance on the budgeted
        valid points AND integrate them there (render/ray_helper.py
        segment_march) — the dense (B, N) grid is never rebuilt, removing
        the 4-channel scatter-back plus all marching work on the ~94%
        invalid padding. Numerically matches the dense scattered-mask path
        (scatter-back + scattered_deltas + alpha_to_weights) to f32
        rounding; the one divergence is when valid points exceed the
        budget: the clip-boundary sample gets a zero tail delta here vs a
        gap-spanning one densely (tests/test_segment_march.py).

        Returns {rgb, depth, mask} per ray, or None when compaction does
        not apply (no mask, no budget) — caller falls back to the dense
        path. Only valid for density models with scattered (ladder-order)
        masks and no importance upsampling."""
        n_rays, n_pts = zvals.shape
        total = n_rays * n_pts
        budget = self._compact_budget(n_rays, inference_only)
        if not (mask_pts is not None and isinstance(budget, int) and 0 < budget < total):
            return None

        sel, sel_valid, off, cnt = self._compact_sel_aux(mask_pts, budget)
        ray_id = sel // n_pts
        z_sel = jnp.take(zvals.reshape(-1), sel)
        o_sel = jnp.take(rays_o, ray_id, axis=0)
        d_sel = jnp.take(rays_d, ray_id, axis=0)
        pts_sel = o_sel + z_sel[:, None] * d_sel

        sigma_c, radiance_c = self._forward_pts_dir(geo_net, radiance_net, pts_sel, d_sel)

        noise = None
        noise_std = 0.0 if inference_only else float(self.get_ray_cfgs("noise_std") or 0.0)
        if noise_std > 0.0:
            key = self._sample_key(inference_only)
            if key is not None:
                noise = jax.random.normal(key, sigma_c.shape, dtype=z_sel.dtype) * noise_std

        from ..render.ray_helper import segment_march

        out = segment_march(
            sigma_c, radiance_c, z_sel, ray_id, off, cnt, n_rays,
            add_inf_z=self.get_ray_cfgs("add_inf_z"),
            white_bkg=self.get_ray_cfgs("white_bkg"),
            bkg_color=bkg_color,
            noise=noise,
        )
        out.pop("trans_end", None)
        return out

    # ----------------------------------------------------- invalid-ray fill
    def update_values_for_invalid_rays(self, output_valid, mask, rand_bkg_color=None, zero_fill=False):
        """Fill defaults on rays that miss the bound (reference
        fg_model.py:320-387), via jnp.where on static shapes."""
        render_cfgs = self.get_render_cfgs()
        output = {}
        for k, v in output_valid.items():
            if not isinstance(v, jnp.ndarray):
                output[k] = v
                continue
            m = mask.reshape((mask.shape[0],) + (1,) * (v.ndim - 1))
            if zero_fill:
                # windowed partial integrals: empty-window rays contribute 0
                output[k] = jnp.where(m, v, 0.0)
                continue
            if k.startswith("rgb"):
                if rand_bkg_color is not None:
                    fill = jnp.broadcast_to(rand_bkg_color, v.shape)
                else:
                    fill = jnp.broadcast_to(jnp.asarray(render_cfgs["bkg_color"], dtype=v.dtype), v.shape)
                output[k] = jnp.where(m, v, fill)
            elif k.startswith("depth"):
                output[k] = jnp.where(m, v, render_cfgs["depth_far"])
            elif k.startswith("mask"):
                output[k] = jnp.where(m, v, 0.0)
            elif k.startswith("normal"):
                fill = normalize(jnp.asarray(render_cfgs["normal"], dtype=v.dtype))
                output[k] = jnp.where(m, v, jnp.broadcast_to(fill, v.shape))
            elif k.startswith("progress"):
                if "sigma" in k and self.sigma_reverse():
                    output[k] = jnp.where(m, v, -1.0)
                elif "trans_shift" in k:
                    output[k] = jnp.where(m, v, 1.0)
                else:
                    output[k] = jnp.where(m, v, 0.0)
            else:
                output[k] = v
        return output

    @staticmethod
    def merge_full_mask(mask_pts, zvals_new):
        """Extend mask with all-valid new samples, keeping valid-first order
        (reference fg_model.py:389-406)."""
        if mask_pts is None:
            return None
        merged = jnp.concatenate([mask_pts, jnp.ones_like(zvals_new, dtype=bool)], axis=-1)
        return jnp.flip(jnp.sort(merged, axis=-1), axis=-1)

    # -------------------------------------------------------- surface render
    def surface_render(
        self, inputs, bound_state=None, method="sphere_tracing", n_step=128, n_iter=100, threshold=0.01,
        level=50.0, grad_dir="descent"
    ):
        """Surface render with invalid-ray fill (reference fg_model.py:412)."""
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        n_rays = rays_o.shape[0]
        near, far, valid_rays = self.get_near_far_from_rays(inputs, bound_state)
        geo_net, radiance_net = self.get_net()

        geo_fn = lambda pts: geo_net(pts)[0][..., 0]  # noqa: E731
        zvals, pts, mask = surface_ray_intersection(
            rays_o, rays_d, geo_fn, method, near, far, n_step, n_iter, threshold, level, grad_dir
        )
        if valid_rays is not None:
            mask = mask & valid_rays
        _, rgb_pts = self._forward_pts_dir(geo_net, radiance_net, pts, rays_d)
        rgb = jnp.where(mask[:, None], rgb_pts, jnp.ones((n_rays, 3)))
        return {"rgb": rgb, "depth": zvals[:, 0], "mask": mask.astype(rays_o.dtype)}
