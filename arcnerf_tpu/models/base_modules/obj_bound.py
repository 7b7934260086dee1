"""Object bounding structures constraining ray sampling.

Capability parity with /root/reference/arcnerf/models/base_modules/obj_bound/:
build_obj_bound (__init__.py:25-62), BasicBound (basic_bound.py:12-106),
SphereBound (sphere_bound.py:10-37), VolumeBound (volume_bound.py:15-213),
BitfieldBound (bitfield_bound.py:16-189).

TPU-native design:
- Bounds are plain python objects holding *static* geometry (Volume/Sphere
  metadata). All mutable occupancy state (bitfield / opacity field /
  density grid) lives in an explicit ``state`` dict of jnp arrays created by
  ``init_state()`` — it belongs in the train-state pytree and every update
  is functional (state in, state out), jit-safe.
- The reference's CUDA DDA sampler (sparse_volume_sampling) becomes a
  fixed-step sampler + vectorized occupancy gather + stable-sort compaction
  (handle_valid_mask_zvals): static (B, n_pts) shapes, no while-loops.
- Random voxel selection in optimize() uses explicit PRNG keys; the
  "1/4 occupied cells" draw uses probability-weighted choice over the
  bitfield instead of dynamic-length index lists.
"""

import jax
import jax.numpy as jnp

from ...geometry.ray import get_ray_points_by_zvals, sphere_ray_intersection
from ...geometry.volume import Volume, convert_flatten_index_to_xyz_index
from ...render.ray_helper import (
    get_near_far_from_rays,
    get_zvals_from_near_far,
    get_zvals_from_near_far_fix_step,
    handle_valid_mask_zvals,
)
from ...utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs
from ...utils.registry import BOUND_REGISTRY


def _cap_pts_per_ray(mask_pts, inference_only, cap, offset=None):
    """Inference-time early-termination analogue (reference CUDA march's
    trans_shift cutoff, ray_helper.py:476 semantics): keep only the first
    ``cap`` valid samples per ray, front to back. Samples past the cap sit
    behind ~opaque surfaces (T ~ 0) on occupancy-culled scenes. Also makes
    eval chunks budget-safe: chunk_rays * cap bounds the compacted point
    count, so the static budget cannot silently drop points mid-image.

    ``offset`` (traced scalar or None) selects a later WINDOW of valid
    samples: ranks in (offset, offset+cap]. The transmittance-continuation
    renderer (trainer.render_image_windowed) marches consecutive windows
    and composes them with carried per-ray transmittance — the TPU-shaped
    equivalent of the reference CUDA renderer's alive-ray compaction
    rounds."""
    if not inference_only or not cap:
        return mask_pts
    rank = jnp.cumsum(mask_pts.astype(jnp.int32), axis=1)
    if offset is None:
        return mask_pts & (rank <= int(cap))
    off = jnp.asarray(offset, jnp.int32)
    return mask_pts & (rank > off) & (rank <= off + int(cap))


def _occ_mask_soa(volume, bitfield, rays_o, rays_d, zvals):
    """(B,) rays x (B, N) zvals -> (B, N) in-occupied-voxel mask, computed
    axis-by-axis (no (B, N, 3) point tensor) with a row-form bitfield
    gather. See probe_hotpath.py: pts materialization 191 ms + element
    gather 68 ms -> ~35 ms total in this form at the 32k bucket."""
    x = rays_o[:, 0:1] + zvals * rays_d[:, 0:1]
    y = rays_o[:, 1:2] + zvals * rays_d[:, 1:2]
    z = rays_o[:, 2:3] + zvals * rays_d[:, 2:3]
    flat, valid = volume.get_flat_voxel_idx_from_coords(x, y, z)
    return volume.check_flat_in_occ_voxel(flat, valid, bitfield)


def build_obj_bound(cfgs):
    """Pick the bound from cfgs.obj_bound keys: volume > sphere > bitfield >
    basic (reference obj_bound/__init__.py:25-62). Returns (bound, type)."""
    if not valid_key_in_cfgs(cfgs, "obj_bound"):
        return BasicBound(None), "basic"
    keys = cfgs.obj_bound.keys()
    if "volume" in keys:
        return VolumeBound(cfgs.obj_bound), "volume"
    if "sphere" in keys:
        return SphereBound(cfgs.obj_bound), "sphere"
    if "bitfield" in keys:
        return BitfieldBound(cfgs.obj_bound), "bitfield"
    return BasicBound(cfgs.obj_bound), "basic"


@BOUND_REGISTRY.register()
class BasicBound:
    """No structure: near/far from hardcode/bounds/bounding sphere."""

    def __init__(self, cfgs):
        self.cfgs = cfgs
        self.optim_cfgs = self.read_optim_cfgs()

    def get_obj_bound(self):
        return None

    def read_optim_cfgs(self):
        return {
            "epoch_optim": get_value_from_cfgs_field(self.cfgs, "epoch_optim", None),
            "epoch_optim_warmup": get_value_from_cfgs_field(self.cfgs, "epoch_optim_warmup", None),
            "ema_optim_decay": get_value_from_cfgs_field(self.cfgs, "ema_optim_decay", 0.95),
            "opa_thres": get_value_from_cfgs_field(self.cfgs, "opa_thres", 0.01),
            # inference-only coarse-ladder override (trainer.set_render_cap):
            # render with fewer fix-step samples per ray than training
            "eval_n_sample": get_value_from_cfgs_field(self.cfgs, "eval_n_sample", None),
        }

    def get_optim_cfgs(self, key=None):
        return self.optim_cfgs if key is None else self.optim_cfgs[key]

    def set_optim_cfgs(self, key, value):
        self.optim_cfgs[key] = value

    # ---------------------------------------------------------------- state
    def init_state(self):
        """Occupancy state pytree (empty for unstructured bounds)."""
        return {}

    # ------------------------------------------------------------- sampling
    def get_near_far_from_rays(self, state, inputs, near_hardcode=None, far_hardcode=None, bounding_radius=None):
        """-> near (B, 1), far (B, 1), mask_rays (B,)|None."""
        bounds = inputs.get("bounds", None)
        near, far = get_near_far_from_rays(
            inputs["rays_o"], inputs["rays_d"], bounds, near_hardcode, far_hardcode, bounding_radius
        )
        return near, far, None

    def get_zvals_from_near_far(
        self,
        state,
        near,
        far,
        n_pts,
        inference_only=False,
        inverse_linear=False,
        perturb=False,
        key=None,
        rays_o=None,
        rays_d=None,
        keep_order=False,
        cap_offset=None,
    ):
        """-> zvals (B, n_pts), mask_pts (B, n_pts)|None."""
        zvals = get_zvals_from_near_far(
            near,
            far,
            n_pts,
            inverse_linear=inverse_linear,
            perturb=perturb and not inference_only,
            key=key if (perturb and not inference_only) else None,
        )
        return zvals, None

    # ------------------------------------------------------------- optimize
    def optimize(self, state, cur_epoch=0, n_pts=128, get_est_opacity=None, key=None):
        """Periodic occupancy update; identity for unstructured bounds."""
        return state


@BOUND_REGISTRY.register()
class SphereBound(BasicBound):
    """Ray-sphere intersection near/far + per-ray valid mask
    (reference sphere_bound.py:10-37)."""

    def __init__(self, cfgs):
        super().__init__(cfgs)
        sphere_cfgs = cfgs.sphere
        self.origin = tuple(get_value_from_cfgs_field(sphere_cfgs, "origin", (0.0, 0.0, 0.0)))
        self.radius = float(get_value_from_cfgs_field(sphere_cfgs, "radius", 1.0))

    def get_obj_bound(self):
        from ...geometry.sphere import Sphere

        return Sphere(origin=self.origin, radius=self.radius)

    def get_near_far_from_rays(self, state, inputs, **kwargs):
        near, far, _, mask = sphere_ray_intersection(inputs["rays_o"], inputs["rays_d"], self.radius, self.origin)
        return near, far, mask[:, 0]


@BOUND_REGISTRY.register()
class VolumeBound(BasicBound):
    """Dense voxel volume with prunable occupancy (reference
    volume_bound.py:15-213).

    State: {'bitfield': (n, n, n) bool, 'opafield': (n, n, n) f32}.
    Sampling: ray/volume AABB near-far; optionally const-step zvals with
    occupancy masking + left-compaction (ray_sample_acc) — the static-shape
    replacement for the reference CUDA DDA march.
    """

    def __init__(self, cfgs):
        super().__init__(cfgs)
        assert valid_key_in_cfgs(cfgs, "volume"), "VolumeBound needs cfgs.volume"
        vol_cfgs = {k: v for k, v in cfgs.volume.items()}
        vol_cfgs.setdefault("n_grid", 128)
        if "origin" in vol_cfgs and isinstance(vol_cfgs["origin"], (list, tuple)):
            vol_cfgs["origin"] = tuple(vol_cfgs["origin"])
        self.volume = Volume(**vol_cfgs)

    def get_obj_bound(self):
        return self.volume

    def read_optim_cfgs(self):
        params = super().read_optim_cfgs()
        params["ray_sample_acc"] = get_value_from_cfgs_field(self.cfgs, "ray_sample_acc", False)
        params["ray_sample_fix_step"] = get_value_from_cfgs_field(self.cfgs, "ray_sample_fix_step", False)
        params["near_distance"] = get_value_from_cfgs_field(self.cfgs, "near_distance", 0.0)
        params["eval_max_pts_per_ray"] = get_value_from_cfgs_field(self.cfgs, "eval_max_pts_per_ray", None)
        # transmittance-continuation windows (trainer.render_image_windowed):
        # the cap becomes a rank WINDOW (offset traced per call) and the
        # sampler also returns the pre-cap occupancy mask for marching
        params["eval_cap_window"] = get_value_from_cfgs_field(self.cfgs, "eval_cap_window", False)
        return params

    def init_state(self):
        if self.get_optim_cfgs("epoch_optim") is None:
            return {}
        return {
            "bitfield": self.volume.create_bitfield(init_occ=True),
            "opafield": self.volume.create_opafield(),
        }

    def get_near_far_from_rays(self, state, inputs, **kwargs):
        near, far, _, mask = self.volume.ray_volume_intersection(inputs["rays_o"], inputs["rays_d"])
        return near, far, mask[:, 0]

    def get_zvals_from_near_far(
        self,
        state,
        near,
        far,
        n_pts,
        inference_only=False,
        inverse_linear=False,
        perturb=False,
        key=None,
        rays_o=None,
        rays_d=None,
        keep_order=False,
        cap_offset=None,
    ):
        use_acc = self.get_optim_cfgs("epoch_optim") is not None and self.get_optim_cfgs("ray_sample_acc")
        if not use_acc or "bitfield" not in state:
            return super().get_zvals_from_near_far(
                state, near, far, n_pts, inference_only, inverse_linear, perturb, key
            )

        perturb_key = key if (perturb and not inference_only) else None
        if self.get_optim_cfgs("ray_sample_fix_step"):
            fix_t = self.volume.get_diag_len() / n_pts
            zvals, mask_pts = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts, key=perturb_key)
        else:
            zvals = get_zvals_from_near_far(
                near, far, n_pts, inverse_linear=inverse_linear,
                perturb=perturb and not inference_only, key=perturb_key
            )
            mask_pts = jnp.ones_like(zvals, dtype=bool)

        # occupancy cull in SoA form: per-axis (B, n_pts) planes + row-form
        # bitfield gather — no (B*N, 3) point tensor (see volume.py
        # get_flat_voxel_idx_from_coords for the layout rationale)
        mask_pts = mask_pts & _occ_mask_soa(self.volume, state["bitfield"], rays_o, rays_d, zvals)
        # window mode engages only when the caller actually feeds a window
        # offset (render_image_windowed passes cap_offset on EVERY pass,
        # including 0) — plain renders on the same trainer/cfg keep exact
        # plain-cap behavior even while eval_cap_window is set
        window = (bool(self.get_optim_cfgs("eval_cap_window")) and inference_only
                  and cap_offset is not None)
        mask_cap = _cap_pts_per_ray(
            mask_pts, inference_only, self.get_optim_cfgs("eval_max_pts_per_ray"),
            offset=cap_offset if window else None)
        if keep_order:
            # scattered-mask mode: ray_marching(mask_pts=...) reproduces the
            # compacted numerics without the per-ray stable sort. In window
            # mode the pre-cap occupancy mask rides along so marching deltas
            # span gaps with the FULL render's geometry (exact composition
            # across windows; non-window samples march with sigma 0).
            if window:
                return zvals, (mask_cap, mask_pts)
            return zvals, mask_cap
        zvals, mask_cap = handle_valid_mask_zvals(zvals, mask_cap)
        return zvals, mask_cap

    def optimize(self, state, cur_epoch=0, n_pts=128, get_est_opacity=None, key=None):
        """Opacity-EMA voxel pruning (reference volume_bound.py:160-213).

        Warmup: evaluate every voxel center. After: half the budget uniform
        over all voxels + half importance-drawn from occupied voxels.
        Pure function of (state, key); call it every ``epoch_optim`` steps.
        """
        if not state or get_est_opacity is None:
            return state
        epoch_optim_warmup = self.get_optim_cfgs("epoch_optim_warmup")
        vol = self.volume
        n_grid = vol.get_n_grid()
        n_voxel = vol.get_n_voxel()
        bitfield, opafield = state["bitfield"], state["opafield"]

        warmup = epoch_optim_warmup is not None and cur_epoch < epoch_optim_warmup
        k_sel, k_occ, k_noise = jax.random.split(key, 3)
        if warmup:
            flat_idx = jnp.arange(n_voxel, dtype=jnp.int32)
        else:
            n_sample = n_voxel // 4
            uni = jax.random.choice(k_sel, n_voxel, shape=(n_sample,), replace=False)
            occ_p = bitfield.reshape(-1).astype(jnp.float32)
            occ_p = occ_p / jnp.maximum(jnp.sum(occ_p), 1.0)
            occ = jax.random.choice(k_occ, n_voxel, shape=(n_sample,), replace=True, p=occ_p)
            flat_idx = jnp.concatenate([uni, occ]).astype(jnp.int32)

        voxel_idx = convert_flatten_index_to_xyz_index(flat_idx, n_grid)
        pts = vol.get_voxel_pts_by_voxel_idx(voxel_idx)
        noise = (jax.random.uniform(k_noise, pts.shape) - 0.5) * vol.get_voxel_size(to_list=False)
        pts = pts + noise

        dt = vol.get_diag_len() / float(n_pts)
        opacity = get_est_opacity(dt, pts)  # (N,)

        # per-voxel max via scatter-max into a full grid (segment max)
        opa_max = jnp.full((n_voxel,), -jnp.inf).at[flat_idx].max(opacity)
        sampled = jnp.zeros((n_voxel,), dtype=bool).at[flat_idx].set(True)

        old = opafield.reshape(-1)
        ema = self.get_optim_cfgs("ema_optim_decay")
        new = jnp.maximum(old * ema, opa_max)
        new = jnp.where(sampled & (old >= 0), new, old)
        opafield = new.reshape(opafield.shape)

        bitfield = vol.update_bitfield_by_opafield(
            bitfield, opafield, threshold=self.get_optim_cfgs("opa_thres"), ops="overwrite"
        )
        return {"bitfield": bitfield, "opafield": opafield}


@BOUND_REGISTRY.register()
class BitfieldBound(BasicBound):
    """instant-ngp style single-level density grid (reference
    bitfield_bound.py:16-189).

    State: {'density_grid': (n^3,) f32, 'bitfield': (n, n, n) bool,
    'ema_step': int}. No morton coding — a plain (x, y, z) layout is an
    equivalent internal choice on TPU (SURVEY.md section 2.4 note). The
    generate/splat/ema/update CUDA kernels become choice + scatter-max +
    elementwise ops.
    """

    def __init__(self, cfgs):
        super().__init__(cfgs)
        assert valid_key_in_cfgs(cfgs, "bitfield"), "BitfieldBound needs cfgs.bitfield"
        bf_cfgs = cfgs.bitfield
        n_grid = get_value_from_cfgs_field(bf_cfgs, "n_grid", 128)
        origin = tuple(get_value_from_cfgs_field(bf_cfgs, "origin", (0.0, 0.0, 0.0)))
        side = get_value_from_cfgs_field(bf_cfgs, "side", 2.0)
        self.volume = Volume(n_grid=n_grid, origin=origin, side=side)

    def get_obj_bound(self):
        return self.volume

    def read_optim_cfgs(self):
        params = super().read_optim_cfgs()
        params["ray_sample_acc"] = get_value_from_cfgs_field(self.cfgs, "ray_sample_acc", True)
        params["near_distance"] = get_value_from_cfgs_field(self.cfgs, "near_distance", 0.0)
        params["opa_thres"] = get_value_from_cfgs_field(self.cfgs, "opa_thres", 0.01)
        params["eval_max_pts_per_ray"] = get_value_from_cfgs_field(self.cfgs, "eval_max_pts_per_ray", None)
        params["eval_cap_window"] = get_value_from_cfgs_field(self.cfgs, "eval_cap_window", False)
        return params

    def init_state(self):
        n_voxel = self.volume.get_n_voxel()
        return {
            "density_grid": jnp.zeros((n_voxel,), dtype=jnp.float32),
            "bitfield": self.volume.create_bitfield(init_occ=True),
            "ema_step": jnp.zeros((), dtype=jnp.int32),
        }

    def get_near_far_from_rays(self, state, inputs, **kwargs):
        near, far, _, mask = self.volume.ray_volume_intersection(inputs["rays_o"], inputs["rays_d"])
        near = jnp.maximum(near, self.get_optim_cfgs("near_distance"))
        return near, far, mask[:, 0]

    def get_zvals_from_near_far(
        self,
        state,
        near,
        far,
        n_pts,
        inference_only=False,
        inverse_linear=False,
        perturb=False,
        key=None,
        rays_o=None,
        rays_d=None,
        keep_order=False,
        cap_offset=None,
    ):
        """Const-dt march with bitfield culling + compaction — static-shape
        equivalent of sparse_volume_sampling_bit (bitfield_func_kernel.cu)."""
        if "bitfield" not in state:
            return super().get_zvals_from_near_far(
                state, near, far, n_pts, inference_only, inverse_linear, perturb, key
            )
        perturb_key = key if (perturb and not inference_only) else None
        fix_t = self.volume.get_diag_len() / n_pts
        zvals, mask_pts = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts, key=perturb_key)
        mask_pts = mask_pts & _occ_mask_soa(self.volume, state["bitfield"], rays_o, rays_d, zvals)
        # window mode engages only when the caller actually feeds a window
        # offset (render_image_windowed passes cap_offset on EVERY pass,
        # including 0) — plain renders on the same trainer/cfg keep exact
        # plain-cap behavior even while eval_cap_window is set
        window = (bool(self.get_optim_cfgs("eval_cap_window")) and inference_only
                  and cap_offset is not None)
        mask_cap = _cap_pts_per_ray(
            mask_pts, inference_only, self.get_optim_cfgs("eval_max_pts_per_ray"),
            offset=cap_offset if window else None)
        if keep_order:
            if window:  # see VolumeBound: (eval window mask, march mask)
                return zvals, (mask_cap, mask_pts)
            return zvals, mask_cap
        zvals, mask_cap = handle_valid_mask_zvals(zvals, mask_cap)
        return zvals, mask_cap

    def optimize(self, state, cur_epoch=0, n_pts=128, get_est_opacity=None, key=None):
        """generate -> splat(max) -> ema -> update_bitfield, functionally
        (reference bitfield_bound.py:132-189)."""
        if not state or get_est_opacity is None:
            return state
        vol = self.volume
        n_grid = vol.get_n_grid()
        n_voxel = vol.get_n_voxel()
        density_grid, bitfield = state["density_grid"], state["bitfield"]
        ema_step = state["ema_step"]

        k_sel, k_occ, k_noise = jax.random.split(key, 3)
        warmup = self.get_optim_cfgs("epoch_optim_warmup")
        n_sample = n_voxel // 4

        # during warmup sample all cells; after, uniform + density-weighted
        use_all = warmup is not None and cur_epoch < warmup
        if use_all:
            flat_idx = jnp.arange(n_voxel, dtype=jnp.int32)
        else:
            uni = jax.random.choice(k_sel, n_voxel, shape=(n_sample,), replace=False)
            occ_p = bitfield.reshape(-1).astype(jnp.float32)
            occ_p = occ_p / jnp.maximum(jnp.sum(occ_p), 1.0)
            occ = jax.random.choice(k_occ, n_voxel, shape=(n_sample,), replace=True, p=occ_p)
            flat_idx = jnp.concatenate([uni, occ]).astype(jnp.int32)

        voxel_idx = convert_flatten_index_to_xyz_index(flat_idx, n_grid)
        pts = vol.get_voxel_pts_by_voxel_idx(voxel_idx)
        noise = (jax.random.uniform(k_noise, pts.shape) - 0.5) * vol.get_voxel_size(to_list=False)
        pts = pts + noise

        dt = vol.get_diag_len() / float(n_pts)
        opacity = get_est_opacity(dt, pts)

        # splat max into tmp grid
        tmp = jnp.zeros((n_voxel,)).at[flat_idx].max(opacity)
        sampled = jnp.zeros((n_voxel,), dtype=bool).at[flat_idx].set(True)

        # ema: grid = max(grid * decay, tmp) on sampled cells
        decay = self.get_optim_cfgs("ema_optim_decay")
        new_grid = jnp.where(sampled, jnp.maximum(density_grid * decay, tmp), density_grid * decay)

        # bit j on iff density > min(mean_density, thres)
        mean_d = jnp.mean(jnp.clip(new_grid, 0.0, None))
        thres = jnp.minimum(mean_d, self.get_optim_cfgs("opa_thres"))
        bitfield = (new_grid > thres).reshape(bitfield.shape)

        return {"density_grid": new_grid, "bitfield": bitfield, "ema_step": ema_step + 1}

    def count_bitfield(self, state):
        """Occupancy ratio diagnostics (reference count_bitfield kernel)."""
        return jnp.mean(state["bitfield"].astype(jnp.float32))
