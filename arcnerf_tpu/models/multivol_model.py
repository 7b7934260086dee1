"""MultiVol: instant-ngp multi-cascade occupancy volume model.

Capability parity with /root/reference/arcnerf/models/multivol_bkg_model.py:
20-261 plus the _multivol_func CUDA kernels (mip_from_pos cascade select,
sparse_sampling_in_multivol_bitfield cone-angle march,
generate/splat/ema/update cascade kernels — reference
arcnerf/ops/src/multivol_func/*).

TPU design: cascade bitfield is a (n_used_cascade, n, n, n) bool array in
the bound state; the cone-angle adaptive march is a lax.scan accumulating
z += clamp(z * cone_angle, min_step, max_step), masked by cascade-aware
occupancy lookups, then left-compacted. Can act as background (default,
inner cascade excluded) or full-scene fg (``inclusive``).
"""

import jax
import jax.numpy as jnp

from ..geometry.ray import get_ray_points_by_zvals
from ..geometry.volume import Volume
from ..render.ray_helper import handle_valid_mask_zvals
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .bkg_model import BkgModel


@MODEL_REGISTRY.register()
class MultiVol(BkgModel):

    def setup(self):
        node = self._cfg_node()
        self.geo_net = build_geo_model(node.geometry)
        self.radiance_net = build_radiance_model(node.radiance)

    def _cfg_node(self):
        return self.cfgs.model.background if hasattr(self.cfgs.model, "background") else self.cfgs.model

    def read_ray_cfgs(self):
        rays = self._cfg_node().rays
        return {
            "bounding_radius": get_value_from_cfgs_field(rays, "bounding_radius"),
            "near": get_value_from_cfgs_field(rays, "near"),
            "far": get_value_from_cfgs_field(rays, "far"),
            "n_sample": get_value_from_cfgs_field(rays, "n_sample", 1024),
            "inverse_linear": get_value_from_cfgs_field(rays, "inverse_linear", False),
            "perturb": get_value_from_cfgs_field(rays, "perturb", False),
            "add_inf_z": get_value_from_cfgs_field(rays, "add_inf_z", False),
            "noise_std": get_value_from_cfgs_field(rays, "noise_std", 0.0),
            "white_bkg": get_value_from_cfgs_field(rays, "white_bkg", False),
            "rand_bkg_color": get_value_from_cfgs_field(rays, "rand_bkg_color", False),
            "n_importance": 0,
            "shared_network": False,
            "volume": None,
            "cone_angle": get_value_from_cfgs_field(rays, "cone_angle", 0.0),
        }

    # ----------------------------------------------------------- volume geom
    @property
    def _vol_cfgs(self):
        return self._cfg_node().basic_volume

    @property
    def n_grid(self):
        return get_value_from_cfgs_field(self._vol_cfgs, "n_grid", 128)

    @property
    def n_cascade(self):
        return get_value_from_cfgs_field(self._vol_cfgs, "n_cascade", 4)

    @property
    def inclusive(self):
        return get_value_from_cfgs_field(self._vol_cfgs, "inclusive", False)

    @property
    def n_used_cascade(self):
        return self.n_cascade if self.inclusive else self.n_cascade - 1

    def basic_volume(self):
        side = get_value_from_cfgs_field(self._vol_cfgs, "side", 2.0)
        origin = tuple(get_value_from_cfgs_field(self._vol_cfgs, "origin", (0.0, 0.0, 0.0)))
        return Volume(n_grid=self.n_grid, origin=origin, side=side)

    def max_volume(self):
        basic = self.basic_volume()
        max_len = [x * 2 ** (self.n_cascade - 1) for x in basic.get_len()]
        return Volume(n_grid=self.n_grid, origin=tuple(basic.origin), xyz_len=max_len)

    def get_net(self):
        return self.geo_net, self.radiance_net

    # --------------------------------------------------------------- state
    def init_bound_state(self):
        n_elem = self.n_used_cascade * self.n_grid**3
        return {
            "density_grid": jnp.zeros((n_elem,), dtype=jnp.float32),
            "bitfield": jnp.ones((self.n_used_cascade, self.n_grid, self.n_grid, self.n_grid), dtype=bool),
            "ema_step": jnp.zeros((), dtype=jnp.int32),
        }

    # ------------------------------------------------------- cascade lookup
    def _cascade_from_pos(self, pts):
        """Smallest cascade whose volume contains pts. (B, 3) -> (B,) int32
        in [0, n_cascade) — mirrors mip_from_pos (volume_func.h:201)."""
        basic = self.basic_volume()
        origin = basic.get_origin()
        half0 = jnp.asarray(basic.xyz_len, dtype=jnp.float32) / 2.0
        rel = jnp.abs(pts - origin) / half0  # in cascade c iff rel < 2^c
        max_rel = jnp.maximum(jnp.max(rel, axis=-1), 1e-8)
        casc = jnp.ceil(jnp.log2(jnp.maximum(max_rel, 1.0))).astype(jnp.int32)
        casc = jnp.where(max_rel <= 1.0, 0, casc)
        return jnp.clip(casc, 0, self.n_cascade - 1)

    def _occupancy_at(self, pts, bitfield):
        """(B, 3) -> (B,) bool: in an occupied voxel of its cascade."""
        basic = self.basic_volume()
        origin = basic.get_origin()
        casc = self._cascade_from_pos(pts)  # (B,)
        in_max = jnp.max(jnp.abs(pts - origin) / (jnp.asarray(basic.xyz_len) / 2.0), axis=-1) < 2.0 ** (
            self.n_cascade - 1
        )
        if not self.inclusive:
            slot = casc - 1  # cascade 0 (inner) excluded
            valid_casc = casc >= 1
        else:
            slot = casc
            valid_casc = jnp.ones_like(casc, dtype=bool)
        slot = jnp.clip(slot, 0, self.n_used_cascade - 1)

        # voxel index inside this cascade's volume
        scale = (2.0 ** casc.astype(jnp.float32))[:, None]
        half = (jnp.asarray(basic.xyz_len) / 2.0)[None, :] * scale
        vs = 2.0 * half / self.n_grid
        idx = jnp.floor((pts - (origin - half)) / vs).astype(jnp.int32)
        idx = jnp.clip(idx, 0, self.n_grid - 1)
        occ = bitfield[slot, idx[:, 0], idx[:, 1], idx[:, 2]]
        return occ & valid_casc & in_max

    # ------------------------------------------------------------- sampling
    def get_near_far_from_rays_mv(self, rays_o, rays_d):
        near, far, _, mask = self.max_volume().ray_volume_intersection(rays_o, rays_d)
        return near, far, mask[:, 0]

    def get_zvals_from_near_far_mv(self, near, far, n_pts, rays_o, rays_d, bound_state, inference_only=False):
        """Cone-angle adaptive march with cascade occupancy culling."""
        cone_angle = self.get_ray_cfgs("cone_angle")
        basic, vmax = self.basic_volume(), self.max_volume()
        min_step = basic.get_diag_len() / n_pts
        max_step = vmax.get_diag_len() / self.n_grid
        near_distance = self.get_optim_cfgs("near_distance")
        near = jnp.maximum(near, near_distance)

        def step(z, _):
            dt = jnp.clip(z * cone_angle, min_step, max_step)
            return z + dt, z

        _, zvals = jax.lax.scan(step, near[:, 0], None, length=n_pts)
        zvals = zvals.T  # (B, n_pts)
        mask_pts = zvals < far

        pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
        occ = self._occupancy_at(pts, bound_state["bitfield"]).reshape(zvals.shape)
        mask_pts = mask_pts & occ
        zvals = jnp.clip(zvals, near, far)
        return handle_valid_mask_zvals(zvals, mask_pts)

    # -------------------------------------------------------------- forward
    def __call__(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000,
                 bound_state=None):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        bound_state = bound_state if bound_state else self.init_bound_state()

        near, far, _ = self.get_near_far_from_rays_mv(rays_o, rays_d)
        zvals, mask_pts = self.get_zvals_from_near_far_mv(
            near, far, self.get_ray_cfgs("n_sample"), rays_o, rays_d, bound_state, inference_only
        )

        n_rays, n_pts = zvals.shape
        pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_pts, 3)).reshape(-1, 3)
        sigma, radiance = self._forward_pts_dir(self.geo_net, self.radiance_net, pts, dirs)
        sigma = sigma.reshape(n_rays, n_pts)
        radiance = radiance.reshape(n_rays, n_pts, 3)
        # zero sigma outside occupied space so empty rays contribute nothing
        sigma = jnp.where(mask_pts, sigma, 0.0)

        output = self.ray_marching_wrap(
            sigma, radiance, zvals, inference_only=inference_only,
            bkg_color=inputs.get("bkg_color", None),
        )
        output["n_valid_pts"] = jnp.sum(mask_pts)
        return self.output_get_progress(output, get_progress)

    # ------------------------------------------------------------- optimize
    def get_est_opacity(self, dt, pts):
        geo, _ = self.geo_net(pts)
        return geo[..., 0] * dt

    def optimize_state(self, bound_state, cur_epoch, get_est_opacity, key):
        """Cascade density-grid EMA update (reference
        multivol_bkg_model.py:203-261), functional."""
        n_grid, n_used = self.n_grid, self.n_used_cascade
        n_elem = n_used * n_grid**3
        density_grid, bitfield = bound_state["density_grid"], bound_state["bitfield"]

        warmup = self.get_optim_cfgs("epoch_optim_warmup")
        k_sel, k_occ, k_noise = jax.random.split(key, 3)
        if warmup is not None and cur_epoch < warmup:
            flat_idx = jnp.arange(n_elem, dtype=jnp.int32)
        else:
            n_sample = n_elem // 4
            uni = jax.random.choice(k_sel, n_elem, shape=(n_sample,), replace=False)
            occ_p = bitfield.reshape(-1).astype(jnp.float32)
            occ_p = occ_p / jnp.maximum(jnp.sum(occ_p), 1.0)
            occ = jax.random.choice(k_occ, n_elem, shape=(n_sample,), replace=True, p=occ_p)
            flat_idx = jnp.concatenate([uni, occ]).astype(jnp.int32)

        # decode flat index -> cascade slot + voxel xyz -> world position
        basic = self.basic_volume()
        origin = basic.get_origin()
        slot = flat_idx // (n_grid**3)
        rem = flat_idx % (n_grid**3)
        xyz = jnp.stack([rem // (n_grid**2), (rem // n_grid) % n_grid, rem % n_grid], axis=-1)
        casc = slot if self.inclusive else slot + 1
        scale = (2.0 ** casc.astype(jnp.float32))[:, None]
        half = (jnp.asarray(basic.xyz_len) / 2.0)[None, :] * scale
        vs = 2.0 * half / n_grid
        pts = (origin - half) + (xyz.astype(jnp.float32) + 0.5) * vs
        pts = pts + (jax.random.uniform(k_noise, pts.shape) - 0.5) * vs

        dt = basic.get_diag_len() / float(self.get_ray_cfgs("n_sample"))
        opacity = get_est_opacity(dt, pts)

        tmp = jnp.zeros((n_elem,)).at[flat_idx].max(opacity)
        sampled = jnp.zeros((n_elem,), dtype=bool).at[flat_idx].set(True)
        decay = self.get_optim_cfgs("ema_optim_decay")
        new_grid = jnp.where(sampled, jnp.maximum(density_grid * decay, tmp), density_grid * decay)

        mean_d = jnp.mean(jnp.clip(new_grid, 0.0, None))
        thres = jnp.minimum(mean_d, self.get_optim_cfgs("opa_thres"))
        new_bitfield = (new_grid > thres).reshape(bitfield.shape)
        return {
            "density_grid": new_grid,
            "bitfield": new_bitfield,
            "ema_step": bound_state["ema_step"] + 1,
        }
