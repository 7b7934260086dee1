"""NeuS: SDF-to-alpha with learned single-parameter scale.

Capability parity with /root/reference/arcnerf/models/neus_model.py:21-265:
scale = exp(inv_s * speed_factor), cos-annealed slope, sdf-guided iterative
upsampling (s * 2^i), mid-point handling with masks, sdf_to_alpha/cdf/pdf
helpers.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.ray import get_ray_points_by_zvals
from ..geometry.transformation import normalize
from ..render.ray_helper import alpha_to_weights, sample_pdf
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .sdf_model import SdfModel, geo_with_grad


def sdf_to_cdf(sdf, s):
    return jax.nn.sigmoid(sdf * s)


def sdf_to_pdf(sdf, s):
    esx = jnp.exp(-sdf * s)
    return s * esx / ((1 + esx) ** 2)


def sdf_to_alpha(mid_sdf, zvals, mid_slope, s, clip=True):
    """NeuS eq.13: alpha over each interval from section-estimated sdf.

    mid_sdf/mid_slope (B, N-1), zvals (B, N) -> alpha (B, N-1).
    """
    dist = zvals[:, 1:] - zvals[:, :-1]
    prev_sdf = mid_sdf - mid_slope * dist * 0.5
    next_sdf = mid_sdf + mid_slope * dist * 0.5
    prev_cdf = sdf_to_cdf(prev_sdf, s)
    next_cdf = sdf_to_cdf(next_sdf, s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    if clip:
        alpha = jnp.clip(alpha, 0.0, 1.0)
    return alpha


@MODEL_REGISTRY.register()
class Neus(SdfModel):

    def setup(self):
        # SDF normals are jax.grad wrt input pts -> exact (unfused) encoder interp
        self.geo_net = build_geo_model(self.cfgs.model.geometry, needs_input_grad=True)
        self.radiance_net = build_radiance_model(self.cfgs.model.radiance)
        init_var = get_value_from_cfgs_field(self.cfgs.model.params, "init_var", 0.05)
        speed = self.speed_factor
        self.inv_s = self.param(
            "inv_s", lambda key: jnp.asarray([-math.log(init_var) / speed], dtype=jnp.float32)
        )

    @property
    def speed_factor(self):
        return get_value_from_cfgs_field(self.cfgs.model.params, "speed_factor", 10)

    @property
    def radius_bound(self):
        return get_value_from_cfgs_field(self.cfgs.model.rays, "radius_bound", 1.5)

    @property
    def anneal_end(self):
        return get_value_from_cfgs_field(self.cfgs.model.params, "anneal_end", 0)

    def get_net(self):
        return self.geo_net, self.radiance_net

    def forward_scale(self):
        return jnp.exp(self.inv_s * self.speed_factor)

    def get_cos_anneal(self, cur_epoch):
        if self.anneal_end == 0:
            return 1.0
        return jnp.minimum(1.0, cur_epoch / self.anneal_end)

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        zvals, mask_pts = inputs["zvals"], inputs["mask_pts"]
        bkg_color = inputs.get("bkg_color", None)

        zvals, mask_pts = self.upsample_zvals(rays_o, rays_d, zvals, mask_pts, inference_only)
        mid_zvals, zvals, mask_mid_pts = self.handle_mid_pts(zvals, mask_pts)

        sdf, radiance, normal_pts = self.get_sdf_radiance_normal_by_mask_pts(
            self.geo_net, self.radiance_net, rays_o, rays_d, mid_zvals, mask_mid_pts, inference_only
        )
        dirs = jnp.broadcast_to(rays_d[:, None, :], normal_pts.shape)

        cos_anneal = 1.0 if inference_only else self.get_cos_anneal(cur_epoch)
        slope = jnp.sum(dirs * normal_pts, axis=-1)  # (B, N)
        iter_slope = -(
            jax.nn.relu(-slope * 0.5 + 0.5) * (1 - cos_anneal) + jax.nn.relu(-slope) * cos_anneal
        )
        alpha = sdf_to_alpha(sdf, zvals, iter_slope, self.forward_scale())

        output = self.ray_marching_wrap(
            sdf, radiance, mid_zvals, alpha=alpha, inference_only=inference_only, bkg_color=bkg_color
        )
        output["normal"] = jnp.sum(output["weights"][..., None] * normalize(normal_pts), axis=-2)
        if not inference_only:
            output["params"] = {"scale": self.forward_scale()[0]}
            output["normal_pts"] = normal_pts
        return self.output_get_progress(output, get_progress)

    def upsample_zvals(self, rays_o, rays_d, zvals, mask_pts=None, inference_only=False, s=32):
        """Iterative sdf-guided upsampling (reference neus_model.py:106-171).
        Fixed n_iter python unroll — shapes grow statically each round."""
        if self.get_ray_cfgs("n_importance") <= 0:
            return zvals, mask_pts

        n_iter = get_value_from_cfgs_field(self.cfgs.model.rays, "n_iter", 4)
        n_per_iter = self.get_ray_cfgs("n_importance") // n_iter
        for i in range(n_iter):
            n_rays, n_pts = zvals.shape
            pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
            sdf = jax.lax.stop_gradient(self.forward_pts(pts)).reshape(n_rays, n_pts)

            prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
            mid_sdf = 0.5 * (prev_sdf + next_sdf)
            slope = (next_sdf - prev_sdf) / (zvals[:, 1:] - zvals[:, :-1] + 1e-5)
            prev_slope = jnp.concatenate([jnp.zeros((n_rays, 1)), slope[:, :-1]], axis=-1)
            slope = jnp.minimum(prev_slope, slope)
            slope = jnp.clip(slope, -10.0, 0.0)

            pts3 = pts.reshape(n_rays, n_pts, 3)
            radius = jnp.linalg.norm(pts3, axis=-1)
            inside = (radius[:, :-1] < self.radius_bound) | (radius[:, 1:] < self.radius_bound)
            slope = slope * inside

            alpha = sdf_to_alpha(mid_sdf, zvals, slope, s * (2 ** (i + 1)), clip=False)
            _, weights = alpha_to_weights(alpha)
            det = inference_only or not self.get_ray_cfgs("perturb")
            new_zvals = sample_pdf(
                zvals, weights, n_per_iter, det=det,
                key=self._sample_key(inference_only) if not det else None,
            )
            new_zvals = jax.lax.stop_gradient(new_zvals)
            zvals = jnp.sort(jnp.concatenate([zvals, new_zvals], axis=-1), axis=-1)
            mask_pts = self.merge_full_mask(mask_pts, new_zvals)

        return zvals, mask_pts

    def handle_mid_pts(self, zvals, mask_pts):
        """Mid-point sections with tail extension (reference
        neus_model.py:173-218), mask-aware via jnp.where."""
        n_rays = zvals.shape[0]
        sample_dist = (zvals[:, -1] - zvals[:, 0]) / self.get_ray_cfgs("n_sample") * 0.5

        if mask_pts is None:
            mid_zvals = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
            mid_zvals = jnp.concatenate([mid_zvals, (mid_zvals[:, -1] + sample_dist)[:, None]], axis=-1)
            zvals = jnp.concatenate([zvals, (zvals[:, -1] + sample_dist)[:, None]], axis=-1)
            return mid_zvals, zvals, None

        # with masks: append one extra boundary past the last valid zval.
        # invalid entries already repeat the last valid zval (left-compact),
        # so set every invalid slot (and the appended one) to last + 2*dist.
        final_zvals = zvals[:, -1] + sample_dist * 2.0  # (B,)
        ext_mask = jnp.concatenate([mask_pts, jnp.zeros((n_rays, 1), dtype=bool)], axis=1)
        ext_zvals = jnp.concatenate([zvals, zvals[:, -1:]], axis=1)
        ext_zvals = jnp.where(ext_mask, ext_zvals, final_zvals[:, None])

        mid_zvals = 0.5 * (ext_zvals[..., 1:] + ext_zvals[..., :-1])
        new_mask = jnp.concatenate([jnp.ones((n_rays, 1), dtype=bool), mask_pts[:, :-1]], axis=1)
        return mid_zvals, ext_zvals, new_mask

    def get_est_opacity(self, dt, pts):
        """sdf + slope -> alpha over a diag-dt interval (reference
        neus_model.py:204-218)."""
        n_pts = pts.shape[0]
        rays_d = -normalize(pts)
        sdf, _, normal = geo_with_grad(self.geo_net, pts)
        slope = jnp.sum(rays_d * normal, axis=-1, keepdims=True)
        zvals = jnp.concatenate(
            [jnp.zeros((n_pts, 1)), jnp.full((n_pts, 1), dt / math.sqrt(3.0))], axis=-1
        )
        iter_slope = -jax.nn.relu(-slope)
        opacity = sdf_to_alpha(sdf, zvals, iter_slope, self.forward_scale())
        return opacity[:, 0]
