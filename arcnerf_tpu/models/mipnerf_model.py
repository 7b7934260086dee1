"""MipNeRF: IPE conical-frustum Gaussians, single shared network,
resample-only fine stage, optional blurpool on coarse weights.

Capability parity with /root/reference/arcnerf/models/mipnerf_model.py:15-187.
"""

import jax
import jax.numpy as jnp

from ..render.ray_helper import sample_pdf
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .base_modules.encoding import Gaussian
from .fg_model import FgModel


@MODEL_REGISTRY.register()
class MipNeRF(FgModel):

    def setup(self):
        self.geo_net = build_geo_model(self.cfgs.model.geometry)
        self.radiance_net = build_radiance_model(self.cfgs.model.radiance)

    def get_net(self):
        return self.geo_net, self.radiance_net

    def _gaussian(self):
        gaussian_cfg = get_value_from_cfgs_field(self.cfgs.model.rays, "gaussian", None)
        fn = get_value_from_cfgs_field(gaussian_cfg, "gaussian_fn", "cone")
        return Gaussian(gaussian_fn=fn)

    def get_n_coarse_sample(self):
        """One extra sample: n intervals need n+1 boundaries."""
        return self.get_ray_cfgs("n_sample") + 1

    def _eval_intervals(self, intervals, rays_d):
        """intervals (B, N, 6) -> sigma (B, N), radiance (B, N, 3)."""
        n_rays, n_pts = intervals.shape[:2]
        flat = intervals.reshape(-1, 6)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_pts, 3)).reshape(-1, 3)
        sigma, radiance = self._forward_pts_dir(self.geo_net, self.radiance_net, flat, dirs)
        return sigma.reshape(n_rays, n_pts), radiance.reshape(n_rays, n_pts, 3)

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        rays_r = inputs["rays_r"]
        zvals = inputs["zvals"]  # (B, n_sample+1) boundaries
        bkg_color = inputs.get("bkg_color", None)
        gaussian = self._gaussian()
        output = {}

        intervals = gaussian(zvals, rays_o, rays_d, rays_r)  # (B, n_sample, 6)
        sigma, radiance = self._eval_intervals(intervals, rays_d)

        zvals_mid = 0.5 * (zvals[:, 1:] + zvals[:, :-1])
        output_coarse = self.ray_marching_wrap(
            sigma, radiance, zvals_mid, inference_only=inference_only, bkg_color=bkg_color
        )
        coarse_weights = output_coarse["weights"]
        output["coarse"] = self.output_get_progress(output_coarse, get_progress)

        if self.get_ray_cfgs("n_importance") > 0:
            zvals = self.upsample_zvals(zvals_mid, coarse_weights, inference_only)  # (B, n_importance+1)
            intervals = gaussian(zvals, rays_o, rays_d, rays_r)
            sigma, radiance = self._eval_intervals(intervals, rays_d)
            zvals_mid = 0.5 * (zvals[:, 1:] + zvals[:, :-1])
            output_fine = self.ray_marching_wrap(
                sigma, radiance, zvals_mid, inference_only=inference_only, bkg_color=bkg_color
            )
            output["fine"] = self.output_get_progress(output_fine, get_progress)

        return self.adjust_coarse_fine_output(output, inference_only)

    def upsample_zvals(self, zvals, weights, inference_only=True):
        """Resample-only fine boundaries (n_importance+1); optional blurpool
        (reference mipnerf_model.py:148-173)."""
        if get_value_from_cfgs_field(self.cfgs.model.rays, "blur_coarse_weights", False):
            pad = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], axis=-1)
            wmax = jnp.maximum(pad[..., :-1], pad[..., 1:])
            weights = 0.5 * (wmax[..., :-1] + wmax[..., 1:]) + 0.01

        weights_coarse = weights[:, 1:self.get_n_coarse_sample() - 2]
        zvals_mid = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
        det = inference_only or not self.get_ray_cfgs("perturb")
        new_zvals = sample_pdf(
            zvals_mid,
            weights_coarse,
            self.get_ray_cfgs("n_importance") + 1,
            det=det,
            key=self._sample_key(inference_only) if not det else None,
        )
        return jax.lax.stop_gradient(new_zvals)

    def get_est_opacity(self, dt, pts):
        raise NotImplementedError("mipnerf has no single-point opacity (interval encoding)")

    def surface_render(self, *args, **kwargs):
        raise NotImplementedError("surface render not supported for mipnerf")
