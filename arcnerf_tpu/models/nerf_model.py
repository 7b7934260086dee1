"""Classic NeRF: coarse + fine density model with hierarchical resampling.

Capability parity with /root/reference/arcnerf/models/nerf_model.py:13-136
(separate or shared coarse/fine networks, sample_pdf upsampling). Also
serves as the NGP model when configured with HashGridEmbedder + FusedMLP
nets and a volume/bitfield obj_bound (like the reference's
nerf_lego_nerf_ngp.yaml recipe).
"""

import os

import jax
import jax.numpy as jnp

from ..render.ray_helper import sample_pdf
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .fg_model import FgModel

# Segmented compacted-stream marching (fg_model.fused_render_by_mask_pts):
# integrate on the compacted point stream instead of scattering sigma/rgb
# back to the (B, N) grid and marching its ~94% invalid padding. Exact to
# f32 rounding vs the dense scattered-mask path (tests/test_segment_march.py).
# ARCNERF_SEG_MARCH=0 forces the dense path.
_SEG_MARCH = os.environ.get("ARCNERF_SEG_MARCH", "1") == "1"


@MODEL_REGISTRY.register()
class NeRF(FgModel):

    def setup(self):
        self.coarse_geo_net = build_geo_model(self.cfgs.model.geometry)
        self.coarse_radiance_net = build_radiance_model(self.cfgs.model.radiance)
        if self.get_ray_cfgs("n_importance") > 0 and not self.get_ray_cfgs("shared_network"):
            self.fine_geo_net = build_geo_model(self.cfgs.model.geometry)
            self.fine_radiance_net = build_radiance_model(self.cfgs.model.radiance)

    def get_coarse_net(self):
        return self.coarse_geo_net, self.coarse_radiance_net

    def get_fine_net(self):
        if self.get_ray_cfgs("shared_network"):
            return self.coarse_geo_net, self.coarse_radiance_net
        return self.fine_geo_net, self.fine_radiance_net

    def get_net(self):
        if self.get_ray_cfgs("n_importance") > 0:
            return self.get_fine_net()
        return self.get_coarse_net()

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        zvals, mask_pts = inputs["zvals"], inputs["mask_pts"]
        bkg_color = inputs.get("bkg_color", None)
        # windowed renders march with the PRE-cap occupancy mask so deltas
        # span gaps exactly like the full render (window composition)
        march_mask = inputs.get("mask_march", mask_pts) if inputs.get("mask_scattered") else None
        output = {}

        # compacted-stream fast path: density model, scattered ladder-order
        # masks, no window continuation, no importance resampling, and no
        # progress tensors requested — the per-sample grid is then dead
        # weight and integration happens on the compacted stream directly
        if (
            _SEG_MARCH
            and not get_progress
            and mask_pts is not None
            and inputs.get("mask_scattered")
            and "mask_march" not in inputs
            and self.get_ray_cfgs("n_importance") == 0
        ):
            out = self.fused_render_by_mask_pts(
                *self.get_coarse_net(), rays_o, rays_d, zvals, mask_pts, inference_only,
                bkg_color=bkg_color,
            )
            if out is not None:
                output["coarse"] = out
                return self.adjust_coarse_fine_output(output, inference_only)

        sigma, radiance = self.get_sigma_radiance_by_mask_pts(
            *self.get_coarse_net(), rays_o, rays_d, zvals, mask_pts, inference_only
        )
        output_coarse = self.ray_marching_wrap(
            sigma, radiance, zvals, inference_only=inference_only, bkg_color=bkg_color,
            mask_pts=march_mask
        )
        coarse_weights = output_coarse["weights"]
        output["coarse"] = self.output_get_progress(output_coarse, get_progress)

        if self.get_ray_cfgs("n_importance") > 0:
            zvals, mask_pts = self.upsample_zvals(zvals, coarse_weights, mask_pts, inference_only)
            sigma, radiance = self.get_sigma_radiance_by_mask_pts(
                *self.get_fine_net(), rays_o, rays_d, zvals, mask_pts, inference_only
            )
            output_fine = self.ray_marching_wrap(
                sigma, radiance, zvals, inference_only=inference_only, bkg_color=bkg_color
            )
            output["fine"] = self.output_get_progress(output_fine, get_progress)

        return self.adjust_coarse_fine_output(output, inference_only)

    def upsample_zvals(self, zvals, weights, mask_pts=None, inference_only=True):
        """Importance-sample n_importance extra zvals from coarse weights
        (reference nerf_model.py:93-117)."""
        n_sample = self.get_ray_cfgs("n_sample")
        weights_coarse = weights[:, 1:n_sample - 1]  # (B, N_sample-2)
        zvals_mid = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
        det = inference_only or not self.get_ray_cfgs("perturb")
        new_zvals = sample_pdf(
            zvals_mid,
            weights_coarse,
            self.get_ray_cfgs("n_importance"),
            det=det,
            key=self._sample_key(inference_only) if not det else None,
        )
        new_zvals = jax.lax.stop_gradient(new_zvals)
        zvals = jnp.sort(jnp.concatenate([zvals, new_zvals], -1), -1)
        mask_pts = self.merge_full_mask(mask_pts, new_zvals)
        return zvals, mask_pts

    def surface_render(
        self, inputs, bound_state=None, method="secant_root_finding", n_step=128, n_iter=20, threshold=0.01,
        level=50.0, grad_dir="descent"
    ):
        """Density model surface render: level-set of density via secant."""
        assert grad_dir == "descent" and method != "sphere_tracing", "density models need descent secant"
        return super().surface_render(inputs, bound_state, method, n_step, n_iter, threshold, level, grad_dir)
