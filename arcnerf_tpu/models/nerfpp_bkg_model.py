"""NeRF++ inverted-sphere background model.

Capability parity with /root/reference/arcnerf/models/nerfpp_bkg_model.py:
15-136: points parameterized as (x/r, y/r, z/r, 1/r) 4-D input, MSI shell
sampling, optional coarse+fine stages.
"""

import jax
import jax.numpy as jnp

from ..geometry.ray import get_ray_points_by_zvals
from ..render.ray_helper import sample_pdf
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .bkg_model import BkgModel


@MODEL_REGISTRY.register()
class NeRFPP(BkgModel):

    def setup(self):
        cfg_node = self.cfgs.model.background if hasattr(self.cfgs.model, "background") else self.cfgs.model
        self._cfg_node = cfg_node
        self.coarse_geo_net = build_geo_model(cfg_node.geometry)
        self.coarse_radiance_net = build_radiance_model(cfg_node.radiance)
        if self._bkg_ray_cfgs("n_importance") > 0 and not self._bkg_ray_cfgs("shared_network"):
            self.fine_geo_net = build_geo_model(cfg_node.geometry)
            self.fine_radiance_net = build_radiance_model(cfg_node.radiance)

    def _bkg_cfg_node(self):
        return self.cfgs.model.background if hasattr(self.cfgs.model, "background") else self.cfgs.model

    def read_ray_cfgs(self):
        """Background ray cfgs come from model.background.rays when the
        model acts as a background."""
        from ..utils.cfgs import get_value_from_cfgs_field

        rays = self._bkg_cfg_node().rays
        return {
            "bounding_radius": get_value_from_cfgs_field(rays, "bounding_radius"),
            "near": get_value_from_cfgs_field(rays, "near"),
            "far": get_value_from_cfgs_field(rays, "far"),
            "n_sample": get_value_from_cfgs_field(rays, "n_sample", 32),
            "inverse_linear": get_value_from_cfgs_field(rays, "inverse_linear", False),
            "perturb": get_value_from_cfgs_field(rays, "perturb", False),
            "add_inf_z": get_value_from_cfgs_field(rays, "add_inf_z", True),
            "noise_std": get_value_from_cfgs_field(rays, "noise_std", 0.0),
            "white_bkg": get_value_from_cfgs_field(rays, "white_bkg", False),
            "rand_bkg_color": get_value_from_cfgs_field(rays, "rand_bkg_color", False),
            "n_importance": get_value_from_cfgs_field(rays, "n_importance", 0),
            "shared_network": get_value_from_cfgs_field(rays, "shared_network", False),
            "volume": None,
        }

    def _bkg_ray_cfgs(self, key):
        return self.read_ray_cfgs()[key]

    def get_net(self):
        if self._bkg_ray_cfgs("n_importance") > 0 and not self._bkg_ray_cfgs("shared_network"):
            return self.fine_geo_net, self.fine_radiance_net
        return self.coarse_geo_net, self.coarse_radiance_net

    @staticmethod
    def _invert_pts(pts, radius):
        """(B, N, 3) world pts + (B, N, 1) sphere radius -> (B*N, 4)
        inverted-sphere coords."""
        pts4 = jnp.concatenate([pts / radius, 1.0 / radius], axis=-1)
        return pts4.reshape(-1, 4)

    def _eval_stage(self, geo_net, radiance_net, rays_o, rays_d, zvals, radius):
        n_rays, n_pts = zvals.shape
        pts = get_ray_points_by_zvals(rays_o, rays_d, zvals)
        pts4 = self._invert_pts(pts, radius)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_pts, 3)).reshape(-1, 3)
        sigma, radiance = self._forward_pts_dir(geo_net, radiance_net, pts4, dirs)
        return sigma.reshape(n_rays, n_pts), radiance.reshape(n_rays, n_pts, 3)

    def __call__(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000,
                 bound_state=None):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        output = {}

        zvals, radius = self.get_zvals_outside_sphere_wrap(rays_o, rays_d, inference_only)
        sigma, radiance = self._eval_stage(self.coarse_geo_net, self.coarse_radiance_net, rays_o, rays_d, zvals,
                                           radius)
        output_coarse = self.ray_marching_wrap(sigma, radiance, zvals, inference_only=inference_only)
        coarse_weights = output_coarse["weights"]
        output["coarse"] = self.output_get_progress(output_coarse, get_progress)

        if self._bkg_ray_cfgs("n_importance") > 0:
            zvals = self.upsample_zvals(zvals, coarse_weights, inference_only)
            pts = get_ray_points_by_zvals(rays_o, rays_d, zvals)
            radius = jnp.linalg.norm(pts, axis=-1, keepdims=True)
            fine_nets = self.get_net()
            n_rays, n_total = zvals.shape
            pts4 = self._invert_pts(pts, radius)
            dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_total, 3)).reshape(-1, 3)
            sigma, radiance = self._forward_pts_dir(fine_nets[0], fine_nets[1], pts4, dirs)
            sigma = sigma.reshape(n_rays, n_total)
            radiance = radiance.reshape(n_rays, n_total, 3)
            output_fine = self.ray_marching_wrap(sigma, radiance, zvals, inference_only=inference_only)
            output["fine"] = self.output_get_progress(output_fine, get_progress)

        return self.adjust_coarse_fine_output(output, inference_only)

    def upsample_zvals(self, zvals, weights, inference_only=True):
        n_sample = self._bkg_ray_cfgs("n_sample")
        weights_coarse = weights[:, 1:n_sample - 1]
        zvals_mid = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
        det = inference_only or not self._bkg_ray_cfgs("perturb")
        new_zvals = sample_pdf(
            zvals_mid, weights_coarse, self._bkg_ray_cfgs("n_importance"), det=det,
            key=self._sample_key(inference_only) if not det else None,
        )
        new_zvals = jax.lax.stop_gradient(new_zvals)
        return jnp.sort(jnp.concatenate([zvals, new_zvals], -1), -1)

    def adjust_coarse_fine_output(self, output, inference_only=False):
        if inference_only:
            return output["fine"] if self._bkg_ray_cfgs("n_importance") > 0 else output["coarse"]
        out = {}
        for k, v in output["coarse"].items():
            out["{}_coarse".format(k)] = v
        if self._bkg_ray_cfgs("n_importance") > 0:
            for k, v in output["fine"].items():
                out["{}_fine".format(k)] = v
        return out
