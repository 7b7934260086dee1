"""Base 3d model: shared ray cfgs, ray-marching wrapper, progress plumbing.

Capability parity with /root/reference/arcnerf/models/base_3d_model.py
(ray cfgs :37-52, ray_marching wrapper :113-158, output_get_progress
:160-187, adjust_coarse_fine_output :189-208, forward_pts_dir :210-231,
forward_pts :256-270, density surface_render :307-366, get_est_opacity
:368-389).

Models are flax.linen modules; randomness (zval perturb, sigma noise,
importance sampling) flows through the 'sampling' rng stream, disabled when
``inference_only``. Occupancy state is an explicit ``bound_state`` argument.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.ray import surface_ray_intersection
from ..geometry.transformation import normalize
from ..render.ray_helper import ray_marching
from ..utils.cfgs import get_value_from_cfgs_field

PROGRESS_KEYS = ("sigma", "zvals", "alpha", "trans_shift", "weights", "radiance")


class Base3dModel(nn.Module):
    """Shared base for fg/bkg 3d models."""

    cfgs: Any = None

    # ------------------------------------------------------------- ray cfgs
    def read_ray_cfgs(self):
        rays = self.cfgs.model.rays
        return {
            "bounding_radius": get_value_from_cfgs_field(rays, "bounding_radius"),
            "volume": get_value_from_cfgs_field(rays, "volume"),
            "near": get_value_from_cfgs_field(rays, "near"),
            "far": get_value_from_cfgs_field(rays, "far"),
            "n_sample": get_value_from_cfgs_field(rays, "n_sample", 128),
            "inverse_linear": get_value_from_cfgs_field(rays, "inverse_linear", False),
            "perturb": get_value_from_cfgs_field(rays, "perturb", False),
            "add_inf_z": get_value_from_cfgs_field(rays, "add_inf_z", False),
            "noise_std": get_value_from_cfgs_field(rays, "noise_std", 0.0),
            "white_bkg": get_value_from_cfgs_field(rays, "white_bkg", False),
            "rand_bkg_color": get_value_from_cfgs_field(rays, "rand_bkg_color", False),
            "n_importance": get_value_from_cfgs_field(rays, "n_importance", 0),
            "shared_network": get_value_from_cfgs_field(rays, "shared_network", False),
        }

    def get_ray_cfgs(self, key=None):
        cfgs = self.read_ray_cfgs()
        return cfgs if key is None else cfgs[key]

    @staticmethod
    def sigma_reverse():
        """True for sdf-style models where inside-object geo value < 0."""
        return False

    def _sample_key(self, inference_only):
        """Fresh PRNG key from the 'sampling' stream, or None at inference /
        when the caller provided no rng."""
        if inference_only or not self.has_rng("sampling"):
            return None
        return self.make_rng("sampling")

    # --------------------------------------------------------- ray marching
    def ray_marching_wrap(
        self, sigma, radiance, zvals, add_inf_z=None, alpha=None, inference_only=False, weights_only=False,
        bkg_color=None, mask_pts=None
    ):
        """ray_marching with model cfg defaults (add_inf_z, noise_std,
        white_bkg); see reference base_3d_model.py:113. ``mask_pts`` enables
        the scattered-mask marching mode (unsorted occupancy masks)."""
        noise_std = 0.0 if inference_only else float(self.get_ray_cfgs("noise_std") or 0.0)
        key = self._sample_key(inference_only) if noise_std > 0.0 else None
        return ray_marching(
            sigma,
            radiance,
            zvals,
            self.get_ray_cfgs("add_inf_z") if add_inf_z is None else add_inf_z,
            noise_std,
            weights_only=weights_only,
            white_bkg=self.get_ray_cfgs("white_bkg"),
            alpha=alpha,
            bkg_color=bkg_color,
            key=key,
            mask_pts=mask_pts,
        )

    def output_get_progress(self, output, get_progress=False, n_fg=None):
        """Keep/drop the per-point marching tensors under progress_* keys."""
        if get_progress:
            for key in PROGRESS_KEYS:
                if output.get(key) is None:
                    continue
                v = output[key]
                output["progress_{}".format(key)] = v[:, :n_fg] if n_fg is not None else v
            if self.sigma_reverse():
                output["progress_sigma_reverse"] = True
        for key in PROGRESS_KEYS:
            output.pop(key, None)
        return output

    def adjust_coarse_fine_output(self, output, inference_only=False):
        """coarse/fine stage dicts -> flat keys with _coarse/_fine suffixes
        (plain keys at inference)."""
        if inference_only:
            return output["fine"] if self.get_ray_cfgs("n_importance") > 0 else output["coarse"]
        out = {}
        for k, v in output["coarse"].items():
            out["{}_coarse".format(k)] = v
        if self.get_ray_cfgs("n_importance") > 0:
            for k, v in output["fine"].items():
                out["{}_fine".format(k)] = v
        return out

    # ---------------------------------------------------------- pts forward
    def get_net(self):
        """Return (geo_net, radiance_net) used for direct pts queries."""
        raise NotImplementedError

    @staticmethod
    def _forward_pts_dir(geo_net, radiance_net, pts, rays_d):
        """(B, 3), (B, 3) -> sigma (B,), radiance (B, 3)."""
        geo, feat = geo_net(pts)
        radiance = radiance_net(pts, rays_d, None, feat)
        return geo[..., 0], radiance

    def forward_pts_dir(self, pts, view_dir=None):
        """Direct query: (N, 3)[, (N, 3)] -> sigma (N,), rgb (N, 3)."""
        geo_net, radiance_net = self.get_net()
        rays_d = jnp.zeros_like(pts) if view_dir is None else normalize(view_dir)
        return self._forward_pts_dir(geo_net, radiance_net, pts, rays_d)

    def forward_pts(self, pts):
        """Direct geometry query: (N, 3) -> sigma/sdf (N,)."""
        geo_net, _ = self.get_net()
        return geo_net(pts)[0][..., 0]

    def get_est_opacity(self, dt, pts):
        """opacity ~= sigma * dt (instant-ngp convention); sdf models
        override (reference base_3d_model.py:368)."""
        return self.forward_pts(pts) * dt

    # -------------------------------------------------------- surface render
    def surface_render(
        self, inputs, bound_state=None, method="secant_root_finding", n_step=128, n_iter=20, threshold=0.01,
        level=50.0, grad_dir="descent"
    ):
        """Find the level-set surface along each ray and shade it."""
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        n_rays = rays_o.shape[0]
        near, far, _ = self.get_near_far_from_rays(inputs, bound_state)
        geo_net, radiance_net = self.get_net()

        geo_fn = lambda pts: geo_net(pts)[0][..., 0]  # noqa: E731
        zvals, pts, mask = surface_ray_intersection(
            rays_o, rays_d, geo_fn, method, near, far, n_step, n_iter, threshold, level, grad_dir
        )
        _, rgb_pts = self._forward_pts_dir(geo_net, radiance_net, pts, rays_d)
        rgb = jnp.where(mask[:, None], rgb_pts, jnp.ones((n_rays, 3)))
        return {"rgb": rgb, "depth": zvals[:, 0], "mask": mask.astype(rays_o.dtype)}

    def get_near_far_from_rays(self, inputs, bound_state=None):
        """Default near/far from ray cfgs (overridden by FgModel's bound)."""
        from ..render.ray_helper import get_near_far_from_rays

        near, far = get_near_far_from_rays(
            inputs["rays_o"],
            inputs["rays_d"],
            inputs.get("bounds", None),
            self.get_ray_cfgs("near"),
            self.get_ray_cfgs("far"),
            self.get_ray_cfgs("bounding_radius"),
        )
        return near, far, None
