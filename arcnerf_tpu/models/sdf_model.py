"""SDF model base: autodiff surface normals, sphere-tracing surface render.

Capability parity with /root/reference/arcnerf/models/sdf_model.py:11-171.
Normals come from ``jax.grad`` of the geo net w.r.t. input points (nested
autodiff keeps them differentiable for the eikonal loss), replacing torch's
``forward_with_grad`` autograd.grad machinery.
"""

import jax
import jax.numpy as jnp

from ..geometry.ray import get_ray_points_by_zvals, surface_ray_intersection
from ..geometry.transformation import normalize
from .fg_model import FgModel


def geo_with_grad(geo_net, pts):
    """geo value + feature + d(geo)/d(pts) in one pass.

    pts (B, 3) -> geo (B, 1), feat (B, W), normal (B, 3). Differentiable
    (supports grad-of-grad for eikonal regularization).
    """

    def sdf_sum(p):
        geo, feat = geo_net(p)
        return jnp.sum(geo[..., 0]), (geo, feat)

    (_, (geo, feat)), normal = jax.value_and_grad(sdf_sum, has_aux=True)(pts)
    return geo, feat, normal


class SdfModel(FgModel):

    @staticmethod
    def sigma_reverse():
        return True

    def get_est_opacity(self, dt, pts):
        raise NotImplementedError("implement in concrete sdf model")

    @staticmethod
    def _forward_pts_dir(geo_net, radiance_net, pts, rays_d):
        """sdf models feed the normal into the radiance net."""
        sdf, feature, normal = geo_with_grad(geo_net, pts)
        radiance = radiance_net(pts, rays_d, normal, feature)
        return sdf[..., 0], radiance

    @staticmethod
    def _forward_pts_dir_with_normal(geo_net, radiance_net, pts, rays_d):
        sdf, feature, normal = geo_with_grad(geo_net, pts)
        radiance = radiance_net(pts, rays_d, normal, feature)
        return sdf[..., 0], radiance, normal

    def get_sdf_radiance_normal_by_mask_pts(
        self, geo_net, radiance_net, rays_o, rays_d, zvals, mask_pts=None, inference_only=False
    ):
        """(B, n_pts) grid evaluation -> sdf (B, N), radiance (B, N, 3),
        normal (B, N, 3). Static shapes; when a point budget is set and
        masks mark most points invalid, only the budgeted prefix of valid
        points feeds the (grad-carrying) MLP; invalid slots repeat the
        last valid value (their zvals duplicate it, so this is exact —
        zero-fill would wrongly mean sdf=0 = on-surface)."""
        n_rays, n_pts = zvals.shape
        pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, n_pts, 3)).reshape(-1, 3)

        budget = self.get_render_cfgs("max_allowance")
        if mask_pts is not None and isinstance(budget, int) and 0 < budget < n_rays * n_pts:
            sdf, radiance, normal = self.compact_point_eval(
                lambda p, d: self._forward_pts_dir_with_normal(geo_net, radiance_net, p, d),
                pts, dirs, mask_pts, budget, fill="repeat_last",
            )
        else:
            sdf, radiance, normal = self._forward_pts_dir_with_normal(geo_net, radiance_net, pts, dirs)
        return sdf.reshape(n_rays, n_pts), radiance.reshape(n_rays, n_pts, 3), normal.reshape(n_rays, n_pts, 3)

    def surface_render(
        self, inputs, bound_state=None, method="sphere_tracing", n_step=128, n_iter=20, threshold=0.01,
        level=0.0, grad_dir="ascent"
    ):
        assert level == 0.0 and grad_dir == "ascent", "sdf models trace the zero level set"
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
        _, rgb_pts, normal_pts = self._forward_pts_dir_with_normal(geo_net, radiance_net, pts, rays_d)
        rgb = jnp.where(mask[:, None], rgb_pts, jnp.ones((n_rays, 3)))
        normal = jnp.where(mask[:, None], normalize(normal_pts), 0.0)
        return {"rgb": rgb, "depth": zvals[:, 0], "mask": mask.astype(rays_o.dtype), "normal": normal}
