"""VolSDF: sdf -> density via Laplace CDF with learned beta; error-bound
driven sampling.

Capability parity with /root/reference/arcnerf/models/volsdf_model.py:18-358:
sdf_to_sigma Laplace transform, Algorithm-1 error-bound sampling (d_star
Theorem-1 bound, beta bisection line search), eikonal sample points.

TPU adaptation: the data-dependent while loop becomes a fixed ``n_iter``
python unroll — every iteration appends n_eval samples (static, growing
shapes) and refines beta by bisection; already-converged rays simply keep
refining (same result, no dynamic control flow).
"""

import math

import jax
import jax.numpy as jnp

from ..geometry.ray import get_ray_points_by_zvals
from ..geometry.transformation import normalize
from ..render.ray_helper import ray_marching, sample_pdf
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import MODEL_REGISTRY
from .base_modules import build_geo_model, build_radiance_model
from .sdf_model import SdfModel


def sdf_to_sigma(sdf, beta, beta_min=1e-4):
    """Laplace-CDF density (volsdf eq.2/3)."""
    beta = beta + beta_min
    alpha = 1.0 / beta
    exp = 0.5 * jnp.exp(-jnp.abs(sdf) / beta)
    return alpha * jnp.where(sdf >= 0, exp, 1.0 - exp)


@MODEL_REGISTRY.register()
class VolSDF(SdfModel):

    def setup(self):
        # SDF normals are jax.grad wrt input pts -> exact (unfused) encoder interp
        self.geo_net = build_geo_model(self.cfgs.model.geometry, needs_input_grad=True)
        self.radiance_net = build_radiance_model(self.cfgs.model.radiance)
        init_beta = get_value_from_cfgs_field(self.cfgs.model.params, "init_beta", 0.1)
        speed = self.speed_factor
        self.ln_beta = self.param(
            "ln_beta", lambda key: jnp.asarray([math.log(init_beta) / speed], dtype=jnp.float32)
        )

    @property
    def speed_factor(self):
        return get_value_from_cfgs_field(self.cfgs.model.params, "speed_factor", 10)

    @property
    def beta_min(self):
        return get_value_from_cfgs_field(self.cfgs.model.params, "beta_min", 1e-4)

    @property
    def radius_bound(self):
        return get_value_from_cfgs_field(self.cfgs.model.rays, "radius_bound", 1.5)

    def get_net(self):
        return self.geo_net, self.radiance_net

    def forward_beta(self):
        return jnp.exp(self.ln_beta * self.speed_factor)

    def get_n_coarse_sample(self):
        return get_value_from_cfgs_field(self.cfgs.model.rays, "n_eval", 128)

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        zvals = inputs["zvals"]
        bkg_color = inputs.get("bkg_color", None)
        n_rays = rays_o.shape[0]

        zvals, zvals_surface, mask_pts = self.upsample_zvals(rays_o, rays_d, zvals, inference_only)

        sdf, radiance, normal_pts = self.get_sdf_radiance_normal_by_mask_pts(
            self.geo_net, self.radiance_net, rays_o, rays_d, zvals, mask_pts, inference_only
        )
        sigma = sdf_to_sigma(sdf, self.forward_beta(), self.beta_min)

        output = self.ray_marching_wrap(sigma, radiance, zvals, inference_only=inference_only, bkg_color=bkg_color)
        # record sdf (not sigma) in progress like the reference
        n_weights = output["weights"].shape[1]
        normal_w = normal_pts[:, :n_weights]
        output["normal"] = jnp.sum(output["weights"][..., None] * normalize(normal_w), axis=-2)
        if not inference_only:
            output["params"] = {"beta": self.forward_beta()[0]}
            eikonal_pts = self.get_eikonal_pts(rays_o, rays_d, zvals_surface).reshape(-1, 3)
            n_per_ray = eikonal_pts.shape[0] // n_rays
            dirs = jnp.repeat(rays_d, n_per_ray, axis=0)
            _, _, normal_eik = self._forward_pts_dir_with_normal(self.geo_net, self.radiance_net, eikonal_pts, dirs)
            output["normal_pts"] = normal_eik.reshape(n_rays, -1, 3)
        return self.output_get_progress(output, get_progress)

    # ----------------------------------------------------- error-bound math
    @staticmethod
    def get_d_star(zvals, sdf):
        """Theorem-1 interval bound d* (reference volsdf_model.py:256-289)."""
        dists = zvals[:, 1:] - zvals[:, :-1]
        a, b, c = dists, jnp.abs(sdf[:, :-1]), jnp.abs(sdf[:, 1:])
        first = a**2 + b**2 <= c**2
        second = a**2 + c**2 <= b**2
        s = (a + b + c) / 2.0
        area2 = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
        h = 2.0 * jnp.sqrt(area2) / (a + 1e-12)
        d_star = jnp.where(first, b, jnp.where(second, c, jnp.where(b + c - a > 0, h, 0.0)))
        same_sign = jnp.sign(sdf[:, 1:]) * jnp.sign(sdf[:, :-1]) == 1
        return jnp.where(same_sign, d_star, 0.0)

    def get_integral_bound(self, integral_esti, beta, d_star, dists):
        err = jnp.exp(-d_star / beta) * (dists**2) / (4.0 * beta**2)
        err_int = jnp.cumsum(err, axis=-1)
        return (jnp.clip(jnp.exp(err_int), None, 1e6) - 1.0) * jnp.exp(-integral_esti[:, :-1])

    def get_error_bound(self, beta, sdf, zvals, d_star, max_per_ray=True):
        dists = zvals[:, 1:] - zvals[:, :-1]
        sigma = sdf_to_sigma(sdf, beta, self.beta_min)
        shifted = jnp.concatenate([jnp.zeros((dists.shape[0], 1)), dists * sigma[:, :-1]], axis=-1)
        integral_esti = jnp.cumsum(shifted, axis=-1)
        bound = self.get_integral_bound(integral_esti, beta, d_star, dists)
        return jnp.max(bound, axis=-1) if max_per_ray else bound

    def upsample_zvals(self, rays_o, rays_d, zvals, inference_only=False):
        """Algorithm-1 sampling with fixed iteration counts.

        Returns zvals (B, n_sample + n_importance), zvals_surface (B, 1),
        mask_pts (None).
        """
        n_eval = self.get_n_coarse_sample()
        n_sample = self.get_ray_cfgs("n_sample")
        n_iter = get_value_from_cfgs_field(self.cfgs.model.rays, "n_iter", 5)
        beta_iter = get_value_from_cfgs_field(self.cfgs.model.rays, "beta_iter", 10)
        eps = get_value_from_cfgs_field(self.cfgs.model.rays, "eps", 0.1)

        n_rays = zvals.shape[0]
        beta0 = jax.lax.stop_gradient(self.forward_beta())[0]

        # Lemma-2 upper bound on beta
        dists = zvals[:, 1:] - zvals[:, :-1]
        bound = (1.0 / (4.0 * math.log(eps + 1.0))) * jnp.sum(dists**2, -1)
        beta = jnp.sqrt(bound)  # (B,)

        sdf_fn = lambda p: jax.lax.stop_gradient(self.forward_pts(p))  # noqa: E731

        for it in range(n_iter):
            n_pts = zvals.shape[1]
            pts = get_ray_points_by_zvals(rays_o, rays_d, zvals).reshape(-1, 3)
            sdf = sdf_fn(pts).reshape(n_rays, n_pts)

            d_star = self.get_d_star(zvals, sdf)
            cur_error = self.get_error_bound(beta0, sdf, zvals, d_star)
            beta = jnp.where(cur_error <= eps, beta0, beta)

            # bisection line search on beta
            beta_lo = jnp.full((n_rays,), beta0)
            beta_hi = beta
            for _ in range(beta_iter):
                beta_mid = 0.5 * (beta_lo + beta_hi)
                err = self.get_error_bound(beta_mid[:, None], sdf, zvals, d_star)
                beta_hi = jnp.where(err <= eps, beta_mid, beta_hi)
                beta_lo = jnp.where(err > eps, beta_mid, beta_lo)
            beta = beta_hi

            sigma = sdf_to_sigma(sdf, beta[:, None], self.beta_min)
            march = ray_marching(sigma, None, zvals, add_inf_z=True)
            trans_shift, weights = march["trans_shift"], march["weights"]

            dists = zvals[:, 1:] - zvals[:, :-1]
            if it < n_iter - 1:
                pdf = self.get_integral_bound(
                    -jnp.log(jnp.maximum(trans_shift, 1e-12)), beta[:, None], d_star, dists
                )
                new_zvals = sample_pdf(zvals, pdf[:, : n_pts - 1], n_eval, det=True)
                zvals = jnp.sort(jnp.concatenate([zvals, new_zvals], axis=-1), axis=-1)
            else:
                det = inference_only or not self.get_ray_cfgs("perturb")
                samples = sample_pdf(
                    zvals, weights[:, : n_pts - 1], n_sample, det=det,
                    key=self._sample_key(inference_only) if not det else None,
                )
        zvals_sample = jax.lax.stop_gradient(samples)

        n_importance = self.get_ray_cfgs("n_importance")
        if n_importance > 0:
            if inference_only or self._sample_key(inference_only) is None:
                sel = jnp.linspace(0, zvals.shape[1] - 1, n_importance).astype(jnp.int32)
                extra = zvals[:, sel]
            else:
                sel = jax.random.choice(
                    self.make_rng("sampling"), zvals.shape[1], shape=(n_importance,), replace=False
                )
                extra = zvals[:, sel]
            zvals_sample = jnp.sort(jnp.concatenate([zvals_sample, extra], axis=-1), axis=-1)

        # random surface zval per ray (for eikonal points)
        if self.has_rng("sampling") and not inference_only:
            idx = jax.random.randint(self.make_rng("sampling"), (n_rays, 1), 0, zvals_sample.shape[1])
        else:
            idx = jnp.full((n_rays, 1), zvals_sample.shape[1] // 2, dtype=jnp.int32)
        zvals_surface = jnp.take_along_axis(zvals_sample, idx, axis=1)
        return zvals_sample, zvals_surface, None

    def get_eikonal_pts(self, rays_o, rays_d, zvals_surface):
        """Uniform in-sphere point + surface point per ray -> (B, 2, 3)."""
        if self.has_rng("sampling"):
            pts_rand = jax.random.uniform(
                self.make_rng("sampling"), (rays_o.shape[0], 1, 3),
                minval=-self.radius_bound, maxval=self.radius_bound,
            )
        else:
            pts_rand = jnp.zeros((rays_o.shape[0], 1, 3))
        norm_max = jnp.maximum(jnp.max(jnp.linalg.norm(pts_rand, axis=-1)), 1e-8)
        pts_rand = pts_rand / norm_max * self.radius_bound
        pts_surface = get_ray_points_by_zvals(rays_o, rays_d, zvals_surface)
        return jnp.concatenate([pts_rand, pts_surface], axis=1)

    def get_est_opacity(self, dt, pts):
        sdf = self.forward_pts(pts)
        density = sdf_to_sigma(sdf, self.forward_beta(), self.beta_min)
        return 1.0 - jnp.exp(-jax.nn.relu(density) * dt)
