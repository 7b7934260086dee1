"""Golden-value math tests for the sdf/density conversions and the MipNeRF
IPE (reference tests drive these with the make_sample_rays fixture)."""

import numpy as np

import jax.numpy as jnp

from arcnerf_tpu.models.base_modules.encoding import FreqEmbedder, Gaussian, GaussianEmbedder
from arcnerf_tpu.models.neus_model import sdf_to_alpha, sdf_to_cdf, sdf_to_pdf
from arcnerf_tpu.models.volsdf_model import sdf_to_sigma
from arcnerf_tpu.render.ray_helper import make_sample_rays


class TestNeusMath:

    def test_cdf_pdf(self):
        sdf = jnp.linspace(-2, 2, 41)[None]
        s = 10.0
        cdf = np.asarray(sdf_to_cdf(sdf, s))
        assert cdf[0, 0] < 1e-6 and cdf[0, -1] > 1 - 1e-6
        assert abs(cdf[0, 20] - 0.5) < 1e-6  # sdf=0 -> 0.5
        assert np.all(np.diff(cdf[0]) >= 0)
        pdf = np.asarray(sdf_to_pdf(sdf, s))
        assert pdf[0, 20] == pdf.max()  # peaked at the surface

    def test_alpha_on_fixture(self):
        """On the synthetic +..0..-..0..+ sdf ray, alpha peaks at the first
        surface crossing (descending sdf)."""
        fixture = make_sample_rays(n_pts=32, sdf=True)
        zvals = jnp.asarray(fixture["zvals"])
        mid_sdf = jnp.asarray(fixture["mid_vals"])
        mid_slope = jnp.asarray(fixture["mid_slope"])
        alpha = np.asarray(sdf_to_alpha(mid_sdf, zvals, jnp.minimum(mid_slope, 0.0), s=20.0))
        assert alpha.shape == (1, 31)
        assert np.all(alpha >= 0) and np.all(alpha <= 1)
        # fully-outside regions (start/end of the ray) are transparent;
        # around and inside the surface (sdf <= 0) alpha saturates
        assert alpha[0, :6].max() < 1e-4 and alpha[0, -6:].max() < 1e-4
        # entering (descending-sdf) side saturates once inside; the exit
        # side (rising sdf, slope clamped to 0) contributes ~nothing
        entering_inside = (np.asarray(mid_sdf[0]) < -0.3) & (np.arange(31) < 16)
        assert alpha[0][entering_inside].min() > 0.9

    def test_alpha_scale_sharpens(self):
        fixture = make_sample_rays(n_pts=32)
        zvals = jnp.asarray(fixture["zvals"])
        mid_sdf = jnp.asarray(fixture["mid_vals"])
        slope = jnp.minimum(jnp.asarray(fixture["mid_slope"]), 0.0)
        a_lo = np.asarray(sdf_to_alpha(mid_sdf, zvals, slope, s=4.0))
        a_hi = np.asarray(sdf_to_alpha(mid_sdf, zvals, slope, s=64.0))
        # higher scale -> sharper onset: just OUTSIDE the surface
        # (sdf ~ +0.5) the high-scale alpha is much smaller
        near_out = np.argmin(np.abs(np.asarray(mid_sdf[0][:16]) - 0.5))
        assert a_hi[0, near_out] < a_lo[0, near_out]


class TestVolSDFMath:

    def test_laplace_density(self):
        beta = 0.1
        s0 = float(sdf_to_sigma(jnp.zeros((1, 1)), beta, 0.0)[0, 0])
        assert abs(s0 - 0.5 / beta) < 1e-4  # sdf=0 -> alpha/2
        far_out = float(sdf_to_sigma(jnp.full((1, 1), 3.0), beta, 0.0)[0, 0])
        assert far_out < 1e-8
        deep_in = float(sdf_to_sigma(jnp.full((1, 1), -3.0), beta, 0.0)[0, 0])
        assert abs(deep_in - 1.0 / beta) < 1e-4
        # monotone decreasing in sdf
        sdf = jnp.linspace(-1, 1, 21)[None]
        sig = np.asarray(sdf_to_sigma(sdf, beta, 0.0))
        assert np.all(np.diff(sig[0]) <= 1e-9)


class TestIPE:

    def test_zero_width_matches_freq(self):
        """A zero-volume gaussian IPE reduces to plain freq encoding."""
        emb_g = GaussianEmbedder(input_dim=3, n_freqs=4)
        emb_f = FreqEmbedder(input_dim=3, n_freqs=4)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32))
        mean_cov = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
        out_g = emb_g.apply({}, mean_cov)
        out_f = emb_f.apply({}, x)
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_f), atol=1e-5)

    def test_large_cov_damps_high_freq(self):
        emb = GaussianEmbedder(input_dim=3, n_freqs=6, include_input=False)
        x = jnp.ones((1, 3)) * 0.3
        small = emb.apply({}, jnp.concatenate([x, jnp.full((1, 3), 1e-6)], -1))
        big = emb.apply({}, jnp.concatenate([x, jnp.full((1, 3), 1.0)], -1))
        # highest-frequency components (last block) should be crushed
        assert float(jnp.abs(big[0, -6:]).max()) < 1e-3
        assert float(jnp.abs(small[0, -6:]).max()) > 0.1

    def test_cone_gaussian_geometry(self):
        g = Gaussian("cone")
        zvals = jnp.asarray([[1.0, 2.0, 3.0]])
        rays_o = jnp.zeros((1, 3))
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays_r = jnp.full((1, 1), 0.1)
        mc = g(zvals, rays_o, rays_d, rays_r)  # (1, 2, 6)
        means, covs = np.asarray(mc[..., :3]), np.asarray(mc[..., 3:])
        # means lie on the ray between interval ends, slightly past midpoint
        assert 1.5 < means[0, 0, 2] < 2.0 and 2.5 < means[0, 1, 2] < 3.0
        assert np.allclose(means[..., :2], 0.0, atol=1e-6)
        assert np.all(covs > 0)
        # farther interval has larger radial variance (cone grows)
        assert covs[0, 1, 0] > covs[0, 0, 0]

    def test_cylinder_gaussian(self):
        g = Gaussian("cylinder")
        zvals = jnp.asarray([[1.0, 2.0]])
        rays_o = jnp.zeros((1, 3))
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        rays_r = jnp.full((1, 1), 0.2)
        mc = g(zvals, rays_o, rays_d, rays_r)
        means, covs = np.asarray(mc[..., :3]), np.asarray(mc[..., 3:])
        assert abs(means[0, 0, 2] - 1.5) < 1e-6  # cylinder mean = midpoint
        # longitudinal var = len^2/12, radial var = r^2/4
        assert abs(covs[0, 0, 2] - 1.0 / 12.0) < 1e-6
        assert abs(covs[0, 0, 0] - 0.01) < 1e-6
