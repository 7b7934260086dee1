"""Render-layer tests (mirrors reference tests_render/tests_ray_helper.py:
zvals samplers, cdf/pdf resampling, ray marching numerics)."""

import numpy as np

import jax
import jax.numpy as jnp

from arcnerf_tpu.geometry.poses import look_at
from arcnerf_tpu.render import ray_helper as rh


def _camera():
    intrinsic = jnp.asarray([[100.0, 0.0, 32.0], [0.0, 100.0, 24.0], [0.0, 0.0, 1.0]])
    c2w = jnp.asarray(look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3)), dtype=jnp.float32)
    return 64, 48, intrinsic, c2w


class TestGetRays:

    def test_full_image(self):
        W, H, K, c2w = _camera()
        rays_o, rays_d, index, rays_r = rh.get_rays(W, H, K, c2w)
        assert rays_o.shape == (W * H, 3) and rays_d.shape == (W * H, 3)
        assert index is None and rays_r.shape == (W * H, 1)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rays_o), np.tile([[0, 0, -4]], (W * H, 1)), atol=1e-5)
        # center pixel ray points at origin
        center = np.asarray(rays_d).reshape(W, H, 3)[32, 24]
        np.testing.assert_allclose(center, [0, 0, 1], atol=1e-2)

    def test_index_select(self):
        W, H, K, c2w = _camera()
        index = np.array([[0, 0], [10, 20], [63, 47]])
        rays_o, rays_d, flat, _ = rh.get_rays(W, H, K, c2w, index=index)
        assert rays_d.shape == (3, 3)
        full_o, full_d, _, _ = rh.get_rays(W, H, K, c2w)
        np.testing.assert_allclose(np.asarray(rays_d[1]), np.asarray(full_d[10 * H + 20]), atol=1e-6)

    def test_random_select(self):
        W, H, K, c2w = _camera()
        rays_o, rays_d, flat, _ = rh.get_rays(W, H, K, c2w, n_rays=16, key=jax.random.PRNGKey(0))
        assert rays_d.shape == (16, 3)
        assert len(np.unique(np.asarray(flat))) == 16

    def test_hw_order(self):
        W, H, K, c2w = _camera()
        _, d_wh, _, _ = rh.get_rays(W, H, K, c2w, wh_order=True)
        _, d_hw, _, _ = rh.get_rays(W, H, K, c2w, wh_order=False)
        np.testing.assert_allclose(
            np.asarray(d_wh).reshape(W, H, 3).transpose(1, 0, 2), np.asarray(d_hw).reshape(H, W, 3), atol=1e-6
        )


def test_near_far_modes():
    rays_o = jnp.asarray([[0.0, 0.0, -4.0]] * 2)
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    near, far = rh.get_near_far_from_rays(rays_o, rays_d, near_hardcode=2.0, far_hardcode=6.0)
    np.testing.assert_allclose(np.asarray(near), 2.0)
    np.testing.assert_allclose(np.asarray(far), 6.0)

    near, far = rh.get_near_far_from_rays(rays_o, rays_d, bounding_radius=3.0)
    assert abs(float(near[0, 0]) - 1.0) < 1e-4 and abs(float(far[0, 0]) - 7.0) < 1e-4
    # second ray misses the sphere -> near=far=0, then far fixed to near+eps
    assert float(far[1, 0]) > float(near[1, 0])

    bounds = jnp.asarray([[1.5, 5.0], [0.5, 9.0]])
    near, far = rh.get_near_far_from_rays(rays_o, rays_d, bounds=bounds, bounding_radius=3.0)
    assert abs(float(near[0, 0]) - 1.5) < 1e-5
    assert abs(float(far[0, 0]) - 5.0) < 1e-5  # capped at sphere far 7 -> keeps 5


def test_zvals_from_near_far():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = rh.get_zvals_from_near_far(near, far, 9)
    assert z.shape == (4, 9)
    np.testing.assert_allclose(np.asarray(z[0]), np.linspace(2, 6, 9), atol=1e-5)

    z_ex = rh.get_zvals_from_near_far(near, far, 5, inclusive=False)
    assert float(z_ex[0, 0]) > 2.0 and float(z_ex[0, -1]) < 6.0

    z_inv = rh.get_zvals_from_near_far(near, far, 5, inverse_linear=True)
    assert np.all(np.diff(np.asarray(z_inv[0])) > 0)
    # inverse-linear concentrates near the near plane
    assert float(z_inv[0, 2]) < float(z[0, 4])

    z_pert = rh.get_zvals_from_near_far(near, far, 9, perturb=True, key=jax.random.PRNGKey(0))
    assert np.all(np.diff(np.asarray(z_pert), axis=-1) > 0)
    assert not np.allclose(np.asarray(z_pert), np.asarray(z))


def test_zvals_fix_step():
    near = jnp.asarray([[2.0], [2.0]])
    far = jnp.asarray([[6.0], [2.5]])
    z, mask = rh.get_zvals_from_near_far_fix_step(near, far, 0.25, 32)
    assert z.shape == (2, 32)
    # ray 1 covers (6-2)/0.25 = 16 steps + start = 17 valid; clamped dups masked
    assert int(jnp.sum(mask[0])) == 17
    # ray 2 only has (2.5-2)/0.25 = 2 steps + start = 3 valid
    assert int(jnp.sum(mask[1])) == 3
    assert np.all(np.asarray(z) <= np.asarray(far) + 1e-6)


def test_zvals_outside_sphere():
    rays_o = jnp.asarray([[0.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    z, radii = rh.get_zvals_outside_sphere(rays_o, rays_d, 8, radius=2.0)
    assert z.shape == (1, 8) and radii.shape == (8,)
    # from origin along unit dir, zval to sphere radius r is exactly r
    np.testing.assert_allclose(np.asarray(z[0]), np.asarray(radii), atol=1e-4)
    assert np.all(np.diff(np.asarray(radii)) > 0) and float(radii[0]) >= 2.0


class TestSamplePdf:

    def test_uniform_weights(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (2, 11))
        weights = jnp.ones((2, 10))
        samples = rh.sample_pdf(bins, weights, 100, det=True)
        assert samples.shape == (2, 100)
        np.testing.assert_allclose(np.asarray(samples[0]), np.linspace(0, 1, 100), atol=2e-2)

    def test_concentrated_weights(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
        weights = jnp.zeros((1, 10)).at[0, 5].set(100.0)
        samples = rh.sample_pdf(bins, weights, 64, det=True)
        inside = np.mean((np.asarray(samples[0]) >= 0.5) & (np.asarray(samples[0]) <= 0.6))
        assert inside > 0.9

    def test_random_sorted(self):
        bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 17), (4, 17))
        weights = jax.random.uniform(jax.random.PRNGKey(1), (4, 16))
        samples = rh.sample_pdf(bins, weights, 32, det=False, key=jax.random.PRNGKey(2))
        s = np.asarray(samples)
        assert np.all(np.diff(s, axis=-1) >= 0)
        assert np.all(s >= 2.0) and np.all(s <= 6.0)


class TestRayMarching:

    def test_opaque_wall(self):
        """A huge-sigma slab at z=3 should make depth ~3 and mask ~1."""
        n_pts = 64
        zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n_pts), (1, n_pts))
        sigma = jnp.where((zvals > 2.95) & (zvals < 3.3), 1e5, 0.0)
        radiance = jnp.ones((1, n_pts, 3)) * jnp.asarray([1.0, 0.0, 0.0])
        out = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True)
        assert abs(float(out["depth"][0]) - 3.0) < 0.05
        assert abs(float(out["mask"][0]) - 1.0) < 1e-4
        np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1, 0, 0], atol=1e-3)

    def test_empty_ray_white_bkg(self):
        n_pts = 16
        zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n_pts), (1, n_pts))
        sigma = jnp.zeros((1, n_pts))
        radiance = jnp.zeros((1, n_pts, 3))
        out = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True, white_bkg=True)
        assert float(out["mask"][0]) < 1e-5
        np.testing.assert_allclose(np.asarray(out["rgb"][0]), [1, 1, 1], atol=1e-4)

    def test_bkg_color_blend(self):
        n_pts = 16
        zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n_pts), (1, n_pts))
        sigma = jnp.zeros((1, n_pts))
        radiance = jnp.zeros((1, n_pts, 3))
        bkg = jnp.asarray([[0.2, 0.4, 0.6]])
        out = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True, bkg_color=bkg)
        np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0.2, 0.4, 0.6], atol=1e-4)

    def test_shapes_no_inf_z(self):
        n_pts = 16
        zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n_pts), (3, n_pts))
        sigma = jnp.ones((3, n_pts))
        radiance = jnp.ones((3, n_pts, 3)) * 0.5
        out = rh.ray_marching(sigma, radiance, zvals, add_inf_z=False)
        assert out["weights"].shape == (3, n_pts - 1)
        assert out["zvals"].shape == (3, n_pts - 1)

    def test_alpha_to_weights_sums(self):
        alpha = jnp.asarray([[0.5, 0.5, 1.0]])
        trans, weights = rh.alpha_to_weights(alpha)
        np.testing.assert_allclose(np.asarray(trans[0]), [1.0, 0.5, 0.25], atol=1e-6)
        np.testing.assert_allclose(np.asarray(weights[0]), [0.5, 0.25, 0.25], atol=1e-6)
        assert abs(float(jnp.sum(weights)) - 1.0) < 1e-5

    def test_alpha_direct_input(self):
        alpha = jnp.asarray([[0.3, 0.3, 0.3, 0.3]])
        zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, 4), (1, 4))
        radiance = jnp.ones((1, 4, 3))
        out = rh.ray_marching(None, radiance, zvals, alpha=alpha)
        assert out["weights"].shape == (1, 4)


def test_handle_valid_mask_zvals():
    zvals = jnp.asarray([[0.0, 0.2, 0.4, 0.6, 0.8, 1.0], [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]])
    mask = jnp.asarray([[True, False, False, True, True, False], [False] * 6])
    z_out, m_out = rh.handle_valid_mask_zvals(zvals, mask)
    np.testing.assert_allclose(np.asarray(z_out[0]), [0.0, 0.6, 0.8, 0.8, 0.8, 0.8], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_out[0]), [True, True, True, False, False, False])
    # fully invalid ray -> all zeros
    np.testing.assert_allclose(np.asarray(z_out[1]), 0.0)
    assert not bool(jnp.any(m_out[1]))

    # constant zvals with all-valid mask keeps one point
    zvals_c = jnp.full((1, 4), 2.0)
    mask_c = jnp.ones((1, 4), dtype=bool)
    z_c, m_c = rh.handle_valid_mask_zvals(zvals_c, mask_c)
    assert int(jnp.sum(m_c)) == 1


def test_ndc_rays():
    """NDC projection (llff-style): origins land on the near plane (o2 at
    near -> o2' = -1), points at infinity map toward z' = 1, and d' = 0
    means the ray goes straight to the image center."""
    intrinsic = np.eye(3)
    intrinsic[0, 0] = intrinsic[1, 1] = 50.0
    W, H = 100, 80
    rays_o = jnp.asarray([[0.0, 0.0, 0.0], [0.3, -0.2, 0.0]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])  # forward = -z
    o_ndc, d_ndc = rh.get_ndc_rays(rays_o, rays_d, W, H, jnp.asarray(intrinsic), near=1.0)
    # on the near plane: o2 = 1 + 2*near/(-near) = -1
    np.testing.assert_allclose(np.asarray(o_ndc[:, 2]), [-1.0, -1.0], atol=1e-6)
    # d2 = -2*near/oz = 2: o2 + t*d2 -> 1 as t -> 1 (infinity)
    np.testing.assert_allclose(np.asarray(o_ndc[:, 2] + d_ndc[:, 2]), [1.0, 1.0], atol=1e-6)
    # the centered ray stays centered
    np.testing.assert_allclose(np.asarray(o_ndc[0, :2]), [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_ndc[0, :2]), [0.0, 0.0], atol=1e-6)
    # the off-center ray's NDC x/y sign matches -x/-z convention
    expected = -1.0 / (W / 100.0) * 0.3 / -1.0
    assert abs(float(o_ndc[1, 0]) - expected) < 1e-6


def test_ray_marching_noise_and_weights_only():
    n_pts = 32
    key = jax.random.PRNGKey(0)
    zvals = jnp.broadcast_to(jnp.linspace(2.0, 4.0, n_pts), (4, n_pts))
    sigma = jnp.full((4, n_pts), 2.0)
    radiance = jnp.full((4, n_pts, 3), 0.5)
    out_clean = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True)
    out_noise = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True, noise_std=5.0, key=key)
    # noise perturbs the weights but keeps them a valid distribution
    assert not np.allclose(np.asarray(out_clean["weights"]), np.asarray(out_noise["weights"]))
    assert float(jnp.max(jnp.sum(out_noise["weights"], -1))) <= 1.0 + 1e-4

    out_w = rh.ray_marching(sigma, radiance, zvals, add_inf_z=True, weights_only=True)
    assert "weights" in out_w and out_w.get("rgb") is None or "rgb" not in out_w


def test_make_sample_rays():
    out = rh.make_sample_rays(near=2.0, far=4.0, n_pts=32)
    assert out["zvals"].shape == (1, 32) and out["vals"].shape == (1, 32)
    assert out["vals"][0, 0] == 2.0 and abs(out["vals"][0, 15] - -1.0) < 0.3
    assert out["mid_zvals"].shape == (1, 31)
