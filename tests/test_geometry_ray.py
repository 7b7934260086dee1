"""Numeric tests for geometry.ray (mirrors reference
tests_arcnerf/tests_geometry/tests_ray.py genre: analytic fixtures with
exact expectations)."""

import numpy as np
import pytest

from arcnerf_tpu.geometry import ray
from arcnerf_tpu.utils.chunk import np_wrapper


def test_get_ray_points_by_zvals():
    rays_o = np.zeros((2, 3), dtype=np.float32)
    rays_d = np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float32)
    zvals = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    pts = np_wrapper(ray.get_ray_points_by_zvals, rays_o, rays_d, zvals)
    assert pts.shape == (2, 2, 3)
    np.testing.assert_allclose(pts[0, 1], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pts[1, 0], [0, 3, 0], atol=1e-6)


def test_closest_point_on_ray():
    rays_o = np.zeros((1, 3), dtype=np.float32)
    rays_d = np.array([[1, 0, 0]], dtype=np.float32)
    pts = np.array([[2.0, 1.0, 0.0], [-5.0, 2.0, 0.0]], dtype=np.float32)
    closest, zvals = np_wrapper(ray.closest_point_on_ray, rays_o, rays_d, pts)
    np.testing.assert_allclose(closest[0, 0], [2, 0, 0], atol=1e-5)
    # behind origin clamps to zval 0
    assert zvals[0, 1] == 0.0
    np.testing.assert_allclose(closest[0, 1], [0, 0, 0], atol=1e-5)


def test_closest_point_to_two_rays():
    # two rays on z=0 / z=1 planes; shortest segment length 1
    rays_o = np.array([[0, 0, 0], [0, 0, 1]], dtype=np.float32)
    rays_d = np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float32)
    pts, distance, zvals = np_wrapper(ray.closest_point_to_two_rays, rays_o, rays_d)
    assert abs(float(distance) - 1.0) < 1e-5
    np.testing.assert_allclose(pts[0], [0, 0, 0.5], atol=1e-5)


def test_closest_point_to_rays_closed_form():
    # rays through (1,1,1) from multiple directions
    target = np.array([1.0, 1.0, 1.0], dtype=np.float32)
    dirs = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], dtype=np.float32)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = target[None] - 3.0 * dirs
    pts, distance, zvals = np_wrapper(ray.closest_point_to_rays, origins, dirs)
    np.testing.assert_allclose(pts[0], target, atol=1e-4)
    assert np.all(distance < 1e-4)


def test_closest_distance_of_two_rays():
    rays_o = np.array([[0, 0, 0], [0, 0, 2]], dtype=np.float32)
    rays_d = np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float32)
    d = np_wrapper(ray.closest_distance_of_two_rays, rays_o, rays_d)
    assert abs(float(d) - 2.0) < 1e-5


class TestSphereIntersection:

    def test_outside_two_hits(self):
        rays_o = np.array([[-3.0, 0.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        near, far, pts, mask = np_wrapper(ray.sphere_ray_intersection, rays_o, rays_d, 1.0)
        assert mask[0, 0]
        assert abs(near[0, 0] - 2.0) < 1e-5 and abs(far[0, 0] - 4.0) < 1e-5
        np.testing.assert_allclose(pts[0, 0, 0], [-1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(pts[0, 0, 1], [1, 0, 0], atol=1e-5)

    def test_inside(self):
        rays_o = np.zeros((1, 3), dtype=np.float32)
        rays_d = np.array([[0.0, 0.0, 1.0]], dtype=np.float32)
        near, far, _, mask = np_wrapper(ray.sphere_ray_intersection, rays_o, rays_d, 2.0)
        assert mask[0, 0] and near[0, 0] == 0.0 and abs(far[0, 0] - 2.0) < 1e-5

    def test_miss(self):
        rays_o = np.array([[-3.0, 2.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        near, far, _, mask = np_wrapper(ray.sphere_ray_intersection, rays_o, rays_d, 1.0)
        assert not mask[0, 0] and near[0, 0] == 0.0 and far[0, 0] == 0.0

    def test_away(self):
        rays_o = np.array([[-3.0, 0.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[-1.0, 0.0, 0.0]], dtype=np.float32)
        _, _, _, mask = np_wrapper(ray.sphere_ray_intersection, rays_o, rays_d, 1.0)
        assert not mask[0, 0]

    def test_multi_radius(self):
        rays_o = np.array([[-5.0, 0.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        radius = np.array([1.0, 2.0], dtype=np.float32)
        near, far, pts, mask = np_wrapper(ray.sphere_ray_intersection, rays_o, rays_d, radius)
        assert near.shape == (1, 2) and pts.shape == (1, 2, 2, 3)
        assert abs(near[0, 0] - 4.0) < 1e-5 and abs(near[0, 1] - 3.0) < 1e-5


class TestAABBIntersection:

    aabb = np.array([[[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]]], dtype=np.float32)

    def test_outside_hit(self):
        rays_o = np.array([[-3.0, 0.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        near, far, pts, mask = np_wrapper(ray.aabb_ray_intersection, rays_o, rays_d, self.aabb)
        assert mask[0, 0]
        assert abs(near[0, 0] - 2.0) < 1e-4 and abs(far[0, 0] - 4.0) < 1e-4

    def test_inside(self):
        rays_o = np.zeros((1, 3), dtype=np.float32)
        rays_d = np.array([[0.0, 1.0, 0.0]], dtype=np.float32)
        near, far, _, mask = np_wrapper(ray.aabb_ray_intersection, rays_o, rays_d, self.aabb)
        assert mask[0, 0] and near[0, 0] <= 1e-4 and abs(far[0, 0] - 1.0) < 1e-4

    def test_miss(self):
        rays_o = np.array([[-3.0, 5.0, 0.0]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        near, far, _, mask = np_wrapper(ray.aabb_ray_intersection, rays_o, rays_d, self.aabb)
        assert not mask[0, 0] and near[0, 0] == 0.0 and far[0, 0] == 0.0

    def test_parallel_inside_slab(self):
        rays_o = np.array([[-3.0, 0.5, 0.5]], dtype=np.float32)
        rays_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
        _, _, _, mask = np_wrapper(ray.aabb_ray_intersection, rays_o, rays_d, self.aabb)
        assert mask[0, 0]

    def test_brute_force_agreement(self):
        rng = np.random.default_rng(7)
        rays_o = rng.normal(size=(64, 3)).astype(np.float32) * 3
        rays_d = rng.normal(size=(64, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        near, far, _, mask = np_wrapper(ray.aabb_ray_intersection, rays_o, rays_d, self.aabb)
        # brute force: sample points along each ray, check bbox membership
        t = np.linspace(0, 12, 4000)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * t[None, :, None]
        inside = np.all((pts >= -1) & (pts <= 1), axis=-1)  # (64, T)
        hit_bf = inside.any(axis=1)
        assert np.mean(hit_bf == mask[:, 0]) > 0.97  # allow rare tangent-edge diff
        for i in range(64):
            if mask[i, 0] and hit_bf[i]:
                t_in = t[inside[i]]
                assert abs(near[i, 0] - t_in.min()) < 2e-2
                assert abs(far[i, 0] - t_in.max()) < 2e-2


def _sphere_sdf(pts, radius=1.0):
    import jax.numpy as jnp

    return jnp.linalg.norm(pts, axis=-1) - radius


class TestSurfaceIntersection:

    def setup_method(self):
        self.rays_o = np.array([[-3.0, 0.0, 0.0], [-3.0, 0.3, 0.0], [-3.0, 2.0, 0.0]], dtype=np.float32)
        self.rays_d = np.array([[1.0, 0.0, 0.0]] * 3, dtype=np.float32)

    def test_sphere_tracing(self):
        zvals, pts, mask = np_wrapper(
            lambda o, d: ray.sphere_tracing(o, d, _sphere_sdf, near=0.0, far=10.0), self.rays_o, self.rays_d
        )
        assert mask[0] and mask[1] and not mask[2]
        assert abs(zvals[0, 0] - 2.0) < 1e-2
        np.testing.assert_allclose(pts[0], [-1, 0, 0], atol=1e-2)
        expected_z1 = 3.0 - np.sqrt(1 - 0.3**2)
        assert abs(zvals[1, 0] - expected_z1) < 1e-2

    def test_secant(self):
        zvals, pts, mask = np_wrapper(
            lambda o, d: ray.secant_root_finding(o, d, _sphere_sdf, near=0.0, far=10.0, n_step=128, n_iter=20),
            self.rays_o,
            self.rays_d,
        )
        assert mask[0] and mask[1] and not mask[2]
        assert abs(zvals[0, 0] - 2.0) < 1e-3
        expected_z1 = 3.0 - np.sqrt(1 - 0.3**2)
        assert abs(zvals[1, 0] - expected_z1) < 1e-3

    def test_secant_descent_density(self):
        # density-style: inside > level, outside < level
        def density(pts):
            import jax.numpy as jnp

            return 10.0 * (1.0 - jnp.linalg.norm(pts, axis=-1))

        zvals, _, mask = np_wrapper(
            lambda o, d: ray.secant_root_finding(
                o, d, density, near=0.0, far=10.0, n_step=128, n_iter=20, level=0.0, grad_dir="descent"
            ),
            self.rays_o,
            self.rays_d,
        )
        assert mask[0] and abs(zvals[0, 0] - 2.0) < 1e-3
