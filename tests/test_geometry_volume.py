"""Volume tests (mirrors reference tests_geometry/tests_volume.py: index
conversions, interpolation, intersections vs brute force, bitfield ops)."""

import numpy as np

import jax.numpy as jnp

from arcnerf_tpu.geometry.volume import (
    Volume,
    convert_flatten_index_to_xyz_index,
    convert_xyz_index_to_flatten_index,
)


def make_volume(n_grid=4, side=2.0):
    return Volume(n_grid=n_grid, origin=(0, 0, 0), side=side)


def test_basic_geometry():
    vol = make_volume()
    assert vol.get_n_voxel() == 64
    assert vol.get_n_grid_pts() == 125
    np.testing.assert_allclose(np.asarray(vol.get_range()), [[-1, 1]] * 3, atol=1e-6)
    assert vol.get_voxel_size() == (0.5, 0.5, 0.5)
    assert vol.get_corner().shape == (8, 3)
    assert vol.get_grid_pts().shape == (125, 3)
    assert vol.get_volume_pts().shape == (64, 3)
    assert abs(vol.get_diag_len() - 2 * np.sqrt(3)) < 1e-6


def test_index_round_trip():
    n = 5
    xyz = jnp.asarray(np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"), -1).reshape(-1, 3))
    flat = convert_xyz_index_to_flatten_index(xyz, n)
    assert flat.shape == (n**3,)
    np.testing.assert_array_equal(np.asarray(flat), np.arange(n**3))
    back = convert_flatten_index_to_xyz_index(flat, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xyz))


def test_voxel_idx_from_xyz():
    vol = make_volume()
    pts = jnp.asarray([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9], [0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], dtype=jnp.float32)
    idx, valid = vol.get_voxel_idx_from_xyz(pts)
    np.testing.assert_array_equal(np.asarray(valid), [True, True, True, False])
    np.testing.assert_array_equal(np.asarray(idx[0]), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(idx[1]), [3, 3, 3])
    np.testing.assert_array_equal(np.asarray(idx[3]), [-1, -1, -1])


def test_voxel_center_and_corners():
    vol = make_volume()
    idx = jnp.asarray([[0, 0, 0], [3, 3, 3]], dtype=jnp.int32)
    centers = np.asarray(vol.get_voxel_pts_by_voxel_idx(idx))
    np.testing.assert_allclose(centers[0], [-0.75] * 3, atol=1e-6)
    np.testing.assert_allclose(centers[1], [0.75] * 3, atol=1e-6)
    corners = np.asarray(vol.get_grid_pts_by_voxel_idx(idx))
    assert corners.shape == (2, 8, 3)
    np.testing.assert_allclose(corners[0, 0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(corners[0, -1], [-0.5, -0.5, -0.5], atol=1e-6)


def test_trilinear_interpolation_linear_field():
    """Trilinear interpolation must exactly reproduce a linear function."""
    vol = make_volume(n_grid=4)
    grid_pts = vol.get_grid_pts()  # ((n+1)^3, 3)
    values = 2.0 * grid_pts[:, 0] + 3.0 * grid_pts[:, 1] - grid_pts[:, 2] + 0.5  # linear field

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-0.99, 0.99, size=(64, 3)).astype(np.float32))
    voxel_idx, valid, grid_pts_idx, gp, weights = vol.get_voxel_grid_info_from_xyz(pts)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(jnp.sum(weights, -1)), 1.0, atol=1e-5)

    interp = vol.interpolate(values, weights, voxel_idx)
    expected = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] - pts[:, 2] + 0.5
    np.testing.assert_allclose(np.asarray(interp), np.asarray(expected), atol=1e-4)


def test_ray_volume_intersection():
    vol = make_volume()
    rays_o = jnp.asarray([[-3.0, 0.0, 0.0], [-3.0, 5.0, 0.0]], dtype=jnp.float32)
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], dtype=jnp.float32)
    near, far, pts, mask = vol.ray_volume_intersection(rays_o, rays_d)
    assert bool(mask[0, 0]) and not bool(mask[1, 0])
    assert abs(float(near[0, 0]) - 2.0) < 1e-4 and abs(float(far[0, 0]) - 4.0) < 1e-4


def test_bitfield_ops():
    vol = make_volume()
    bf = vol.create_bitfield(init_occ=False)
    assert not bool(jnp.any(bf))
    idx = jnp.asarray([[0, 0, 0], [1, 2, 3]], dtype=jnp.int32)
    bf = vol.update_bitfield_by_voxel_idx(bf, idx, occ=True)
    assert int(vol.get_n_occupied_voxel(bf)) == 2
    assert bool(bf[1, 2, 3])

    # occupied bounding range covers both voxels
    rng_occ = np.asarray(vol.get_occupied_bounding_range(bf))
    np.testing.assert_allclose(rng_occ[0], [-1.0, 0.0], atol=1e-5)  # x: voxels 0..1
    np.testing.assert_allclose(rng_occ[2], [-1.0, 1.0], atol=1e-5)  # z: voxels 0..3

    pts = jnp.asarray([[-0.9, -0.9, -0.9], [0.9, 0.9, 0.9], [-0.3, 0.3, 0.9]], dtype=jnp.float32)
    in_occ = vol.check_pts_in_occ_voxel(pts, bf)
    np.testing.assert_array_equal(np.asarray(in_occ), [True, False, True])

    # and/or/overwrite
    other = jnp.zeros_like(bf).at[0, 0, 0].set(True)
    assert int(jnp.sum(vol.update_bitfield(bf, other, "and"))) == 1
    assert int(jnp.sum(vol.update_bitfield(bf, other, "or"))) == 2
    assert int(jnp.sum(vol.update_bitfield(bf, other, "overwrite"))) == 1


def test_opafield_update_and_threshold():
    vol = make_volume()
    opa = vol.create_opafield()
    idx = jnp.asarray([[0, 0, 0], [1, 1, 1]], dtype=jnp.int32)
    opa = vol.update_opafield_by_voxel_idx(opa, idx, jnp.asarray([0.5, 0.002]))
    assert abs(float(opa[0, 0, 0]) - 0.5) < 1e-6
    # ema keeps max of decayed old and new
    opa = vol.update_opafield_by_voxel_idx(opa, idx, jnp.asarray([0.1, 0.001]), ema=0.9)
    assert abs(float(opa[0, 0, 0]) - 0.45) < 1e-6

    bf = vol.create_bitfield(init_occ=True)
    bf = vol.update_bitfield_by_opafield(bf, opa, threshold=0.01)
    assert bool(bf[0, 0, 0])
    assert not bool(bf[2, 2, 2])  # zero-opacity voxel culled


def test_ray_pass_through():
    vol = make_volume(n_grid=8)
    rays_o = jnp.asarray([[-3.0, 0.01, 0.01]], dtype=jnp.float32)
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]], dtype=jnp.float32)
    field = vol.get_ray_pass_through(rays_o, rays_d)
    assert field.shape == (8, 8, 8)
    # the ray crosses the middle row of voxels in x
    assert bool(jnp.all(field[:, 4, 4]))
    assert int(jnp.sum(field)) == 8
