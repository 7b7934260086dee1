"""Tests for transformation / projection / poses (round-trip style like the
reference tests_geometry/tests_projection.py)."""

import numpy as np

from arcnerf_tpu.geometry import poses, projection, transformation
from arcnerf_tpu.utils.chunk import np_wrapper


def test_normalize():
    v = np.array([[3.0, 0.0, 0.0], [0.0, 0.0, 5.0]], dtype=np.float32)
    out = np_wrapper(transformation.normalize, v)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_rotation_round_trips():
    rng = np.random.default_rng(0)
    aa = rng.normal(size=(8, 3)).astype(np.float32) * 0.7
    mat = np_wrapper(transformation.axis_angle_to_matrix, aa)
    # valid rotation: orthonormal, det 1
    eye = np.einsum("bij,bkj->bik", mat, mat)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mat), 1.0, atol=1e-5)
    # round trip through quaternion + axis-angle
    aa_back = np_wrapper(transformation.matrix_to_axis_angle, mat)
    np.testing.assert_allclose(aa_back, aa, atol=1e-4)
    # 6d round trip
    d6 = np_wrapper(transformation.matrix_to_rotation_6d, mat)
    mat_back = np_wrapper(transformation.rotation_6d_to_matrix, d6)
    np.testing.assert_allclose(mat_back, mat, atol=1e-5)


def test_quaternion_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    aa = rng.normal(size=(4, 3)).astype(np.float32)
    mat = np_wrapper(transformation.axis_angle_to_matrix, aa)
    q = np_wrapper(transformation.matrix_to_quaternion, mat)
    v = rng.normal(size=(4, 3)).astype(np.float32)
    out_q = np_wrapper(transformation.qrot, q, v)
    out_m = np.einsum("bij,bj->bi", mat, v)
    np.testing.assert_allclose(out_q, out_m, atol=1e-4)


def test_get_rotate_matrix_from_vec():
    a = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], dtype=np.float32)
    b = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]], dtype=np.float32)
    mat = np_wrapper(transformation.get_rotate_matrix_from_vec, a, b)
    rotated = np.einsum("bij,bj->bi", mat, a)
    np.testing.assert_allclose(rotated[0], b[0], atol=1e-5)
    np.testing.assert_allclose(mat[1], np.eye(3), atol=1e-5)  # parallel -> identity
    np.testing.assert_allclose(rotated[2], b[2], atol=1e-5)  # antiparallel


def test_projection_round_trip():
    intrinsic = np.array([[[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]]], dtype=np.float32)
    c2w = poses.look_at(np.array([0.0, 0.0, -4.0]), np.zeros(3))[None].astype(np.float32)
    w2c = poses.invert_poses(c2w).astype(np.float32)

    pixels = np.array([[[100.0, 120.0], [320.0, 240.0], [600.0, 400.0]]], dtype=np.float32)
    z = np.full((1, 3), 2.5, dtype=np.float32)
    xyz_w = np_wrapper(projection.pixel_to_world, pixels, z, intrinsic, c2w)
    pixels_back = np_wrapper(projection.world_to_pixel, xyz_w, intrinsic, w2c)
    np.testing.assert_allclose(pixels_back, pixels, atol=1e-2)


def test_look_at_and_view_matrix():
    cam_loc = np.array([0.0, 0.0, -4.0])
    c2w = poses.look_at(cam_loc, np.zeros(3))
    np.testing.assert_allclose(c2w[:3, 3], cam_loc, atol=1e-6)
    # forward (z col) points at origin
    np.testing.assert_allclose(c2w[:3, 2], [0, 0, 1], atol=1e-6)
    # orthonormal
    r = c2w[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_average_and_center_poses():
    c2ws = poses.generate_cam_pose_on_sphere("circle", radius=3.0, n_cam=8)
    assert c2ws.shape == (8, 4, 4)
    # all cams at radius 3 looking at origin
    np.testing.assert_allclose(np.linalg.norm(c2ws[:, :3, 3], axis=-1), 3.0, atol=1e-5)
    avg = poses.average_poses(c2ws)
    assert avg.shape == (4, 4)
    centered = poses.center_poses(c2ws.copy())
    assert centered.shape == (8, 4, 4)


def test_invert_poses():
    c2w = poses.look_at(np.array([1.0, 2.0, 3.0]), np.zeros(3))[None]
    w2c = poses.invert_poses(c2w)
    np.testing.assert_allclose(np.matmul(c2w, w2c)[0], np.eye(4), atol=1e-6)


def test_sphere_pose_modes():
    for mode in ["random", "regular", "circle", "spiral", "swing"]:
        c2ws = poses.generate_cam_pose_on_sphere(mode, radius=2.0, n_cam=12)
        assert c2ws.shape == (12, 4, 4)
        np.testing.assert_allclose(np.linalg.norm(c2ws[:, :3, 3], axis=-1), 2.0, atol=1e-4)
