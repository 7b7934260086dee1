"""Camera pose utilities: averaging, centering, look-at, path generation.

Capability parity with /root/reference/arcnerf/geometry/poses.py
(invert_poses:12, center_poses:27, average_poses:100, view_matrix:135,
look_at:160, generate_cam_pose_on_sphere:177,
generate_cam_pose_from_tri_circle:261). Host-side numpy — poses are tiny
and generated once per run.

Convention: c2w with columns (x, y, z, t); y is up; camera looks along +z.
"""

import numpy as np

from .sphere import (
    get_regular_sphere_line,
    get_sphere_line,
    get_spiral_line,
    get_swing_line,
    uv_to_sphere_point,
)
from .triangle import circumcircle_from_triangle


def _normalize(v):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)


def invert_poses(poses):
    """c2w <-> w2c. (N, 4, 4) -> (N, 4, 4)."""
    return np.linalg.inv(np.asarray(poses).copy())


def average_poses(poses):
    """Average c2w pose with z-forward orthogonalization. (N, 4, 4) -> (4, 4)."""
    p = np.asarray(poses)[:, :3, :]
    center = p[..., 3].mean(0)
    z = _normalize(p[..., 2].mean(0))
    y_ = p[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    avg = np.stack([x, y, z, center], axis=1)
    return np.concatenate([avg, np.array([[0.0, 0.0, 0.0, 1.0]], dtype=avg.dtype)], axis=0)


def average_poses_up(poses):
    """Average pose orthogonalized around the up (y) axis. (N, 4, 4) -> (4, 4)."""
    p = np.asarray(poses)[:, :3, :]
    center = p[..., 3].mean(0)
    y = _normalize(p[..., 1].mean(0))
    z_ = p[..., 2].mean(0)
    x = _normalize(np.cross(y, z_))
    z = np.cross(x, y)
    avg = np.stack([x, y, z, center], axis=1)
    return np.concatenate([avg, np.array([[0.0, 0.0, 0.0, 1.0]], dtype=avg.dtype)], axis=0)


def center_poses(poses, center_loc=None):
    """Re-center all poses around the average pose (or given location)."""
    poses = np.asarray(poses).copy()
    if center_loc is None:
        up = _normalize(poses[:, :3, 1].mean(0))
        pose_avg = average_poses(poses)
        out = poses.copy()
        out[:, :3, 3] -= pose_avg[:3, 3]
        for i in range(poses.shape[0]):
            out[i, :3, :3] = look_at(poses[i, :3, 3], pose_avg[:3, 3], up)[:3, :3]
        return out
    poses[:, :3, 3] -= np.asarray(center_loc)
    return poses


def view_matrix(forward, cam_loc, up=np.array([0.0, 1.0, 0.0])):
    """c2w from forward dir + camera location. All np(3,) -> np(4, 4)."""
    rot_z = _normalize(forward)
    rot_x = _normalize(np.cross(up, rot_z))
    rot_y = _normalize(np.cross(rot_z, rot_x))
    mat = np.stack([rot_x, rot_y, rot_z, cam_loc], axis=-1)
    return np.concatenate([mat, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=-2)


def look_at(cam_loc, point, up=np.array([0.0, 1.0, 0.0])):
    """c2w placing the camera at cam_loc looking at point."""
    return view_matrix(_normalize(np.asarray(point) - np.asarray(cam_loc)), np.asarray(cam_loc), up)


def generate_cam_pose_on_sphere(
    mode,
    radius,
    n_cam,
    u_start=0,
    u_range=(0, 0.5),
    v_ratio=0,
    v_range=(1, 0),
    n_rot=3,
    reverse=False,
    upper=None,
    close=False,
    origin=(0, 0, 0),
    normal=(0.0, 1.0, 0.0),
    look_at_point=np.array([0.0, 0.0, 0.0]),
    rng=None,
):
    """Camera c2w poses on a sphere track, looking at a point.

    mode in {random, regular, circle, spiral, swing}. Returns (n_cam, 4, 4).
    """
    if mode == "random":
        rng = rng or np.random.default_rng(0)
        u = rng.random(n_cam) * np.pi * 2
        v = rng.random(n_cam) * np.pi
        xyz = uv_to_sphere_point(u, v, radius, origin)
    elif mode == "regular":
        xyz = get_regular_sphere_line(radius, u_start, origin, n_rot, n_pts=n_cam, upper=upper, close=close)
    elif mode == "circle":
        xyz = get_sphere_line(radius, u_start, v_ratio, origin, n_pts=n_cam, close=close)
    elif mode == "spiral":
        xyz = get_spiral_line(radius, u_start, v_range, origin, n_rot, n_pts=n_cam)
    elif mode == "swing":
        xyz = get_swing_line(radius, u_range, v_range, origin, n_rot, n_pts=n_cam, reverse=reverse)
    else:
        raise NotImplementedError("cam generation mode {} not supported".format(mode))

    # rotate positions from y-up to the requested normal
    normal = np.asarray(normal, dtype=np.float64)
    up = np.array([0.0, 1.0, 0.0])
    if not np.allclose(_normalize(normal), up):
        from .transformation import get_rotate_matrix_from_vec, rotate_points
        from ..utils.chunk import np_wrapper

        rot = np_wrapper(get_rotate_matrix_from_vec, up[None].astype(np.float32), normal[None].astype(np.float32))
        offset = np.asarray(origin, dtype=xyz.dtype)[None]
        xyz = xyz - offset
        xyz = np_wrapper(rotate_points, xyz[:, None, :].astype(np.float32), rot, True)[:, 0, :]
        xyz = xyz + offset

    return np.stack([look_at(xyz[i], look_at_point) for i in range(xyz.shape[0])], axis=0)


def generate_cam_pose_from_tri_circle(verts, n_cam, close=True):
    """Poses on the circumcircle of a triangle, looking at its center.

    Returns c2w (n_cam, 4, 4), origin (3,), radius.
    """
    origin, radius, normal, circle = circumcircle_from_triangle(verts, n_cam, close)
    poses = np.stack([look_at(circle[i], origin, up=normal) for i in range(circle.shape[0])], axis=0)
    return poses, origin, radius
