"""Sphere surface math and camera-track line generators.

Capability parity with /root/reference/arcnerf/geometry/sphere.py
(uv_to_sphere_point:14, get_uv_from_pos:37, get_circle:61,
get_sphere_surface:94, get_regular_sphere_line:113, get_sphere_line:166,
get_spiral_line:198, get_swing_line:227, Sphere:281).

Path generators are host-side numpy (they build camera tracks, not hot
compute); the ray intersection rides the jnp geometry.ray implementation.
Convention: y is the up/down axis; u in (0, 2pi) azimuth, v in (0, pi) polar.
"""

import math

import numpy as np

from .ray import sphere_ray_intersection


def uv_to_sphere_point(u, v, radius, origin=(0, 0, 0)):
    """u (n,), v (n,) or scalar -> xyz (n, 3) on the sphere."""
    u = np.asarray(u)
    if np.ndim(v) == 0:
        v = np.full_like(u, float(v))
    x = radius * (np.cos(u) * np.sin(v)) + origin[0]
    y = radius * np.cos(v) + origin[1]
    z = radius * (np.sin(u) * np.sin(v)) + origin[2]
    return np.stack([x, y, z], axis=-1)


def get_uv_from_pos(pos, origin=(0.0, 0.0, 0.0), radius=None):
    """Inverse map: point -> (u in (0,1), v in (-1,1), radius)."""
    origin = np.asarray(origin, dtype=np.asarray(pos).dtype)
    if radius is None:
        radius = float(np.linalg.norm(pos - origin))
    v = np.arccos((pos[1] - origin[1]) / radius)
    u = np.arctan((pos[2] - origin[2]) / (pos[0] - origin[0]))
    if u < 0:
        u += 2 * np.pi
    return u / (2 * np.pi), 1 - (v * 2.0 / np.pi), radius


def _normalize_np(v):
    return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)


def get_circle(origin, radius, normal, n_pts=100, close=True):
    """Circle of given radius/normal around origin -> (n_pts, 3)."""
    u = np.linspace(0, 2 * np.pi, n_pts) if close else np.linspace(0, 2 * np.pi, n_pts + 1)[:n_pts]
    a = np.cross(normal, np.array([1.0, 0.0, 0.0]))
    if not np.any(a):
        a = np.cross(normal, np.array([0.0, 1.0, 0.0]))
    b = np.cross(normal, a)
    a, b = _normalize_np(a), _normalize_np(b)
    pts = radius * (a[None, :] * np.cos(u)[:, None] + b[None, :] * np.sin(u)[:, None])
    return pts + np.asarray(origin)[None, :]


def get_sphere_surface(radius, origin=(0, 0, 0), n_pts=100):
    """Meshgrid sphere surface -> x, y, z each (n_pts, n_pts)."""
    u = np.linspace(0, 2 * np.pi, n_pts)
    v = np.linspace(0, np.pi, n_pts)
    x = radius * np.outer(np.cos(u), np.sin(v)) + origin[0]
    y = radius * np.outer(np.ones_like(u), np.cos(v)) + origin[1]
    z = radius * np.outer(np.sin(u), np.sin(v)) + origin[2]
    return x, y, z


def _wrap_u(u):
    u = u.copy()
    u[u > 1.0] -= 1.0
    return u


def get_regular_sphere_line(radius, u_start=0, origin=(0, 0, 0), n_rot=3, n_pts=100, upper=None, close=True,
                            concat=True):
    """n_rot stacked circles at regular heights, top to bottom."""
    assert 0 <= u_start <= 1
    n_per = math.ceil(float(n_pts) / float(n_rot))
    u = np.linspace(0, 1, n_per) if close else np.linspace(0, 1, n_per + 1)[:n_per]
    u = _wrap_u(u + u_start) * 2 * np.pi
    u = np.concatenate([u] * n_rot)[:n_pts]

    if upper is None:
        v_levels = np.linspace(-1, 1, n_rot + 2)[1:-1]
    elif upper:
        v_levels = np.linspace(-1, 0, n_rot + 1)[1:]
    else:
        v_levels = np.linspace(1, 0, n_rot + 1)[1:]
    v_levels = (1 - v_levels) * np.pi / 2.0

    lines, count = [], 0
    for i in range(n_rot - 1):
        lines.append(uv_to_sphere_point(u[count:count + n_per], v_levels[i], radius, origin))
        count += n_per
    lines.append(uv_to_sphere_point(u[count:], v_levels[-1], radius, origin))
    return np.concatenate(lines, axis=0) if concat else lines


def get_sphere_line(radius, u_start=0, v_ratio=0, origin=(0, 0, 0), n_pts=100, close=True):
    """One horizontal circle at height ratio v_ratio -> (n_pts, 3)."""
    assert 0 <= u_start <= 1 and -1 <= v_ratio <= 1
    u = np.linspace(0, 1, n_pts) if close else np.linspace(0, 1, n_pts + 1)[:n_pts]
    u = _wrap_u(u + u_start) * 2 * np.pi
    v = (1 - v_ratio) * np.pi / 2.0
    return uv_to_sphere_point(u, v, radius, origin)


def get_spiral_line(radius, u_start=0, v_range=(-1, 0), origin=(0, 0, 0), n_rot=3, n_pts=100):
    """Spiral from v_range[0] to v_range[1] over n_rot turns -> (n_pts, 3)."""
    assert 0 <= u_start <= 1
    n_per = math.ceil(float(n_pts) / float(n_rot))
    u = np.linspace(0, 1, n_per + 1)[:n_per]
    u = _wrap_u(u + u_start) * 2 * np.pi
    u = np.concatenate([u] * n_rot)[:n_pts]
    v = np.linspace(1 - v_range[0], 1 - v_range[1], n_pts) * np.pi / 2.0
    return uv_to_sphere_point(u, v, radius, origin)


def get_swing_line(radius, u_range=(0, 0.5), v_range=(-1, 0), origin=(0, 0, 0), n_rot=3, n_pts=100, reverse=False):
    """Back-and-forth arc swing while descending in v -> (n_pts, 3)."""
    assert 0 <= u_range[0] <= u_range[1] <= 1
    n_half = math.floor(float(n_pts) / float(n_rot) / 2.0 + 1)
    if reverse:
        u = np.linspace(u_range[1], 1 + u_range[0], n_half)
        u = _wrap_u(u)
        u = np.concatenate([u, np.flip(u)[1:-1]])
    else:
        u = np.linspace(u_range[0], u_range[1], n_half)
        u = np.concatenate([u, np.flip(u)[1:-1]])
    u = u * 2 * np.pi
    u = np.concatenate([u] * (n_rot + 1))[:n_pts]
    v = np.linspace(1 - v_range[0], 1 - v_range[1], n_pts) * np.pi / 2.0
    return uv_to_sphere_point(u, v, radius, origin)


class Sphere:
    """Simple origin+radius sphere (reference sphere.py:281 Sphere module)."""

    def __init__(self, origin=(0, 0, 0), radius=1.0):
        self.set_params(origin, radius)

    def set_params(self, origin, radius):
        self.origin = tuple(float(o) for o in origin)
        self.radius = float(radius)

    def get_origin(self, in_tuple=False):
        return self.origin if in_tuple else np.asarray(self.origin)

    def get_radius(self, in_float=False):
        return self.radius if in_float else np.asarray([self.radius])

    def ray_sphere_intersection(self, rays_o, rays_d):
        """(N_rays, 3) x2 -> near/far (N_rays, 1), pts (N_rays, 2, 3), mask (N_rays, 1)."""
        near, far, pts, mask = sphere_ray_intersection(rays_o, rays_d, self.radius, self.origin)
        return near, far, pts[:, 0], mask
