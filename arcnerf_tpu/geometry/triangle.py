"""Triangle helpers (reference arcnerf/geometry/triangle.py).

Host-side numpy: normals, circumcircle (used by camera-path generation).
"""

import numpy as np

from .sphere import get_circle


def get_tri_normal(verts, normalize=True):
    """verts (3, 3) -> normal (3,)."""
    n = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    if normalize:
        n = n / (np.linalg.norm(n) + 1e-8)
    return n


def get_tri_circumcenter(verts):
    """Circumcenter of a 3d triangle. verts (3, 3) -> center (3,)."""
    a, b, c = verts[0], verts[1], verts[2]
    ab, ac = b - a, c - a
    ab2, ac2 = np.dot(ab, ab), np.dot(ac, ac)
    n = np.cross(ab, ac)
    to_center = (np.cross(n, ab) * ac2 + np.cross(ac, n) * ab2) / (2.0 * np.dot(n, n) + 1e-12)
    return a + to_center


def circumcircle_from_triangle(verts, n_pts=100, close=True):
    """verts (3, 3) -> origin (3,), radius, normal (3,), circle (n_pts, 3)."""
    origin = get_tri_circumcenter(verts)
    radius = float(np.linalg.norm(verts[0] - origin))
    normal = get_tri_normal(verts)
    if normal[1] < 0:  # keep normal pointing to y+ for camera-up consistency
        normal = -normal
    circle = get_circle(origin, radius, normal, n_pts=n_pts, close=close)
    return origin, radius, normal, circle
