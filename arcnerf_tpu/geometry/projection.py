"""Pixel <-> camera <-> world projection chains in jnp.

Capability parity with /root/reference/arcnerf/geometry/projection.py:
pixel_to_cam:8, cam_to_world:37, pixel_to_world:52, world_to_cam:68,
cam_to_pixel:81, world_to_pixel:100, apply_distortion:122.
Convention: x right / y down camera coords, pixels are (x, y).
"""

import jax.numpy as jnp

from .transformation import rotate_points


def pixel_to_cam(pixels, z, intrinsic):
    """Lift pixels to camera space at depth z.

    pixels (B, N, 2), z (B, N), intrinsic (B, 3, 3) -> (B, N, 3).
    Handles intrinsic skew ``s = K[0, 1]``.
    """
    fx = intrinsic[..., 0, 0][..., None]
    fy = intrinsic[..., 1, 1][..., None]
    cx = intrinsic[..., 0, 2][..., None]
    cy = intrinsic[..., 1, 2][..., None]
    s = intrinsic[..., 0, 1][..., None]
    i = pixels[..., 0]
    j = pixels[..., 1]
    x_cam = (i - (s * (j - cy) / fy) - cx) / fx * z
    y_cam = (j - cy) / fy * z
    return jnp.stack([x_cam, y_cam, z], axis=-1)


def cam_to_world(points, c2w):
    """(B, N, 3) x (B, 4, 4) -> (B, N, 3)."""
    return rotate_points(points, c2w)


def pixel_to_world(pixels, z, intrinsic, c2w):
    return cam_to_world(pixel_to_cam(pixels, z, intrinsic), c2w)


def world_to_cam(points, w2c):
    return rotate_points(points, w2c)


def cam_to_pixel(points, intrinsic):
    """Project camera-space points to pixels. (B, N, 3) -> (B, N, 2)."""
    proj = jnp.einsum("bki,bji->bjk", intrinsic, points, precision="highest")
    return proj[..., :2] / (proj[..., 2:3] + 1e-8)


def world_to_pixel(points, intrinsic, w2c, distort=None):
    xyz_cam = world_to_cam(points, w2c)
    if distort is not None:
        xyz_cam = apply_distortion(xyz_cam, distort[0], distort[1])
    return cam_to_pixel(xyz_cam, intrinsic)


def apply_distortion(points, radial, tan):
    """Radial + tangential lens distortion in camera space.

    points (B, N, 3), radial (B, 3), tan (B, 2).
    """
    norm = jnp.clip(points[..., :2] / points[..., 2:], -1.0, 1.0)
    r2 = jnp.sum(norm**2, axis=-1, keepdims=True)
    radial_dist = 1.0 + jnp.sum(
        radial[:, None, :] * jnp.concatenate([r2, r2**2, r2**3], axis=-1), axis=-1, keepdims=True
    )
    tan_norm = jnp.sum(tan[:, None, :] * norm, axis=-1, keepdims=True)
    xy = points[..., :2] + points[..., 2:] * (tan[:, None, :] * r2) / (radial_dist + tan_norm)
    z = points[..., 2:] / (radial_dist + tan_norm)
    return jnp.concatenate([xy, z], axis=-1)
