"""Rotation / transformation math in jnp.

Capability parity with /root/reference/arcnerf/geometry/transformation.py
(normalize:11, rotate_points:44, rotate_matrix:62, rotation conversions,
quaternions) — implemented fresh for jax; all functions work on jnp or
numpy inputs and are jit/vmap-safe.
"""

import jax.numpy as jnp


def normalize(vec, eps=1e-8):
    """Normalize last dim. (..., 3) -> (..., 3)."""
    return vec / (jnp.linalg.norm(vec, axis=-1, keepdims=True) + eps)


def batch_dot_product(a, b):
    """(B, v) x (B, v) -> (B,)."""
    return jnp.sum(a * b, axis=-1)


def rotate_points(points, mat, rotate_only=False):
    """Apply a 4x4 (or 3x3 with rotate_only) transform to points.

    points: (B, N, 3); mat: (B, 4, 4) or (B, 3, 3). Returns (B, N, 3).
    """
    out = jnp.einsum("bki,bji->bjk", mat[:, :3, :3], points, precision="highest")
    if not rotate_only:
        out = out + mat[:, None, :3, 3]
    return out


def rotate_matrix(rot, source):
    """(B, k, i) @ (B, i, j) -> (B, k, j)."""
    return jnp.einsum("bki,bij->bkj", rot, source, precision="highest")


def get_rotate_matrix_from_vec(vec_a, vec_b, eps=1e-5):
    """Rotation matrices taking each vec_a to vec_b. (B, 3) x (B, 3) -> (B, 3, 3).

    Handles parallel (identity) and anti-parallel (-identity) cases with
    jnp.where instead of boolean indexing.
    """
    a = normalize(vec_a)
    b = normalize(vec_b)
    dot = batch_dot_product(a, b)
    parallel = jnp.abs(dot - 1.0) < eps
    antiparallel = jnp.abs(dot + 1.0) < eps
    valid = ~(parallel | antiparallel)

    n = normalize(jnp.cross(a, b))
    # orthonormal frames with the basis vectors as COLUMNS so that
    # R @ a = b, R @ cross(n, a) = cross(n, b), R @ n = n
    base_a = jnp.stack([a, jnp.cross(n, a), n], axis=-1)  # (B, 3, 3)
    base_b = jnp.stack([b, jnp.cross(n, b), n], axis=-1)
    # guard the inverse for degenerate rows
    safe_base_a = jnp.where(valid[:, None, None], base_a, jnp.eye(3))
    mat_valid = jnp.matmul(base_b, jnp.linalg.inv(safe_base_a), precision="highest")

    eye = jnp.broadcast_to(jnp.eye(3, dtype=vec_a.dtype), mat_valid.shape)
    mat = jnp.where(valid[:, None, None], mat_valid, eye)
    mat = jnp.where(antiparallel[:, None, None], -eye, mat)
    return mat


def skew_symmetric(v):
    """(B, 3) -> (B, 3, 3) skew matrices."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_matrix(axis_angle):
    """Rodrigues formula. (..., 3) -> (..., 3, 3)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, 1e-12)
    k = skew_symmetric(axis)
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    return eye + s * k + (1.0 - c) * jnp.matmul(k, k, precision="highest")


def matrix_to_axis_angle(mat):
    """(..., 3, 3) -> (..., 3). Inverse Rodrigues via quaternion path."""
    return quaternion_to_axis_angle(matrix_to_quaternion(mat))


def matrix_to_quaternion(m):
    """(..., 3, 3) -> (..., 4) wxyz, branch-free Shepperd method."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    # four candidate formulations; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2.0
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2])) / 2.0
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2])) / 2.0
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2])) / 2.0
    qx = jnp.copysign(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = jnp.copysign(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = jnp.copysign(qz, m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_matrix(q):
    """(..., 4) wxyz -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def quaternion_to_axis_angle(q):
    """(..., 4) wxyz -> (..., 3)."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    axis = q[..., 1:] / s[..., None]
    return jnp.where(angle[..., None] < 1e-6, q[..., 1:] * 2.0, axis * angle[..., None])


def matrix_to_rotation_6d(mat):
    """(..., 3, 3) -> (..., 6): first two rows flattened."""
    return mat[..., :2, :].reshape(mat.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6):
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al.)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def axis_angle_to_rot_6d(axis_angle):
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rot_6d_to_axis_angle(rot_6d):
    return matrix_to_axis_angle(rotation_6d_to_matrix(rot_6d))


def qinverse(q):
    """Conjugate of unit quaternion, (..., 4) wxyz."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def qrot(q, v):
    """Rotate vectors v by quaternions q. (..., 4) x (..., 3) -> (..., 3)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)
