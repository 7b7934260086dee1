"""Ray geometry in jnp: points on rays, closest points, sphere/aabb
intersection, sphere tracing, secant root finding.

Capability parity with /root/reference/arcnerf/geometry/ray.py
(get_ray_points_by_zvals:11, closest_point_on_ray:33,
closest_point_to_rays:61, closest_point_to_two_rays:106,
sphere_ray_intersection:180, aabb_ray_intersection:258,
surface_ray_intersection:353, sphere_tracing:403, secant_root_finding:470).

TPU-first differences: iterative routines use ``lax.fori_loop`` with masks
(no data-dependent early exit), and closest-point-to-N-rays is a closed-form
3x3 least-squares solve instead of the reference's Adam optimization loop.
"""

import jax
import jax.numpy as jnp

from .transformation import batch_dot_product

_ZERO_EPS = 1e-6  # snap tiny values to zero like reference set_tensor_to_zeros


def _set_small_to_zero(x, eps=_ZERO_EPS):
    return jnp.where(jnp.abs(x) < eps, jnp.zeros_like(x), x)


def get_ray_points_by_zvals(rays_o, rays_d, zvals):
    """(N_rays, 3), (N_rays, 3), (N_rays, N_pts) -> (N_rays, N_pts, 3)."""
    return rays_o[:, None, :] + rays_d[:, None, :] * zvals[..., None]


def closest_point_on_ray(rays_o, rays_d, pts):
    """For every (ray, point) pair, the closest point on the ray (clamped to
    the ray's positive side).

    rays (N_rays, 3), pts (N_pts, 3) -> pts_closest (N_rays, N_pts, 3),
    zvals (N_rays, N_pts).
    """
    ca = pts[None, :, :] - rays_o[:, None, :]  # (N_rays, N_pts, 3)
    zvals = jnp.einsum("rpc,rc->rp", ca, rays_d, precision="highest")
    zvals = zvals / jnp.sum(rays_d * rays_d, axis=-1, keepdims=True)
    zvals = jnp.maximum(zvals, 0.0)
    return get_ray_points_by_zvals(rays_o, rays_d, zvals), zvals


def closest_point_to_rays(rays_o, rays_d):
    """Single point minimizing summed squared distance to all rays.

    Closed-form: sum_i (I - d_i d_i^T) (p - o_i) = 0 -> 3x3 solve.
    Returns pts (1, 3), distance (N_rays,), zvals (N_rays, 1).
    """
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    eye = jnp.eye(3, dtype=rays_o.dtype)
    proj = eye[None] - d[:, :, None] * d[:, None, :]  # (N, 3, 3)
    a = jnp.sum(proj, axis=0)
    b = jnp.sum(jnp.einsum("nij,nj->ni", proj, rays_o, precision="highest"), axis=0)
    pts = jnp.linalg.solve(a + 1e-8 * eye, b)[None, :]  # (1, 3)
    pts_on, zvals = closest_point_on_ray(rays_o, rays_d, pts)  # (N, 1, 3), (N, 1)
    distance = jnp.linalg.norm(pts_on[:, 0, :] - pts, axis=-1)
    return pts, distance, zvals


def closest_point_to_two_rays(rays_o, rays_d):
    """Midpoint of the shortest segment between two rays.

    rays (2, 3) -> pts (1, 3), distance scalar, zvals (2, 1). Degenerate
    (parallel / behind-origin) cases fall back to origin projections.
    """
    r1_o, r1_d = rays_o[0], rays_d[0]
    r2_o, r2_d = rays_o[1], rays_d[1]
    dd = jnp.dot(r1_d, r2_d)
    denom = 1.0 - dd**2
    safe_denom = jnp.where(jnp.abs(denom) < 1e-10, 1.0, denom)
    z1 = (jnp.dot(r2_o - r1_o, r1_d) + dd * jnp.dot(r1_o - r2_o, r2_d)) / safe_denom
    z2 = (jnp.dot(r1_o - r2_o, r2_d) + dd * jnp.dot(r2_o - r1_o, r1_d)) / safe_denom
    bad = (jnp.abs(denom) < 1e-10) | jnp.isnan(z1) | jnp.isnan(z2) | (z1 < 0) | (z2 < 0)

    zvals = jnp.stack([z1, z2])[:, None]  # (2, 1)
    p = get_ray_points_by_zvals(rays_o, rays_d, zvals)[:, 0, :]  # (2, 3)
    dist_main = jnp.linalg.norm(p[0] - p[1])
    pts_main = 0.5 * (p[0] + p[1])

    # fallback: project each origin on the other ray, keep the closer side
    r1o_on_r2, z_r2 = closest_point_on_ray(rays_o[1:2], rays_d[1:2], rays_o[0:1])
    r2o_on_r1, z_r1 = closest_point_on_ray(rays_o[0:1], rays_d[0:1], rays_o[1:2])
    d1 = jnp.linalg.norm(r1_o - r1o_on_r2[0, 0])
    d2 = jnp.linalg.norm(r2_o - r2o_on_r1[0, 0])
    use1 = d1 < d2
    dist_fb = jnp.where(use1, d1, d2)
    pts_fb = jnp.where(use1, 0.5 * (rays_o[0] + r1o_on_r2[0, 0]), 0.5 * (rays_o[1] + r2o_on_r1[0, 0]))
    zvals_fb = jnp.where(
        use1,
        jnp.stack([jnp.zeros_like(z_r2[0]), z_r2[0]]),
        jnp.stack([z_r1[0], jnp.zeros_like(z_r1[0])]),
    )

    pts = jnp.where(bad, pts_fb, pts_main)[None, :]
    distance = jnp.where(bad, dist_fb, dist_main)
    zvals = jnp.where(bad, zvals_fb, zvals)
    return pts, distance, zvals


def closest_distance_of_two_rays(rays_o, rays_d):
    """Shortest distance between two skew lines. rays (2, 3) -> scalar."""
    n = jnp.cross(rays_d[0], rays_d[1])
    return jnp.abs(jnp.dot(n, rays_o[0] - rays_o[1])) / jnp.linalg.norm(n)


def sphere_ray_intersection(rays_o, rays_d, radius, origin=(0.0, 0.0, 0.0)):
    """Ray/sphere near-far intersection.

    rays (N_rays, 3); radius scalar or (N_r,); one shared origin.
    Returns near (N_rays, N_r), far (N_rays, N_r), pts (N_rays, N_r, 2, 3),
    mask (N_rays, N_r). Near/far clamped to >= 0 (origin inside handled);
    misses give near = far = 0 and mask False.
    """
    radius = jnp.atleast_1d(jnp.asarray(radius, dtype=rays_o.dtype))
    n_r = radius.shape[0]
    c = jnp.asarray(origin, dtype=rays_o.dtype)

    oc = c[None, :] - rays_o  # (N_rays, 3)
    z_half = _set_small_to_zero(batch_dot_product(oc, rays_d))[:, None]  # (N_rays, 1)
    inside = (jnp.linalg.norm(oc, axis=-1, keepdims=True) <= radius[None, :])  # (N_rays, N_r)
    mask = (z_half > 0) | inside
    d2 = _set_small_to_zero(jnp.sum(oc * oc, axis=-1, keepdims=True) - z_half**2)  # (N_rays, 1)
    mask = mask & (d2 >= 0)
    z_offset2 = _set_small_to_zero(radius[None, :] ** 2 - d2)  # (N_rays, N_r)
    mask = mask & (z_offset2 >= 0)
    z_offset = jnp.sqrt(jnp.maximum(z_offset2, 0.0))

    near = jnp.maximum(z_half - z_offset, 0.0)
    far = jnp.maximum(z_half + z_offset, 0.0)
    near = jnp.where(mask, near, 0.0)
    far = jnp.where(mask, far, 0.0)

    zvals = jnp.stack([near, far], axis=-1)  # (N_rays, N_r, 2)
    pts = rays_o[:, None, None, :] + rays_d[:, None, None, :] * zvals[..., None]  # (N_rays, N_r, 2, 3)
    return near, far, pts, mask


def aabb_ray_intersection(rays_o, rays_d, aabb_range, eps=1e-7):
    """Ray/AABB slab-test intersection against N_v boxes.

    rays (N_rays, 3); aabb_range (N_v, 3, 2) xyz min/max.
    Returns near/far (N_rays, N_v), pts (N_rays, N_v, 2, 3), mask (N_rays, N_v).
    Matches the reference contract: clamped >= 0, plus/minus eps inset on hits,
    zeros on miss.
    """
    mn = aabb_range[None, :, :, 0]  # (1, N_v, 3)
    mx = aabb_range[None, :, :, 1]
    o = rays_o[:, None, :]  # (N_rays, 1, 3)
    d = rays_d[:, None, :]

    parallel = jnp.abs(d) < eps
    out_slab = (o < mn) | (o > mx)
    miss_parallel = jnp.any(parallel & out_slab, axis=-1)  # (N_rays, N_v)

    safe_d = jnp.where(parallel, jnp.ones_like(d), d)
    t1 = (mn - o) / safe_d
    t2 = (mx - o) / safe_d
    t_near = jnp.where(parallel, -jnp.inf, jnp.minimum(t1, t2))
    t_far = jnp.where(parallel, jnp.inf, jnp.maximum(t1, t2))
    near_raw = jnp.max(t_near, axis=-1)  # (N_rays, N_v)
    far_raw = jnp.min(t_far, axis=-1)
    near = jnp.maximum(near_raw, 0.0)
    far = jnp.maximum(far_raw, 0.0)

    mask = (~miss_parallel) & (near_raw <= far_raw) & (far_raw >= 0)
    near = jnp.where(mask, near + eps, 0.0)
    far = jnp.where(mask, far - eps, 0.0)

    zvals = jnp.stack([near, far], axis=-1)  # (N_rays, N_v, 2)
    pts = rays_o[:, None, None, :] + rays_d[:, None, None, :] * zvals[..., None]
    return near, far, pts, mask


def surface_ray_intersection(
    rays_o,
    rays_d,
    geo_func,
    method="sphere_tracing",
    near=0.0,
    far=10.0,
    n_step=128,
    n_iter=100,
    threshold=1e-3,
    level=0.0,
    grad_dir="ascent",
):
    """Dispatch to sphere tracing or secant root finding (reference ray.py:353)."""
    if method == "sphere_tracing":
        return sphere_tracing(rays_o, rays_d, geo_func, near, far, n_iter, threshold)
    if method == "secant_root_finding":
        return secant_root_finding(rays_o, rays_d, geo_func, near, far, n_step, n_iter, threshold, level, grad_dir)
    raise NotImplementedError("method {} not supported".format(method))


def _broadcast_near_far(val, n_rays, dtype):
    arr = jnp.asarray(val, dtype=dtype)
    if arr.ndim == 0:
        arr = jnp.full((n_rays, 1), arr)
    return arr.reshape(n_rays, 1)


def sphere_tracing(rays_o, rays_d, sdf_func, near=0.0, far=10.0, n_iter=100, threshold=1e-3):
    """Sphere tracing with a fixed trip count and convergence masks.

    Returns zvals (N_rays, 1), pts (N_rays, 3), mask (N_rays,).
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    _near = _broadcast_near_far(near, n_rays, dtype)
    _far = _broadcast_near_far(far, n_rays, dtype)

    def body(_, state):
        zvals, mask, converged = state
        pts = rays_o + rays_d * zvals  # (N_rays, 3)
        sdf = sdf_func(pts)  # (N_rays,)
        new_converged = converged | (jnp.abs(sdf) < threshold)
        step_mask = (~new_converged) & mask
        zvals = jnp.where(step_mask[:, None], zvals + sdf[:, None], zvals)
        mask = mask & (zvals[:, 0] <= _far[:, 0]) & (zvals[:, 0] >= _near[:, 0])
        return zvals, mask, new_converged

    zvals0 = jnp.broadcast_to(_near, (n_rays, 1)).astype(dtype)
    mask0 = jnp.ones((n_rays,), dtype=bool)
    conv0 = jnp.zeros((n_rays,), dtype=bool)
    zvals, mask, _ = jax.lax.fori_loop(0, n_iter, body, (zvals0, mask0, conv0))
    zvals = jnp.where(zvals <= jnp.asarray(near, dtype=dtype), 0.0, zvals)
    pts = (rays_o + rays_d * zvals).reshape(-1, 3)
    return zvals, pts, mask


def secant_root_finding(
    rays_o, rays_d, geo_func, near=0.0, far=10.0, n_step=128, n_iter=20, threshold=1e-3, level=0.0, grad_dir="ascent"
):
    """Secant surface finding: coarse sign-change scan then fixed-iteration
    secant refinement; fully vectorized, masks instead of gather/compact.

    Returns zvals (N_rays, 1), pts (N_rays, 3), mask (N_rays,).
    """
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype
    _near = _broadcast_near_far(near, n_rays, dtype)
    _far = _broadcast_near_far(far, n_rays, dtype)

    t = jnp.linspace(0.0, 1.0, n_step, dtype=dtype)[None, :]
    step = _near * (1.0 - t) + _far * t  # (N_rays, n_step)
    pts = get_ray_points_by_zvals(rays_o, rays_d, step).reshape(-1, 3)
    geo = geo_func(pts).reshape(n_rays, n_step) - level
    if grad_dir == "descent":
        geo = -geo

    mask_not_occ = geo[:, 0] > 0
    sign = jnp.concatenate([jnp.sign(geo[:, :-1] * geo[:, 1:]), jnp.ones((n_rays, 1), dtype=dtype)], axis=-1)
    cost = sign * jnp.arange(n_step, 0, -1, dtype=dtype)[None, :]
    index = jnp.argmin(cost, axis=-1)  # (N_rays,)
    min_cost = jnp.min(cost, axis=-1)
    mask_sign_change = min_cost < 0
    row = jnp.arange(n_rays)
    mask_pos_to_neg = geo[row, index] > 0
    mask = mask_not_occ & mask_sign_change & mask_pos_to_neg

    z_high = step[row, index]
    geo_high = geo[row, index]
    index_next = jnp.minimum(index + 1, n_step - 1)
    z_low = step[row, index_next]
    geo_low = geo[row, index_next]

    def secant_step(state):
        z_low, geo_low, z_high, geo_high = state
        z_mid = -geo_low * (z_high - z_low) / (geo_high - geo_low + 1e-12) + z_low
        pts_mid = rays_o + rays_d * z_mid[:, None]
        g = geo_func(pts_mid) - level
        if grad_dir == "descent":
            g = -g
        low_side = g < 0
        z_low = jnp.where(low_side, z_mid, z_low)
        geo_low = jnp.where(low_side, g, geo_low)
        z_high = jnp.where(~low_side, z_mid, z_high)
        geo_high = jnp.where(~low_side, g, geo_high)
        return z_low, geo_low, z_high, geo_high

    state = (z_low, geo_low, z_high, geo_high)
    state = jax.lax.fori_loop(0, n_iter, lambda _, s: secant_step(s), state)
    z_low, geo_low, z_high, geo_high = state
    z_mid = -geo_low * (z_high - z_low) / (geo_high - geo_low + 1e-12) + z_low

    zvals = jnp.where(mask[:, None], z_mid[:, None], _far)
    zvals = jnp.where(mask_not_occ[:, None], zvals, 0.0)
    zvals = jnp.where(zvals <= _near, 0.0, zvals)
    pts = (rays_o + rays_d * zvals).reshape(-1, 3)
    return zvals, pts, mask
