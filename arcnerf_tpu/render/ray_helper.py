"""Ray generation, z-value sampling, importance resampling, and volume
integration (ray marching) in pure jnp.

Capability parity with /root/reference/arcnerf/render/ray_helper.py:
get_rays:12, get_ndc_rays:122, equal_sample, get_near_far_from_rays:175,
get_zvals_from_near_far:231, get_zvals_from_near_far_fix_step:267,
get_zvals_outside_sphere:318, perturb_interval:361, sample_pdf:410,
sample_cdf:432, ray_marching:476, alpha_to_weights:596,
make_sample_rays:681, handle_valid_mask_zvals:753.

TPU-first notes:
- randomness is explicit (``key=`` PRNG key); ``key=None`` means
  deterministic (the reference's ``perturb=False`` / inference mode),
- masked compaction (handle_valid_mask_zvals) is a stable argsort —
  O(N log N) XLA sort instead of boolean fancy indexing,
- everything is static-shape, jit/vmap/grad-safe.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projection import pixel_to_world
from ..geometry.ray import sphere_ray_intersection
from ..geometry.transformation import normalize


def get_rays(
    W,
    H,
    intrinsic,
    c2w,
    wh_order=True,
    index=None,
    n_rays=-1,
    key=None,
    ndc=False,
    ndc_near=1.0,
    center_pixel=False,
    normalize_rays_d=True,
):
    """Rays in world coordinates for one camera.

    intrinsic (3, 3), c2w (4, 4). Selection: ``index`` is (N, 2) int (i, j)
    pixel coords, or ``n_rays > 0`` random rays (requires ``key``).

    Returns rays_o (N, 3), rays_d (N, 3), index (flat indices or None),
    rays_r (N, 1) mip-nerf pixel radius (full-image mode only, else None).
    """
    assert index is None or n_rays <= 0, "cannot sample by both index and n_rays"
    dtype = intrinsic.dtype
    i, j = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype), indexing="ij")
    pixels = jnp.stack([i, j], axis=-1).reshape(-1, 2)[None]  # (1, WH, 2), wh order

    if center_pixel:
        pixels = pixels + 0.5

    flat_index = None
    if index is not None:
        index = jnp.asarray(index)
        flat_index = index[:, 0].astype(jnp.int32) * H + index[:, 1].astype(jnp.int32)
    if n_rays > 0:
        assert key is not None, "random sampling needs a PRNG key"
        flat_index = jax.random.choice(key, W * H, shape=(n_rays,), replace=False)
    if flat_index is not None:
        pixels = pixels[:, flat_index, :]

    if not wh_order and flat_index is None and n_rays <= 0:
        pixels = pixels[0].reshape(W, H, 2).transpose(1, 0, 2).reshape(-1, 2)[None]

    z = jnp.ones((1, pixels.shape[1]), dtype=dtype)
    xyz_world = pixel_to_world(pixels, z, intrinsic[None], c2w[None])  # (1, N, 3)

    cam_loc = c2w[:3, 3][None]  # (1, 3)
    rays_d = xyz_world[0] - cam_loc
    rays_o = jnp.broadcast_to(cam_loc, rays_d.shape)

    if ndc:
        rays_o, rays_d = get_ndc_rays(rays_o, rays_d, W, H, intrinsic, ndc_near)
    elif normalize_rays_d:
        rays_d = normalize(rays_d)

    rays_r = None
    if flat_index is None and n_rays <= 0:
        if wh_order:
            dirs = rays_d.reshape(W, H, 3)
            dx = jnp.sqrt(jnp.sum((dirs[:-1] - dirs[1:]) ** 2, -1))  # (W-1, H)
            dx = jnp.concatenate([dx, dx[-2:-1]], axis=0)  # (W, H)
        else:
            dirs = rays_d.reshape(H, W, 3)
            dx = jnp.sqrt(jnp.sum((dirs[:, :-1] - dirs[:, 1:]) ** 2, -1))
            dx = jnp.concatenate([dx, dx[:, -2:-1]], axis=1)
        rays_r = (dx[..., None] * 2.0 / jnp.sqrt(12.0)).reshape(-1, 1)

    return rays_o, rays_d, flat_index, rays_r


def get_ndc_rays(rays_o, rays_d, W, H, intrinsic, near=1.0):
    """Shift rays to the near plane and project into NDC (llff-style)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    f_x, f_y = intrinsic[0, 0], intrinsic[1, 1]
    o0 = -1.0 / (W / (2.0 * f_x)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * f_y)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * f_x)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * f_y)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def equal_sample(n_rays_w, n_rays_h, W, H):
    """Evenly spaced (i, j) pixel index grid -> np(n_w*n_h, 2)."""
    i, j = np.meshgrid(np.linspace(0, W - 1, n_rays_w), np.linspace(0, H - 1, n_rays_h))
    return np.stack([i, j], axis=-1).reshape(-1, 2)


def get_near_far_from_rays(rays_o, rays_d, bounds=None, near_hardcode=None, far_hardcode=None, bounding_radius=None):
    """Near/far per ray: hardcode > bounds (optionally sphere-capped) >
    bounding-sphere intersection. Returns near, far each (N_rays, 1)."""
    n_rays = rays_o.shape[0]
    dtype = rays_o.dtype

    if near_hardcode is None or far_hardcode is None:
        if bounds is None and bounding_radius is None:
            raise NotImplementedError("must specify near/far source")
        if bounds is None:
            near, far, _, _ = sphere_ray_intersection(rays_o, rays_d, radius=float(bounding_radius))
        else:
            near, far = bounds[:, 0:1], bounds[:, 1:2]
            if bounding_radius is not None:
                _, far_bound, _, _ = sphere_ray_intersection(rays_o, rays_d, radius=float(bounding_radius))
                far = jnp.minimum(far, far_bound)
        if near_hardcode is not None:
            near = jnp.full_like(near, near_hardcode)
        if far_hardcode is not None:
            far = jnp.full_like(far, far_hardcode)
    else:
        near = jnp.full((n_rays, 1), near_hardcode, dtype=dtype)
        far = jnp.full((n_rays, 1), far_hardcode, dtype=dtype)

    far = jnp.where(far <= near, near + 1e-5, far)
    return near, far


def get_zvals_from_near_far(near, far, n_pts, inclusive=True, inverse_linear=False, perturb=False, key=None):
    """Stratified zvals in (near, far). near/far (N_rays, 1) -> (N_rays, n_pts)."""
    if inclusive:
        t = jnp.linspace(0.0, 1.0, n_pts, dtype=near.dtype)
    else:
        t = jnp.linspace(0.0, 1.0, n_pts + 2, dtype=near.dtype)[1:-1]
    if inverse_linear:
        zvals = 1.0 / (1.0 / (near + 1e-8) * (1.0 - t) + 1.0 / (far + 1e-8) * t)
    else:
        zvals = near + (far - near) * t
    if perturb and key is not None:
        zvals = perturb_interval(zvals, key)
    return zvals


def get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts, inclusive=True, perturb=False, key=None):
    """Constant-step zvals clamped at far; duplicated tail points masked out.

    Returns zvals (N_rays, n_pts), mask_pts (N_rays, n_pts).
    """
    assert fix_t > 0
    n_rays = near.shape[0]
    start = near if inclusive else near + fix_t
    step = jnp.arange(n_pts, dtype=near.dtype)[None]
    zvals = jnp.clip(start + step * fix_t, near, far)

    dup = jnp.concatenate(
        [jnp.zeros((n_rays, 1), dtype=bool), (zvals[:, 1:] - zvals[:, :-1]) == 0.0], axis=1
    )
    mask_pts = ~dup

    if key is not None:
        zvals = perturb_interval_with_mask(zvals, key, mask_pts)
    return zvals, mask_pts


def get_zvals_outside_sphere(rays_o, rays_d, n_pts, radius, perturb=False, key=None):
    """MSI-style background zvals: shells from radius to infinity.

    Returns zvals (N_rays, n_pts), sphere_radius (n_pts,).
    """
    t = jnp.linspace(0.0, 1.0, n_pts + 2, dtype=rays_o.dtype)[1:-1]
    sphere_radius = radius / jnp.flip(t, -1)
    if perturb and key is not None:
        sphere_radius = perturb_interval(sphere_radius[None], key)[0]
    zvals = get_zvals_from_sphere_radius(rays_o, rays_d, sphere_radius)
    return zvals, sphere_radius


def get_zvals_from_sphere_radius(rays_o, rays_d, sphere_radius):
    """Far intersections with concentric spheres. -> (N_rays, N)."""
    _, zvals, _, _ = sphere_ray_intersection(rays_o, rays_d, sphere_radius)
    return zvals


def perturb_interval(vals, key):
    """Jitter each sample uniformly within its interval. (B, N) -> (B, N)."""
    mids = 0.5 * (vals[..., 1:] + vals[..., :-1])
    upper = jnp.concatenate([mids, vals[..., -1:]], -1)
    lower = jnp.concatenate([vals[..., :1], mids], -1)
    rand = jax.random.uniform(key, upper.shape, dtype=vals.dtype)
    return lower + (upper - lower) * rand


def perturb_interval_with_mask(vals, key, mask=None):
    """Perturb only valid samples; invalid tail keeps the last valid value."""
    perturbed = perturb_interval(vals, key)
    if mask is None:
        return perturbed
    vals = jnp.where(mask, perturbed, vals)
    n_valid = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
    last_value = jnp.take_along_axis(vals, n_valid[:, None], axis=1)  # (B, 1)
    return jnp.clip(vals, vals[:, 0:1], last_value)


def sample_pdf(bins, weights, n_sample, det=False, eps=1e-5, key=None):
    """Inverse-CDF importance sampling over weighted bins.

    bins (B, n_pts), weights (B, n_pts-1) -> samples (B, n_sample), sorted.
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (B, n_pts)
    return sample_cdf(bins, cdf, n_sample, det, eps, key)


def sample_cdf(bins, cdf, n_sample, det=False, eps=1e-5, key=None):
    """Inverse-CDF sampling given the cdf (B, n_pts) over bins (B, n_pts)."""
    n_pts = bins.shape[-1]
    batch = cdf.shape[:-1]
    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_sample, dtype=bins.dtype)
        u = jnp.broadcast_to(u, batch + (n_sample,))
    else:
        u = jax.random.uniform(key, batch + (n_sample,), dtype=bins.dtype)

    inds = jax.vmap(lambda c, x: jnp.searchsorted(c, x, side="right"))(
        jax.lax.stop_gradient(cdf), u
    )  # (B, n_sample)
    below = jnp.clip(inds - 1, 0, n_pts - 1)
    above = jnp.clip(inds, 0, n_pts - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bin_lo = jnp.take_along_axis(bins, below, axis=-1)
    bin_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    t = (u - cdf_lo) / denom
    samples = bin_lo + t * (bin_hi - bin_lo)
    return jnp.sort(samples, -1)


def alpha_to_weights(alpha):
    """alpha (N_rays, N_p) -> trans_shift (accumulated transmittance T_i),
    weights (T_i * alpha_i).

    T_i = prod_{j<i}(1 - alpha_j + 1e-10), computed as exp(cumsum(log .))
    — same values to f32 rounding, but the VJP becomes a reverse cumsum
    instead of XLA's cumprod gradient (ray-marching fwd+bwd 108 -> ~25 ms
    at (32k, 128), scripts/probe_hotpath2.py). The argument is clamped to
    >= 1e-10 before the log so a (numerically) >1 alpha cannot emit NaN."""
    logt = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
    csum = jnp.cumsum(logt, -1)
    trans_shift = jnp.exp(jnp.concatenate([jnp.zeros_like(csum[:, :1]), csum[:, :-1]], -1))
    return trans_shift, alpha * trans_shift


def scattered_deltas(zvals, mask, inf_tail=False):
    """Marching deltas for an UNSORTED validity mask over ladder zvals:
    delta_j = z_{nv(j)} - z_j with nv(j) the next valid slot after j
    (0 for invalid slots and for the last valid one — exactly the
    contribution pattern of left-compacted zvals whose invalid tail
    duplicates the last valid sample). With ``inf_tail`` the last valid
    sample gets the reference's 1e10 add_inf_z tail delta instead.

    This is what lets the volume/bitfield sampling path skip the per-ray
    stable argsort of handle_valid_mask_zvals (measured 281 ms at
    (32k, 128)) while keeping ray_marching numerics identical: invalid
    slots march with alpha = 0, valid slots see the same gap-spanning
    deltas the compacted layout produced.
    """
    n_rays, n_pts = zvals.shape
    # zvals ascend along each ray, so the next valid sample's z is a
    # reverse cummin over masked z — one scan, no per-row gather (the
    # take_along_axis formulation measured 102 ms at (32k, 128))
    zm = jnp.where(mask, zvals, jnp.inf)
    rc = jnp.flip(jax.lax.cummin(jnp.flip(zm, 1), axis=1), 1)  # min over k >= j
    z_nv = jnp.concatenate([rc[:, 1:], jnp.full((n_rays, 1), jnp.inf, zvals.dtype)], axis=1)
    has_next = jnp.isfinite(z_nv)
    deltas = jnp.where(mask & has_next, z_nv - zvals, 0.0)
    # same near-duplicate crush the compacted path applies to its diffs
    deltas = jnp.where(jnp.abs(deltas) < 1e-5, 0.0, deltas)
    if inf_tail:
        deltas = jnp.where(mask & ~has_next, 1e10, deltas)
    return deltas


def _seg_prod_scan(v, head):
    """Inclusive segmented cumulative PRODUCT along a 1-D stream.

    ``head`` marks segment starts; within a segment the scan multiplies,
    at a head it resets to that element. The (value, flag) pair under
    ``combine`` is the standard segmented-scan monoid (associative), so
    ``lax.associative_scan`` runs it in log-depth vector passes — no
    per-element loop, jit/grad-safe. Unlike the exp(cumsum(log)) trick
    used on the dense grid, products stay LOCAL to each segment: a
    saturated alpha (log -> -23) cannot poison later rays through a
    global cumsum's f32 rounding."""

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va * vb), fa | fb

    prod, _ = jax.lax.associative_scan(combine, (v, head))
    return prod


def segment_march(
    sigma,
    radiance,
    z,
    ray_id,
    off,
    cnt,
    n_rays,
    add_inf_z=False,
    white_bkg=False,
    bkg_color=None,
    noise=None,
):
    """Alpha-composited integration over a COMPACTED sample stream.

    The dense ``ray_marching`` integrates a (N_rays, N_pts) grid in which
    — under occupancy masks — ~94% of slots are invalid padding. This
    variant consumes only the compacted valid samples (the exact stream
    ``FgModel._compact_sel`` feeds to the MLP): rays' samples sit
    contiguously in z order, so transmittance is a segmented product and
    each per-ray output a segmented sum. Nothing is ever scattered back to
    the dense grid (reference `/root/reference/arcnerf/models/fg_model.py:264`
    scatters into the full grid before marching on it).

    Args:
        sigma: (K,) density at the compacted samples (first n_valid rows
            real, the tail is budget padding).
        radiance: (K, 3) rgb at the samples.
        z: (K,) z-values of the samples (ascending within each ray).
        ray_id: (K,) ray index per sample (row-major order: a ray's
            samples are contiguous; padding rows carry ray_id 0).
        off: (N_rays,) UNCLIPPED exclusive start rank of each ray.
        cnt: (N_rays,) per-ray IN-STREAM sample count (clipped to budget).
        n_rays: static ray count.
        add_inf_z / white_bkg / bkg_color / noise: as in ``ray_marching``
            (noise is a pre-drawn (K,) array, not a std).

    Returns dict rgb (N_rays, 3), depth (N_rays,), mask (N_rays,),
    trans_end (N_rays,) — T after the last valid sample (what the dense
    path reads as trans_shift[:, -1] when the final ladder slot is
    invalid padding, which occupancy masks guarantee in practice).
    """
    k_total = sigma.shape[0]
    dtype = z.dtype
    n_valid = jnp.sum(cnt)
    valid = jnp.arange(k_total, dtype=jnp.int32) < n_valid

    # deltas span to the next sample of the SAME ray (the compacted stream
    # holds exactly the valid slots, so this reproduces scattered_deltas's
    # next-valid gap spanning); segment tails get 0 (drop-last semantics)
    # or the reference's 1e10 inf tail.
    next_same = jnp.concatenate(
        [(ray_id[1:] == ray_id[:-1]) & valid[1:], jnp.zeros((1,), bool)])
    z_next = jnp.concatenate([z[1:], z[-1:]])
    deltas = jnp.where(next_same, z_next - z, 0.0)
    deltas = jnp.where(jnp.abs(deltas) < 1e-5, 0.0, deltas)
    if add_inf_z:
        deltas = jnp.where(valid & ~next_same, jnp.asarray(1e10, dtype), deltas)

    s = sigma if noise is None else sigma + noise
    # same overflow clamp as ray_marching: alpha stays finite under an
    # inf trunc_exp sigma and the VJP back to it is exactly zero
    s = jnp.minimum(jax.nn.relu(s), 1e10)
    alpha = 1.0 - jnp.exp(-s * deltas)
    alpha = jnp.where(valid, alpha, 0.0)

    # exclusive per-sample transmittance T_i = prod_{j<i in segment}
    # (1 - alpha_j + 1e-10): scan the SHIFTED factors so no division by a
    # near-zero (1 - alpha) is ever needed.
    head = jnp.concatenate([jnp.ones((1,), bool), ray_id[1:] != ray_id[:-1]])
    one_m_alpha = 1.0 - alpha + 1e-10
    v = jnp.where(head, 1.0, jnp.concatenate([jnp.ones((1,), dtype), one_m_alpha[:-1]]))
    trans = _seg_prod_scan(v, head)
    weights = trans * alpha

    # per-ray outputs are segmented sums: one inclusive cumsum over the
    # stream + two (N_rays,) gathers per channel — never a scatter into
    # the (N_rays * N_pts) grid.
    chans = jnp.stack(
        [weights, weights * z, weights * radiance[:, 0], weights * radiance[:, 1],
         weights * radiance[:, 2]], axis=0)
    csum = jnp.cumsum(chans, axis=1)
    csum = jnp.concatenate([jnp.zeros((chans.shape[0], 1), dtype), csum], axis=1)
    start = jnp.minimum(off, k_total)
    end = jnp.minimum(off + cnt, k_total)
    sums = jnp.take(csum, end, axis=1) - jnp.take(csum, start, axis=1)  # (5, B)

    mask = sums[0]
    depth = sums[1]
    rgb = jnp.moveaxis(sums[2:5], 0, 1)  # (B, 3)

    # T after the whole segment: exclusive T at the last sample times its
    # own (1 - alpha) factor; empty rays keep T = 1.
    last = jnp.maximum(end - 1, 0)
    trans_end = jnp.take(trans, last) * jnp.take(one_m_alpha, last)
    trans_end = jnp.where(cnt > 0, trans_end, 1.0)

    if bkg_color is not None:
        rgb = rgb + trans_end[:, None] * bkg_color
    elif white_bkg:
        rgb = rgb + (1.0 - mask[:, None])

    return {"rgb": rgb, "depth": depth, "mask": mask, "trans_end": trans_end}


def ray_marching(
    sigma,
    radiance,
    zvals,
    add_inf_z=False,
    noise_std=0.0,
    weights_only=False,
    white_bkg=False,
    alpha=None,
    bkg_color=None,
    key=None,
    mask_pts=None,
):
    """Alpha-composited volume integration along each ray.

    alpha_i = 1 - exp(-relu(sigma_i)*delta_i); T_i = prod_{j<i}(1-alpha_j);
    rgb = sum_i T_i alpha_i c_i. With ``add_inf_z`` a 1e10 tail delta keeps
    all N_pts; otherwise the last point is dropped (N_pts-1).

    With ``mask_pts`` (N_rays, N_pts bool), valid samples may sit anywhere
    in the ladder (no left-compaction required): deltas span to the NEXT
    VALID sample and invalid slots get delta 0 -> alpha 0 -> zero weight,
    which reproduces the compacted layout's numerics exactly (see
    scattered_deltas). All N_pts slots are kept in that mode.

    Returns a dict: rgb (N_rays, 3 or None), depth (N_rays,), mask (N_rays,),
    sigma/radiance/zvals/alpha/trans_shift/weights at the marching length.
    """
    n_rays = zvals.shape[0]
    dtype = zvals.dtype
    assert sigma is not None or alpha is not None

    _sigma, _radiance, _zvals = sigma, radiance, zvals
    if mask_pts is not None:
        deltas = scattered_deltas(zvals, mask_pts, inf_tail=add_inf_z)
    else:
        deltas = zvals[:, 1:] - zvals[:, :-1]
        deltas = jnp.where(jnp.abs(deltas) < 1e-5, 0.0, deltas)

        if add_inf_z:
            deltas = jnp.concatenate([deltas, jnp.full((n_rays, 1), 1e10, dtype=dtype)], -1)
        elif alpha is None:
            _sigma = sigma[:, :-1] if sigma is not None else None
            _radiance = radiance[:, :-1, :] if radiance is not None else None
            _zvals = zvals[:, :-1]

    if alpha is None:
        noise = 0.0
        if noise_std > 0.0 and key is not None:
            noise = jax.random.normal(key, _sigma.shape, dtype=dtype) * noise_std
        # finite clamp at the alpha boundary: a density that overflowed f32
        # exp (trunc_exp keeps reference forward semantics, so sigma can be
        # inf) would make this VJP compute inf * 0 = NaN even though alpha
        # itself is finite. jnp.minimum picks the constant above the cap, so
        # the cotangent back to an overflowed sigma is exactly zero — the
        # same gradient the reference's grad-clamped trunc_exp produces.
        s = jnp.minimum(jax.nn.relu(_sigma + noise), 1e10)
        alpha = 1.0 - jnp.exp(-s * deltas)

    trans_shift, weights = alpha_to_weights(alpha)

    depth = jnp.sum(weights * _zvals, -1)
    mask = jnp.sum(weights, -1)

    rgb = None
    if _radiance is not None:
        rgb = jnp.sum(weights[..., None] * _radiance, -2)
        if bkg_color is not None:
            rgb = rgb + trans_shift[:, -1:] * bkg_color
        elif white_bkg:
            rgb = rgb + (1.0 - mask[:, None])

    if weights_only:
        return {"weights": weights}

    return {
        "rgb": rgb,
        "depth": depth,
        "mask": mask,
        "sigma": _sigma,
        "radiance": _radiance,
        "zvals": _zvals,
        "alpha": alpha,
        "trans_shift": trans_shift,
        "weights": weights,
    }


def sample_ray_marching_output_by_index(output, index=None, n_rays=1, sigma_scale=2.0):
    """Pick rays from a marching output for 2d curve visualization (host-side)."""
    total = np.asarray(output["zvals"]).shape[0]
    n_pts = np.asarray(output["zvals"]).shape[1]
    sample_index = list(np.random.default_rng(0).choice(total, n_rays, replace=False)) if index is None else index

    out_list = []
    for idx in sample_index:
        res = {"points": [], "lines": [], "legends": []}
        x = np.asarray(output["zvals"])[idx].tolist()
        res["points"].append([x, [-1] * n_pts])
        sigma = np.asarray(output["sigma"])[idx].copy()
        s_max, s_min = float(sigma.max()), float(sigma.min())
        if s_max > 0:
            sigma[sigma > 0] = sigma[sigma > 0] / s_max * sigma_scale
        if s_min < 0:
            sigma[sigma < 0] = sigma[sigma < 0] / (abs(s_min) * 1.2)
        res["lines"].append([x, sigma.tolist()])
        res["legends"].append("sigma(max={:.1f})".format(s_max))
        for k in ("alpha", "trans_shift", "weights"):
            res["lines"].append([x, np.asarray(output[k])[idx].tolist()])
            res["legends"].append(k)
        out_list.append(res)
    return out_list, sample_index


def make_sample_rays(near=2.0, far=4.0, n_pts=32, v_max=2.0, v_min=-1.0, sdf=True):
    """Synthetic sdf/sigma ray fixture (+ -> 0 -> - -> 0 -> +), used by the
    NeuS/VolSDF sampling tests (reference ray_helper.py:681-750)."""
    assert v_max > 0 > v_min and n_pts % 2 == 0
    half = n_pts // 2
    zvals = np.linspace(near, far, n_pts)[None]
    vals = np.concatenate([np.linspace(v_max, v_min, half), np.linspace(v_min, v_max, half)])[None]
    if not sdf:
        vals = -vals
    mid_zvals = 0.5 * (zvals[:, 1:] + zvals[:, :-1])
    mid_vals = 0.5 * (vals[:, 1:] + vals[:, :-1])
    mid_slope = (vals[:, 1:] - vals[:, :-1]) / (zvals[:, 1:] - zvals[:, :-1] + 1e-5)
    return {
        "zvals": zvals,
        "zvals_list": zvals[0].tolist(),
        "vals": vals,
        "vals_list": vals[0].tolist(),
        "mid_zvals": mid_zvals,
        "mid_zvals_list": mid_zvals[0].tolist(),
        "mid_vals": mid_vals,
        "mid_vals_list": mid_vals[0].tolist(),
        "mid_slope": mid_slope,
        "mid_slope_list": mid_slope[0].tolist(),
    }


def handle_valid_mask_zvals(zvals, mask):
    """Left-compact valid zvals per ray; invalid tail repeats the last valid
    value. Stable sort keeps zvals ascending among the valid entries.

    zvals/mask (N_rays, N_pts) -> new zvals/mask, same shapes.
    """
    assert zvals.ndim == 2 and zvals.shape == mask.shape
    n_rays, n_pts = zvals.shape

    # rays where every zval is identical AND all valid keep a single point
    zdiff = zvals[:, 1:] - zvals[:, :-1]
    keep_one = jnp.all(jnp.abs(zdiff) < 1e-7, axis=1) & jnp.all(mask, axis=1)
    mask = jnp.where(keep_one[:, None], jnp.arange(n_pts)[None, :] == 0, mask)

    order = jnp.argsort(~mask, axis=1, stable=True)  # valid entries first
    zvals_sorted = jnp.take_along_axis(zvals, order, axis=1)
    mask_sorted = jnp.take_along_axis(mask, order, axis=1)

    n_valid = jnp.sum(mask, axis=1)
    last_idx = jnp.maximum(n_valid - 1, 0)
    last_val = jnp.take_along_axis(zvals_sorted, last_idx[:, None], axis=1)
    zvals_out = jnp.where(mask_sorted, zvals_sorted, last_val)

    all_invalid = n_valid == 0
    zvals_out = jnp.where(all_invalid[:, None], 0.0, zvals_out)
    return zvals_out, mask_sorted
