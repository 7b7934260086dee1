"""Segmented compacted-stream marching parity (r5 hot-path rework).

The NGP training path integrates on the compacted point stream
(ray_helper.segment_march via fg_model.fused_render_by_mask_pts) instead
of scattering sigma/radiance back to the (B, N) grid and marching its
padding. These tests pin the contract: identical rgb/depth/mask to the
dense scattered-mask marching, for arbitrary mask patterns, background
modes, and budgets — plus matching gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from arcnerf_tpu.models.fg_model import FgModel
from arcnerf_tpu.render.ray_helper import ray_marching, segment_march


def _random_case(seed, n_rays=48, n_pts=24, p=0.35):
    rng = np.random.default_rng(seed)
    zvals = np.sort(rng.uniform(0.5, 4.0, size=(n_rays, n_pts)), axis=1).astype(np.float32)
    mask = rng.uniform(size=(n_rays, n_pts)) < p
    mask[0] = False  # all-invalid ray
    mask[1] = True  # all-valid ray
    mask[2] = False
    mask[2, -1] = True  # single valid at the last slot
    sigma = np.abs(rng.normal(size=(n_rays, n_pts))).astype(np.float32) * 3.0
    radiance = rng.uniform(size=(n_rays, n_pts, 3)).astype(np.float32)
    return (jnp.asarray(zvals), jnp.asarray(mask), jnp.asarray(sigma),
            jnp.asarray(radiance))


def _stream_inputs(zvals, mask, sigma, radiance, budget):
    """Build the compacted stream the fused model path would feed."""
    n_rays, n_pts = zvals.shape
    sel, sel_valid, off, cnt = FgModel._compact_sel_aux(mask, budget)
    ray_id = sel // n_pts
    z_sel = jnp.take(zvals.reshape(-1), sel)
    s_sel = jnp.take(sigma.reshape(-1), sel)
    r_sel = jnp.take(radiance.reshape(-1, 3), sel, axis=0)
    return s_sel, r_sel, z_sel, ray_id, off, cnt


def _dense_reference(zvals, mask, sigma, radiance, **kw):
    """Dense scattered-mask marching with the scatter-back zero fill the
    compacted path replaces (sigma/radiance zero outside the mask)."""
    s = jnp.where(mask, sigma, 0.0)
    r = jnp.where(mask[..., None], radiance, 0.0)
    return ray_marching(s, r, zvals, mask_pts=mask, **kw)


def test_segment_march_parity():
    for seed, kw in [
        (0, {}),
        (1, {"add_inf_z": True}),
        (2, {"white_bkg": True}),
        (3, {"bkg_color": jnp.asarray(np.random.default_rng(9).uniform(size=(48, 3)).astype(np.float32))}),
    ]:
        zvals, mask, sigma, radiance = _random_case(seed)
        budget = int(jnp.sum(mask)) + 8  # no clipping
        stream = _stream_inputs(zvals, mask, sigma, radiance, budget)
        out = segment_march(*stream, n_rays=zvals.shape[0], **kw)
        ref = _dense_reference(zvals, mask, sigma, radiance, **kw)
        # rays whose FINAL ladder slot is valid hit the reference's
        # drop-last boundary convention: dense trans_shift[:, -1] excludes
        # that sample's alpha while the stream's segment-end T includes it
        # (same caveat as test_scattered_marching_inf_tail). Occupancy
        # masks never mark the final slot, so compare the rest strictly.
        tail_free = ~np.asarray(mask[:, -1])
        for k in ("rgb", "depth", "mask"):
            a, b = np.asarray(out[k]), np.asarray(ref[k])
            if kw.get("bkg_color") is not None or kw.get("add_inf_z"):
                a, b = a[tail_free], b[tail_free]
            np.testing.assert_allclose(
                a, b, rtol=3e-5, atol=3e-5,
                err_msg="{} seed {} kw {}".format(k, seed, kw))
        np.testing.assert_allclose(
            np.asarray(out["trans_end"])[tail_free],
            np.asarray(ref["trans_shift"][:, -1])[tail_free],
            rtol=3e-5, atol=3e-5)


def test_segment_march_budget_clip():
    """With fewer budget slots than valid points, rays wholly inside the
    budget must be exact; the clip-boundary ray's truncated samples
    contribute zero (a consistent partial integral, never garbage)."""
    zvals, mask, sigma, radiance = _random_case(5)
    n_valid = int(jnp.sum(mask))
    budget = n_valid // 2
    stream = _stream_inputs(zvals, mask, sigma, radiance, budget)
    out = segment_march(*stream, n_rays=zvals.shape[0])
    ref = _dense_reference(zvals, mask, sigma, radiance)

    off = np.asarray(stream[4])
    tot = np.asarray(jnp.sum(mask, axis=1))
    inside = off + tot <= budget  # rays wholly within budget
    # the dense reference zero-fills sigma past the budget the same way the
    # production scatter-back does — rebuild it with the clipped mask
    sel, sel_valid, _, _ = FgModel._compact_sel_aux(mask, budget)
    keep = np.zeros(mask.size, bool)
    keep[np.asarray(sel)[np.asarray(sel_valid)]] = True
    sigma_clip = jnp.where(jnp.asarray(keep.reshape(mask.shape)), sigma, 0.0)
    ref_clip = ray_marching(sigma_clip, jnp.where(mask[..., None], radiance, 0.0),
                            zvals, mask_pts=mask)
    for k in ("rgb", "depth", "mask"):
        np.testing.assert_allclose(
            np.asarray(out[k])[inside], np.asarray(ref_clip[k])[inside],
            rtol=3e-5, atol=3e-5, err_msg=k)
        assert np.all(np.isfinite(np.asarray(out[k])))


def test_segment_march_grads_match_dense():
    """d loss / d (sigma, radiance) on the stream must equal the dense
    path's gradients gathered at the same samples."""
    zvals, mask, sigma, radiance = _random_case(11, n_rays=16, n_pts=16)
    budget = int(jnp.sum(mask)) + 4
    sel, sel_valid, off, cnt = FgModel._compact_sel_aux(mask, budget)
    ray_id = sel // zvals.shape[1]
    z_sel = jnp.take(zvals.reshape(-1), sel)

    w_r = jnp.asarray(np.random.default_rng(2).normal(size=(16, 3)).astype(np.float32))

    def loss_stream(s_sel, r_sel):
        out = segment_march(s_sel, r_sel, z_sel, ray_id, off, cnt, 16)
        return jnp.sum(out["rgb"] * w_r) + jnp.sum(out["depth"]) + jnp.sum(out["mask"])

    def loss_dense(s, r):
        out = _dense_reference(zvals, mask, s, r)
        return jnp.sum(out["rgb"] * w_r) + jnp.sum(out["depth"]) + jnp.sum(out["mask"])

    s_sel = jnp.take(sigma.reshape(-1), sel)
    r_sel = jnp.take(radiance.reshape(-1, 3), sel, axis=0)
    gs_s, gr_s = jax.grad(loss_stream, argnums=(0, 1))(s_sel, r_sel)
    gs_d, gr_d = jax.grad(loss_dense, argnums=(0, 1))(sigma, radiance)

    nv = int(jnp.sum(mask))
    sel_np = np.asarray(sel)[:nv]
    np.testing.assert_allclose(
        np.asarray(gs_s)[:nv], np.asarray(gs_d).reshape(-1)[sel_np], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gr_s)[:nv], np.asarray(gr_d).reshape(-1, 3)[sel_np], rtol=2e-4, atol=2e-5)


def test_nerf_fused_path_matches_dense_path():
    """End to end: NeRF forward with ARCNERF_SEG_MARCH on vs the dense
    scatter-back path must agree on rgb/depth/mask."""
    import os

    from arcnerf_tpu.models import build_model, nerf_model
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "models", "nerf_ngp.yaml")
    overrides = ["--model.rays.n_sample", "64", "--model.obj_bound.volume.n_grid", "16",
                 "--model.geometry.encoder.hashmap_size", "12",
                 "--model.geometry.encoder.n_levels", "4",
                 "--model.geometry.encoder.max_res", "64",
                 "--model.obj_bound.log_max_allowance", "10"]
    cfgs = load_configs(cfg_path)
    update_configs_by_dotlist(cfgs, overrides)

    rng = np.random.default_rng(0)
    n_rays = 8
    rays_o = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    rays_o = rays_o / np.linalg.norm(rays_o, axis=-1, keepdims=True) * 2.5
    rays_d = -rays_o / np.linalg.norm(rays_o, axis=-1, keepdims=True)
    feed = {
        "img": jnp.asarray(rng.uniform(size=(1, n_rays, 3)).astype(np.float32)),
        "rays_o": jnp.asarray(rays_o),
        "rays_d": jnp.asarray(rays_d),
        "rays_r": jnp.full((1, n_rays, 1), 1e-3, dtype=jnp.float32),
    }
    model = build_model(cfgs)
    bound_state = model.init_bound_state()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feed, inference_only=True, bound_state=bound_state)

    orig = nerf_model._SEG_MARCH
    try:
        nerf_model._SEG_MARCH = True
        out_fused = model.apply(variables, feed, inference_only=True, bound_state=bound_state)
        nerf_model._SEG_MARCH = False
        out_dense = model.apply(variables, feed, inference_only=True, bound_state=bound_state)
    finally:
        nerf_model._SEG_MARCH = orig

    for k in ("rgb", "depth", "mask"):
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_dense[k]), rtol=5e-5, atol=5e-5,
            err_msg=k)
