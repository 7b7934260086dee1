"""Compacted masked-point evaluation must match dense evaluation wherever
points are valid (budget >= n_valid)."""

import numpy as np

import jax
import jax.numpy as jnp

from arcnerf_tpu.models import build_model
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist
import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "models")


def test_compaction_matches_dense():
    overrides = ["--model.rays.n_sample", "64", "--model.obj_bound.volume.n_grid", "16",
                 "--model.geometry.encoder.hashmap_size", "12",
                 "--model.geometry.encoder.n_levels", "4",
                 "--model.geometry.encoder.max_res", "64",
                 "--model.obj_bound.log_max_allowance", "10"]  # 1024-pt budget
    cfgs = load_configs(os.path.join(CONFIG_DIR, "nerf_ngp.yaml"))
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
        feed, inference_only=True, bound_state=bound_state,
    )
    out_compact = model.apply(variables, feed, inference_only=True, bound_state=bound_state)

    # dense path: same model with no budget
    cfgs_dense = load_configs(os.path.join(CONFIG_DIR, "nerf_ngp.yaml"))
    update_configs_by_dotlist(cfgs_dense, overrides[:-2] + ["--model.obj_bound.log_max_allowance", "-1"])
    model_dense = build_model(cfgs_dense)
    out_dense = model_dense.apply(variables, feed, inference_only=True, bound_state=bound_state)

    np.testing.assert_allclose(np.asarray(out_compact["rgb"]), np.asarray(out_dense["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_compact["depth"]), np.asarray(out_dense["depth"]), atol=1e-5)


def test_sdf_compaction_matches_dense():
    """NeuS-NGP path: repeat_last fill must reproduce the dense sdf eval
    (zero-fill would wrongly put invalid slots on the surface)."""
    overrides = ["--model.rays.n_sample", "32", "--model.rays.n_importance", "0",
                 "--model.obj_bound.volume.n_grid", "16",
                 "--model.geometry.encoder.hashmap_size", "12",
                 "--model.geometry.encoder.n_levels", "4",
                 "--model.geometry.encoder.max_res", "64",
                 "--model.obj_bound.log_max_allowance", "9"]  # 512-pt budget
    cfgs = load_configs(os.path.join(CONFIG_DIR, "neus_ngp.yaml"))
    update_configs_by_dotlist(cfgs, overrides)

    rng = np.random.default_rng(1)
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
        feed, inference_only=True, bound_state=bound_state,
    )
    out_compact = model.apply(variables, feed, inference_only=True, bound_state=bound_state)

    cfgs_dense = load_configs(os.path.join(CONFIG_DIR, "neus_ngp.yaml"))
    update_configs_by_dotlist(cfgs_dense, overrides[:-2] + ["--model.obj_bound.log_max_allowance", "-1"])
    model_dense = build_model(cfgs_dense)
    out_dense = model_dense.apply(variables, feed, inference_only=True, bound_state=bound_state)

    np.testing.assert_allclose(np.asarray(out_compact["rgb"]), np.asarray(out_dense["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_compact["depth"]), np.asarray(out_dense["depth"]), atol=1e-4)


def test_compact_sel_forms_parity():
    """rowgather and rank forms of _compact_sel_aux must agree on the valid
    prefix (sel), on sel_valid, and exactly on off/cnt — under scattered,
    prefix, empty-ray, and over-budget mask patterns."""
    from arcnerf_tpu.models import fg_model as fgm

    rng = np.random.default_rng(3)
    cases = [
        (rng.random((16, 32)) < 0.3, 128),           # scattered
        (rng.random((16, 32)) < 0.3, 64),            # over budget (clipped)
        (np.arange(32)[None, :] < rng.integers(0, 32, (16, 1)), 128),  # prefix
        (np.zeros((16, 32), bool), 32),              # all empty
    ]
    cases[0][0][3] = False  # force an empty ray among scattered rows

    def run(form, mask, budget):
        old = fgm._COMPACT_SEL_FORM
        fgm._COMPACT_SEL_FORM = form
        try:
            return jax.tree_util.tree_map(
                np.asarray, fgm.FgModel._compact_sel_aux(jnp.asarray(mask), budget))
        finally:
            fgm._COMPACT_SEL_FORM = old

    for mask, budget in cases:
        sel_a, val_a, off_a, cnt_a = run("rank", mask, budget)
        sel_b, val_b, off_b, cnt_b = run("rowgather", mask, budget)
        nv = int(val_a.sum())
        assert np.array_equal(val_a, val_b)
        assert np.array_equal(sel_a[:nv], sel_b[:nv])
        assert np.array_equal(off_a, off_b)
        assert np.array_equal(cnt_a, cnt_b)
        # padding rows must still be in-range (consumers gather before masking)
        total = mask.size
        assert sel_b.min() >= 0 and sel_b.max() < total
