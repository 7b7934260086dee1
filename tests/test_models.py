"""Config-driven model smoke/shape tests (reference
tests_arcnerf/tests_models genre): build each model from configs/models/*,
init params, run train/inference/progress forwards on random rays pointing
at the origin, assert output keys and shapes."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcnerf_tpu.models import build_model
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "models")

N_RAYS = 16


def make_feed_in(n_rays=N_RAYS, key=0, with_extra=()):
    """Random rays pointing at the origin from radius ~2.5 (mirrors reference
    create_feed_in_to_cuda)."""
    rng = np.random.default_rng(key)
    rays_o = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    rays_o = rays_o / np.linalg.norm(rays_o, axis=-1, keepdims=True) * 2.5
    rays_d = -rays_o / np.linalg.norm(rays_o, axis=-1, keepdims=True)
    feed = {
        "img": jnp.asarray(rng.uniform(size=(1, n_rays, 3)).astype(np.float32)),
        "mask": jnp.asarray(rng.integers(0, 2, size=(1, n_rays)).astype(np.float32)),
        "rays_o": jnp.asarray(rays_o),
        "rays_d": jnp.asarray(rays_d),
        "rays_r": jnp.full((1, n_rays, 1), 1e-3, dtype=jnp.float32),
    }
    if "exp_time" in with_extra:
        feed["exp_time"] = jnp.full((1, n_rays), 0.5, dtype=jnp.float32)
    return feed


def load_model_cfgs(name, overrides=()):
    cfgs = load_configs(os.path.join(CONFIG_DIR, name))
    if overrides:
        update_configs_by_dotlist(cfgs, list(overrides))
    return cfgs


def build_and_run(cfgs, feed_in, inference_only=False, get_progress=False):
    model = build_model(cfgs)
    bound_state = model.init_bound_state()
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    variables = model.init(
        rngs, feed_in, inference_only=True, get_progress=False, bound_state=bound_state
    )
    out = model.apply(
        variables,
        feed_in,
        inference_only=inference_only,
        get_progress=get_progress,
        bound_state=bound_state,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    return model, variables, bound_state, out


def check_rgb_keys(out, inference_only, two_stage):
    if inference_only:
        assert "rgb" in out and out["rgb"].shape == (1, N_RAYS, 3)
        assert out["depth"].shape == (1, N_RAYS)
        assert out["mask"].shape == (1, N_RAYS)
        assert np.isfinite(np.asarray(out["rgb"])).all()
    else:
        key = "rgb_coarse" if two_stage else "rgb"
        assert key in out, "missing {} in {}".format(key, sorted(out.keys()))
        assert out[key].shape == (1, N_RAYS, 3)
        assert np.isfinite(np.asarray(out[key])).all()


class TestNeRF:

    overrides = ["--model.rays.n_sample", "16", "--model.rays.n_importance", "8",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("nerf.yaml", self.overrides)
        feed = make_feed_in()
        _, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, True)
        assert "rgb_fine" in out

        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, True)

    def test_progress(self):
        cfgs = load_model_cfgs("nerf.yaml", self.overrides)
        feed = make_feed_in()
        _, _, _, out = build_and_run(cfgs, feed, get_progress=True)
        assert "progress_sigma" in out
        # add_inf_z=True keeps all n_sample+n_importance pts
        assert out["progress_sigma"].shape == (1, N_RAYS, 24)
        assert "progress_weights" in out and "progress_trans_shift" in out


class TestNGP:

    overrides = ["--model.rays.n_sample", "32", "--model.obj_bound.volume.n_grid", "16",
                 "--model.geometry.encoder.hashmap_size", "12",
                 "--model.geometry.encoder.n_levels", "4",
                 "--model.geometry.encoder.max_res", "64"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("nerf_ngp.yaml", self.overrides)
        feed = make_feed_in()
        model, variables, bound_state, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, True)  # NeRF-family training keys carry _coarse even one-stage
        assert "n_valid_pts" in out

        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, False)

    def test_bound_state_and_optimize(self):
        cfgs = load_model_cfgs("nerf_ngp.yaml", self.overrides)
        feed = make_feed_in()
        model, variables, bound_state, _ = build_and_run(cfgs, feed)
        assert "bitfield" in bound_state["fg"] and bound_state["fg"]["bitfield"].shape == (16, 16, 16)
        assert bool(jnp.all(bound_state["fg"]["bitfield"]))

        # occupancy update culls empty space given a tiny-sphere density field
        bound = model.fg_model.get_obj_bound()

        def fake_opacity(dt, pts):
            return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.3, 10.0, 0.0)

        state = bound.optimize(bound_state["fg"], cur_epoch=16, n_pts=32, get_est_opacity=fake_opacity,
                               key=jax.random.PRNGKey(0))
        occ_ratio = float(jnp.mean(state["bitfield"].astype(jnp.float32)))
        assert occ_ratio < 0.2, "pruning should cull most empty voxels, got {}".format(occ_ratio)
        # center voxel stays occupied
        assert bool(state["bitfield"][8, 8, 8])


class TestMipNeRF:

    overrides = ["--model.rays.n_sample", "16", "--model.rays.n_importance", "8",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("mipnerf.yaml", self.overrides)
        feed = make_feed_in()
        _, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, True)
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, True)


class TestNeus:

    overrides = ["--model.rays.n_sample", "16", "--model.rays.n_importance", "8",
                 "--model.rays.n_iter", "2",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("neus.yaml", self.overrides)
        feed = make_feed_in()
        _, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, False)
        assert "normal" in out and out["normal"].shape == (1, N_RAYS, 3)
        assert "normal_pts" in out  # for eikonal loss
        assert "params" in out and "scale" in out["params"]

        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, False)

    def test_geometric_init_sphere(self):
        """Geometric init should give approximately sphere sdf at start."""
        cfgs = load_model_cfgs("neus.yaml", self.overrides)
        feed = make_feed_in()
        model, variables, bound_state, _ = build_and_run(cfgs, feed)
        pts = jnp.asarray([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [0.0, 0.75, 0.0]])
        sdf = model.apply(variables, pts, method=lambda m, p: m.forward_pts(p))
        sdf = np.asarray(sdf)
        assert sdf[0] < 0  # center inside
        assert sdf[1] > 0  # outside radius 0.75


class TestVolSDF:

    overrides = ["--model.rays.n_sample", "16", "--model.rays.n_importance", "4",
                 "--model.rays.n_eval", "16", "--model.rays.n_iter", "2",
                 "--model.rays.beta_iter", "3",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("volsdf.yaml", self.overrides)
        feed = make_feed_in()
        _, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, False)
        assert "params" in out and "beta" in out["params"]
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, False)


class TestHDRNeRF:

    overrides = ["--model.rays.n_sample", "8", "--model.rays.n_importance", "8",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32", "--model.exp_mlps.W", "16"]

    def test_train_and_inference(self):
        cfgs = load_model_cfgs("hdrnerf.yaml", self.overrides)
        feed = make_feed_in(with_extra=("exp_time",))
        _, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        check_rgb_keys(out, False, True)
        assert "hdr_coarse" in out
        assert "unit_exp_coarse" in out
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, True)
        assert "hdr" in out_inf

    def test_unit_exposure_default(self):
        """Without per-image exposure in the batch (non-HDRReal datasets)
        the model assumes exp_time=1 instead of raising."""
        cfgs = load_model_cfgs("hdrnerf.yaml", self.overrides)
        feed = make_feed_in()  # no exp_time key
        assert "exp_time" not in feed
        _, _, _, out = build_and_run(cfgs, feed, inference_only=True)
        assert "rgb" in out and bool(jnp.all(jnp.isfinite(out["rgb"])))


class TestNeRFPP:

    overrides = ["--model.rays.n_sample", "8", "--model.rays.n_importance", "8",
                 "--model.geometry.W", "32", "--model.geometry.D", "2",
                 "--model.geometry.W_feat", "32", "--model.radiance.W", "32",
                 "--model.radiance.W_feat_in", "32",
                 "--model.background.rays.n_sample", "8",
                 "--model.background.geometry.W", "32", "--model.background.geometry.D", "2",
                 "--model.background.geometry.W_feat", "32",
                 "--model.background.radiance.W", "32", "--model.background.radiance.W_feat_in", "32"]

    def test_fg_bkg_blend(self):
        cfgs = load_model_cfgs("nerfpp.yaml", self.overrides)
        feed = make_feed_in()
        model, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        assert model.has_bkg
        check_rgb_keys(out, False, True)
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, True)


class TestMultiVol:

    overrides = ["--model.rays.n_sample", "32", "--model.obj_bound.volume.n_grid", "16",
                 "--model.geometry.encoder.hashmap_size", "12",
                 "--model.geometry.encoder.n_levels", "4",
                 "--model.geometry.encoder.max_res", "64",
                 "--model.background.basic_volume.n_grid", "16",
                 "--model.background.rays.n_sample", "32",
                 "--model.background.geometry.encoder.hashmap_size", "12",
                 "--model.background.geometry.encoder.n_levels", "4",
                 "--model.background.geometry.encoder.max_res", "64"]

    def test_fg_bkg_blend(self):
        cfgs = load_model_cfgs("multivol.yaml", self.overrides)
        feed = make_feed_in()
        model, variables, bound_state, out = build_and_run(cfgs, feed, inference_only=False)
        assert "bitfield" in bound_state["bkg"]
        assert bound_state["bkg"]["bitfield"].shape == (3, 16, 16, 16)
        check_rgb_keys(out, False, True)  # one-stage NeRF fg still keys _coarse in training
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, False)


def test_gradients_flow():
    """value_and_grad through the NeRF forward produces finite nonzero grads."""
    cfgs = load_model_cfgs("nerf.yaml", TestNeRF.overrides)
    feed = make_feed_in()
    model = build_model(cfgs)
    bound_state = model.init_bound_state()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feed, inference_only=True, bound_state=bound_state,
    )

    def loss_fn(params):
        out = model.apply(
            {"params": params["params"]}, feed, inference_only=False, bound_state=bound_state,
            rngs={"sampling": jax.random.PRNGKey(2)},
        )
        return jnp.mean((out["rgb_fine"] - feed["img"]) ** 2) + jnp.mean((out["rgb_coarse"] - feed["img"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(total) and total > 0


class TestSigmaBlend:

    overrides = TestNeRFPP.overrides + [
        "--model.background.bkg_blend", "sigma",
        "--model.background.rays.add_inf_z", "False",
    ]

    def test_sigma_blend(self):
        cfgs = load_model_cfgs("nerfpp.yaml", self.overrides)
        feed = make_feed_in()
        model, _, _, out = build_and_run(cfgs, feed, inference_only=False)
        assert model.bkg_blend == "sigma"
        check_rgb_keys(out, False, True)
        _, _, _, out_inf = build_and_run(cfgs, feed, inference_only=True)
        check_rgb_keys(out_inf, True, True)


def test_bkg_model_ignores_bkg_color_input():
    """With an rgb-blend background MODEL, a per-ray bkg_color input must
    not ALSO be composited by the fg marching (double compositing drove
    eval rgb to ~1.5 in the synthetic_nerfpp golden run). rgb with and
    without the input must match, and stay bounded."""
    cfgs = load_model_cfgs("nerfpp.yaml", TestNeRFPP.overrides)
    feed = make_feed_in()
    _, _, _, out_plain = build_and_run(cfgs, feed, inference_only=True)

    feed_colored = dict(feed)
    feed_colored["bkg_color"] = jnp.ones((1, N_RAYS, 3), dtype=jnp.float32)
    _, _, _, out_colored = build_and_run(cfgs, feed_colored, inference_only=True)

    np.testing.assert_allclose(np.asarray(out_colored["rgb"]), np.asarray(out_plain["rgb"]),
                               atol=1e-5)
