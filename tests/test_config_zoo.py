"""Config-zoo regression: every shipped yaml must load, and every
experiment recipe must build its model, losses and metrics (reference
ships 73 yamls incl. full per-scene training recipes; a recipe that stops
building is a silent loss of reproducibility)."""

import glob
import os

import pytest

from arcnerf_tpu.utils.cfgs import load_configs, valid_key_in_cfgs

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"), recursive=True))
EXPR_YAMLS = [p for p in ALL_YAMLS if os.sep + "expr" + os.sep in p]
DATASET_YAMLS = [p for p in ALL_YAMLS if os.sep + "datasets" + os.sep in p]


def _rel(p):
    return os.path.relpath(p, CONFIG_ROOT)


def test_zoo_size():
    # reference ships 73 yamls; ours must not regress below parity
    assert len(ALL_YAMLS) >= 73, "config zoo shrank: {} yamls".format(len(ALL_YAMLS))


@pytest.mark.parametrize("path", ALL_YAMLS, ids=_rel)
def test_loads(path):
    cfgs = load_configs(path)
    assert cfgs is not None


@pytest.mark.parametrize("path", EXPR_YAMLS, ids=_rel)
def test_expr_builds_model_and_loss(path):
    from arcnerf_tpu.losses import build_loss
    from arcnerf_tpu.metrics import build_metric
    from arcnerf_tpu.models import build_model

    cfgs = load_configs(path)
    if not valid_key_in_cfgs(cfgs, "model"):
        pytest.skip("no model section")
    model = build_model(cfgs)
    assert model is not None
    # bound state must initialize (volume/bitfield recipes carry occupancy)
    state = model.init_bound_state()
    assert state is not None
    if valid_key_in_cfgs(cfgs, "loss"):
        assert build_loss(cfgs) is not None
    if valid_key_in_cfgs(cfgs, "metric"):
        assert build_metric(cfgs) is not None


@pytest.mark.parametrize("path", DATASET_YAMLS, ids=_rel)
def test_dataset_cfg_type_registered(path):
    import arcnerf_tpu.datasets  # noqa: F401 — populates the registry
    from arcnerf_tpu.utils.registry import DATASET_REGISTRY

    cfgs = load_configs(path)
    for mode in ("train", "val", "eval"):
        if valid_key_in_cfgs(cfgs.dataset, mode):
            ds_type = getattr(cfgs.dataset, mode).type
            assert DATASET_REGISTRY.get(ds_type) is not None, ds_type


def test_ngp_lego_recipe_knobs():
    """The hard-won NGP hyperparameters must survive translation
    (reference nerf_lego_nerf_ngp.yaml:34-37,155-156,197)."""
    cfgs = load_configs(os.path.join(CONFIG_ROOT, "expr", "NeRF", "lego", "nerf_lego_nerf_ngp.yaml"))
    assert float(cfgs.optim.lr) == 0.1
    assert float(cfgs.optim.eps) == 1e-15
    assert float(cfgs.loss.ImgLoss.weight) == 3000
    assert float(cfgs.loss.ImgLoss.delta) == 0.1
    assert int(cfgs.model.chunk_rays) == 32768
    assert int(cfgs.model.chunk_pts) == 1048576
    assert int(cfgs.model.obj_bound.log_max_allowance) == 18
    assert int(cfgs.model.geometry.encoder.hashmap_size) == 19
