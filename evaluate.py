"""Evaluation CLI (parity: /root/reference/evaluate.py:19-88).

Usage: python evaluate.py --configs <cfg.yaml> --model_pt <ckpt>
Renders the eval split, reports PSNR/SSIM, writes images + eval_log.txt.
"""

import os
import sys

import jax

from arcnerf_tpu.datasets import get_dataset
from arcnerf_tpu.evaluation import run_eval
from arcnerf_tpu.models import build_model
from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, parse_configs
from arcnerf_tpu.utils.logger import Logger
from arcnerf_tpu.utils.model_io import load_raw_state, restore_subtree


def main():
    cfgs = parse_configs(sys.argv[1:])
    eval_dir = get_value_from_cfgs_field(cfgs.dir, "eval_dir", None) if hasattr(cfgs, "dir") else None
    eval_dir = eval_dir or os.path.join("results", get_value_from_cfgs_field(cfgs, "name", "eval"))
    os.makedirs(eval_dir, exist_ok=True)
    logger = Logger(os.path.join(eval_dir, "eval_log.txt".replace(".txt", "_run.log")))

    data_dir = get_value_from_cfgs_field(cfgs.dir, "data_dir", "data") if hasattr(cfgs, "dir") else "data"
    dataset = get_dataset(cfgs.dataset, data_dir, "eval", None, logger)

    model = build_model(cfgs, logger)
    bound_state = model.init_bound_state()
    sample = dataset[0]
    import jax.numpy as jnp

    tiny = {k: jnp.asarray(v[:2])[None] for k, v in sample.items()
            if k in ("img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "exp_time")}
    variables = jax.jit(
        lambda rngs, feed: model.init(rngs, feed, inference_only=True, bound_state=bound_state)
    )({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, tiny)

    # the reference hard-requires a checkpoint here (evaluate.py:56)
    model_pt = get_value_from_cfgs_field(cfgs, "model_pt", None)
    assert model_pt is not None, "Please specify the model_pt for evaluation"
    assert os.path.exists(str(model_pt)), "model_pt {} does not exist".format(model_pt)
    from arcnerf_tpu.models.base_modules.encoding import hash_variant_from_cfgs
    hv = hash_variant_from_cfgs(cfgs.model)
    raw, step = load_raw_state(str(model_pt), expected_meta={"hash_variant": hv} if hv else None)
    params = restore_subtree(variables["params"], raw["params"])
    if raw.get("bound_state"):
        bound_state = restore_subtree(bound_state, raw["bound_state"])
        bound_state = jax.tree_util.tree_map(jnp.asarray, bound_state)
    logger.add_log("restored checkpoint {} (step {})".format(model_pt, step))

    render_chunk = jax.jit(
        lambda feed: model.apply({"params": params}, feed, inference_only=True, bound_state=bound_state)
    )
    max_samples = get_value_from_cfgs_field(cfgs.progress, "max_samples_eval", 25) if hasattr(cfgs, "progress") else 25
    ds_cfgs = get_value_from_cfgs_field(cfgs.dataset, "eval", None)
    # composite a background only when the TRAINING protocol fed one
    # (scheduler.bkg_color, e.g. the NGP random-bkg recipe) — a model
    # trained without it owns its background and compositing double-adds
    # (see ArcNerfTrainer.eval_bkg_color)
    train_ds = get_value_from_cfgs_field(cfgs.dataset, "train", None)
    sched = get_value_from_cfgs_field(train_ds, "scheduler", None)
    trained_with_bkg = get_value_from_cfgs_field(
        get_value_from_cfgs_field(sched, "bkg_color", None), "color", None) is not None
    bkg_color = None
    aug = get_value_from_cfgs_field(ds_cfgs, "augmentation", None)
    blend = get_value_from_cfgs_field(aug, "blend_bkg_color", None)
    if not trained_with_bkg:
        pass
    elif blend is not None:
        bkg_color = blend
    elif get_value_from_cfgs_field(ds_cfgs, "white_bkg", False):
        bkg_color = [1.0, 1.0, 1.0]
    summary, _ = run_eval(render_chunk, dataset, logger, eval_dir, max_samples=max_samples, bkg_color=bkg_color)
    print("Eval done:", summary)


if __name__ == "__main__":
    main()
