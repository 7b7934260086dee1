"""Inference CLI (parity: /root/reference/inference.py:16-76).

Usage: python inference.py --configs <cfg.yaml> --model_pt <ckpt>
Renders novel-view videos on configured camera paths and extracts a point
cloud + colored mesh from the trained model.
"""

import os
import sys

import jax
import jax.numpy as jnp

from arcnerf_tpu.datasets import get_dataset
from arcnerf_tpu.evaluation import Inferencer
from arcnerf_tpu.models import build_model
from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, parse_configs, valid_key_in_cfgs
from arcnerf_tpu.utils.logger import Logger
from arcnerf_tpu.utils.model_io import load_raw_state, restore_subtree


def main():
    cfgs = parse_configs(sys.argv[1:])
    out_dir = get_value_from_cfgs_field(cfgs.dir, "eval_dir", None) if hasattr(cfgs, "dir") else None
    out_dir = out_dir or os.path.join("results", get_value_from_cfgs_field(cfgs, "name", "infer"))
    os.makedirs(out_dir, exist_ok=True)
    logger = Logger(os.path.join(out_dir, "infer.log"))

    # dataset only provides intrinsic/wh for the render cameras
    data_dir = get_value_from_cfgs_field(cfgs.dir, "data_dir", "data") if hasattr(cfgs, "dir") else "data"
    intrinsic, wh = None, None
    for mode in ("eval", "val", "train"):
        if valid_key_in_cfgs(cfgs.dataset, mode):
            try:
                dataset = get_dataset(cfgs.dataset, data_dir, mode, None, logger)
                intrinsic = dataset.get_intrinsic()
                wh = (dataset.W, dataset.H)
                break
            except Exception:
                continue
    assert intrinsic is not None, "need at least one loadable dataset split for camera intrinsics"

    model = build_model(cfgs, logger)
    bound_state = model.init_bound_state()
    sample = dataset[0]
    tiny = {k: jnp.asarray(v[:2])[None] for k, v in sample.items()
            if k in ("img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "exp_time")}
    variables = jax.jit(
        lambda rngs, feed: model.init(rngs, feed, inference_only=True, bound_state=bound_state)
    )({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, tiny)

    # the reference hard-requires a checkpoint here (inference.py:44)
    model_pt = get_value_from_cfgs_field(cfgs, "model_pt", None)
    assert model_pt is not None, "Please specify the model_pt for inference"
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
    forward_pts = jax.jit(
        lambda pts: model.apply({"params": params}, pts, method="forward_pts")
    )
    forward_pts_dir = jax.jit(
        lambda pts, dirs: model.apply({"params": params}, pts, dirs, method="forward_pts_dir")
    )

    infer_cfgs = cfgs.inference if valid_key_in_cfgs(cfgs, "inference") else None
    assert infer_cfgs is not None, "cfgs.inference missing"

    # optional surface-render video (sphere tracing / secant level set)
    surface_render_fn = None
    if get_value_from_cfgs_field(infer_cfgs, "render", None) is not None and get_value_from_cfgs_field(
        infer_cfgs.render, "surface", False
    ):
        method = get_value_from_cfgs_field(infer_cfgs.render, "surface_method", "sphere_tracing")
        level = get_value_from_cfgs_field(infer_cfgs.render, "surface_level", 0.0)
        grad_dir = get_value_from_cfgs_field(infer_cfgs.render, "surface_grad_dir", "ascent")
        surface_render_fn = jax.jit(
            lambda feed: model.apply(
                {"params": params}, feed, bound_state, method, 128, 20, 0.01, level, grad_dir,
                method="surface_render",
            )
        )

    inferencer = Inferencer(infer_cfgs, intrinsic, wh, logger)
    results = inferencer.run_infer(
        render_chunk, forward_pts, forward_pts_dir, out_dir, surface_render_fn=surface_render_fn
    )
    print("Inference done:", results)


if __name__ == "__main__":
    main()
