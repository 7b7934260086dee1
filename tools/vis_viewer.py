"""Serve the interactive viewer from a trained checkpoint (reference
tools/vis_ns_viewer.py).

Usage: python tools/vis_viewer.py --configs <expr.yaml> --model_pt <ckpt> [--port 7007]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.models import build_model
    from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, parse_configs
    from arcnerf_tpu.utils.logger import Logger
    from arcnerf_tpu.utils.model_io import load_raw_state, restore_subtree
    from arcnerf_tpu.viewer import ViewerState, run_viewer

    cfgs = parse_configs(sys.argv[1:])
    logger = Logger()
    data_dir = get_value_from_cfgs_field(cfgs.dir, "data_dir", "data") if hasattr(cfgs, "dir") else "data"
    dataset = get_dataset(cfgs.dataset, data_dir, "train", None, logger)

    model = build_model(cfgs, logger)
    bound_state = model.init_bound_state()
    sample = dataset[0]
    tiny = {k: jnp.asarray(v[:2])[None] for k, v in sample.items()
            if k in ("img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "exp_time")}
    variables = jax.jit(
        lambda rngs, feed: model.init(rngs, feed, inference_only=True, bound_state=bound_state)
    )({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, tiny)
    params = variables["params"]

    model_pt = get_value_from_cfgs_field(cfgs, "model_pt", None)
    if model_pt and os.path.exists(str(model_pt)):
        raw, step = load_raw_state(str(model_pt))
        params = restore_subtree(params, raw["params"])
        if raw.get("bound_state"):
            bound_state = restore_subtree(bound_state, raw["bound_state"])
            bound_state = jax.tree_util.tree_map(jnp.asarray, bound_state)
        logger.add_log("restored {} (step {})".format(model_pt, step))

    render_chunk = jax.jit(
        lambda feed: model.apply({"params": params}, feed, inference_only=True, bound_state=bound_state)
    )
    state = ViewerState(render_chunk, dataset.get_intrinsic(), (dataset.W, dataset.H))
    port = int(get_value_from_cfgs_field(cfgs, "viewer_port", 7007))
    run_viewer(state, port)


if __name__ == "__main__":
    main()
