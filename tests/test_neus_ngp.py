"""NeuS-NGP smoke: sdf model through hashgrid encoder + volume bound —
grads w.r.t. input points must flow through the hashgrid for normals."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from arcnerf_tpu.models import build_model
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "models")


def test_neus_ngp_forward():
    cfgs = load_configs(os.path.join(CONFIG_DIR, "neus_ngp.yaml"))
    update_configs_by_dotlist(cfgs, [
        "--model.rays.n_sample", "24", "--model.rays.n_importance", "8",
        "--model.rays.n_iter", "2",
        "--model.obj_bound.volume.n_grid", "16",
        "--model.obj_bound.log_max_allowance", "-1",
        "--model.geometry.encoder.hashmap_size", "12",
        "--model.geometry.encoder.n_levels", "4",
        "--model.geometry.encoder.max_res", "64",
    ])
    rng = np.random.default_rng(0)
    n_rays = 8
    rays_o = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    rays_o = rays_o / np.linalg.norm(rays_o, axis=-1, keepdims=True) * 2.2
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
    out = model.apply(
        variables, feed, inference_only=False, bound_state=bound_state,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert "rgb" in out and np.isfinite(np.asarray(out["rgb"])).all()
    assert "normal_pts" in out  # hashgrid grads flowed
    assert np.isfinite(np.asarray(out["normal_pts"])).all()
    # normals should be non-zero somewhere (piecewise-linear hashgrid grads)
    assert float(jnp.abs(out["normal_pts"]).sum()) > 0
