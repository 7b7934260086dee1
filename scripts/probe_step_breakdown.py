"""Bisect the NGP train step at bench shapes on the current backend.

Times, each as its own jitted dispatch: model forward (inference), forward
(train mode), value_and_grad, and the full optimizer step — to locate the
~400 ms/step not explained by the encoder (row-form fwd 157 + bwd 305 ms).
"""

import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo — a set PYTHONPATH breaks the
# axon TPU-tunnel plugin registration ('axon' missing from known backends).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    import os

    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    n_rays = 16384
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_step", "--dir.expr_dir", "/tmp/probe_step",
        "--progress.epoch", "8", "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
        "--n_rays", str(n_rays),
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(), flush=True)

    batch = trainer.pipeline.get_train_batch(0)
    from arcnerf_tpu.parallel.mesh import shard_batch

    batch = shard_batch(batch, trainer.mesh)
    params = trainer.state["params"]
    bound_state = trainer.state["bound_state"]

    fwd_inf = jax.jit(lambda p, bs, b: trainer.model.apply(
        {"params": p}, b, inference_only=True, bound_state=bs)["rgb"])
    print("fwd inference_only:   {:7.1f} ms".format(timed(fwd_inf, params, bound_state, batch) * 1e3),
          flush=True)

    def train_loss(p, bs, b, key):
        out = trainer.model.apply({"params": p}, b, inference_only=False, bound_state=bs,
                                  rngs={"sampling": key})
        rgb = out.get("rgb", None)
        if rgb is None:  # train-mode outputs are keyed rgb_coarse/rgb_fine
            rgb = next(out[k] for k in sorted(out) if k.startswith("rgb"))
        return jnp.mean((rgb - b["img"]) ** 2)

    key = jax.random.PRNGKey(0)
    fwd_train = jax.jit(train_loss)
    print("fwd train mode:       {:7.1f} ms".format(
        timed(fwd_train, params, bound_state, batch, key) * 1e3), flush=True)

    vgrad = jax.jit(jax.value_and_grad(train_loss))
    print("value_and_grad:       {:7.1f} ms".format(
        timed(vgrad, params, bound_state, batch, key) * 1e3), flush=True)

    full = jax.jit(trainer._train_step_impl)
    state = jax.tree_util.tree_map(lambda x: x, trainer.state)
    try:
        dt = timed(lambda s, b, k: full(s, b, k, 1), state, batch, key)
        print("full train step:      {:7.1f} ms".format(dt * 1e3), flush=True)
    except Exception as e:
        print("full step probe skipped:", str(e).splitlines()[0][:120], flush=True)


if __name__ == "__main__":
    main()
