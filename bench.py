"""Benchmark: NGP training throughput on the real chip.

Trains the NGP recipe (hashgrid + fused bf16 MLPs + occupancy pruning) on
the procedural synthetic scene for a fixed number of steps and reports
steady-state training rays/sec. Baseline: the reference ArcNerf NGP trains
lego at ~50k steps x 4096 rays in ~17 min on its GPU (docs/benchmark.md:48)
~= 2.0e5 rays/sec, which we use as vs_baseline denominator.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist
    import os

    root = os.path.dirname(os.path.abspath(__file__))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    n_steps = 600
    warmup_steps = 100
    update_configs_by_dotlist(cfgs, [
        "--name", "bench_ngp",
        "--progress.epoch", str(n_steps),
        "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--n_rays", "4096",
        "--dataset.train.n_imgs", "16",
        "--dataset.train.wh", "[128,128]",
    ])

    trainer = ArcNerfTrainer(cfgs)

    from arcnerf_tpu.datasets import get_model_feed_in
    from arcnerf_tpu.parallel.mesh import shard_batch

    # warmup (compile + occupancy warmup)
    rays_done = 0
    for epoch in range(warmup_steps):
        trainer.run_optimize(epoch)
        batch = trainer.pipeline.get_train_batch(epoch)
        feed_in, _ = get_model_feed_in(batch)
        feed_in = shard_batch(feed_in, trainer.mesh)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, stats = trainer._train_step(trainer.state, feed_in, sub, epoch)
    jax.block_until_ready(stats["loss"])

    t0 = time.perf_counter()
    for epoch in range(warmup_steps, n_steps):
        trainer.run_optimize(epoch)
        batch = trainer.pipeline.get_train_batch(epoch)
        feed_in, _ = get_model_feed_in(batch)
        feed_in = shard_batch(feed_in, trainer.mesh)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, stats = trainer._train_step(trainer.state, feed_in, sub, epoch)
        rays_done += feed_in["rays_o"].shape[1]
    jax.block_until_ready(stats["loss"])
    elapsed = time.perf_counter() - t0

    rays_per_sec = rays_done / elapsed
    baseline = 2.0e5  # reference ArcNerf NGP GPU throughput (see header)
    print(json.dumps({
        "metric": "ngp_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
