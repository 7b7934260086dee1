"""Benchmark: NGP training throughput on the real chip.

Trains the NGP recipe (hashgrid + fused bf16 MLPs + occupancy pruning +
masked point compaction) on the procedural synthetic scene and reports
steady-state training rays/sec. Baseline: the reference ArcNerf NGP trains
lego at ~50k steps x 4096 rays in ~17 min on its GPU (docs/benchmark.md:48)
~= 2.0e5 rays/sec, used as the vs_baseline denominator.

NOTE on environment: the tunneled chip in this container measures ~0.3
TFLOP/s bf16 (about 0.15% of a real v5e's 197 TFLOP/s), so the absolute
value here is bounded by the tunnel, not the program: the same program on a
full-rate chip scales with the hardware ratio.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time


def main():
    import jax

    from arcnerf_tpu.datasets import get_model_feed_in
    from arcnerf_tpu.parallel.mesh import shard_batch
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.abspath(__file__))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    # one large fixed ray bucket: the masked-point compaction keeps the MLP
    # budget constant, so large buckets cost barely more than small ones,
    # and a single static shape means exactly one (slow, remote) compile.
    warmup_steps, timed_steps = 40, 64
    n_rays = 16384
    update_configs_by_dotlist(cfgs, [
        "--name", "bench_ngp",
        "--progress.epoch", str(warmup_steps + timed_steps),
        "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--n_rays", str(n_rays),
        "--dataset.train.n_imgs", "10",
        "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
    ])

    trainer = ArcNerfTrainer(cfgs)

    rays_counter = {"n": 0}

    def one_step(epoch, count=False):
        trainer.run_optimize(epoch)
        batch = trainer.pipeline.get_train_batch(epoch)
        feed_in, _ = get_model_feed_in(batch)
        feed_in = shard_batch(feed_in, trainer.mesh)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, stats = trainer._train_step(trainer.state, feed_in, sub, epoch)
        if "n_valid_pts" in stats and trainer.log_max_allowance:
            trainer.pipeline.record_valid_pts(stats["n_valid_pts"], trainer.n_coarse)
        if count:
            rays_counter["n"] += feed_in["rays_o"].shape[1]
        return stats

    for epoch in range(warmup_steps):
        stats = one_step(epoch)
    # force real completion (block_until_ready is unreliable through the
    # tunnel — a host read is the only hard sync)
    float(stats["loss"])

    t0 = time.perf_counter()
    for epoch in range(warmup_steps, warmup_steps + timed_steps):
        stats = one_step(epoch, count=True)
    final_loss = float(stats["loss"])
    elapsed = time.perf_counter() - t0

    rays_per_sec = rays_counter["n"] / elapsed
    baseline = 2.0e5  # reference ArcNerf NGP GPU throughput (see header)
    assert final_loss == final_loss, "loss is NaN"
    print(json.dumps({
        "metric": "ngp_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
