"""In-context A/B of the quad-coalesced hashed-level lookup (r4).

Times the REAL jitted train step (value_and_grad + adam + ema + occupancy
cond) at the bench shapes with quad_hash off (pair-coalesced hashed
levels, 4 gathers+scatters per point per level) vs on (stride-32 quad
rows, 2 per point per level). The backward probe (probe_bwd_decomp.py)
showed the hashed-level scatter is per-INDEX bound (~10 ns/idx, dtype
makes no difference), so halving the index count should take ~5 ms/level
off the backward and ~2.5 ms/level off the forward.

Run: python scripts/probe_quad_ab.py [--rays 32768] [--iters 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax

    from arcnerf_tpu.datasets import get_model_feed_in
    from arcnerf_tpu.parallel.mesh import shard_batch
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def build(quad):
        cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
        update_configs_by_dotlist(cfgs, [
            "--name", "probe_quad_ab", "--dir.expr_dir", "/tmp/probe_quad_ab",
            "--progress.epoch", "8", "--progress.epoch_loss", "1000000",
            "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
            "--n_rays", str(args.rays),
            "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
            "--model.rays.n_sample", "128",
            "--model.obj_bound.volume.n_grid", "64",
            "--model.obj_bound.epoch_optim_warmup", "32",
            "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
            "--model.geometry.encoder.quad_hash", "True" if quad else "False",
        ])
        return ArcNerfTrainer(cfgs)

    print("backend:", jax.default_backend(), "rays:", args.rays, flush=True)
    for quad in (False, True):
        trainer = build(quad)
        batch = trainer.pipeline.get_train_batch(0)
        feed, _ = get_model_feed_in(batch)
        feed = shard_batch(feed, trainer.mesh)
        key = jax.random.PRNGKey(0)
        state = trainer.state
        # warmup (compile) + 2 steps to settle
        for i in range(2):
            state, stats = trainer._train_step(state, feed, key, i)
        np.asarray(jax.device_get(stats["loss"]))
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, stats = trainer._train_step(state, feed, key, 2 + i)
            np.asarray(jax.device_get(stats["loss"]))
            ts.append(time.perf_counter() - t0)
        print("quad={}: full train step {:.1f} ms (min of {}; median {:.1f})".format(
            quad, min(ts) * 1e3, args.iters, sorted(ts)[len(ts) // 2] * 1e3), flush=True)


if __name__ == "__main__":
    main()
