"""Measure whether a bigger ray bucket rides the same 2^18 point budget.

Trains the NGP bench recipe at 16384 rays until the occupancy grid settles
(64 steps), reports the measured valid-point count, then re-times strides
at 32768 and 65536 rays with the SAME trained state. If steady-state valid
points per 16k rays is well under the 2^18 compaction budget, larger
buckets are clip-free and rays/s scales — this is exactly the reference's
dynamic-batch-size semantics (grow rays until the sample budget fills,
arcnerf_trainer.py dynamic_batch_size).
"""

import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo — a set PYTHONPATH breaks the
# axon TPU-tunnel plugin registration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN = 16


def build_trainer(n_rays, expr):
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    update_configs_by_dotlist(cfgs, [
        "--name", expr, "--dir.expr_dir", "/tmp/" + expr,
        "--progress.epoch", "4096", "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", str(SCAN),
        "--n_rays", str(n_rays),
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    return ArcNerfTrainer(cfgs)


def timed_strides(trainer, epoch0, n_strides):
    t = trainer
    stats = t.train_steps(epoch0, SCAN)  # warm/compile stride
    float(stats["loss"])
    t0 = time.perf_counter()
    for i in range(n_strides):
        stats = t.train_steps(epoch0 + (i + 1) * SCAN, SCAN)
    loss = float(stats["loss"])
    dt = (time.perf_counter() - t0) / (n_strides * SCAN)
    return dt, loss, stats


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)

    t16 = build_trainer(16384, "probe_bucket16")
    # settle occupancy: 64 steps (warmup 32 + two optimize passes)
    for e in range(0, 64, SCAN):
        stats = t16.train_steps(e, SCAN)
    print("loss after 64 steps: {:.4f}".format(float(stats["loss"])), flush=True)
    if "n_valid_pts" in stats:
        v = np.asarray(stats["n_valid_pts"]).ravel()
        print("valid pts @16k rays: {} (budget {})".format(int(v[-1]), 2**18), flush=True)

    dt, loss, _ = timed_strides(t16, 64, 3)
    print("16384 rays: {:6.1f} ms/step = {:8.0f} rays/s (loss {:.4f})".format(
        dt * 1e3, 16384 / dt, loss), flush=True)

    for n_rays in (32768, 65536):
        tr = build_trainer(n_rays, "probe_bucket{}".format(n_rays))
        # carry trained state; deep-copy buffers — the donated train step
        # would otherwise invalidate t16's arrays for the next bucket
        tr.state = jax.tree_util.tree_map(lambda x: x.copy(), t16.state)
        dt, loss, stats = timed_strides(tr, 128, 3)
        extra = ""
        if "n_valid_pts" in stats:
            v = np.asarray(stats["n_valid_pts"]).ravel()
            extra = " valid_pts {} ({}clipped)".format(
                int(v[-1]), "" if int(v[-1]) >= 2**18 else "not ")
        print("{} rays: {:6.1f} ms/step = {:8.0f} rays/s (loss {:.4f}){}".format(
            n_rays, dt * 1e3, n_rays / dt, loss, extra), flush=True)


if __name__ == "__main__":
    main()
