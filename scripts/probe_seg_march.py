"""A/B the segmented compacted-stream ray marching on the real backend.

Times warmed train strides at the bench workload (32k rays x 128 samples,
64^3 grid, 2^18 budget) with ARCNERF_SEG_MARCH inherited from the env, so
run it twice:

    ARCNERF_SEG_MARCH=0 python scripts/probe_seg_march.py
    ARCNERF_SEG_MARCH=1 python scripts/probe_seg_march.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--scan-steps", type=int, default=16)
    ap.add_argument("--warmup-strides", type=int, default=4)
    ap.add_argument("--timed-strides", type=int, default=4)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/arcnerf_tpu_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    scan_steps = args.scan_steps
    n_epoch = (args.warmup_strides + args.timed_strides) * scan_steps
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_seg_march", "--dir.expr_dir", "/tmp/probe_seg_march",
        "--progress.epoch", str(n_epoch),
        "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", str(scan_steps),
        "--n_rays", str(args.rays),
        "--dataset.train.n_imgs", "10",
        "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(),
          "seg_march:", os.environ.get("ARCNERF_SEG_MARCH", "1"), flush=True)

    epoch = 0
    for _ in range(args.warmup_strides):
        stats = trainer.train_steps(epoch, scan_steps)
        epoch += scan_steps
    loss = float(stats["loss"])  # hard sync
    t0 = time.perf_counter()
    for _ in range(args.timed_strides):
        stats = trainer.train_steps(epoch, scan_steps)
        epoch += scan_steps
    loss = float(stats["loss"])  # hard sync
    elapsed = time.perf_counter() - t0
    steps = args.timed_strides * scan_steps
    print("final loss {:.5f}".format(loss), flush=True)
    print("step_ms {:.2f}  rays/s {:.1f}".format(
        elapsed / steps * 1e3, steps * args.rays / elapsed), flush=True)


if __name__ == "__main__":
    main()
