"""PSNR-vs-wallclock ladder on the TPU (VERDICT r3 item 2).

Trains the NGP recipe on a procedural scene sized so the DATA POOL is not
the quality ceiling (the 24-view 96x96 pool saturates ~29 dB), and
records val PSNR at wall-clock marks mirroring the reference's step
ladder (reference docs/benchmark.md:48-54: ~4 s / 18 s / 40 s / 3 min /
17 min on its GPU). Artifacts land under experiments/<name>/ — the
ladder json is the quality-per-wallclock evidence next to the
throughput-only projections.

Run: python scripts/run_psnr_ladder.py [--minutes 1 3 10 25] [--name ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    # default marks mirror the reference's ladder times (~4 s, 18 s, 40 s,
    # 3 min, 17 min; reference docs/benchmark.md:48-54) plus a 25-min tail
    ap.add_argument("--marks", type=float, nargs="+",
                    default=[0.067, 0.3, 0.67, 3.0, 10.0, 17.0, 25.0],
                    help="wall-clock marks (minutes)")
    ap.add_argument("--name", default="ngp_ladder_r5")
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--views", type=int, default=128)
    ap.add_argument("--wh", type=int, default=400)
    # r5 scene: supersampled GT (antialiased silhouettes) + procedural
    # surface texture raise the DATA ceiling above 36 dB — the r4 1-sample
    # hard-edge GT capped achievable PSNR at ~34 dB regardless of model
    ap.add_argument("--ss", type=int, default=4)
    ap.add_argument("--texture", type=float, default=9.0)
    ap.add_argument("--config", default="synthetic_ngp.yaml")
    ap.add_argument("--n_sample", type=int, default=128)
    ap.add_argument("--override", nargs="*", default=[],
                    help="extra dotted config overrides (k v k v ...)")
    args = ap.parse_args()

    import jax

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expr_dir = os.path.join(root, "experiments")
    from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs

    cfgs = load_configs(os.path.join(root, "configs", "expr", args.config))
    overrides = [
        "--name", args.name, "--dir.expr_dir", expr_dir,
        "--progress.epoch", "1000000", "--progress.epoch_loss", "200",
        "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", "16",
        "--n_rays", str(args.rays),
        "--dataset.train.n_imgs", str(args.views),
        "--dataset.train.wh", "[{},{}]".format(args.wh, args.wh),
        "--dataset.train.supersample", str(args.ss),
        "--dataset.train.texture_freq", str(args.texture),
        "--dataset.val.n_imgs", "4",
        "--dataset.val.wh", "[{},{}]".format(args.wh, args.wh),
        "--dataset.val.supersample", str(args.ss),
        "--dataset.val.texture_freq", str(args.texture),
    ]
    if args.n_sample > 0:
        overrides += ["--model.rays.n_sample", str(args.n_sample)]
    # occupancy-volume knobs only apply to volume-bounded recipes: injecting
    # volume keys into a sphere-bound config would CHANGE the bound type
    # (build_obj_bound selects by cfg keys)
    obj_bound = get_value_from_cfgs_field(cfgs.model, "obj_bound", None)
    if obj_bound is not None and valid_key_in_cfgs(obj_bound, "volume"):
        overrides += ["--model.obj_bound.volume.n_grid", "64",
                      "--model.obj_bound.epoch_optim_warmup", "32"]
    sched = get_value_from_cfgs_field(cfgs.dataset.train, "scheduler", None)
    if sched is not None and valid_key_in_cfgs(sched, "dynamic_batch_size"):
        overrides += ["--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000"]
    update_configs_by_dotlist(cfgs, overrides + [
        "--" + o if i % 2 == 0 and not o.startswith("--") else o
        for i, o in enumerate(args.override)])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(), "pool rays:",
          trainer.pipeline.n_total_rays, flush=True)

    marks = sorted(args.marks)
    ladder = []
    scan = trainer.scan_steps
    epoch = 0
    # wall clock starts at the first STEP (compile excluded: the reference's
    # published ladder also excludes its CUDA build; note compile time
    # separately for honesty)
    t_compile0 = time.perf_counter()
    stats = trainer.train_steps(epoch, scan)
    float(stats["loss"])
    epoch += scan
    compile_s = time.perf_counter() - t_compile0
    print("first stride (compile) {:.1f} s".format(compile_s), flush=True)

    t0 = time.perf_counter()
    next_mark = 0
    stride_times = []
    stall_s = 0.0
    while next_mark < len(marks):
        t_s = time.perf_counter()
        stats = trainer.train_steps(epoch, scan)
        # HARD SYNC each stride: dispatch is async through the tunnel, so
        # without this the loop enqueues hundreds of strides while the wall
        # clock reads ~0, and every mark lands at the drained-queue time
        # (the r4 first ladder run: all marks at ~69.5 min). The ~30 ms
        # readback is part of honest wall time.
        float(stats["loss"])
        dt_s = time.perf_counter() - t_s
        # TUNNEL-STALL detector (r4 ladder had a ~6.5 min stall between the
        # 3 and 10 min marks, under-reporting the tail): a stride taking
        # > max(5x median, 3 s) is a transport fault, not training cost —
        # pause the clock for the excess and record it for honesty.
        if len(stride_times) >= 8:
            med = sorted(stride_times)[len(stride_times) // 2]
            lim = max(5.0 * med, 3.0)
            if dt_s > lim:
                t0 += dt_s - med
                stall_s += dt_s - med
                print("stall: stride took {:.1f}s (median {:.2f}s) — clock paused".format(
                    dt_s, med), flush=True)
                dt_s = med
        stride_times.append(dt_s)
        if len(stride_times) > 64:
            stride_times.pop(0)
        epoch += scan
        elapsed_min = (time.perf_counter() - t0) / 60.0
        if elapsed_min >= marks[next_mark]:
            train_min = (time.perf_counter() - t0) / 60.0
            t_eval = time.perf_counter()
            summary = trainer.valid_epoch(epoch)
            entry = {
                "mark_min": marks[next_mark],
                "train_min": round(train_min, 2),
                "steps": int(epoch),
                "val_psnr": round(float(summary["psnr"]), 2),
                "eval_s": round(time.perf_counter() - t_eval, 1),
                "loss": round(float(stats["loss"]), 5),
                "stall_paused_s": round(stall_s, 1),
            }
            ladder.append(entry)
            print(json.dumps(entry), flush=True)
            next_mark += 1
            # eval time doesn't count against the train clock
            t0 += time.perf_counter() - t_eval

    out = {
        "name": args.name,
        "views": args.views, "wh": args.wh, "rays": args.rays,
        "supersample": args.ss, "texture_freq": args.texture,
        "config": args.config, "stall_paused_s": round(stall_s, 1),
        "compile_s": round(compile_s, 1),
        "ladder": ladder,
        "reference_ladder": "lego NGP: 100st/4s/16.11  500st/18s/17.95  "
                            "2k/40s/30.01  10k/3min/33.14  50k/17min/35.38 "
                            "(reference docs/benchmark.md:48-54)",
    }
    path = os.path.join(expr_dir, args.name, "psnr_ladder.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("ladder written to", path, flush=True)


if __name__ == "__main__":
    main()
