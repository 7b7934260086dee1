"""A/B the lane-extraction construction form (slot vs direct) in the LIVE
train step at bench shapes (r5).

"slot" builds masks on the (n, S) slot view and multiplies an (n, S, F)
view of the gathered rows — fewest mask ops, but the view forces a
physical relayout per level on TPU (xprof r5: ~1.7 ms/level of reshape +
copy in the backward, plus the forward's (n, 128) -> (n, 64, 2) reshape).
"direct" pays more VPU mask arithmetic to stay in the native (n, 128) row
layout end to end. The env var is read at import, so each arm runs in a
subprocess.

Run: python scripts/probe_laneform.py [--rays 32768]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r'''
import os, sys, time
sys.path.insert(0, {root!r})
import jax
from arcnerf_tpu.trainer import ArcNerfTrainer
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

cfgs = load_configs(os.path.join({root!r}, "configs", "expr", "synthetic_ngp.yaml"))
update_configs_by_dotlist(cfgs, [
    "--name", "probe_laneform", "--dir.expr_dir", "/tmp/probe_laneform",
    "--progress.epoch", "200", "--progress.epoch_loss", "1000000",
    "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
    "--progress.scan_steps", "16",
    "--n_rays", str({rays}),
    "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
    "--model.rays.n_sample", "128",
    "--model.obj_bound.volume.n_grid", "64",
    "--model.obj_bound.epoch_optim_warmup", "32",
    "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
])
trainer = ArcNerfTrainer(cfgs)
ep = 0
for _ in range(4):  # warmup + occupancy settle
    stats = trainer.train_steps(ep, 16); ep += 16
float(stats["loss"])
t0 = time.perf_counter()
for _ in range(4):
    stats = trainer.train_steps(ep, 16); ep += 16
loss = float(stats["loss"])
dt = time.perf_counter() - t0
import json as _j
print(_j.dumps({{"form": os.environ.get("ARCNERF_LANE_FORM", "slot"),
                 "step_ms": round(dt / 64 * 1e3, 2), "loss": loss}}))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--forms", nargs="+", default=["slot", "direct"])
    args = ap.parse_args()
    code = CHILD.format(root=ROOT, rays=args.rays)
    results = []
    for form in args.forms:
        env = dict(os.environ, ARCNERF_LANE_FORM=form)
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=1800)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if line:
            r = json.loads(line[-1])
            results.append(r)
            print(r, flush=True)
        else:
            print(form, "FAILED:", out.stderr[-500:], flush=True)
    if len(results) == 2:
        a, b = results
        print("{} {:.2f} ms vs {} {:.2f} ms -> {:+.1f}%".format(
            a["form"], a["step_ms"], b["form"], b["step_ms"],
            (a["step_ms"] / b["step_ms"] - 1) * 100))


if __name__ == "__main__":
    main()
