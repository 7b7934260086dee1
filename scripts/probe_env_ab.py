"""Generic in-step A/B of an env-flagged variant at bench shapes (r5).

Runs the LIVE NGP train step (32k-ray bucket, settled occupancy) in a
subprocess per flag value — env flags are read at import — and reports
ms/step per arm, plus an optional short-horizon quality gate (train to
--gate_epochs and eval 4 held-out views) so a numerics-changing variant
ships with a PSNR delta next to its speedup.

Run: python scripts/probe_env_ab.py --var ARCNERF_BF16_UPD --values 0 1 \
        [--rays 32768] [--gate_epochs 600]
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

gate_epochs = {gate_epochs}
cfgs = load_configs(os.path.join({root!r}, "configs", "expr", "synthetic_ngp.yaml"))
update_configs_by_dotlist(cfgs, [
    "--name", "probe_ab", "--dir.expr_dir", "/tmp/probe_ab",
    "--progress.epoch", "1000000", "--progress.epoch_loss", "1000000",
    "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
    "--progress.scan_steps", "16",
    "--n_rays", str({rays}),
    "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
    "--dataset.val.n_imgs", "4", "--dataset.val.wh", "[96,96]",
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
out = {{"var": {var!r}, "value": os.environ.get({var!r}),
        "step_ms": round(dt / 64 * 1e3, 2), "loss": loss}}
if gate_epochs:
    while ep < gate_epochs:
        stats = trainer.train_steps(ep, 16); ep += 16
    float(stats["loss"])
    out["gate_epochs"] = ep
    out["gate_val_psnr"] = round(float(trainer.valid_epoch(ep)["psnr"]), 2)
import json as _j
print(_j.dumps(out))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--var", required=True)
    ap.add_argument("--values", nargs="+", required=True)
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--gate_epochs", type=int, default=0)
    args = ap.parse_args()
    code = CHILD.format(root=ROOT, rays=args.rays, var=args.var,
                        gate_epochs=args.gate_epochs)
    results = []
    for val in args.values:
        env = dict(os.environ)
        env[args.var] = val
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if line:
            r = json.loads(line[-1])
            results.append(r)
            print(json.dumps(r), flush=True)
        else:
            print(val, "FAILED:", out.stderr[-500:], flush=True)
    if len(results) == 2:
        a, b = results
        print("{}={} {:.2f} ms vs {}={} {:.2f} ms -> {:+.1f}%".format(
            args.var, a["value"], a["step_ms"], args.var, b["value"], b["step_ms"],
            (a["step_ms"] / b["step_ms"] - 1) * 100))


if __name__ == "__main__":
    main()
