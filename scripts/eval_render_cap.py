"""Render-cap quality/speed ladder on a trained checkpoint.

The inference render path caps valid samples per ray front-to-back
(obj_bound.eval_max_pts_per_ray) — the reference CUDA march's
early-termination analogue. This script loads a checkpoint, renders the
800x800 val view at several caps, and reports PSNR + latency per cap so
the default render cap is a measured choice, not a guess.

Usage:
    python scripts/eval_render_cap.py experiments/ngp_tpu_r3 [caps...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    expr = sys.argv[1] if len(sys.argv) > 1 else "experiments/ngp_tpu_r3"
    caps = [int(c) for c in sys.argv[2:]] or [4, 8, 16, 32]

    import jax.numpy as jnp

    from arcnerf_tpu.metrics import psnr
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    cfgs = load_configs(os.path.join(expr, "cfgs.yaml"))
    ckpt = os.path.join(expr, "checkpoints", "latest.ckpt")
    if os.path.exists(os.path.join(expr, "checkpoints", "final.ckpt")):
        ckpt = os.path.join(expr, "checkpoints", "final.ckpt")
    update_configs_by_dotlist(cfgs, [
        "--resume", ckpt,
        "--progress.epoch", "0",
        "--dir.expr_dir", "/tmp/eval_render_cap",
    ])
    trainer = ArcNerfTrainer(cfgs)

    sample = trainer.data["val"][0]
    gt = np.asarray(sample["img"])
    wh = sample["img"].shape
    bkg = trainer.eval_bkg_color("val")

    print("checkpoint:", ckpt, "| view:", wh, flush=True)
    for cap in caps:
        trainer.set_render_cap(cap)
        imgs = trainer.render_image(sample, bkg_color=bkg)  # compile at this cap
        t0 = time.perf_counter()
        imgs = trainer.render_image(sample, bkg_color=bkg)
        dt = time.perf_counter() - t0
        pred = np.asarray(imgs["rgb"])
        p = float(psnr(jnp.asarray(pred), jnp.asarray(gt.reshape(pred.shape))))
        print("cap {:3d}: psnr {:6.2f}  render {:7.1f} ms  ({:5.2f} fps)".format(
            cap, p, dt * 1e3, 1.0 / dt), flush=True)
    # uncapped reference (None disables the cap; -1 would cap to zero)
    trainer.set_render_cap(None)
    imgs = trainer.render_image(sample, bkg_color=bkg)
    t0 = time.perf_counter()
    imgs = trainer.render_image(sample, bkg_color=bkg)
    dt = time.perf_counter() - t0
    pred = np.asarray(imgs["rgb"])
    p = float(psnr(jnp.asarray(pred), jnp.asarray(gt.reshape(pred.shape))))
    print("uncapped: psnr {:6.2f}  render {:7.1f} ms  ({:5.2f} fps)".format(
        p, dt * 1e3, 1.0 / dt), flush=True)


if __name__ == "__main__":
    main()
