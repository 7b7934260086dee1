"""Windowed render tiers under the COUNTED pass ladder (r4 item 3).

Bench r4's first cut ran the windowed render with a geometric pass
ladder: n_pass = ceil(n_sample/cap) = 16 passes, each floored at one
chunk — ~15 nearly-empty passes (~170 ms each) dominated the frame, and
the 0.25^p budget guesses CLIPPED alive rays (windowed_s1 measured only
32.8 dB vs full). The counted ladder sizes every pass from the
valid-count prepass histogram (#(count >= p*cap) rays can't clip) and
drops empty passes statically.

This probe times full / windowed s1..s4 (+refine) at the bench scene
and shapes, reporting ms, fps, PSNR-vs-full, and the ladder each tier
actually ran.

Run: python scripts/probe_windowed_tiers.py [--scales 1 2 3 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 2, 3, 4])
    ap.add_argument("--refine", type=float, nargs="+", default=[0.0, 0.05])
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--settle_strides", type=int, default=8)
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--win_cap", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import dict_to_obj, load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    scan = 16
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_windowed", "--dir.expr_dir", "/tmp/probe_windowed",
        "--progress.epoch", str(args.settle_strides * scan),
        "--progress.epoch_loss", "1000000", "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", str(scan),
        "--n_rays", str(args.rays),
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(), flush=True)

    t0 = time.perf_counter()
    for s in range(args.settle_strides):
        stats = trainer.train_steps(s * scan, scan)
    print("settled {} steps, loss {:.5f} ({:.1f} s)".format(
        args.settle_strides * scan, float(stats["loss"]),
        time.perf_counter() - t0), flush=True)

    ds_cfgs = dict_to_obj({"val": {
        "type": "Synthetic", "n_imgs": 1, "wh": [args.wh, args.wh],
        "cam_radius": 2.5, "white_bkg": True, "center_pixel": True,
    }})
    sample = get_dataset(ds_cfgs, "data", mode="val")[0]
    chunk = min(args.rays, 32768)

    trainer.set_render_cap(16)
    full = trainer.render_image(sample, chunk_rays=chunk)
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        full = trainer.render_image(sample, chunk_rays=chunk)
        ts.append(time.perf_counter() - t0)
    print("full cap16: {:.0f} ms".format(min(ts) * 1e3), flush=True)
    ref = np.asarray(full["rgb"])

    def psnr(img):
        mse = float(np.mean((np.asarray(img) - ref) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    n_pass_max = 128 // args.win_cap
    for s in args.scales:
        for rf in args.refine:
            if rf > 0.0 and s == 1:
                continue
            trainer.set_render_cap(args.win_cap, window=True)
            kw = dict(n_pass=n_pass_max, chunk_rays=chunk, scale=s, eps=1e-3,
                      adaptive_budget=True, refine_frac=rf)
            imgs, stats = trainer.render_image_windowed(sample, **kw)  # calibrate
            alive = [a for a in stats.get("alive_per_pass", ()) if a > 0]
            if alive:
                kw["pass_budget_rays"] = tuple(2 * a + 256 for a in alive)
                kw["budget_rays"] = stats.get("budget_rays")
            imgs, stats = trainer.render_image_windowed(sample, **kw)  # compile
            if stats.get("clipped_alive", 0) or stats.get("hit_clipped", 0):
                kw.pop("pass_budget_rays", None)
                kw.pop("budget_rays", None)
                imgs, stats = trainer.render_image_windowed(sample, **kw)
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                imgs, stats = trainer.render_image_windowed(sample, **kw)
                ts.append(time.perf_counter() - t0)
            t = min(ts)
            print("windowed s{} rf{:.2f}: {:6.0f} ms  {:5.2f} fps  "
                  "{:5.2f} dB  ladder {} + pass1 {}  alive_end {} clipped {}".format(
                      s, rf, t * 1e3, 1.0 / t, psnr(imgs["rgb"]),
                      stats.get("budget_rays"), stats.get("pass_budget_rays"),
                      stats.get("alive_at_end"), stats.get("clipped_alive")),
                  flush=True)


if __name__ == "__main__":
    main()
