"""Upper quality bound of adaptive-resolution render tiers (r4).

Renders the bench scene once EXACTLY (compact tier) at 800x800, then
simulates the scale-2/3 tiers with PERFECT subgrid samples: take the
exact image's stride-s pixels and bilinear-upsample back. The PSNR of
that reconstruction vs the full exact render is the ceiling ANY
stride-s tier can reach regardless of how good its per-ray rendering
is — it separates "the cap approximation hurts" from "the resolution
hurts" and tells us whether a scale-2-exact tier can clear the 30 dB
bar (VERDICT r3 item 3).

Also reports the same with a cheap edge-refine: replace the top-q% of
pixels by |upsample - full| proxy (local Laplacian of the UPSAMPLED
image, no oracle) with exact values — the quality a
subgrid+edge-refinement tier would reach.

Run: python scripts/probe_upsample_bound.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    import jax

    from arcnerf_tpu.trainer.trainer import _bilinear_upsample
    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_upsample", "--dir.expr_dir", "/tmp/probe_upsample",
        "--progress.epoch", "220", "--progress.epoch_loss", "100",
        "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
        "--n_rays", "16384",
        "--dataset.train.n_imgs", "8", "--dataset.train.wh", "[800,800]",
        "--dataset.val.n_imgs", "1", "--dataset.val.wh", "[800,800]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "16",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    print("backend:", jax.default_backend(), flush=True)
    trainer.train()

    from arcnerf_tpu.datasets import get_dataset as _gd
    val_ds = _gd(cfgs.dataset, cfgs.dir.data_dir, mode="val")
    sample = val_ds[0]
    h, w = int(sample["H"]), int(sample["W"])

    # ground truth: the UNCAPPED full render (this scene keeps many valid
    # samples per ray, so a capped render is itself an approximation)
    trainer.set_render_cap(None)
    t0 = time.perf_counter()
    full = trainer.render_image(sample, bkg_color=trainer.eval_bkg_color("val"))
    rgb_full = np.asarray(full["rgb"], np.float32)
    rgb_full.ravel()[0]
    t_full = time.perf_counter() - t0
    print("uncapped full render: {:.0f} ms".format(t_full * 1e3), flush=True)

    trainer.set_render_cap(16)
    t0 = time.perf_counter()
    comp, _ = trainer.render_image_fast(sample, bkg_color=trainer.eval_bkg_color("val"))
    np.asarray(comp["rgb"]).ravel()[0]
    print("compact cap-16 render: {:.0f} ms  {:.2f} dB vs full".format(
        (time.perf_counter() - t0) * 1e3,
        psnr(np.asarray(comp["rgb"], np.float32), rgb_full)), flush=True)

    for s in (2, 3, 4):
        off = s // 2
        sub = rgb_full[off::s, off::s]
        up = _bilinear_upsample(sub, h, w, off, s)
        p = psnr(up, rgb_full)
        print("scale {}: perfect-subgrid upsample PSNR vs full = {:.2f} dB".format(s, p), flush=True)

        # edge refinement: pick top-q% pixels by Laplacian of the UPSAMPLED
        # frame (computable without the full render), replace with exact
        lap = np.abs(
            4 * up
            - np.roll(up, 1, 0) - np.roll(up, -1, 0)
            - np.roll(up, 1, 1) - np.roll(up, -1, 1)
        ).sum(-1)
        for q in (5, 10, 20):
            k = int(h * w * q / 100)
            idx = np.argpartition(lap.ravel(), -k)[-k:]
            up_r = up.reshape(-1, 3).copy()
            up_r[idx] = rgb_full.reshape(-1, 3)[idx]
            print("  + refine top {:2d}% edges: {:.2f} dB".format(
                q, psnr(up_r.reshape(h, w, 3), rgb_full)), flush=True)

    # ---------------- transmittance-continuation (windowed) tiers, timed
    def timed_frames(fn, iters=3):
        out = fn()
        np.asarray(out[0]["rgb"]).ravel()[0]
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[0]["rgb"]).ravel()[0]
            ts.append(time.perf_counter() - t0)
        return out, min(ts)

    bkg = trainer.eval_bkg_color("val")
    for cap, n_pass, af in ((8, 3, 0.25), (8, 6, 0.25)):
        trainer.set_render_cap(cap, window=True)
        for s in (1, 2, 3, 4):
            (imgs, stats), t = timed_frames(
                lambda s=s: trainer.render_image_windowed(
                    sample, n_pass=n_pass, alive_frac=af, bkg_color=bkg, scale=s))
            p = psnr(np.asarray(imgs["rgb"], np.float32), rgb_full)
            print("windowed cap{} x{} af{} scale {}: {:6.0f} ms ({:4.2f} fps)  "
                  "{:.2f} dB vs full  alive_end {} clipped {}".format(
                      cap, n_pass, af, s, t * 1e3, 1.0 / t, p,
                      stats.get("alive_at_end"), stats.get("clipped_alive")), flush=True)
    trainer.set_render_cap(16)


if __name__ == "__main__":
    main()
