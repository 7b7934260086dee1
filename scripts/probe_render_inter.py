"""Interactive (adaptive-resolution) render tier timing at bench shapes.

Times render_image_interactive at scale 2/3 (cap 4, ns 64) interleaved
with the cap-4 full-res fast tier, min-of-4, PSNR vs the cap-16 full
render. Run when the TPU is otherwise idle.

Run: cd /root/repo && python scripts/probe_render_inter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def main():
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist, dict_to_obj
    from arcnerf_tpu.datasets import get_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    scan_steps, n_rays = 16, 32768
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_rint", "--dir.expr_dir", "/tmp/probe_rint",
        "--progress.epoch", str(8 * scan_steps),
        "--progress.epoch_loss", "1000000", "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", str(scan_steps), "--n_rays", str(n_rays),
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    for s in range(8):
        stats = trainer.train_steps(s * scan_steps, scan_steps)
    float(stats["loss"])
    print("warmup done", flush=True)

    ds_cfgs = dict_to_obj({"val": {
        "type": "Synthetic", "n_imgs": 1, "wh": [800, 800],
        "cam_radius": 2.5, "white_bkg": True, "center_pixel": True,
    }})
    sample = get_dataset(ds_cfgs, "data", mode="val")[0]

    trainer.set_render_cap(16)
    ref = trainer.render_image(sample, chunk_rays=32768)["rgb"]
    print("ref done", flush=True)

    obj_bound = trainer.cfgs.model.obj_bound
    # warm both interactive scales + the fast tier under (cap4, ns64),
    # stashing the jitted scan fn (one config -> no re-jit switches)
    trainer.set_render_cap(4, n_sample=64)
    runs = [
        ("fast  cap4 ns64", lambda: trainer.render_image_fast(sample, chunk_rays=32768, hit_frac=0.42)),
        ("inter s2 cap4 ns64", lambda: trainer.render_image_interactive(
            sample, scale=2, chunk_rays=32768, hit_frac=0.42)),
        ("inter s3 cap4 ns64", lambda: trainer.render_image_interactive(
            sample, scale=3, chunk_rays=32768, hit_frac=0.42)),
    ]
    for name, fn in runs:
        t0 = time.perf_counter()
        img, st = fn()
        print("compiled {} in {:.0f} s | psnr {:.2f} | stats {}".format(
            name, time.perf_counter() - t0, psnr(img["rgb"], ref),
            {k: round(v, 3) if isinstance(v, float) else v for k, v in st.items()}), flush=True)

    times = {n: [] for n, _ in runs}
    for rep in range(5):
        for name, fn in runs:
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
        print("rep {}: ".format(rep) + " | ".join(
            "{} {:.0f}".format(n.split()[0] + n.split()[1], times[n][-1] * 1e3) for n, _ in runs), flush=True)

    print("\n=== min-of-5 ===", flush=True)
    for name, _ in runs:
        t = min(times[name])
        print("{:<22s} {:6.0f} ms  {:.3f} fps".format(name, t * 1e3, 1.0 / t), flush=True)


if __name__ == "__main__":
    main()
