"""Interactive-render lever probe: ladder size, chunk size, cap.

bench_r3j has the fast tier at 1612 ms (0.62 fps) vs the >=2 fps target.
The per-chunk eval forward pays: fix-step ladder + occ mask + budget
select over (chunk, n_sample), encoder+MLP on the (shrunk) point budget,
scatter-back + marching over (chunk, n_sample). Three untested levers:

- eval_n_sample (set_render_cap(cap, n_sample=...)): shrinks every
  (chunk, n_sample) tensor in the eval path;
- chunk 65536: at cap 4 the shrunk budget is 2^18 exactly, so chunks of
  64k rays halve the scan length at the same per-chunk budget clamp;
- cap 2: halves the shaded points.

All configs are timed INTERLEAVED round-robin (tunnel weather immunity,
see docs/benchmark.md timing note) by stashing each config's jitted
scan renderer after its compile — set_render_cap re-jits, so naive
switching inside the loop would recompile every rep.

Run: cd /root/repo && python scripts/probe_render_surgery.py
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
    import jax.numpy as jnp  # noqa: F401  (ensures jax inits before timing)

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist, dict_to_obj
    from arcnerf_tpu.datasets import get_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    scan_steps, n_rays = 16, 32768
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_rsurg", "--dir.expr_dir", "/tmp/probe_rsurg",
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
    float(stats["loss"])  # hard sync
    print("warmup done", flush=True)

    ds_cfgs = dict_to_obj({"val": {
        "type": "Synthetic", "n_imgs": 1, "wh": [800, 800],
        "cam_radius": 2.5, "white_bkg": True, "center_pixel": True,
    }})
    sample = get_dataset(ds_cfgs, "data", mode="val")[0]

    obj_bound = trainer.cfgs.model.obj_bound

    # reference image: the bench "full" render at cap 16
    trainer.set_render_cap(16)
    ref = trainer.render_image(sample, chunk_rays=32768)["rgb"]
    print("ref render done", flush=True)

    # (name, cap, eval_n_sample, chunk)
    CONFIGS = [
        ("cap4 ns128 c32k (bench fast)", 4, None, 32768),
        ("cap4 ns128 c64k", 4, None, 65536),
        ("cap4 ns64  c32k", 4, 64, 32768),
        ("cap4 ns64  c64k", 4, 64, 65536),
        ("cap2 ns64  c64k", 2, 64, 65536),
    ]
    stash = {}
    for name, cap, ns, chunk in CONFIGS:
        trainer.set_render_cap(cap, n_sample=ns)
        t0 = time.perf_counter()
        img, st = trainer.render_image_fast(sample, chunk_rays=chunk, hit_frac=0.42)
        stash[name] = (trainer._render_scan, cap, ns, chunk)
        print("compiled {} in {:.0f} s | psnr {:.2f} | hit {:.3f} clip {}".format(
            name, time.perf_counter() - t0, psnr(img["rgb"], ref),
            st["hit_frac"], st["clipped_rays"]), flush=True)

    times = {name: [] for name, *_ in CONFIGS}
    for rep in range(4):
        for name, cap, ns, chunk in CONFIGS:
            fn, cap_, ns_, chunk_ = stash[name]
            setattr(obj_bound, "eval_max_pts_per_ray", cap_)
            setattr(obj_bound, "eval_n_sample", ns_)
            trainer._render_scan = fn
            t0 = time.perf_counter()
            trainer.render_image_fast(sample, chunk_rays=chunk_, hit_frac=0.42)
            times[name].append(time.perf_counter() - t0)
        print("rep {}: ".format(rep) + " | ".join(
            "{} {:.0f}".format(n.split()[0] + n.split()[1], times[n][-1] * 1e3)
            for n, *_ in CONFIGS), flush=True)

    print("\n=== min-of-4 ===", flush=True)
    for name, *_ in CONFIGS:
        t = min(times[name])
        print("{:<30s} {:6.0f} ms  {:.3f} fps".format(name, t * 1e3, 1.0 / t), flush=True)

    # stage split at the bench-fast config: prepass / scan / host composite
    name, cap, ns, chunk = CONFIGS[0]
    fn, cap_, ns_, chunk_ = stash[name]
    setattr(obj_bound, "eval_max_pts_per_ray", cap_)
    setattr(obj_bound, "eval_n_sample", ns_)
    trainer._render_scan = fn
    import jax
    rays_o = jnp.asarray(np.asarray(sample["rays_o"]))
    rays_d = jnp.asarray(np.asarray(sample["rays_d"]))
    pre_ts, scan_ts = [], []
    n = sample["rays_o"].shape[0]
    for _ in range(4):
        t0 = time.perf_counter()
        hit = np.asarray(trainer._hit_prepass(trainer.state["bound_state"], rays_o, rays_d, 0))
        pre_ts.append(time.perf_counter() - t0)
        idx = np.nonzero(hit)[0]
        budget = int(-(-(n * 0.42) // chunk_)) * chunk_
        idx = idx[:budget]
        if len(idx) < budget:
            idx = np.concatenate([idx, np.full(budget - len(idx), idx[-1], dtype=idx.dtype)])
        sub = {k: np.asarray(sample[k])[idx] for k in ("rays_o", "rays_d")}
        sub["bounds"] = None
        t0 = time.perf_counter()
        out = trainer._render_rays_stacked(sub, budget, chunk_)
        _ = np.asarray(out["rgb"])[0]  # hard sync
        scan_ts.append(time.perf_counter() - t0)
    print("stage split (bench fast): prepass {:.0f} ms | scan+host {:.0f} ms".format(
        min(pre_ts) * 1e3, min(scan_ts) * 1e3), flush=True)


if __name__ == "__main__":
    main()
