"""Interleaved full-vs-fast render timing (tunnel weather immunity).

bench.py's sequential phases gave contradictory results across runs
(fast 4.4x faster, then 4x slower) because tunnel health drifts
minute-to-minute. This probe alternates full and fast renders and also
splits the fast path into prepass / compact / render / scatter phases.

Run: cd /root/repo && python scripts/probe_render_fast.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist
    from arcnerf_tpu.datasets import get_dataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    scan_steps, n_rays = 16, 32768
    update_configs_by_dotlist(cfgs, [
        "--name", "probe_rfast", "--dir.expr_dir", "/tmp/probe_rfast",
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
        trainer.train_steps(s * scan_steps, scan_steps)
    print("warmup done", flush=True)

    from arcnerf_tpu.utils.cfgs import dict_to_obj
    ds_cfgs = dict_to_obj({"val": {
        "type": "Synthetic", "n_imgs": 1, "wh": [800, 800],
        "cam_radius": 2.5, "white_bkg": True, "center_pixel": True,
    }})
    sample = get_dataset(ds_cfgs, "data", mode="val")[0]
    chunk = 32768

    # phase-split fast render
    rays_o = jnp.asarray(np.asarray(sample["rays_o"]))
    rays_d = jnp.asarray(np.asarray(sample["rays_d"]))

    # ONE cap for both paths: set_render_cap re-jits the scan renderer, so
    # per-rep cap switches would recompile every iteration
    trainer.set_render_cap(8)
    trainer.render_image(sample, chunk_rays=chunk)  # compile full (20 chunks)
    trainer.render_image_fast(sample, chunk_rays=chunk, hit_frac=0.5)  # compile fast (10)

    full_ts, fast_ts, pre_ts = [], [], []
    for rep in range(4):
        t0 = time.perf_counter()
        trainer.render_image(sample, chunk_rays=chunk)
        full_ts.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        hit = np.asarray(trainer._hit_prepass(trainer.state["bound_state"], rays_o, rays_d, 32))
        pre_ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _, st = trainer.render_image_fast(sample, chunk_rays=chunk, hit_frac=0.5)
        fast_ts.append(time.perf_counter() - t0)
        print("rep {}: full {:.0f} ms | prepass {:.0f} ms | fast {:.0f} ms (hit {:.3f})".format(
            rep, full_ts[-1] * 1e3, pre_ts[-1] * 1e3, fast_ts[-1] * 1e3, st["hit_frac"]), flush=True)

    print("MIN full {:.0f} ms ({:.3f} fps) | fast {:.0f} ms ({:.3f} fps) | prepass {:.0f} ms".format(
        min(full_ts) * 1e3, 1 / min(full_ts), min(fast_ts) * 1e3, 1 / min(fast_ts),
        min(pre_ts) * 1e3), flush=True)

    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        trainer.render_image_fast(sample, chunk_rays=chunk, hit_frac=0.5)
        ts.append(time.perf_counter() - t0)
    print("steady fast (no cap switches): {} ms, min {:.0f} ({:.3f} fps)".format(
        [int(t * 1e3) for t in ts], min(ts) * 1e3, 1 / min(ts)), flush=True)


if __name__ == "__main__":
    main()
