"""Round 3: where the 800x800 render goes, and what early termination
could buy. Trains the bench NGP recipe for the same warmup as bench.py,
then:

  1. times render_image at per-ray caps {16, 8, 4} and chunk sizes
     {16384, 32768} (several reps — the single-shot bench number has
     shown 8.2 -> 23.6 s variance through the tunnel);
  2. measures the valid-sample and transmittance profile of the trained
     scene at 800x800: valid samples per ray, and per-ray samples until
     T < {1e-2, 1e-4} — the headroom a trans-cutoff render mode has.

Run: cd /root/repo && python scripts/probe_render.py
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
        "--name", "probe_render", "--dir.expr_dir", "/tmp/probe_render",
        "--progress.epoch", str(8 * scan_steps),
        "--progress.epoch_loss", "1000000",
        "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000000",
        "--progress.scan_steps", str(scan_steps),
        "--n_rays", str(n_rays),
        "--dataset.train.n_imgs", "10",
        "--dataset.train.wh", "[96,96]",
        "--model.rays.n_sample", "128",
        "--model.obj_bound.volume.n_grid", "64",
        "--model.obj_bound.epoch_optim_warmup", "32",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ])
    trainer = ArcNerfTrainer(cfgs)
    for s in range(8):
        trainer.train_steps(s * scan_steps, scan_steps)
    print("warmup done", flush=True)

    ds_cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    update_configs_by_dotlist(ds_cfgs, ["--name", "probe_render_ds"])
    ds_cfgs.dataset.val.n_imgs = 1
    ds_cfgs.dataset.val.wh = [800, 800]
    render_ds = get_dataset(ds_cfgs.dataset, "data", mode="val")
    sample = render_ds[0]

    # ---- 2. occupancy / transmittance profile at 800x800 (chunked fwd)
    h, w = int(sample["H"]), int(sample["W"])
    n = sample["rays_o"].shape[0]
    trainer.set_render_cap(None)

    @jax.jit
    def profile_chunk(params, bound_state, feed):
        out = trainer.model.apply({"params": params}, feed, inference_only=True,
                                  bound_state=bound_state, get_progress=True)
        w_ = out["progress_weights"][0]  # (chunk, N)
        alpha = out["progress_alpha"][0]
        valid = jnp.sum((alpha > 0).astype(jnp.int32), axis=1)
        logt = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
        trans = jnp.exp(jnp.cumsum(logt, axis=1))
        n_to = lambda eps: jnp.sum((trans > eps).astype(jnp.int32), axis=1)
        return valid, n_to(1e-2), n_to(1e-4), jnp.sum(w_, axis=1)

    chunk = 16384
    stats = {"valid": [], "t2": [], "t4": [], "acc": []}
    for lo in range(0, n, chunk):
        feed = {k: jnp.asarray(np.asarray(sample[k])[None, lo:lo + chunk])
                for k in ("rays_o", "rays_d") if k in sample}
        if feed["rays_o"].shape[1] < chunk:
            break
        v, t2, t4, acc = jax.device_get(profile_chunk(
            trainer.eval_params(), trainer.state["bound_state"], feed))
        stats["valid"].append(v); stats["t2"].append(t2)
        stats["t4"].append(t4); stats["acc"].append(acc)
    valid = np.concatenate(stats["valid"]); t2 = np.concatenate(stats["t2"])
    t4 = np.concatenate(stats["t4"])
    print("rays profiled:", valid.size, flush=True)
    print("valid samples/ray: mean {:.2f} p50 {} p90 {} p99 {} max {}".format(
        valid.mean(), *np.percentile(valid, [50, 90, 99]).astype(int), valid.max()), flush=True)
    print("samples to T<1e-2 (capped at valid): mean {:.2f} p90 {} p99 {}".format(
        np.minimum(t2, valid).mean(), *np.percentile(np.minimum(t2, valid), [90, 99]).astype(int)), flush=True)
    print("samples to T<1e-4: mean {:.2f} p90 {} p99 {}".format(
        np.minimum(t4, valid).mean(), *np.percentile(np.minimum(t4, valid), [90, 99]).astype(int)), flush=True)

    # ---- 1. render timings at caps/chunks
    for cap in (16, 8, 4):
        trainer.set_render_cap(cap)
        for chunk_rays in (16384, 32768):
            imgs = trainer.render_image(sample, chunk_rays=chunk_rays)  # compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                imgs = trainer.render_image(sample, chunk_rays=chunk_rays)
                ts.append(time.perf_counter() - t0)
            print("cap {:2d} chunk {:5d}: {} ms (min {:.0f})".format(
                cap, chunk_rays, [int(t * 1e3) for t in ts], min(ts) * 1e3), flush=True)


if __name__ == "__main__":
    main()
