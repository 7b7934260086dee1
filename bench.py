"""Benchmark: NGP training throughput on the real chip, with MFU accounting.

Trains the NGP recipe (bf16 hashgrid + fused bf16 MLPs + occupancy pruning +
masked point compaction, occupancy update folded into the jitted step) on
the procedural synthetic scene and reports steady-state training rays/sec.
Multi-step strides run on-device under lax.scan (progress.scan_steps), so
the number measures the program, not the tunnel dispatch tax.

Baseline: the reference ArcNerf NGP trains lego at ~50k steps x 4096 rays
in ~17 min on its GPU (docs/benchmark.md:48) ~= 2.0e5 rays/sec, used as the
vs_baseline denominator.

The JSON line carries the decomposition the number needs to be falsifiable:
- flops_per_step / achieved_gflops: analytic MLP matmul work at the static
  compaction budget (fwd + ~2x bwd) over measured wall time,
- hbm_bytes_per_step: hashgrid gather + backward scatter + full-table adam
  traffic (the encoder-side bandwidth story),
- matmul_peak_gflops: an in-run bf16 matmul probe (lax.scan of chained
  4096^2 matmuls, host-read timed) = what this session's chip+tunnel can
  actually deliver through the same measurement path,
- mfu_vs_probe: achieved / probe — program efficiency net of the tunnel,
- dispatch_ms: median round-trip of a trivial jitted op (the tunnel tax
  paid once per stride).

Every section past the core train timing runs RETRY-GUARDED: the tunnel's
remote-compile service drops connections under load (r4: two runs died
with "response body closed before all bytes were read" in different
sections), so a flaky section retries and then degrades to a
bench_errors entry instead of killing the whole measurement.

Prints ONE json line.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

_BENCH_ERRORS = []


def _guard(what, fn, tries=3, sleep_s=20):
    """Run a bench section with retries on tunnel flakes; on persistent
    failure record the error and return None so the section's keys are
    simply absent from the JSON line."""
    last = None
    for i in range(tries):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — tunnel faults surface as many types
            last = e
            sys.stderr.write("bench: {} attempt {}/{} failed: {}\n".format(
                what, i + 1, tries, str(e)[:300]))
            sys.stderr.flush()
            if i + 1 < tries:
                time.sleep(sleep_s)
    _BENCH_ERRORS.append("{}: {}".format(what, str(last)[:200]))
    return None


def _matmul_peak_probe(jax, jnp, smoke=False):
    """Measured bf16 matmul throughput via one dispatch of 32 chained
    (4096, 4096) matmuls. Host read is the only hard sync on the tunnel."""
    n, iters = (512, 8) if smoke else (4096, 32)
    a = jnp.ones((n, n), dtype=jnp.bfloat16)

    def step(carry, _):
        carry = jnp.tanh(carry @ a)  # tanh keeps values bounded, negligible cost
        return carry, ()

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(step, x, None, length=iters)
        return out[0, 0]

    x = jnp.ones((n, n), dtype=jnp.bfloat16)
    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    dt = time.perf_counter() - t0
    flops = 2.0 * n * n * n * iters
    return flops / dt / 1e9  # GFLOP/s


def _dispatch_probe(jax, jnp):
    """Median host->device->host round trip of a trivial jitted op (ms)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(f(x))
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times)


def _analytic_per_step(cfgs, n_rays):
    """Analytic FLOPs + HBM bytes per train step for the NGP recipe.

    FLOPs: geo+radiance MLP matmuls at the static compaction budget,
    fwd + 2x for bwd. HBM bytes: hashgrid gather (fwd, table dtype) +
    backward scatter-add (f32) + full-table adam update traffic.
    Ray-march/sampling flops are real but small; this is the useful-work
    floor the MFU number is computed against."""
    from arcnerf_tpu.utils.cfgs import get_value_from_cfgs_field

    model = cfgs.model
    budget = 1 << int(get_value_from_cfgs_field(model.obj_bound, "log_max_allowance", 18))
    P = min(budget, n_rays * int(get_value_from_cfgs_field(model.rays, "n_sample", 1024)))

    enc = model.geometry.encoder
    L = int(get_value_from_cfgs_field(enc, "n_levels", 16))
    F = int(get_value_from_cfgs_field(enc, "n_feat_per_entry", 2))
    T = 1 << int(get_value_from_cfgs_field(enc, "hashmap_size", 19))
    table_bytes = 2 if str(get_value_from_cfgs_field(enc, "dtype", "float32")).startswith("bf") else 4

    gw = int(get_value_from_cfgs_field(model.geometry, "W", 64))
    gfeat = int(get_value_from_cfgs_field(model.geometry, "W_feat", 15))
    geo_in = L * F
    geo_flops = 2 * P * (geo_in * gw + gw * (1 + gfeat))

    rw = int(get_value_from_cfgs_field(model.radiance, "W", 64))
    rd = int(get_value_from_cfgs_field(model.radiance, "D", 2))
    sh = (int(get_value_from_cfgs_field(model.radiance.encoder.view, "n_freqs", 4))) ** 2
    rad_in = sh + gfeat
    rad_flops = 2 * P * (rad_in * rw + (rd - 1) * rw * rw + rw * 3)

    fwd = geo_flops + rad_flops
    flops = 3 * fwd  # fwd + ~2x bwd
    gather = P * L * 8 * F * table_bytes  # fwd gather
    scatter = P * L * 8 * F * 4  # bwd scatter-add accumulates f32
    adam = T * L * F * (2 * table_bytes + 4 * 4 + 4)  # param rw + m,v rw + grad read
    return flops, gather + scatter + adam, P


def main():
    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    root = os.path.dirname(os.path.abspath(__file__))
    cfgs = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
    # one large fixed ray bucket (one slow remote compile); strides of 16
    # steps run on-device so the tunnel dispatch tax is paid once per stride
    smoke = bool(os.environ.get("BENCH_SMOKE"))  # tiny shapes for CI smoke
    scan_steps = 4 if smoke else 16
    # 32768 rays is the steady-state bucket the dynamic-batch ladder picks
    # for this scene: measured ~6.9 valid samples/ray once the occupancy
    # grid settles (~113k valid pts per 16k rays, scripts/probe_big_bucket.py),
    # so 32k rays ride the same 2^18 compaction budget clip-free — the
    # reference's dynamic_batch_size semantics (grow rays to fill the
    # sample budget). Warmup covers occupancy warmup (32) + two optimize
    # passes so the timed strides measure the settled regime.
    warmup_strides, timed_strides = (1, 1) if smoke else (4, 4)
    n_rays = 1024 if smoke else 32768
    update_configs_by_dotlist(cfgs, [
        "--name", "bench_ngp",
        "--progress.epoch", str((warmup_strides + timed_strides) * scan_steps),
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
    ])
    if smoke:
        update_configs_by_dotlist(cfgs, [
            "--dataset.train.wh", "[32,32]",
            "--model.rays.n_sample", "32",
            "--model.obj_bound.volume.n_grid", "32",
            "--model.geometry.encoder.hashmap_size", "12",
            "--model.obj_bound.epoch_optim_warmup", "8",
        ])
    # pin the bucket: dynamic batch sizing would change shapes mid-run
    update_configs_by_dotlist(cfgs, ["--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000"])

    trainer = ArcNerfTrainer(cfgs)

    def stride(epoch):
        return trainer.train_steps(epoch, scan_steps)

    # core train timing — retried as a whole (warmup state persists; only
    # the timing restarts), aborts the bench if persistently failing
    state = {"epoch": 0}

    def _train_timing():
        for _ in range(warmup_strides):
            stats = stride(state["epoch"])
            state["epoch"] += scan_steps
        float(stats["loss"])  # hard sync (block_until_ready is a no-op on the tunnel)
        t0 = time.perf_counter()
        for _ in range(timed_strides):
            stats = stride(state["epoch"])
            state["epoch"] += scan_steps
        final_loss = float(stats["loss"])  # hard sync closes the timed region
        assert final_loss == final_loss, "loss is NaN"
        return time.perf_counter() - t0

    elapsed = _guard("train_timing", _train_timing)
    if elapsed is None:
        raise RuntimeError("core train timing failed: {}".format(_BENCH_ERRORS))

    steps = timed_strides * scan_steps
    rays_per_sec = steps * n_rays / elapsed
    step_time = elapsed / steps

    flops_per_step, hbm_bytes_per_step, budget_pts = _analytic_per_step(cfgs, n_rays)
    achieved_gflops = flops_per_step / step_time / 1e9

    peak_gflops = _guard("matmul_peak", lambda: _matmul_peak_probe(jax, jnp, smoke)) or 0.0
    dispatch_ms = _guard("dispatch", lambda: _dispatch_probe(jax, jnp)) or 0.0

    baseline = 2.0e5  # reference ArcNerf NGP GPU throughput (see header)
    out = {
        "metric": "ngp_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 4),
        "steps_timed": steps,
        "scan_steps": scan_steps,
        "step_ms": round(step_time * 1e3, 2),
        "compaction_budget_pts": budget_pts,
        "flops_per_step": flops_per_step,
        "achieved_gflops": round(achieved_gflops, 2),
        "hbm_bytes_per_step": hbm_bytes_per_step,
        "achieved_hbm_gbps": round(hbm_bytes_per_step / step_time / 1e9, 2),
        "matmul_peak_gflops": round(peak_gflops, 1),
        "mfu_vs_probe": round(achieved_gflops / peak_gflops, 4) if peak_gflops else None,
        "dispatch_ms": round(dispatch_ms, 2),
        "n_devices": int(trainer.mesh.devices.size),
        "proj_min_ngp_50kx4096": round(50000 * 4096 / rays_per_sec / 60.0, 1),
    }

    # north-star bridge (BASELINE.json: NGP lego >=35 PSNR <5 min + interactive
    # 800x800 FPS): measure one full 800x800 render through the eval path and
    # project the reference benchmark workload (50k steps x 4096 rays ->
    # 35.38 PSNR, reference docs/benchmark.md:48-54) at the measured step rate.
    render_wh = 128 if smoke else 800
    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.utils.cfgs import dict_to_obj

    ds_cfgs = dict_to_obj({"val": {
        "type": "Synthetic", "n_imgs": 1, "wh": [render_wh, render_wh],
        "cam_radius": 2.5, "white_bkg": True, "center_pixel": True,
    }})
    render_ds = get_dataset(ds_cfgs, "data", mode="val")
    sample = render_ds[0]
    # inference render mode: first-16-valid-samples-per-ray cap (the
    # early-termination analogue; see obj_bound._cap_pts_per_ray). Set
    # BEFORE the first render call so the jitted scan renderer traces it.
    render_cap = 16
    render_chunk = min(n_rays, 32768)  # 32k chunks measured ~1.7x 16k (probe_render.py)

    def _full_render():
        trainer.set_render_cap(render_cap)
        imgs = trainer.render_image(sample, chunk_rays=render_chunk)  # compile
        tr = []
        for _ in range(3):  # min-of-3: single-shot tunnel timings showed 3x outliers
            t0 = time.perf_counter()
            imgs = trainer.render_image(sample, chunk_rays=render_chunk)
            tr.append(time.perf_counter() - t0)
        assert imgs["rgb"].shape[0] == render_wh
        return min(tr), imgs

    full = _guard("render_full", _full_render)
    imgs = None
    if full is not None:
        render_s, imgs = full
        out.update({
            "render_{}px_ms".format(render_wh): round(render_s * 1e3, 1),
            "render_fps_{}px".format(render_wh): round(1.0 / render_s, 3),
            "render_cap_pts": render_cap,
        })

    def _psnr_vs_full(rgb):
        mse = float(np.mean((np.asarray(rgb) - np.asarray(imgs["rgb"])) ** 2))
        return float(-10.0 * np.log10(max(mse, 1e-12)))

    def _timed_fast(frac):
        fast, fstats = trainer.render_image_fast(sample, chunk_rays=render_chunk, hit_frac=frac)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fast, fstats = trainer.render_image_fast(sample, chunk_rays=render_chunk, hit_frac=frac)
            ts.append(time.perf_counter() - t0)
        return min(ts), _psnr_vs_full(fast["rgb"]), fstats

    if imgs is not None:
        # compacted full-quality render: occupancy pre-pass ray compaction at
        # the SAME cap — for models without a learned background this is
        # pixel-identical to render_image (hit rays run the identical program,
        # misses are exact background), at ~hit_frac of the chunks
        def _compact():
            trainer.set_render_cap(render_cap)
            return _timed_fast(0.42)

        r = _guard("render_compact", _compact)
        if r is not None:
            out.update({
                "render_compact_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_compact".format(render_wh): round(1.0 / r[0], 3),
                "psnr_compact_vs_full": round(r[1], 2),
            })

        # interactive mode: compaction + cap 4 (shrinks the compaction budget
        # to chunk*4 — at 32k chunks cap 8 does NOT: min(2^18, 32k*8) = 2^18)
        def _fast():
            trainer.set_render_cap(4)
            return _timed_fast(0.42)

        r = _guard("render_fast", _fast)
        if r is not None:
            out.update({
                "render_fast_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_fast".format(render_wh): round(1.0 / r[0], 3),
                "psnr_fast_vs_full": round(r[1], 2),
                "fast_hit_frac": round(r[2]["hit_frac"], 3),
                "fast_clipped_rays": int(r[2]["clipped_rays"]),
            })

        # interactive tier: adaptive-resolution render (the reference viewer's
        # interaction-time lever, ns_viewer/server/viewer_utils.py:657) + cap 4
        # + coarse 64-step ladder, bilinear-upsampled to the full frame. Cost
        # scales with shaded slots (hit_rays * cap); measured at scale 3 the
        # upsampled PSNR-vs-full EQUALS the full-res cap-4 tier's (25.6 vs
        # 25.5 dB — the cap approximation dominates the error, so resolution
        # is quality-free here; scripts/probe_render_inter.py).
        inter_scale = 1 if smoke else 3

        def _interactive():
            trainer.set_render_cap(4, n_sample=64)
            inter, istats = trainer.render_image_interactive(
                sample, scale=inter_scale, chunk_rays=render_chunk, hit_frac=0.42)  # compile
            ti = []
            for _ in range(3):
                t0 = time.perf_counter()
                inter, istats = trainer.render_image_interactive(
                    sample, scale=inter_scale, chunk_rays=render_chunk, hit_frac=0.42)
                ti.append(time.perf_counter() - t0)
            return min(ti), _psnr_vs_full(inter["rgb"])

        r = _guard("render_interactive", _interactive)
        if r is not None:
            out.update({
                "render_interactive_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_interactive".format(render_wh): round(1.0 / r[0], 3),
                "psnr_interactive_vs_full": round(r[1], 2),
                "interactive_scale": inter_scale,
            })

        # faithful interactive tier (VERDICT r3 item 3): transmittance-
        # continuation windows — exact-up-to-eps per-subpixel samples, so the
        # only approximation at scale>1 is the upsample (measured ceiling:
        # 40.6 dB at scale 2, 37.7 at scale 3 on this scene,
        # scripts/probe_upsample_bound.py). Report the ladder and the best
        # tier clearing 30 dB vs the full render.
        win_cap = 8
        n_sample_cfg = 32 if smoke else 128
        n_pass = max(1, -(-n_sample_cfg // win_cap))
        # (scale, refine_frac): the r4 ladder — counted pass budgets (the
        # valid-count prepass sizes every pass; empty passes vanish, no
        # silent clipping) + edge refinement at scale>1
        tiers = ((1, 0.0),) if smoke else (
            (1, 0.0), (2, 0.0), (3, 0.0), (3, 0.05), (4, 0.0), (4, 0.05))
        best = None
        for s, rf in tiers:
            def _windowed(s=s, rf=rf):
                trainer.set_render_cap(win_cap, window=True)
                kw = dict(n_pass=n_pass, chunk_rays=render_chunk,
                          scale=s, eps=1e-3, adaptive_budget=True, refine_frac=rf)
                # calibration frame: counted (geometry-bound) ladder, exact
                w_imgs, w_stats = trainer.render_image_windowed(sample, **kw)
                # ride the measured per-pass ALIVE counts (x2 safety): the
                # count bound ignores transmittance — opaque rays saturate
                # in window 0, so runtime alive is far below it. Exactness
                # is re-checked per frame via clipped_alive.
                alive = [a for a in w_stats.get("alive_per_pass", ()) if a > 0]
                if alive:
                    kw["pass_budget_rays"] = tuple(2 * a + 256 for a in alive)
                    kw["budget_rays"] = w_stats.get("budget_rays")
                w_imgs, w_stats = trainer.render_image_windowed(sample, **kw)  # compile
                if w_stats.get("clipped_alive", 0) or w_stats.get("hit_clipped", 0):
                    kw.pop("pass_budget_rays", None)  # calibration outgrown
                    kw.pop("budget_rays", None)
                    w_imgs, w_stats = trainer.render_image_windowed(sample, **kw)
                tw = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    w_imgs, w_stats = trainer.render_image_windowed(sample, **kw)
                    tw.append(time.perf_counter() - t0)
                assert not w_stats.get("clipped_alive", 0), w_stats
                return min(tw), _psnr_vs_full(w_imgs["rgb"])

            r = _guard("render_windowed_s{}r{}".format(s, int(rf * 100)), _windowed, tries=2)
            if r is None:
                continue
            t_w, p_w = r
            tag = "s{}".format(s) if rf == 0.0 else "s{}r{}".format(s, int(rf * 100))
            out["render_windowed_{}_ms".format(tag)] = round(t_w * 1e3, 1)
            out["render_windowed_{}_fps".format(tag)] = round(1.0 / t_w, 3)
            out["psnr_windowed_{}_vs_full".format(tag)] = round(p_w, 2)
            if p_w >= 30.0 and (best is None or 1.0 / t_w > best[1]):
                best = (tag, 1.0 / t_w, p_w)
        if best is not None:
            out["faithful_tier"] = "windowed_{}".format(best[0])
            out["faithful_tier_fps"] = round(best[1], 3)
            out["faithful_tier_psnr_vs_full"] = round(best[2], 2)
        trainer.set_render_cap(render_cap)

    # step-stage attribution (VERDICT r3 item 4): named stages of the live
    # step at the bench shapes; stage_named_coverage tells how much of
    # step_ms the truncation ladder itself reaches (the remainder is the
    # optimizer/loss/occupancy lump, also named). Skippable for quick runs.
    if not smoke and not os.environ.get("BENCH_NO_STAGES"):
        def _stages():
            from arcnerf_tpu.datasets import get_model_feed_in
            from arcnerf_tpu.parallel.mesh import shard_batch
            from arcnerf_tpu.utils.step_surgery import stage_table

            batch = trainer.pipeline.get_train_batch(0)
            feed, _ = get_model_feed_in(batch)
            feed = shard_batch(feed, trainer.mesh)
            return stage_table(trainer, feed, 128, budget_pts, step_ms=step_time * 1e3)

        out.update(_guard("stage_table", _stages) or {})

    # ----------------------------------------------------------------------
    # Recipe-shaped variant (VERDICT r2 item 5): the projection above rests
    # on the 96x96 toy's valid-point profile. Re-measure at the reference
    # lego recipe shapes — 800x800 views, n_sample 1024, n_grid 128 volume
    # (configs/expr/NeRF/lego/nerf_lego_nerf_ngp.yaml) — on the procedural
    # scene: warm up occupancy at the recipe's 4096-ray batch, read the
    # measured valid-points profile, let the dynamic-batch rule pick the
    # steady bucket for the 2^18 budget, and time at that bucket.
    if not smoke:
        def _recipe():
            cfgs_r = load_configs(os.path.join(root, "configs", "expr", "synthetic_ngp.yaml"))
            update_configs_by_dotlist(cfgs_r, [
                "--name", "bench_ngp_recipe",
                "--progress.epoch", "400", "--progress.epoch_loss", "1000000",
                "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
                "--progress.scan_steps", str(scan_steps),
                "--n_rays", "4096",
                "--dataset.train.n_imgs", "8",
                "--dataset.train.wh", "[800,800]",
                "--model.rays.n_sample", "1024",
                "--model.obj_bound.volume.n_grid", "128",
                "--model.obj_bound.epoch_optim_warmup", "32",
                "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
            ])
            trainer_r = ArcNerfTrainer(cfgs_r)
            ep = 0
            # warm until the occupancy pruning SETTLES (the r3f run measured the
            # still-dense regime at 64 epochs: 50.9 valid/ray -> a 313-min
            # projection that just reflected warmup, not steady state)
            prev_valid = float("inf")
            for w in range(20):
                stats_r = trainer_r.train_steps(ep, scan_steps)
                ep += scan_steps
                v = float(stats_r["n_valid_pts"])
                if w >= 4 and v > prev_valid * 0.95:
                    break
                prev_valid = v
            valid_pts = float(stats_r["n_valid_pts"])
            valid_per_ray = valid_pts / 4096.0
            # reference dynamic_batch_size semantics: grow rays until the point
            # budget fills (power-of-two buckets, capped like the r2 study)
            bucket = 4096
            while bucket * 2 * valid_per_ray <= budget_pts and bucket < 32768:
                bucket *= 2
            trainer_r.pipeline.n_rays = bucket
            stats_r = trainer_r.train_steps(ep, scan_steps)  # compile+warm the bucket
            ep += scan_steps
            float(stats_r["loss"])
            t0 = time.perf_counter()
            n_meas = 2
            for _ in range(n_meas):
                stats_r = trainer_r.train_steps(ep, scan_steps)
                ep += scan_steps
            float(stats_r["loss"])  # hard sync
            dt_r = time.perf_counter() - t0
            recipe_rays_per_sec = n_meas * scan_steps * bucket / dt_r
            return {
                "recipe_rays_per_sec": round(recipe_rays_per_sec, 1),
                "recipe_bucket": bucket,
                "recipe_valid_pts_per_ray": round(valid_per_ray, 2),
                "recipe_step_ms": round(dt_r / (n_meas * scan_steps) * 1e3, 2),
                "proj_min_ngp_50kx4096_recipe": round(
                    50000 * 4096 / recipe_rays_per_sec / 60.0, 1),
            }

        out.update(_guard("recipe", _recipe) or {})

    if _BENCH_ERRORS:
        out["bench_errors"] = _BENCH_ERRORS
    print(json.dumps(out))


if __name__ == "__main__":
    main()
