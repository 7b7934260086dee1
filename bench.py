"""Benchmark: NGP training throughput on the real chip, with MFU accounting.

Trains the NGP recipe (bf16 hashgrid + fused bf16 MLPs + occupancy pruning +
masked point compaction, occupancy update folded into the jitted step) on
the procedural synthetic scene and reports steady-state training rays/sec.
Multi-step strides run on-device under lax.scan (progress.scan_steps), so
the number measures the program, not the tunnel dispatch tax.

Baseline: the reference ArcNerf NGP trains lego at ~50k steps x 4096 rays
in ~17 min on its GPU (docs/benchmark.md:48) ~= 2.0e5 rays/sec, used as the
vs_baseline denominator.

HANG-PROOF HARNESS (r5): round 4 shipped ZERO perf data because one hung
remote-compile RPC stalled the bench past the driver timeout (BENCH_r04:
rc=124, parsed=null) — exceptions were retry-guarded but a hang raises
nothing. This run therefore splits into a SUPERVISOR (this process: pure
python, no jax, cannot hang) and a WORKER subprocess that does the
measuring. The worker checkpoints a cumulative partial-result JSON to a
status file before/after every section; the supervisor enforces a hard
wall-clock budget per section and globally, kills the worker on violation
or on SIGTERM, and ALWAYS prints one JSON line (partial results + the
bench_errors trail) and exits 0. rc=124 can never again mean "zero data".

The JSON line carries the decomposition the number needs to be falsifiable:
- flops_per_step / achieved_gflops: analytic MLP matmul work at the static
  compaction budget (fwd + ~2x bwd) over measured wall time,
- hbm_bytes_per_step: hashgrid gather + backward scatter + full-table adam
  traffic (the encoder-side bandwidth story),
- matmul_peak_gflops: an in-run bf16 matmul probe = what this session's
  chip+tunnel can actually deliver through the same measurement path,
- mfu_vs_probe: achieved / probe — program efficiency net of the tunnel,
- dispatch_ms: median round-trip of a trivial jitted op,
- stage_*_ms: named attribution of the live step (utils/step_surgery.py).

Prints ONE json line.
"""

import json
import os
import signal
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

_WORKER_ENV = "_ARCNERF_BENCH_WORKER_STATUS"

# hard per-section wall-clock budgets (seconds) enforced by the supervisor;
# generous hang-detectors, not targets — the r3 healthy run spent ~5 min on
# the entire main block. The first remote compile on a cold tunnel is the
# slow step (r3: ~5 min gap in the log covering compile + renders).
_BUDGETS = {
    "setup": 420.0,
    # must cover a COLD remote compile of the 16-step scan (~5-8 min on the
    # tunnel after any HLO-relevant code change) plus warmup + timing
    "train_timing": 960.0,
    "probes": 180.0,
    "stage_table": 600.0,
    "render_full": 360.0,
    "render_windowed": 300.0,  # per tier
    "render_compact": 240.0,
    "render_fast": 240.0,
    "render_interactive": 300.0,
    "recipe": 600.0,
}
for _k in list(_BUDGETS):  # per-section env override: BENCH_BUDGET_RECIPE=300 etc.
    _v = os.environ.get("BENCH_BUDGET_" + _k.upper())
    if _v:
        _BUDGETS[_k] = float(_v)

# sections the supervisor told us to skip (they timed out in a previous
# worker incarnation; results so far persist in the status file)
_SKIP_SECTIONS = set(filter(None, os.environ.get("BENCH_SKIP_SECTIONS", "").split(",")))
_GLOBAL_BUDGET = float(os.environ.get("BENCH_GLOBAL_BUDGET_S", "1680"))


# --------------------------------------------------------------- supervisor
def _read_status(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _finalize(status, extra_errors):
    out = (status or {}).get("out") or {}
    errors = list(out.get("bench_errors", ())) + list((status or {}).get("errors", ()))
    errors += extra_errors
    if "metric" not in out:
        # the core timing never completed: emit an explicit zero so the
        # artifact is parseable and self-describing rather than absent
        out = dict(out)
        out.update({"metric": "ngp_train_rays_per_sec", "value": 0.0,
                    "unit": "rays/s", "vs_baseline": 0.0})
    if errors:
        out["bench_errors"] = errors
    return out


def supervisor_main():
    fd, status_path = tempfile.mkstemp(prefix="bench_status_", suffix=".json")
    os.close(fd)
    base_env = dict(os.environ)
    base_env[_WORKER_ENV] = status_path
    base_env.setdefault("BENCH_T0", str(time.time()))

    killed = []
    skip = []  # sections that timed out — the restarted worker skips them
    t_global = time.time()
    state = {"proc": None, "stop": False}

    def _kill(reason):
        killed.append(reason)
        try:
            state["proc"].kill()
        except Exception:
            pass

    def _on_term(signum, frame):
        state["stop"] = True
        _kill("supervisor received signal {} (driver timeout?)".format(signum))

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # a section timeout kills the worker mid-run; instead of losing every
    # LATER section, relaunch the worker with the offender in
    # BENCH_SKIP_SECTIONS — completed results persist in the status file
    # and the worker fast-forwards past sections whose keys already exist
    for attempt in range(3):
        env = dict(base_env)
        if skip:
            env["BENCH_SKIP_SECTIONS"] = ",".join(skip)
        # worker stdout -> stderr: the one stdout JSON line is ours to print
        state["proc"] = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=sys.stderr, stderr=sys.stderr, env=env)
        proc = state["proc"]
        launch_t = time.time()
        timed_out_section = None
        while proc.poll() is None:
            time.sleep(1.0)
            st = _read_status(status_path)
            now = time.time()
            if now - t_global > _GLOBAL_BUDGET:
                state["stop"] = True
                _kill("global budget {}s exceeded (in section {})".format(
                    int(_GLOBAL_BUDGET), (st or {}).get("section")))
                break
            if st and st.get("section") and not st.get("done"):
                budget = float(st.get("section_budget", 600.0))
                start = float(st.get("section_start", now))
                if start < launch_t - 1:
                    continue  # stale heartbeat from the killed predecessor
                if now - start > budget:
                    timed_out_section = st["section"]
                    _kill("section {} exceeded its {}s budget (hang?)".format(
                        st["section"], int(budget)))
                    break
        try:
            proc.wait(timeout=30)
        except Exception:
            try:
                proc.kill()
                proc.wait(timeout=10)
            except Exception:
                killed.append("worker unkillable")
                state["stop"] = True
        st = _read_status(status_path)
        if state["stop"] or (st or {}).get("done"):
            break
        if timed_out_section is not None:
            skip.append(timed_out_section)
            continue  # relaunch, skipping the hung section
        # worker crashed outside a timeout: record and stop (a crash would
        # likely repeat)
        if st is None and not killed:
            killed.append("worker exited rc={} with no status".format(proc.returncode))
        elif proc.returncode not in (0, None) and not killed:
            killed.append("worker exited rc={} in section {}".format(
                proc.returncode, (st or {}).get("section")))
        break

    st = _read_status(status_path)
    out = _finalize(st, killed)
    # persist a copy for the judge next to the round artifacts
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "experiments", "bench_last_partial.json"), "w") as f:
            json.dump(out, f, indent=1)
    except Exception:
        pass
    try:
        os.unlink(status_path)
    except Exception:
        pass
    print(json.dumps(out), flush=True)
    return 0


# ------------------------------------------------------------------ worker
class _Status:
    """Cumulative results + section heartbeat, checkpointed atomically so
    the supervisor can always print whatever exists."""

    def __init__(self, path):
        self.path = path
        prev = _read_status(path) or {}  # restarted worker resumes results
        self.out = prev.get("out") or {}
        self.errors = prev.get("errors") or []
        self.section = None
        self._write()

    def skip(self, name, done_key=None):
        """True when ``name`` timed out before (supervisor skip list) or its
        results are already present from a previous worker incarnation."""
        if name in _SKIP_SECTIONS:
            note = "section {} skipped (timed out previously)".format(name)
            if note not in self.errors:
                self.error(note)
            return True
        return done_key is not None and done_key in self.out

    def _write(self):
        tmp = self.path + ".tmp"
        payload = {"out": self.out, "errors": self.errors, "done": False,
                   "section": self.section}
        if self.section is not None:
            payload["section_start"] = self._start
            payload["section_budget"] = self._budget
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)

    def begin(self, name, budget=None):
        self.section = name
        self._start = time.time()
        self._budget = budget if budget is not None else _BUDGETS.get(name, 600.0)
        self._write()
        sys.stderr.write("bench: section {} (budget {}s)\n".format(name, int(self._budget)))
        sys.stderr.flush()

    def end(self, merge=None):
        if merge:
            self.out.update(merge)
        self.section = None
        self._write()

    def error(self, msg):
        self.errors.append(msg)
        self._write()

    def done(self):
        self.section = None
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"out": self.out, "errors": self.errors, "done": True}, f)
        os.replace(tmp, self.path)


def _guard(status, what, fn, tries=2, sleep_s=15):
    """Run a bench section with retries on tunnel flakes; on persistent
    failure record the error and return None so the section's keys are
    simply absent from the JSON line. (Hangs are the supervisor's job.)"""
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
    status.error("{}: {}".format(what, str(last)[:200]))
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


def _core_result(rays_per_sec, step_time, steps, scan_steps, budget_pts,
                 flops_per_step, hbm_bytes_per_step, achieved_gflops, baseline, trainer):
    return {
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
        "n_devices": int(trainer.mesh.devices.size),
        "proj_min_ngp_50kx4096": round(50000 * 4096 / rays_per_sec / 60.0, 1),
    }


def worker_main(status):
    t_bench0 = float(os.environ.get("BENCH_T0", time.time()))

    def remaining():
        return _GLOBAL_BUDGET - (time.time() - t_bench0)

    status.begin("setup")
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the first remote compile is the bench's
    # slowest (and in r4, fatal) step; across rounds on the same host the
    # cache turns it into a read
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("ARCNERF_BENCH_CACHE", "/root/.cache/arcnerf_tpu_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

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
    status.end()

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

    flops_per_step, hbm_bytes_per_step, budget_pts = _analytic_per_step(cfgs, n_rays)

    if status.skip("train_timing", "step_ms"):
        # restarted worker: keep the measured numbers, but still warm the
        # fresh trainer (compile + occupancy settle) for the sections below
        status.begin("train_timing", _BUDGETS["train_timing"])
        _guard(status, "rewarm", lambda: [stride(state.setdefault("epoch", 0))
                                          for _ in range(warmup_strides)])
        state["epoch"] += warmup_strides * scan_steps
        status.end()
        step_time = float(status.out["step_ms"]) / 1e3
        achieved_gflops = flops_per_step / step_time / 1e9
    else:
        status.begin("train_timing")
        elapsed = _guard(status, "train_timing", _train_timing)
        if elapsed is None:
            status.done()
            raise RuntimeError("core train timing failed")

        steps = timed_strides * scan_steps
        rays_per_sec = steps * n_rays / elapsed
        step_time = elapsed / steps
        achieved_gflops = flops_per_step / step_time / 1e9

        baseline = 2.0e5  # reference ArcNerf NGP GPU throughput (see header)
        status.end(_core_result(rays_per_sec, step_time, steps, scan_steps, budget_pts,
                                flops_per_step, hbm_bytes_per_step, achieved_gflops,
                                baseline, trainer))
    if not status.skip("probes", "matmul_peak_gflops"):
        status.begin("probes")
        peak_gflops = _guard(status, "matmul_peak", lambda: _matmul_peak_probe(jax, jnp, smoke)) or 0.0
        dispatch_ms = _guard(status, "dispatch", lambda: _dispatch_probe(jax, jnp)) or 0.0
        status.end({
            "matmul_peak_gflops": round(peak_gflops, 1),
            "mfu_vs_probe": round(achieved_gflops / peak_gflops, 4) if peak_gflops else None,
            "dispatch_ms": round(dispatch_ms, 2),
        })

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

    imgs = None
    if not status.skip("render_full"):
        # never key-skipped: later tiers need the reference frame `imgs`
        status.begin("render_full")
        full = _guard(status, "render_full", _full_render)
        if full is not None:
            render_s, imgs = full
            status.end({
                "render_{}px_ms".format(render_wh): round(render_s * 1e3, 1),
                "render_fps_{}px".format(render_wh): round(1.0 / render_s, 3),
                "render_cap_pts": render_cap,
            })
        else:
            status.end()

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
        # faithful interactive tier (VERDICT r3 item 3): transmittance-
        # continuation windows — exact-up-to-eps per-subpixel samples, so the
        # only approximation at scale>1 is the upsample (measured ceiling:
        # 40.6 dB at scale 2, 37.7 at scale 3 on this scene,
        # scripts/probe_upsample_bound.py). Report the ladder and the best
        # tier clearing 30 dB vs the full render. Runs BEFORE the legacy
        # compact/fast tiers: these are the keys the verdict asks for.
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
            if not smoke and remaining() < 420:
                status.error("windowed tiers truncated at s{} (global budget)".format(s))
                break

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

            tag = "s{}".format(s) if rf == 0.0 else "s{}r{}".format(s, int(rf * 100))
            if status.skip("render_windowed_{}".format(tag),
                           "render_windowed_{}_ms".format(tag)):
                p_prev = status.out.get("psnr_windowed_{}_vs_full".format(tag))
                f_prev = status.out.get("render_windowed_{}_fps".format(tag))
                if p_prev is not None and p_prev >= 30.0 and (
                        best is None or f_prev > best[1]):
                    best = (tag, f_prev, p_prev)
                continue
            status.begin("render_windowed_{}".format(tag), _BUDGETS["render_windowed"])
            r = _guard(status, "render_windowed_{}".format(tag), _windowed, tries=2)
            if r is None:
                status.end()
                continue
            t_w, p_w = r
            status.end({
                "render_windowed_{}_ms".format(tag): round(t_w * 1e3, 1),
                "render_windowed_{}_fps".format(tag): round(1.0 / t_w, 3),
                "psnr_windowed_{}_vs_full".format(tag): round(p_w, 2),
            })
            if p_w >= 30.0 and (best is None or 1.0 / t_w > best[1]):
                best = (tag, 1.0 / t_w, p_w)
        if best is not None:
            status.end({
                "faithful_tier": "windowed_{}".format(best[0]),
                "faithful_tier_fps": round(best[1], 3),
                "faithful_tier_psnr_vs_full": round(best[2], 2),
            })

        # compacted full-quality render: occupancy pre-pass ray compaction at
        # the SAME cap — for models without a learned background this is
        # pixel-identical to render_image (hit rays run the identical program,
        # misses are exact background), at ~hit_frac of the chunks
        if remaining() > 420 and not status.skip(
                "render_compact", "render_compact_{}px_ms".format(render_wh)):
            def _compact():
                trainer.set_render_cap(render_cap)
                return _timed_fast(0.42)

            status.begin("render_compact")
            r = _guard(status, "render_compact", _compact)
            status.end({
                "render_compact_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_compact".format(render_wh): round(1.0 / r[0], 3),
                "psnr_compact_vs_full": round(r[1], 2),
            } if r is not None else {})

        # interactive mode: compaction + cap 4 (shrinks the compaction budget
        # to chunk*4 — at 32k chunks cap 8 does NOT: min(2^18, 32k*8) = 2^18)
        if remaining() > 360 and not status.skip(
                "render_fast", "render_fast_{}px_ms".format(render_wh)):
            def _fast():
                trainer.set_render_cap(4)
                return _timed_fast(0.42)

            status.begin("render_fast")
            r = _guard(status, "render_fast", _fast)
            status.end({
                "render_fast_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_fast".format(render_wh): round(1.0 / r[0], 3),
                "psnr_fast_vs_full": round(r[1], 2),
                "fast_hit_frac": round(r[2]["hit_frac"], 3),
                "fast_clipped_rays": int(r[2]["clipped_rays"]),
            } if r is not None else {})

        # interactive tier: adaptive-resolution render (the reference viewer's
        # interaction-time lever, ns_viewer/server/viewer_utils.py:657) + cap 4
        # + coarse 64-step ladder, bilinear-upsampled to the full frame.
        inter_scale = 1 if smoke else 3
        if remaining() > 300 and not status.skip(
                "render_interactive", "render_interactive_{}px_ms".format(render_wh)):
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

            status.begin("render_interactive")
            r = _guard(status, "render_interactive", _interactive)
            status.end({
                "render_interactive_{}px_ms".format(render_wh): round(r[0] * 1e3, 1),
                "render_fps_{}px_interactive".format(render_wh): round(1.0 / r[0], 3),
                "psnr_interactive_vs_full": round(r[1], 2),
                "interactive_scale": inter_scale,
            } if r is not None else {})
        trainer.set_render_cap(render_cap)

    # step-stage attribution (VERDICT r3 item 4): named stages of the live
    # step at the bench shapes; stage_named_coverage tells how much of
    # step_ms the truncation ladder itself reaches. Runs AFTER the render
    # tiers (7 remote compiles — the priciest section on a cold tunnel; a
    # timeout here must not cost the render keys).
    if (not smoke and not os.environ.get("BENCH_NO_STAGES") and remaining() > 540
            and not status.skip("stage_table", "stage_sampling_ms")):
        status.begin("stage_table")

        def _stages():
            from arcnerf_tpu.datasets import get_model_feed_in
            from arcnerf_tpu.parallel.mesh import shard_batch
            from arcnerf_tpu.utils.step_surgery import stage_table

            batch = trainer.pipeline.get_train_batch(0)
            feed, _ = get_model_feed_in(batch)
            feed = shard_batch(feed, trainer.mesh)
            return stage_table(trainer, feed, 128, budget_pts, step_ms=step_time * 1e3)

        status.end(_guard(status, "stage_table", _stages) or {})

    # ----------------------------------------------------------------------
    # Recipe-shaped variant (VERDICT r2 item 5): the projection above rests
    # on the 96x96 toy's valid-point profile. Re-measure at the reference
    # lego recipe shapes — 800x800 views, n_sample 1024, n_grid 128 volume
    # (configs/expr/NeRF/lego/nerf_lego_nerf_ngp.yaml) — on the procedural
    # scene: warm up occupancy at the recipe's 4096-ray batch, read the
    # measured valid-points profile, let the dynamic-batch rule pick the
    # steady bucket for the 2^18 budget, and time at that bucket.
    if not smoke and remaining() > 480 and not status.skip("recipe", "recipe_rays_per_sec"):
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

        status.begin("recipe")
        status.end(_guard(status, "recipe", _recipe) or {})
    elif (not smoke and "recipe_rays_per_sec" not in status.out
          and "recipe" not in _SKIP_SECTIONS):
        status.error("recipe skipped (global budget)")

    status.done()


def main():
    status_path = os.environ.get(_WORKER_ENV)
    if status_path:
        worker_main(_Status(status_path))
    else:
        sys.exit(supervisor_main())


if __name__ == "__main__":
    main()
