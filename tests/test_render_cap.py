"""Inference render cap: set_render_cap must re-trace (a cached jit
executable must not keep serving the old cap) and must shrink the static
compaction budget so capped renders do proportionally less work.

The cap is the TPU-shaped analogue of the reference CUDA march's
transmittance early termination (reference arcnerf/render/ray_helper.py
trans_shift cutoff semantics): keep only the first cap valid samples per
ray, front to back.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcnerf_tpu.trainer import ArcNerfTrainer  # noqa: E402
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist  # noqa: E402

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "expr", "synthetic_ngp.yaml")


import pytest


@pytest.fixture(scope="module")
def shared_trainer(tmp_path_factory):
    """One tiny trained NGP trainer for the whole module: every test here
    needs the same 24-epoch occupancy-structured model, and building +
    training it per test dominated the fast tier (~170 s across 5 tests)."""
    d = str(tmp_path_factory.mktemp("render_cap"))
    trainer = _tiny_trainer(d)
    trainer.train()
    return trainer


@pytest.fixture(autouse=True)
def _fresh_cap(shared_trainer):
    """Reset the render cap before every test so test ORDER can't leak
    cap/window state between them (each test still sets its own cap; the
    persistent XLA cache absorbs the re-jit cost)."""
    shared_trainer.set_render_cap(None)
    yield


def _tiny_trainer(d):
    cfgs = load_configs(CFG)
    update_configs_by_dotlist(cfgs, [
        "--name", "render_cap_test",
        "--dir.expr_dir", os.path.join(d, "expr"),
        "--progress.epoch", "24",
        "--progress.epoch_loss", "1000",
        "--progress.epoch_val", "-1",
        "--progress.epoch_save_checkpoint", "1000",
        "--dataset.train.n_imgs", "3",
        "--dataset.train.wh", "[32,32]",
        "--dataset.val.n_imgs", "1",
        "--dataset.val.wh", "[32,32]",
        "--model.rays.n_sample", "32",
        "--model.obj_bound.volume.n_grid", "32",
        "--model.obj_bound.epoch_optim", "8",
        "--model.obj_bound.epoch_optim_warmup", "16",
        "--model.obj_bound.log_max_allowance", "13",
        "--model.geometry.encoder.hashmap_size", "12",
        "--model.geometry.encoder.n_levels", "4",
        "--model.geometry.encoder.max_res", "64",
        "--n_rays", "256",
    ])
    return ArcNerfTrainer(cfgs)


def test_render_cap_retrace_and_budget_shrink(shared_trainer):
    trainer = shared_trainer
    sample = trainer.data["val"][0]
    bkg = trainer.eval_bkg_color("val")

    trainer.set_render_cap(None)
    # chunk 256 keeps the UNCAPPED render clip-free too (256 rays x 32
    # samples = the 2^13 budget): capped renders are chunk-clamped to
    # budget//cap, and comparing against a silently-clipping uncapped
    # render would flag the capped one for being MORE correct
    full = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)["rgb"]
    assert np.isfinite(full).all()

    # the cap flows to the model cfg used at trace time
    trainer.set_render_cap(1)
    assert trainer.model.fg_model.get_render_cfgs("eval_max_pts_per_ray") == 1
    capped = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)["rgb"]
    assert np.isfinite(capped).all()
    # with a single valid sample per ray the render must differ from the
    # full-sample render — if jit had served the stale executable the
    # arrays would be identical
    assert not np.allclose(capped, full), "cap=1 render identical to uncapped: stale jit cache"

    # a generous cap covers every valid sample -> bit-identical to full
    trainer.set_render_cap(32)
    wide = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)["rgb"]
    assert np.allclose(wide, full, atol=1e-5), "cap >= n_sample must reproduce the uncapped render"

    # budget shrink: the capped compaction budget is ceil(rays*cap/1024)*1024
    fg = trainer.model.fg_model
    n_rays = 1024  # 32x32 view in one chunk
    budget = fg.get_render_cfgs("max_allowance")
    trainer.set_render_cap(2)
    cap_budget = -(-(n_rays * 2) // 1024) * 1024
    assert cap_budget < budget, "test setup: shrunk budget must be smaller"


def test_render_image_fast_matches_full(shared_trainer):
    """render_image_fast: occupancy pre-pass + ray compaction must agree
    with the full render on hit rays (identical program on the same rays)
    and composite background zeros on misses; stats report the hit
    fraction and clipping."""
    import jax.numpy as jnp

    trainer = shared_trainer
    from arcnerf_tpu.datasets import get_dataset

    cfgs = load_configs(CFG)
    update_configs_by_dotlist(cfgs, ["--name", "fastrender_ds",
                                     "--dataset.val.n_imgs", "1",
                                     "--dataset.val.wh", "[32,32]"])
    ds = get_dataset(cfgs.dataset, "data", mode="val")
    s = ds[0]

    trainer.set_render_cap(8)
    full = trainer.render_image(s, chunk_rays=256)
    fast, stats = trainer.render_image_fast(s, chunk_rays=256, hit_frac=0.6)

    # the fused single-dispatch path must match the host path exactly
    # (same prepass, same first-budget rays, same scan program)
    fused, fstats = trainer.render_image_fast(s, chunk_rays=256, hit_frac=0.6, fused=True)
    host, hstats = trainer.render_image_fast(s, chunk_rays=256, hit_frac=0.6, fused=False)
    for k in host:
        np.testing.assert_allclose(np.asarray(fused[k]), np.asarray(host[k]), atol=1e-6,
                                   err_msg="fused/host mismatch on {}".format(k))
    assert fstats["hit_frac"] == hstats["hit_frac"]
    assert fstats["clipped_rays"] == hstats["clipped_rays"]

    assert fast["rgb"].shape == full["rgb"].shape
    assert 0.0 < stats["hit_frac"] <= 1.0
    if stats["clipped_rays"] == 0:
        # hit rays run the identical program -> near-identical pixels
        err = np.abs(fast["rgb"] - full["rgb"]).max()
        assert err < 5e-2, "fast render diverged from full: max err {}".format(err)
    # misses must be exactly background (zeros) where full has no mask
    miss = np.asarray(full["mask"]).reshape(-1) < 1e-6
    np.testing.assert_allclose(np.asarray(fast["mask"]).reshape(-1)[miss], 0.0, atol=1e-6)


def test_render_image_interactive_upsample(shared_trainer):
    """render_image_interactive: stride-subgrid render + bilinear upsample
    must return full-frame shapes, stay a close approximation of the full
    render, and pass scale-1 straight through to the fast path."""
    trainer = shared_trainer
    from arcnerf_tpu.datasets import get_dataset

    cfgs = load_configs(CFG)
    update_configs_by_dotlist(cfgs, ["--name", "inter_ds",
                                     "--dataset.val.n_imgs", "1",
                                     "--dataset.val.wh", "[32,32]"])
    s = get_dataset(cfgs.dataset, "data", mode="val")[0]

    trainer.set_render_cap(8)
    full = trainer.render_image(s, chunk_rays=256)
    inter, stats = trainer.render_image_interactive(s, scale=2, chunk_rays=256, hit_frac=0.6)
    assert inter["rgb"].shape == full["rgb"].shape
    assert stats["scale"] == 2 and stats["shaded_rays"] == 16 * 16
    assert np.isfinite(inter["rgb"]).all()
    mse = float(np.mean((inter["rgb"] - full["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 14.0, "half-res upsampled render too far from full: {:.2f} dB".format(psnr)

    one, stats1 = trainer.render_image_interactive(s, scale=1, chunk_rays=256, hit_frac=0.6)
    fast, _ = trainer.render_image_fast(s, chunk_rays=256, hit_frac=0.6)
    np.testing.assert_allclose(one["rgb"], fast["rgb"], atol=1e-6)


def test_render_eval_n_sample_override(shared_trainer):
    """set_render_cap(cap, n_sample=...) must render at a coarser
    inference ladder (fewer fix-step samples), retrace, and stay a close
    approximation of the full-ladder render."""
    trainer = shared_trainer
    from arcnerf_tpu.datasets import get_dataset

    cfgs = load_configs(CFG)
    update_configs_by_dotlist(cfgs, ["--name", "evalns_ds",
                                     "--dataset.val.n_imgs", "1",
                                     "--dataset.val.wh", "[32,32]"])
    s = get_dataset(cfgs.dataset, "data", mode="val")[0]

    trainer.set_render_cap(8)
    full = trainer.render_image(s, chunk_rays=256)
    trainer.set_render_cap(8, n_sample=16)  # training ladder is 32
    coarse = trainer.render_image(s, chunk_rays=256)
    assert coarse["rgb"].shape == full["rgb"].shape
    mse = float(np.mean((coarse["rgb"] - full["rgb"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 15.0, "half-ladder render too far from full: {:.2f} dB".format(psnr)
    assert mse > 0.0, "ladder override did not retrace (identical output)"
    trainer.set_render_cap(None, n_sample=None)
    restored = trainer.render_image(s, chunk_rays=256)
    assert restored["rgb"].shape == full["rgb"].shape


def test_render_image_windowed_matches_full(shared_trainer):
    """Transmittance-continuation render (VERDICT r3 item 3): with enough
    passes to cover every ray's valid samples (n_pass * cap >= n_sample)
    the windowed render must reproduce the full render to float tolerance
    — windows march with the pre-cap occupancy deltas, so per-sample
    alphas are identical and the T-weighted sum telescopes exactly."""
    trainer = shared_trainer
    sample = trainer.data["val"][0]
    bkg = trainer.eval_bkg_color("val")

    trainer.set_render_cap(None)
    full = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)

    # window length 8, 4 passes -> covers all 32 ladder samples
    trainer.set_render_cap(8, window=True)
    win, stats = trainer.render_image_windowed(
        sample, n_pass=4, alive_frac=1.0, chunk_rays=256, bkg_color=bkg,
        hit_frac=1.0, eps=0.0)
    assert stats["clipped_alive"] == 0
    np.testing.assert_allclose(np.asarray(win["rgb"]), np.asarray(full["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(win["depth"]), np.asarray(full["depth"]), atol=1e-4)

    # eps cutoff: a realistic eps must stay visually exact (worst-case
    # per-pixel error is bounded by eps) while finishing early
    win2, stats2 = trainer.render_image_windowed(
        sample, n_pass=2, alive_frac=1.0, chunk_rays=256, bkg_color=bkg,
        hit_frac=1.0, eps=1e-3)
    err = np.abs(np.asarray(win2["rgb"]) - np.asarray(full["rgb"])).max()
    mse = float(np.mean((np.asarray(win2["rgb"]) - np.asarray(full["rgb"])) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, (psnr, err, stats2)

    # window cfg must NOT leak into plain renders (no cap_offset fed):
    # render_image under window=True behaves as the plain cap
    trainer.set_render_cap(8, window=True)
    plain_win = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)
    trainer.set_render_cap(8, window=False)
    plain = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)
    np.testing.assert_allclose(np.asarray(plain_win["rgb"]), np.asarray(plain["rgb"]), atol=1e-6)

    # restore plain-cap mode for other tests
    trainer.set_render_cap(None)


def test_windowed_adaptive_budget_and_refine(shared_trainer):
    """r4 windowed upgrades: (a) adaptive_budget sizes pass-1 from a real
    hit count so a dense view can't silently clip hit rays into
    background (the 25 dB cliff in probe_upsample_bound.py); (b) at
    scale>1, refine_frac re-renders the top edge pixels exactly and
    must not make the frame WORSE than the plain upsample."""
    trainer = shared_trainer
    sample = trainer.data["val"][0]
    bkg = trainer.eval_bkg_color("val")

    trainer.set_render_cap(None)
    full = trainer.render_image(sample, bkg_color=bkg, chunk_rays=256)

    trainer.set_render_cap(8, window=True)
    # blind hit_frac tiny enough to clip on this view; adaptive must
    # override it with a counted budget -> zero hit clipping
    win, stats = trainer.render_image_windowed(
        sample, n_pass=4, alive_frac=1.0, chunk_rays=64, bkg_color=bkg,
        hit_frac=0.01, eps=0.0, adaptive_budget=True)
    assert stats["hit_clipped"] == 0, stats
    np.testing.assert_allclose(np.asarray(win["rgb"]), np.asarray(full["rgb"]), atol=1e-4)

    # shrinking pass ladder is exposed and monotonic non-increasing
    win2, stats2 = trainer.render_image_windowed(
        sample, n_pass=3, alive_frac=0.5, chunk_rays=64, bkg_color=bkg,
        hit_frac=1.0, eps=1e-3, adaptive_budget=True)
    ladder = stats2["pass_budget_rays"]
    assert len(ladder) == 2 and ladder[0] >= ladder[1], stats2

    def psnr_vs_full(img):
        mse = float(np.mean((np.asarray(img) - np.asarray(full["rgb"])) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    # (c) counted pass ladder: with a huge n_pass ceiling, the
    # valid-count prepass must DROP passes no ray can reach (the r4
    # geometric ladder paid ~15 one-chunk floor passes at n_pass=16)
    # while never clipping an alive ray — exactness holds at eps=0
    win3, stats3 = trainer.render_image_windowed(
        sample, n_pass=16, alive_frac=0.5, chunk_rays=64, bkg_color=bkg,
        hit_frac=1.0, eps=0.0, adaptive_budget=True)
    n_sample = int(trainer.model.fg_model.get_ray_cfgs("n_sample"))
    assert len(stats3["pass_budget_rays"]) < 15, stats3
    # ladder long enough for the deepest ray, bounded by the sample count
    assert (1 + len(stats3["pass_budget_rays"])) * stats3["cap"] <= n_sample + stats3["cap"]
    assert stats3["clipped_alive"] == 0, stats3
    np.testing.assert_allclose(np.asarray(win3["rgb"]), np.asarray(full["rgb"]), atol=1e-4)

    plain, _ = trainer.render_image_windowed(
        sample, n_pass=4, alive_frac=1.0, chunk_rays=64, bkg_color=bkg,
        scale=2, eps=0.0, adaptive_budget=True)
    refined, rstats = trainer.render_image_windowed(
        sample, n_pass=4, alive_frac=1.0, chunk_rays=64, bkg_color=bkg,
        scale=2, eps=0.0, adaptive_budget=True, refine_frac=0.2)
    assert rstats.get("refined_rays", 0) > 0, rstats
    assert psnr_vs_full(refined["rgb"]) >= psnr_vs_full(plain["rgb"]) - 1e-6, (
        psnr_vs_full(refined["rgb"]), psnr_vs_full(plain["rgb"]))

    trainer.set_render_cap(None)
