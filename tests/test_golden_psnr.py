"""Golden eval-PSNR regression bars, one per model family (VERDICT r1 item 5).

Each family trains its synthetic recipe (configs/expr/synthetic_<family>.yaml)
for a short run on the procedural scene and must reach a pinned eval-PSNR
floor on 4 held-out views rendered with matched background compositing
(trainer.valid_epoch supplies the gt background color). The floors are
calibrated ~2 dB below measured values (docs/tests.md records the measured
numbers) so a silent quality regression in any family fails pytest while
run-to-run noise does not. The train/eval protocol gap is tracked by also
rendering one training-track view through the same eval protocol.

Reference analogue: the per-family benchmark tables the reference maintains
by hand (/root/reference/docs/benchmark.md:68-74) — here they are enforced.
"""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "expr")

# family -> (config file, extra dotted overrides, eval-psnr floor, ssim floor)
# measured values (CPU mesh, seeded): see docs/tests.md "Golden PSNR bars".
# SSIM floors calibrated from the r5 nightly run (2026-08-19, measured
# values in docs/tests.md): floor = measured - 0.03. multivol's eval
# SSIM is legitimately ~0.50 on this scene (bkg-model regime, large
# train/eval viewpoint gap) — the old 0.60 floor was a pre-measurement
# guess, not a regression.
FAMILIES = {
    "nerf": ("synthetic_nerf.yaml", ["--progress.epoch", "300"], 17.5, 0.74),
    "ngp": ("synthetic_ngp.yaml", [
        "--progress.epoch", "400", "--progress.epoch_val", "-1",
        "--dataset.train.n_imgs", "10", "--dataset.train.wh", "[80,80]",
        "--dataset.val.n_imgs", "4", "--dataset.val.wh", "[80,80]",
        "--model.geometry.encoder.hashmap_size", "15",
        "--model.geometry.encoder.n_levels", "8",
        "--model.obj_bound.volume.n_grid", "32",
        "--model.rays.n_sample", "64",
        # 2^16 point budget + early occupancy: the old 2^18 budget ran the
        # full 4096x64 sample grid through the encoder every step — 14.5
        # s/iter on the 1-core CI host, which timed the 600-epoch bar out
        # of the suite entirely (2x 2h+ aborted runs, golden_suite r3)
        "--model.obj_bound.log_max_allowance", "16",
        "--model.obj_bound.epoch_optim_warmup", "64",
        # pinned ray bucket: the dynamic ladder costs one XLA compile per
        # bucket growth, which dominated the old ~2 h suite wall time
        "--n_rays", "4096",
        "--dataset.train.scheduler.dynamic_batch_size.update_epoch", "1000000",
    ], 23.0, 0.89),
    "neus": ("synthetic_neus.yaml", [
        "--progress.epoch", "400", "--progress.epoch_val", "-1",
        "--dataset.val.n_imgs", "4", "--progress.max_samples_val", "4",
    ], 20.0, 0.86),
    "mipnerf": ("synthetic_mipnerf.yaml", [], 18.0, 0.80),
    "nerfpp": ("synthetic_nerfpp.yaml", [], 16.4, 0.70),
    "multivol": ("synthetic_multivol.yaml", [], 16.5, 0.47),
    "hdrnerf": ("synthetic_hdrnerf.yaml", [], 17.2, 0.74),
    "volsdf": ("synthetic_volsdf.yaml", [], 17.5, 0.78),
}


def run_family(family, floor_check=True):
    from arcnerf_tpu.datasets import get_dataset
    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    config, overrides, floor, ssim_floor = FAMILIES[family]
    cfgs = load_configs(os.path.join(CONFIG_DIR, config))
    with tempfile.TemporaryDirectory() as d:
        update_configs_by_dotlist(cfgs, [
            "--name", "golden_{}".format(family),
            "--dir.expr_dir", os.path.join(d, "expr"),
            "--progress.epoch_val", "-1",
            "--progress.epoch_save_checkpoint", "1000000",
            "--progress.max_samples_val", "4",
            "--dataset.val.n_imgs", "4",
        ] + overrides)
        trainer = ArcNerfTrainer(cfgs)
        trainer.train()
        summary = trainer.valid_epoch(trainer.total_epoch)

        # train/eval protocol gap: render one training-track view through the
        # SAME eval protocol (matched bkg) — large gaps flag overfit/protocol bugs
        train_view_ds = get_dataset(cfgs.dataset, cfgs.dir.data_dir, mode="train")
        sample = train_view_ds[0]
        imgs = trainer.render_image(sample, bkg_color=trainer.eval_bkg_color("val"))
        from arcnerf_tpu.metrics import psnr
        import jax.numpy as jnp

        gt = np.asarray(sample["img"]).reshape(imgs["rgb"].shape)
        train_view_psnr = float(psnr(jnp.asarray(imgs["rgb"]), jnp.asarray(gt)))

        # eval-view SSIM bar (VERDICT r3 weak 6): render a HELD-OUT view
        # through the same protocol and score structure, not just MSE
        from arcnerf_tpu.metrics import ssim

        val_ds = get_dataset(cfgs.dataset, cfgs.dir.data_dir, mode="val")
        vsample = val_ds[0]
        vimgs = trainer.render_image(vsample, bkg_color=trainer.eval_bkg_color("val"))
        vgt = np.asarray(vsample["img"]).reshape(vimgs["rgb"].shape)
        eval_ssim = float(ssim(jnp.asarray(vimgs["rgb"]), jnp.asarray(vgt)))

    result = {
        "family": family,
        "eval_psnr": float(summary["psnr"]),
        "eval_ssim": eval_ssim,
        "train_view_psnr": train_view_psnr,
        "train_eval_gap": train_view_psnr - float(summary["psnr"]),
        "floor": floor,
        "ssim_floor": ssim_floor,
    }
    if floor_check:
        assert result["eval_psnr"] >= floor, \
            "{} eval PSNR regressed: {:.2f} < floor {:.2f} ({})".format(
                family, result["eval_psnr"], floor, result)
        assert result["eval_ssim"] >= ssim_floor, \
            "{} eval SSIM regressed: {:.3f} < floor {:.3f} ({})".format(
                family, result["eval_ssim"], ssim_floor, result)
    return result


@pytest.mark.slow
@pytest.mark.golden
@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_golden_eval_psnr(family):
    result = run_family(family)
    print(json.dumps(result))


if __name__ == "__main__":  # calibration: python tests/test_golden_psnr.py <family>
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    # direct-run bootstrap: sys.path[0] is tests/, the package root is above
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # env alone is NOT enough: the axon sitecustomize may have registered the
    # TPU tunnel with priority over env selection — force cpu post-import
    # exactly like tests/conftest.py, or the "cpu" calibration run silently
    # fights the tunnel (remote compiles, SIGILL flakes)
    import jax

    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", "calibration must run on the CPU mesh"
    fam = sys.argv[1]
    print(json.dumps(run_family(fam, floor_check=False)))
