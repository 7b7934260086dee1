"""Golden-value unit tests for every loss and metric type (reference test
genre 1/§4-d: re-derivable math checked against closed forms)."""

import math

import numpy as np

import jax.numpy as jnp

from arcnerf_tpu.losses import AllLoss, build_loss
from arcnerf_tpu.metrics import AllMetric, build_metric, psnr, ssim
from arcnerf_tpu.utils.cfgs import dict_to_obj


def _cfg(d):
    return dict_to_obj(d)


class TestImgLoss:

    def test_mse_golden(self):
        loss = AllLoss(_cfg({"loss": {"ImgLoss": {"weight": 1.0, "loss_type": "MSE"}}}))
        inputs = {"img": jnp.zeros((2, 4, 3))}
        output = {"rgb": jnp.full((2, 4, 3), 0.5)}
        out = loss(inputs, output)
        assert abs(float(out["sum"]) - 0.25) < 1e-6
        assert out["names"] == ["ImgLoss"]
        assert abs(float(out["ImgLoss"]) - 0.25) < 1e-6

    def test_l1_and_huber(self):
        inputs = {"img": jnp.zeros((1, 4, 3))}
        output = {"rgb": jnp.full((1, 4, 3), 2.0)}
        l1 = AllLoss(_cfg({"loss": {"ImgLoss": {"loss_type": "L1"}}}))(inputs, output)
        assert abs(float(l1["sum"]) - 2.0) < 1e-6
        # huber with delta=1: err=2 -> 1*(2-0.5) = 1.5
        hb = AllLoss(_cfg({"loss": {"ImgLoss": {"loss_type": "Huber"}}}))(inputs, output)
        assert abs(float(hb["sum"]) - 1.5) < 1e-6
        # huber quadratic zone: err=0.5 -> 0.125
        out_small = {"rgb": jnp.full((1, 4, 3), 0.5)}
        hb2 = AllLoss(_cfg({"loss": {"ImgLoss": {"loss_type": "Huber"}}}))(inputs, out_small)
        assert abs(float(hb2["sum"]) - 0.125) < 1e-6

    def test_coarse_fine_sum(self):
        """rgb_coarse + rgb_fine both contribute (reference sums both stages)."""
        loss = AllLoss(_cfg({"loss": {"ImgLoss": {"loss_type": "MSE"}}}))
        inputs = {"img": jnp.zeros((1, 4, 3))}
        output = {"rgb_coarse": jnp.full((1, 4, 3), 1.0), "rgb_fine": jnp.full((1, 4, 3), 0.5)}
        out = loss(inputs, output)
        assert abs(float(out["sum"]) - (1.0 + 0.25)) < 1e-6

    def test_mask_mean(self):
        """use_mask averages the error over valid rays only."""
        loss = AllLoss(_cfg({"loss": {"ImgLoss": {"loss_type": "MSE", "use_mask": True}}}))
        inputs = {
            "img": jnp.zeros((1, 4, 3)),
            "mask": jnp.asarray([[1.0, 1.0, 0.0, 0.0]]),
        }
        pred = jnp.zeros((1, 4, 3)).at[0, :2].set(1.0).at[0, 2:].set(100.0)
        out = loss(inputs, {"rgb": pred})
        # only the two valid rays (err=1) count
        assert abs(float(out["sum"]) - 1.0) < 1e-5

    def test_weight_scales_sum_not_value(self):
        loss = AllLoss(_cfg({"loss": {"ImgLoss": {"weight": 0.5, "loss_type": "MSE"}}}))
        inputs = {"img": jnp.zeros((1, 4, 3))}
        out = loss(inputs, {"rgb": jnp.ones((1, 4, 3))})
        assert abs(float(out["ImgLoss"]) - 1.0) < 1e-6  # raw value logged
        assert abs(float(out["sum"]) - 0.5) < 1e-6  # weighted in the sum


class TestGeoLosses:

    def test_eikonal(self):
        loss = AllLoss(_cfg({"loss": {"EikonalLoss": {"weight": 1.0}}}))
        normals = jnp.zeros((2, 8, 3)).at[..., 0].set(2.0)  # |n| = 2 -> (2-1)^2 = 1
        out = loss({}, {"normal_pts": normals})
        assert abs(float(out["sum"]) - 1.0) < 1e-6
        unit = jnp.zeros((2, 8, 3)).at[..., 1].set(1.0)
        out0 = loss({}, {"normal_pts": unit})
        assert float(out0["sum"]) < 1e-10

    def test_mask_loss_types(self):
        inputs = {"mask": jnp.asarray([[1.0, 0.0]])}
        output = {"mask": jnp.asarray([[0.75, 0.25]])}
        mse = AllLoss(_cfg({"loss": {"MaskLoss": {"loss_type": "MSE"}}}))(inputs, output)
        assert abs(float(mse["sum"]) - 0.0625) < 1e-6
        bce = AllLoss(_cfg({"loss": {"MaskLoss": {"loss_type": "BCE"}}}))(inputs, output)
        expected = -0.5 * (math.log(0.75) + math.log(0.75))
        assert abs(float(bce["sum"]) - expected) < 1e-5

    def test_reg_mask_entropy(self):
        """Entropy is maximal at o=0.5 and ~0 at o→{0,1}."""
        loss = AllLoss(_cfg({"loss": {"RegMaskLoss": {"weight": 1.0}}}))
        mid = float(loss({}, {"mask": jnp.full((1, 8), 0.5)})["sum"])
        edge = float(loss({}, {"mask": jnp.full((1, 8), 0.999)})["sum"])
        assert abs(mid - math.log(2)) < 1e-4
        assert edge < 0.01

    def test_reg_weights(self):
        loss = AllLoss(_cfg({"loss": {"RegWeightsLoss": {"weight": 1.0}}}))
        w = jnp.full((1, 8), 0.5)
        val = float(loss({}, {"progress_weights": w})["sum"])
        assert abs(val - 0.5 * math.log(2)) < 1e-4

    def test_fix_value(self):
        loss = AllLoss(_cfg({"loss": {"FixValueLoss": {"key": "unit_exp", "value": 0.5}}}))
        out = loss({}, {"unit_exp": jnp.full((4,), 1.0)})
        assert abs(float(out["sum"]) - 0.25) < 1e-6

    def test_multi_loss_weighted_sum(self):
        loss = AllLoss(_cfg({"loss": {
            "ImgLoss": {"weight": 2.0, "loss_type": "MSE"},
            "MaskLoss": {"weight": 0.5, "loss_type": "MSE"},
        }}))
        inputs = {"img": jnp.zeros((1, 4, 3)), "mask": jnp.zeros((1, 4))}
        output = {"rgb": jnp.ones((1, 4, 3)), "mask": jnp.ones((1, 4))}
        out = loss(inputs, output)
        assert out["names"] == ["ImgLoss", "MaskLoss"]
        assert abs(float(out["sum"]) - (2.0 * 1.0 + 0.5 * 1.0)) < 1e-6


class TestMetrics:

    def test_psnr_golden(self):
        # mse = 0.01 -> psnr = 20
        pred = jnp.full((4, 4, 3), 0.1)
        gt = jnp.zeros((4, 4, 3))
        assert abs(float(psnr(pred, gt)) - 20.0) < 1e-4
        # identical -> capped by the 1e-10 floor at 100 dB
        assert float(psnr(gt, gt)) >= 99.0

    def test_mask_psnr(self):
        pred = jnp.zeros((1, 4, 3)).at[0, 2:].set(1.0)  # err only on masked-out rays
        gt = jnp.zeros((1, 4, 3))
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        assert float(psnr(pred, gt, mask)) >= 99.0
        assert float(psnr(pred, gt)) < 10.0

    def test_ssim_identical_and_noise(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
        assert abs(float(ssim(img, img)) - 1.0) < 1e-4
        noisy = img + jnp.asarray(rng.normal(scale=0.3, size=(32, 32, 3)).astype(np.float32))
        assert float(ssim(img, noisy)) < 0.7

    def test_all_metric_factory(self):
        metric = AllMetric(_cfg({"metric": {"PSNR": {}, "SSIM": {}}}))
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(8, 8, 3)).astype(np.float32).reshape(1, 64, 3)
        inputs = {"img": jnp.asarray(img), "H": 8, "W": 8}
        output = {"rgb": jnp.asarray(img)}
        out = metric(inputs, output)
        assert float(out["PSNR"]) >= 99.0
        assert abs(float(out["SSIM"]) - 1.0) < 1e-4

    def test_fine_key_preferred(self):
        metric = AllMetric(_cfg({"metric": {"PSNR": {}}}))
        inputs = {"img": jnp.zeros((1, 4, 3))}
        output = {"rgb_fine": jnp.zeros((1, 4, 3)), "rgb_coarse": jnp.ones((1, 4, 3))}
        assert float(metric(inputs, output)["PSNR"]) >= 99.0


def test_builders_smoke():
    cfgs = _cfg({"loss": {"ImgLoss": {"weight": 1.0}}, "metric": {"PSNR": {}}})
    lf = build_loss(cfgs)
    mf = build_metric(cfgs)
    inputs = {"img": jnp.zeros((1, 4, 3))}
    output = {"rgb": jnp.zeros((1, 4, 3))}
    assert float(lf(inputs, output)["sum"]) == 0.0
    assert float(mf(inputs, output)["PSNR"]) >= 99.0
