"""Image metrics: PSNR / MaskPSNR / SSIM / MaskSSIM + factory + averaging
counters.

Capability parity with /root/reference/arcnerf/metric/img_metric.py:13-131
(SSIM implemented natively in jnp — gaussian-window SSIM like
torchgeometry's), metric/__init__.py factory, and
common/{loss,metric}/*_dict.py averaging counters.
"""

import jax.numpy as jnp

from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import METRIC_REGISTRY


def psnr(pred, gt, mask=None):
    """pred/gt (..., 3) in [0, 1]; mask optional broadcastable to (...)."""
    err = (pred - gt) ** 2
    if mask is not None:
        while mask.ndim < err.ndim:
            mask = mask[..., None]
        mse = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask) * (err.size / mask.size), 1.0)
    else:
        mse = jnp.mean(err)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def _gaussian_kernel(size=11, sigma=1.5):
    x = jnp.arange(size) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return g


def ssim(pred, gt, mask=None):
    """SSIM over (H, W, 3) images with 11x11 gaussian window."""
    c1, c2 = 0.01**2, 0.03**2
    kern = _gaussian_kernel()

    def blur(img):
        # separable gaussian via 2 convs on H then W, channelwise
        out = img
        for axis in (0, 1):
            k_shape = [1, 1, 1]
            k_shape[axis] = kern.shape[0]
            pad = [(0, 0)] * 3
            pad[axis] = (kern.shape[0] // 2, kern.shape[0] // 2)
            padded = jnp.pad(out, pad, mode="edge")
            out = jnp.apply_along_axis(lambda v: jnp.convolve(v, kern, mode="valid"), axis, padded)
        return out

    mu_p, mu_g = blur(pred), blur(gt)
    sigma_p = blur(pred**2) - mu_p**2
    sigma_g = blur(gt**2) - mu_g**2
    sigma_pg = blur(pred * gt) - mu_p * mu_g
    ssim_map = ((2 * mu_p * mu_g + c1) * (2 * sigma_pg + c2)) / (
        (mu_p**2 + mu_g**2 + c1) * (sigma_p + sigma_g + c2)
    )
    if mask is not None:
        while mask.ndim < ssim_map.ndim:
            mask = mask[..., None]
        return jnp.sum(ssim_map * mask) / jnp.maximum(jnp.sum(mask) * (ssim_map.size / mask.size), 1.0)
    return jnp.mean(ssim_map)


def _get_image(output, inputs, key="rgb"):
    for k in (key, key + "_fine", key + "_coarse"):
        if k in output and output[k] is not None:
            return output[k]
    raise KeyError(key)


@METRIC_REGISTRY.register()
class PSNR:

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "rgb")

    def __call__(self, inputs, output):
        return psnr(_get_image(output, inputs, self.key), inputs["img"])


@METRIC_REGISTRY.register()
class MaskPSNR:

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "rgb")

    def __call__(self, inputs, output):
        return psnr(_get_image(output, inputs, self.key), inputs["img"], inputs.get("mask"))


@METRIC_REGISTRY.register()
class SSIM:
    """Needs full (1, H*W, 3) batches with wh info in inputs ('H'/'W')."""

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "rgb")

    def __call__(self, inputs, output):
        h, w = int(inputs["H"]), int(inputs["W"])
        pred = _get_image(output, inputs, self.key).reshape(h, w, 3)
        gt = inputs["img"].reshape(h, w, 3)
        return ssim(pred, gt)


@METRIC_REGISTRY.register()
class MaskSSIM:

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "rgb")

    def __call__(self, inputs, output):
        h, w = int(inputs["H"]), int(inputs["W"])
        pred = _get_image(output, inputs, self.key).reshape(h, w, 3)
        gt = inputs["img"].reshape(h, w, 3)
        mask = inputs["mask"].reshape(h, w)
        return ssim(pred, gt, mask)


class AllMetric:
    """Evaluate every configured metric -> dict {names, <name>: value}."""

    def __init__(self, cfgs):
        self.metrics = {}
        metric_cfgs = cfgs.metric if hasattr(cfgs, "metric") else cfgs
        for name in metric_cfgs.keys():
            sub = getattr(metric_cfgs, name)
            metric_type = get_value_from_cfgs_field(sub, "type", name)
            self.metrics[name] = METRIC_REGISTRY.get(metric_type)(sub)

    def __call__(self, inputs, output):
        out = {"names": list(self.metrics.keys())}
        for name, metric in self.metrics.items():
            out[name] = metric(inputs, output)
        return out


def build_metric(cfgs, logger=None):
    allmetric = AllMetric(cfgs)
    if logger is not None:
        logger.add_log("Built metrics: {}".format(list(allmetric.metrics.keys())))
    return allmetric


class AverageDictCounter:
    """Running average of loss/metric dicts (reference
    common/loss/loss_dict.py:4, common/metric/metric_dict.py:4)."""

    def __init__(self):
        self.totals = {}
        self.count = 0

    def __call__(self, values, batch_size=1):
        for k, v in values.items():
            if k == "names":
                continue
            self.totals[k] = self.totals.get(k, 0.0) + float(v) * batch_size
        self.count += batch_size

    def get_avg_summary(self):
        if self.count == 0:
            return {}
        return {k: v / self.count for k, v in self.totals.items()}

    def get_metric_info(self):
        return " | ".join("{}: {:.4f}".format(k, v) for k, v in self.get_avg_summary().items())

    def reset(self):
        self.totals = {}
        self.count = 0
