"""Loss factory + weighted-sum composition.

Capability parity with /root/reference/arcnerf/loss/__init__.py:18-64
(build_loss + AllLoss), img_loss.py (ImgLoss MSE/L1/Huber on rgb* keys,
FixValueLoss), geo_loss.py (EikonalLoss, RegMaskLoss, RegWeightsLoss),
mask_loss.py (MaskLoss MSE/L1/BCE).

All losses are pure functions ``loss(inputs, output) -> scalar`` built from
cfgs; AllLoss sums them with weights and returns a dict
{names, sum, <name>: value} exactly like the reference for logging parity.
"""

import jax.numpy as jnp

from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import LOSS_REGISTRY


def _error_fn(loss_type, delta=1.0):
    lt = (loss_type or "MSE").lower()
    if lt == "mse":
        return lambda pred, gt: (pred - gt) ** 2
    if lt == "l1":
        return lambda pred, gt: jnp.abs(pred - gt)
    if lt == "huber":
        def huber(pred, gt):
            err = jnp.abs(pred - gt)
            return jnp.where(err <= delta, 0.5 * err**2, delta * (err - 0.5 * delta))

        return huber
    if lt == "bce":
        def bce(pred, gt):
            pred = jnp.clip(pred, 1e-7, 1 - 1e-7)
            return -(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred))

        return bce
    raise NotImplementedError("loss type {} not supported".format(loss_type))


def _masked_mean(err, mask=None):
    """err (B, N, ...) averaged; if mask (B, N), average over valid rays only
    (mask-mean, reference img_loss.py:62-84)."""
    if mask is None:
        return jnp.mean(err)
    while mask.ndim < err.ndim:
        mask = mask[..., None]
    denom = jnp.maximum(jnp.sum(mask), 1.0) * (err.size / mask.size)
    return jnp.sum(err * mask) / denom


@LOSS_REGISTRY.register()
class ImgLoss:
    """Photometric loss over every ``rgb*``-prefixed output key
    (rgb/rgb_coarse/rgb_fine/hdr...), optional per-key internal weights and
    mask-mean (reference img_loss.py:12-100)."""

    def __init__(self, cfgs=None):
        self.loss_type = get_value_from_cfgs_field(cfgs, "loss_type", "MSE")
        self.use_mask = get_value_from_cfgs_field(cfgs, "use_mask", False)
        self.keys = get_value_from_cfgs_field(cfgs, "keys", ["rgb"])
        self.internal_weights = get_value_from_cfgs_field(cfgs, "internal_weights", None)
        delta = float(get_value_from_cfgs_field(cfgs, "delta", 1.0))  # Huber delta
        self.fn = _error_fn(self.loss_type, delta)

    def __call__(self, inputs, output):
        gt = inputs["img"]
        mask = inputs.get("mask", None) if self.use_mask else None
        total = 0.0
        count = 0
        for i, base in enumerate(self.keys):
            w = self.internal_weights[i] if self.internal_weights else 1.0
            for suffix in ("", "_coarse", "_fine"):
                key = base + suffix
                if key in output and output[key] is not None:
                    total = total + w * _masked_mean(self.fn(output[key], gt), mask)
                    count += 1
        return total if count else jnp.zeros(())


@LOSS_REGISTRY.register()
class MaskLoss:
    """Opacity-vs-mask loss (reference mask_loss.py:10-66)."""

    def __init__(self, cfgs=None):
        self.loss_type = get_value_from_cfgs_field(cfgs, "loss_type", "MSE")
        self.fn = _error_fn(self.loss_type, float(get_value_from_cfgs_field(cfgs, "delta", 1.0)))

    def __call__(self, inputs, output):
        gt = inputs["mask"]
        total = 0.0
        count = 0
        for key in ("mask", "mask_coarse", "mask_fine"):
            if key in output and output[key] is not None:
                total = total + jnp.mean(self.fn(output[key], gt))
                count += 1
        return total if count else jnp.zeros(())


@LOSS_REGISTRY.register()
class EikonalLoss:
    """|grad sdf| -> 1 regularizer on normal_pts (reference geo_loss.py:12)."""

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "normal_pts")

    def __call__(self, inputs, output):
        total = 0.0
        count = 0
        for suffix in ("", "_coarse", "_fine"):
            key = self.key + suffix
            if key in output and output[key] is not None:
                norm = jnp.linalg.norm(output[key], axis=-1)
                total = total + jnp.mean((norm - 1.0) ** 2)
                count += 1
        return total if count else jnp.zeros(())


@LOSS_REGISTRY.register()
class RegMaskLoss:
    """Opacity entropy regularizer on the accumulated ray mask
    (reference geo_loss.py RegMaskLoss)."""

    def __init__(self, cfgs=None):
        pass

    def __call__(self, inputs, output):
        total = 0.0
        count = 0
        for key in ("mask", "mask_coarse", "mask_fine"):
            if key in output and output[key] is not None:
                o = jnp.clip(output[key], 1e-5, 1 - 1e-5)
                total = total + jnp.mean(-(o * jnp.log(o) + (1 - o) * jnp.log(1 - o)))
                count += 1
        return total if count else jnp.zeros(())


@LOSS_REGISTRY.register()
class RegWeightsLoss:
    """Entropy regularizer on progress_weights (reference geo_loss.py)."""

    def __init__(self, cfgs=None):
        pass

    def __call__(self, inputs, output):
        total = 0.0
        count = 0
        for key in ("progress_weights", "progress_weights_coarse", "progress_weights_fine"):
            if key in output and output[key] is not None:
                w = jnp.clip(output[key], 1e-5, 1 - 1e-5)
                total = total + jnp.mean(-w * jnp.log(w))
                count += 1
        return total if count else jnp.zeros(())


@LOSS_REGISTRY.register()
class FixValueLoss:
    """Pin an output key to a fixed value — e.g. HDR unit-exposure tone map
    to 0.5 (reference img_loss.py:104)."""

    def __init__(self, cfgs=None):
        self.key = get_value_from_cfgs_field(cfgs, "key", "unit_exp")
        self.value = get_value_from_cfgs_field(cfgs, "value", 0.5)

    def __call__(self, inputs, output):
        total = 0.0
        count = 0
        for suffix in ("", "_coarse", "_fine"):
            key = self.key + suffix
            if key in output and output[key] is not None:
                total = total + jnp.mean((output[key] - self.value) ** 2)
                count += 1
        return total if count else jnp.zeros(())


class AllLoss:
    """Weighted sum of configured losses; returns dict with 'sum', 'names',
    and per-loss values (reference loss/__init__.py:18-64)."""

    def __init__(self, cfgs):
        self.losses = {}
        self.weights = {}
        loss_cfgs = cfgs.loss if hasattr(cfgs, "loss") else cfgs
        for name in loss_cfgs.keys():
            sub = getattr(loss_cfgs, name)
            loss_type = get_value_from_cfgs_field(sub, "type", name)
            weight = get_value_from_cfgs_field(sub, "weight", 1.0)
            self.losses[name] = LOSS_REGISTRY.get(loss_type)(sub)
            self.weights[name] = weight

    def __call__(self, inputs, output):
        out = {"names": list(self.losses.keys())}
        total = jnp.zeros(())
        for name, loss in self.losses.items():
            val = loss(inputs, output)
            out[name] = val
            total = total + self.weights[name] * val
        out["sum"] = total
        return out


def build_loss(cfgs, logger=None):
    allloss = AllLoss(cfgs)
    if logger is not None:
        logger.add_log("Built losses: {}".format(list(allloss.losses.keys())))
    return allloss
