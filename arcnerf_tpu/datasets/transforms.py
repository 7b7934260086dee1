"""Per-sample transforms (reference datasets/transform/augmentation.py:9-151):
SampleRays, ShuffleRays, TransferRGBSpace (linear<->srgb), BlendBkgColor.
Plain-callable compose over numpy batch dicts.
"""

import numpy as np

_RAY_KEYS = ("img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "exp_time")


class Compose:

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, inputs):
        for t in self.transforms:
            inputs = t(inputs)
        return inputs


class SampleRays:
    """Keep n_rays random rays of each sample."""

    def __init__(self, n_rays=1024, seed=None):
        self.n_rays = n_rays
        self.rng = np.random.default_rng(seed)

    def __call__(self, inputs):
        total = inputs["rays_o"].shape[0]
        select = self.rng.choice(total, min(self.n_rays, total), replace=False)
        for k in _RAY_KEYS:
            if k in inputs and inputs[k] is not None:
                inputs[k] = inputs[k][select]
        return inputs


class ShuffleRays:

    def __init__(self, seed=None):
        self.rng = np.random.default_rng(seed)

    def __call__(self, inputs):
        total = inputs["rays_o"].shape[0]
        perm = self.rng.permutation(total)
        for k in _RAY_KEYS:
            if k in inputs and inputs[k] is not None:
                inputs[k] = inputs[k][perm]
        return inputs


def linear_to_srgb(x):
    return np.where(x <= 0.0031308, 12.92 * x, 1.055 * np.clip(x, 1e-8, None) ** (1 / 2.4) - 0.055)


def srgb_to_linear(x):
    return np.where(x <= 0.04045, x / 12.92, ((np.clip(x, 1e-8, None) + 0.055) / 1.055) ** 2.4)


class TransferRGBSpace:
    """Convert img colorspace ('linear' <-> 'srgb')."""

    def __init__(self, target="linear"):
        self.target = target

    def __call__(self, inputs):
        if "img" in inputs:
            fn = srgb_to_linear if self.target == "linear" else linear_to_srgb
            inputs["img"] = fn(inputs["img"]).astype(np.float32)
        return inputs


class BlendBkgColor:
    """Composite a fixed bkg color where mask says background."""

    def __init__(self, bkg_color=(1.0, 1.0, 1.0)):
        self.bkg_color = np.asarray(bkg_color, dtype=np.float32)

    def __call__(self, inputs):
        if "img" in inputs and "mask" in inputs:
            m = inputs["mask"][..., None]
            inputs["img"] = inputs["img"] * m + self.bkg_color[None, :] * (1.0 - m)
        return inputs


def get_transforms(cfgs):
    """Build transforms from cfgs.augmentation fields (reference
    datasets/transform/__init__.py behavior)."""
    from ..utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs

    transforms = []
    if cfgs is None:
        return None
    aug = getattr(cfgs, "augmentation", None)
    if aug is None:
        return None
    if valid_key_in_cfgs(aug, "transfer_rgb"):
        transforms.append(TransferRGBSpace(get_value_from_cfgs_field(aug, "transfer_rgb", "linear")))
    if valid_key_in_cfgs(aug, "blend_bkg_color"):
        transforms.append(BlendBkgColor(get_value_from_cfgs_field(aug, "blend_bkg_color", [1.0, 1.0, 1.0])))
    if valid_key_in_cfgs(aug, "shuffle"):
        transforms.append(ShuffleRays())
    if valid_key_in_cfgs(aug, "n_rays"):
        transforms.append(SampleRays(get_value_from_cfgs_field(aug, "n_rays", 1024)))
    return Compose(transforms) if transforms else None
