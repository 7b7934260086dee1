"""Dataset registry + model feed-in selection.

Capability parity with /root/reference/arcnerf/datasets/__init__.py:17-59
(get_dataset, get_model_feed_in, POTENTIAL_KEYS).
"""

import numpy as np

import jax.numpy as jnp

from ..utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs
from ..utils.registry import DATASET_REGISTRY

# keys a model forward may consume from a batch
POTENTIAL_KEYS = ["img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "bkg_color", "exp_time"]


def get_dataset(dataset_cfgs, dirs, mode="train", transforms=None, logger=None):
    """Build a dataset from cfgs.dataset.<mode> with ``type`` name."""
    mode_cfgs = getattr(dataset_cfgs, mode) if hasattr(dataset_cfgs, mode) else dataset_cfgs
    dataset_type = mode_cfgs.type
    dataset = DATASET_REGISTRY.get(dataset_type)(mode_cfgs, dirs, mode, transforms)
    if logger is not None:
        logger.add_log("{} dataset: {} ({} imgs, {}x{})".format(
            mode, dataset_type, len(dataset), dataset.W, dataset.H))
    return dataset


def get_model_feed_in(inputs, to_device=True):
    """Select POTENTIAL_KEYS from a batch dict -> jnp arrays."""
    feed_in = {}
    for k in POTENTIAL_KEYS:
        if k in inputs and inputs[k] is not None:
            v = inputs[k]
            feed_in[k] = jnp.asarray(v) if to_device and isinstance(v, np.ndarray) else v
    batch_size = inputs["rays_o"].shape[0]
    return feed_in, batch_size


# register concrete datasets
from . import nerf_dataset  # noqa: F401, E402
from . import llff_dataset  # noqa: F401, E402
from . import synthetic_dataset  # noqa: F401, E402
from . import dtu_dataset  # noqa: F401, E402
from . import capture_dataset  # noqa: F401, E402
from . import nerfpp_style_dataset  # noqa: F401, E402
from . import hdrreal_dataset  # noqa: F401, E402
