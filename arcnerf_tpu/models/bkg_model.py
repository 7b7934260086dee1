"""Background model base: MSI sampling outside the bounding sphere.

Capability parity with /root/reference/arcnerf/models/bkg_model.py:10-75.
"""

import jax.numpy as jnp

from ..render.ray_helper import get_zvals_outside_sphere
from ..utils.cfgs import get_value_from_cfgs_field
from .base_3d_model import Base3dModel


class BkgModel(Base3dModel):
    """Base for background models (also usable standalone)."""

    def get_zvals_outside_sphere_wrap(self, rays_o, rays_d, inference_only=False):
        """MSI shell zvals outside ray_cfgs['bounding_radius'].

        Returns zvals (B, n_sample), radius (B, n_sample, 1).
        """
        perturb = self.get_ray_cfgs("perturb") and not inference_only
        zvals, radius = get_zvals_outside_sphere(
            rays_o,
            rays_d,
            self.get_ray_cfgs("n_sample"),
            self.get_ray_cfgs("bounding_radius"),
            perturb=perturb,
            key=self._sample_key(inference_only) if perturb else None,
        )
        radius = jnp.broadcast_to(radius[None, :, None], (rays_o.shape[0], radius.shape[0], 1))
        return zvals, radius

    def read_optim_cfgs(self):
        optim_cfgs = get_value_from_cfgs_field(self.cfgs.model, "optim", None)
        return {
            "near_distance": get_value_from_cfgs_field(optim_cfgs, "near_distance", 0.0),
            "epoch_optim": get_value_from_cfgs_field(optim_cfgs, "epoch_optim", 16),
            "epoch_optim_warmup": get_value_from_cfgs_field(optim_cfgs, "epoch_optim_warmup", 256),
            "ema_optim_decay": get_value_from_cfgs_field(optim_cfgs, "ema_optim_decay", 0.95),
            "opa_thres": get_value_from_cfgs_field(optim_cfgs, "opa_thres", 0.01),
        }

    def get_optim_cfgs(self, key=None):
        cfgs = self.read_optim_cfgs()
        return cfgs if key is None else cfgs[key]

    def init_bound_state(self):
        return {}
