"""HDR-NeRF: NeRF + per-channel tone-mapper MLPs over log exposure.

Capability parity with /root/reference/arcnerf/models/hdrnerf_model.py:13-167:
radiance net predicts log-HDR; three tiny 1->W->1 MLPs map
(log_hdr + log(exp_time)) -> LDR per channel; outputs both ``rgb`` (LDR) and
``hdr``; ``unit_exp`` point constraint for the FixValueLoss.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..utils.cfgs import dict_to_obj, get_value_from_cfgs_field
from ..utils.registry import MODEL_REGISTRY
from .base_modules.activation import get_activation
from .nerf_model import NeRF


class ExpMLP(nn.Module):
    """1 -> W x D -> 1 tone mapping MLP, sigmoid output."""

    W: int = 64
    D: int = 2
    act_cfg: Any = None
    out_act_cfg: Any = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act_cfg)
        out_act = get_activation(self.out_act_cfg, dict_to_obj({"type": "Sigmoid"}))
        for i in range(self.D):
            x = act(nn.Dense(self.W, name="fc_{}".format(i))(x))
        return out_act(nn.Dense(1, name="fc_out")(x))


@MODEL_REGISTRY.register()
class HDRNeRF(NeRF):

    def setup(self):
        super().setup()
        exp_cfgs = self.cfgs.model.exp_mlps
        w = get_value_from_cfgs_field(exp_cfgs, "W", 64)
        d = get_value_from_cfgs_field(exp_cfgs, "D", 2)
        act = get_value_from_cfgs_field(exp_cfgs, "act_cfgs", None)
        out_act = get_value_from_cfgs_field(exp_cfgs, "out_act_cfg", None)
        self.coarse_exp_mlps = [ExpMLP(W=w, D=d, act_cfg=act, out_act_cfg=out_act, name="coarse_exp_{}".format(c))
                                for c in "rgb"]
        if self.get_ray_cfgs("n_importance") > 0 and not self.get_ray_cfgs("shared_network"):
            self.fine_exp_mlps = [ExpMLP(W=w, D=d, act_cfg=act, out_act_cfg=out_act, name="fine_exp_{}".format(c))
                                  for c in "rgb"]

    def _get_exp_mlps(self, stage):
        if stage == "fine" and self.get_ray_cfgs("n_importance") > 0 and not self.get_ray_cfgs("shared_network"):
            return self.fine_exp_mlps
        return self.coarse_exp_mlps

    def forward_exp_mlps(self, mlps, rgb_h, exp_time):
        """rgb_h (B, 3) log-HDR + exp_time (B,) -> LDR rgb (B, 3)."""
        shifted = rgb_h + jnp.log(exp_time)[:, None]  # (B, 3)
        channels = [mlps[c](shifted[:, c:c + 1]) for c in range(3)]
        return jnp.concatenate(channels, axis=-1)

    def point_constraint(self, mlps):
        """Tone-map of zero log-HDR at unit exposure (target 0.5 in loss)."""
        zeros = jnp.zeros((1, 3))
        ones = jnp.ones((1,))
        return self.forward_exp_mlps(mlps, zeros, ones)

    def _forward(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000):
        rays_o, rays_d = inputs["rays_o"], inputs["rays_d"]
        zvals, mask_pts = inputs["zvals"], inputs["mask_pts"]
        bkg_color = inputs.get("bkg_color", None)
        # datasets without per-image exposure (anything but HDRReal) imply
        # unit exposure: log(1) = 0 shift, LDR == tone-mapped HDR
        exp_time = inputs.get("exp_time", None)
        if exp_time is None:
            exp_time = jnp.ones((rays_o.shape[0],), dtype=rays_o.dtype)
        if exp_time.ndim > 1:
            exp_time = exp_time.reshape(-1)
        output = {}

        march_mask = mask_pts if inputs.get("mask_scattered") else None

        def run_stage(stage, zvals, mask_pts):
            nets = self.get_coarse_net() if stage == "coarse" else self.get_fine_net()
            mlps = self._get_exp_mlps(stage)
            sigma, rgb_h = self.get_sigma_radiance_by_mask_pts(
                *nets, rays_o, rays_d, zvals, mask_pts, inference_only
            )
            n_rays, n_pts = sigma.shape
            exp_rep = jnp.repeat(exp_time, n_pts, axis=0)
            rgb_l = self.forward_exp_mlps(mlps, rgb_h.reshape(-1, 3), exp_rep).reshape(n_rays, n_pts, 3)
            out = self.ray_marching_wrap(sigma, rgb_l, zvals, inference_only=inference_only,
                                         bkg_color=bkg_color, mask_pts=march_mask)
            if out.get("rgb") is not None:
                out["hdr"] = self.ray_marching_wrap(
                    sigma, jnp.exp(rgb_h), zvals, inference_only=inference_only, bkg_color=bkg_color,
                    mask_pts=march_mask
                )["rgb"]
            if not inference_only:
                out["unit_exp"] = self.point_constraint(mlps)
            return out

        output_coarse = run_stage("coarse", zvals, mask_pts)
        coarse_weights = output_coarse["weights"]
        output["coarse"] = self.output_get_progress(output_coarse, get_progress)

        if self.get_ray_cfgs("n_importance") > 0:
            zvals, mask_pts = self.upsample_zvals(zvals, coarse_weights, mask_pts, inference_only)
            output_fine = run_stage("fine", zvals, mask_pts)
            output["fine"] = self.output_get_progress(output_fine, get_progress)

        return self.adjust_coarse_fine_output(output, inference_only)
