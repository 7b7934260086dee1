"""Geometry / radiance networks as flax.linen modules.

Capability parity with /root/reference/arcnerf/models/base_modules/
geo_rad_model/: GeoNet/RadianceNet (linear_network_module.py:17-335 — skips,
skip_reduce_output + norm_skip, geometric sphere-sdf init, SIREN layers,
weight norm) and the tcnn FusedMLP variants (tcnn_fusedmlp_module.py:16-213)
re-imagined for TPU: a bf16 MXU-friendly MLP with f32 accumulation — XLA
fuses the small matmul chain, no hand-written kernel needed for widths
{16..128}, and bf16 keeps the MXU at full rate.

GeoNet.__call__(x) -> (geo (B, 1), feat (B, W_feat)|None)
RadianceNet.__call__(x, view_dirs, normals, feat) -> rgb (B, 3)
"""

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...geometry.transformation import normalize
from ...utils.cfgs import Obj, dict_to_obj
from ...utils.registry import GEO_MODEL_REGISTRY, RADIANCE_MODEL_REGISTRY
from .activation import get_activation


def _cfg_get(cfg, key, default=None):
    if cfg is None:
        return default
    if isinstance(cfg, Obj):
        return getattr(cfg, key, default) if getattr(cfg, key, None) is not None else default
    if isinstance(cfg, dict):
        return cfg.get(key, default) if cfg.get(key) is not None else default
    return default


def _build_encoder_from_cfg(cfg):
    from . import build_encoder

    if isinstance(cfg, dict):
        cfg = dict_to_obj(cfg)
    return build_encoder(cfg)


class SirenDense(nn.Module):
    """Linear + sin(w0 x), SIREN initialization."""

    features: int
    is_first: bool = False
    w0: float = 30.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.is_first:
            lim = 1.0 / in_dim
        else:
            lim = math.sqrt(6.0 / in_dim) / self.w0
        kernel_init = nn.initializers.uniform(scale=2 * lim)
        dense = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=lambda k, s, d: kernel_init(k, s, d) - lim,
            bias_init=nn.initializers.zeros,
        )
        return jnp.sin(self.w0 * dense(x))


def _geo_init_first(input_ch):
    """First-layer geometric init: normal on raw-x columns, zero on embed."""

    def init(key, shape, dtype):
        in_dim, out_dim = shape
        w = nn.initializers.normal(stddev=math.sqrt(2.0) / math.sqrt(out_dim))(key, shape, dtype)
        mask = (jnp.arange(in_dim) < input_ch)[:, None]
        return jnp.where(mask, w, 0.0)

    return init


def _geo_init_skip(embed_tail):
    """Skip-layer geometric init: zero the embed tail columns."""

    def init(key, shape, dtype):
        in_dim, out_dim = shape
        w = nn.initializers.normal(stddev=math.sqrt(2.0) / math.sqrt(out_dim))(key, shape, dtype)
        mask = (jnp.arange(in_dim) >= in_dim - embed_tail)[:, None]
        return jnp.where(mask, 0.0, w)

    return init


def _geo_init_hidden():
    def init(key, shape, dtype):
        return nn.initializers.normal(stddev=math.sqrt(2.0) / math.sqrt(shape[1]))(key, shape, dtype)

    return init


def _geo_init_last():
    """Last layer: mean sqrt(pi)/sqrt(in), tiny std — sphere-like sdf."""

    def init(key, shape, dtype):
        in_dim = shape[0]
        return nn.initializers.normal(stddev=1e-4)(key, shape, dtype) + math.sqrt(math.pi) / math.sqrt(in_dim)

    return init


def _geo_bias_last(radius_init):
    def init(key, shape, dtype):
        b = jnp.zeros(shape, dtype)
        return b.at[0].set(-radius_init)

    return init


@GEO_MODEL_REGISTRY.register()
class GeoNet(nn.Module):
    """Encoder + MLP geometry net: xyz -> (sdf/sigma, feature).

    Mirrors reference linear_network_module.py:17 GeoNet: skip connections
    (concat [h, embed]), skip_reduce_output/norm_skip IDR-style variant,
    geometric sphere init, SIREN option, weight norm.
    """

    W: int = 256
    D: int = 8
    skips: Sequence[int] = (4,)
    encoder: Any = None
    input_ch: int = 3
    W_feat: int = 256
    use_bias: bool = True
    skip_reduce_output: bool = False
    norm_skip: bool = False
    act_cfg: Any = None
    geometric_init: bool = False
    radius_init: float = 1.0
    use_siren: bool = False
    weight_norm: bool = False
    out_act_cfg: Any = None
    dtype: Any = jnp.float32

    def _embed(self):
        return _build_encoder_from_cfg(self.encoder)

    @nn.compact
    def __call__(self, x):
        embed_fn = self._embed()
        embed_dim = embed_fn.out_dim
        act = get_activation(self.act_cfg)
        out_act = get_activation(self.out_act_cfg, None) if self.out_act_cfg is not None else None

        x_embed = embed_fn(x)
        h = x_embed
        skips = list(self.skips)

        for i in range(self.D + 1):
            last = i == self.D
            if last:
                out_dim = 1 + self.W_feat if self.W_feat > 0 else 1
            elif self.skip_reduce_output and i in skips:
                out_dim = self.W - embed_dim
            else:
                out_dim = self.W

            if self.use_siren and not last:
                h = SirenDense(out_dim, is_first=(i == 0), use_bias=self.use_bias, name="siren_{}".format(i))(h)
            else:
                kernel_init = nn.initializers.lecun_normal()
                bias_init = nn.initializers.zeros
                if self.geometric_init and not self.use_siren:
                    has_embed_tail = embed_dim > self.input_ch
                    if last:
                        kernel_init = _geo_init_last()
                        bias_init = _geo_bias_last(self.radius_init)
                    elif i == 0 and has_embed_tail:
                        kernel_init = _geo_init_first(self.input_ch)
                    elif i > 0 and (i - 1) in skips and has_embed_tail:
                        kernel_init = _geo_init_skip(embed_dim - self.input_ch)
                    else:
                        kernel_init = _geo_init_hidden()
                dense = nn.Dense(
                    out_dim, use_bias=self.use_bias, kernel_init=kernel_init, bias_init=bias_init,
                    dtype=self.dtype, name="fc_{}".format(i)
                )
                if self.weight_norm:
                    dense = nn.WeightNorm(dense, name="wn_{}".format(i))
                h = dense(h)
                if not last:
                    h = act(h)

            if i in skips and not last:
                h = jnp.concatenate([h, x_embed], axis=-1)
                if self.norm_skip:
                    h = h / math.sqrt(2.0)

        if self.W_feat > 0:
            geo, feat = h[:, :1], h[:, 1:]
        else:
            geo, feat = h, None
        if out_act is not None:
            geo = out_act(geo)
        return geo, feat


@RADIANCE_MODEL_REGISTRY.register()
class RadianceNet(nn.Module):
    """Encoder + MLP radiance net: (pts, view, normal, feat) -> rgb.

    ``mode`` chars select inputs ('p' pts, 'v' view, 'n' normal, 'f' feat),
    fused in canonical p-v-n-f order (reference encoder_mlp_network.py:95).
    """

    mode: str = "vf"
    W: int = 256
    D: int = 8
    encoder: Any = None
    W_feat_in: int = 256
    use_bias: bool = True
    act_cfg: Any = None
    use_siren: bool = False
    weight_norm: bool = False
    out_act_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, view_dirs, normals, geo_feat):
        assert len(self.mode) > 0 and all(m in "pvnf" for m in self.mode), "mode must be of pvnf"
        act = get_activation(self.act_cfg)
        out_act = get_activation(self.out_act_cfg, dict_to_obj({"type": "Sigmoid"}))

        inputs = {}
        if "p" in self.mode:
            embed_pts = _build_encoder_from_cfg(_cfg_get(self.encoder, "pts"))
            inputs["p"] = embed_pts(x)
        if "v" in self.mode:
            embed_view = _build_encoder_from_cfg(_cfg_get(self.encoder, "view"))
            inputs["v"] = embed_view(normalize(view_dirs))
        if "n" in self.mode:
            inputs["n"] = normals
        if "f" in self.mode and self.W_feat_in > 0:
            inputs["f"] = geo_feat

        h = jnp.concatenate([inputs[m] for m in "pvnf" if m in inputs], axis=-1)

        for i in range(self.D + 1):
            last = i == self.D
            out_dim = 3 if last else self.W
            if self.use_siren and not last:
                h = SirenDense(out_dim, is_first=(i == 0), use_bias=self.use_bias, name="siren_{}".format(i))(h)
            else:
                dense = nn.Dense(out_dim, use_bias=self.use_bias, dtype=self.dtype, name="fc_{}".format(i))
                if self.weight_norm:
                    dense = nn.WeightNorm(dense, name="wn_{}".format(i))
                h = dense(h)
                if not last:
                    h = act(h)
        return out_act(h)


class _FusedMLP(nn.Module):
    """bf16 MXU MLP: no bias, widths {16, 32, 64, 128}, f32 accumulation.

    TPU stand-in for tcnn FullyFusedMLP (reference tcnn_fusedmlp_module.py).
    Two backends:
    - 'xla' (default): back-to-back Dense layers that XLA fuses,
    - 'pallas': the ops.fused_mlp kernel — all weights VMEM-resident, rows
      streamed in tiles, channel dims padded to the 128-lane MXU tile. Its
      forward beats XLA (~17% at 131k rows on v5e); its backward reads bf16
      pre-activations saved by the differentiated forward (2 matmuls/layer
      instead of 3) and measures at or slightly ahead of the XLA chain.
    """

    W: int = 64
    D: int = 2  # num of hidden layers
    out_dim: int = 16
    act_cfg: Any = None
    backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        assert self.W in (16, 32, 64, 128), "FusedMLP widths limited like tcnn"
        act = get_activation(self.act_cfg)
        if self.backend == "pallas" and jax.default_backend() == "tpu":
            from ...ops.fused_mlp import fused_mlp

            dims = [x.shape[-1]] + [self.W] * self.D + [self.out_dim]
            weights = [
                self.param(
                    "fc_{}".format(i) if i < self.D else "fc_out",
                    nn.initializers.lecun_normal(),
                    (dims[i], dims[i + 1]),
                    jnp.float32,
                )
                for i in range(self.D + 1)
            ]
            return fused_mlp(x, weights, act)
        h = x.astype(jnp.bfloat16)
        for i in range(self.D):
            h = nn.Dense(
                self.W, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32, name="fc_{}".format(i)
            )(h)
            h = act(h)
        h = nn.Dense(
            self.out_dim, use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32, name="fc_out"
        )(h)
        return h.astype(jnp.float32)


@GEO_MODEL_REGISTRY.register()
class FusedMLPGeoNet(nn.Module):
    """Encoder + fused bf16 MLP geometry net (instant-ngp style).

    Output = [geo, feat] combined from one head (reference
    tcnn_fusedmlp_module.py:16-110).
    """

    W: int = 64
    D: int = 1
    encoder: Any = None
    W_feat: int = 15
    act_cfg: Any = None
    out_act_cfg: Any = None
    backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        embed_fn = _build_encoder_from_cfg(self.encoder)
        x_embed = embed_fn(x)
        out = _FusedMLP(W=self.W, D=self.D, out_dim=1 + max(self.W_feat, 0), act_cfg=self.act_cfg,
                        backend=self.backend)(x_embed)
        geo, feat = out[:, :1], (out[:, 1:] if self.W_feat > 0 else None)
        if self.out_act_cfg is not None:
            geo = get_activation(self.out_act_cfg)(geo)
        return geo, feat


@RADIANCE_MODEL_REGISTRY.register()
class FusedMLPRadianceNet(nn.Module):
    """Encoder + fused bf16 MLP radiance net (instant-ngp style)."""

    mode: str = "vf"
    W: int = 64
    D: int = 2
    encoder: Any = None
    W_feat_in: int = 15
    act_cfg: Any = None
    out_act_cfg: Any = None
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, view_dirs, normals, geo_feat):
        inputs = {}
        if "p" in self.mode:
            embed_pts = _build_encoder_from_cfg(_cfg_get(self.encoder, "pts"))
            inputs["p"] = embed_pts(x)
        if "v" in self.mode:
            embed_view = _build_encoder_from_cfg(_cfg_get(self.encoder, "view"))
            inputs["v"] = embed_view(normalize(view_dirs))
        if "n" in self.mode:
            inputs["n"] = normals
        if "f" in self.mode and self.W_feat_in > 0:
            inputs["f"] = geo_feat
        h = jnp.concatenate([inputs[m] for m in "pvnf" if m in inputs], axis=-1)
        out = _FusedMLP(W=self.W, D=self.D, out_dim=3, act_cfg=self.act_cfg, backend=self.backend)(h)
        out_act = get_activation(self.out_act_cfg, dict_to_obj({"type": "Sigmoid"}))
        return out_act(out)
