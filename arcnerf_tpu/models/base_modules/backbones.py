"""Conv backbone zoo.

Parity with the reference backbone tree (common/models/backbones/
resnet.py:1-403 — BasicBlock/Bottleneck/ResNet, resnet_spec for
18/34/50/101/152, get_resnet with an output-channel tail; common/models/
components.py:8-79 — ConvBNRelu, SEBlock). Not used by the NeRF pipeline
itself; provided for feature-conditioned extensions (pixel-aligned
features, image encoders).

TPU notes: NHWC layout throughout (flax default — XLA's native conv
layout on TPU), GroupNorm by default (batch-stat-free, so the backbone
stays a pure function under jit/vmap/pjit); BatchNorm is available as
``norm='batch'`` for transplanting the reference's torch-pretrained
weights, with running stats carried in the ``batch_stats`` collection.
``load_torch_resnet`` maps a torchvision-style state_dict (the exact
naming the reference's model_urls checkpoints use) into this module's
params — the no-network equivalent of the reference's
load_state_dict_from_url path (resnet.py:320-340).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

# reference resnet.py:340-365 resnet_spec
RESNET_SPEC = {
    "18": {"block": "basic", "layers": (2, 2, 2, 2), "exp": 1},
    "34": {"block": "basic", "layers": (3, 4, 6, 3), "exp": 1},
    "50": {"block": "bottleneck", "layers": (3, 4, 6, 3), "exp": 4},
    "101": {"block": "bottleneck", "layers": (3, 4, 23, 3), "exp": 4},
    "152": {"block": "bottleneck", "layers": (3, 8, 36, 3), "exp": 4},
}


def _norm(norm, features, name=None, zero_scale=False):
    scale_init = nn.initializers.zeros if zero_scale else nn.initializers.ones
    if norm == "batch":
        # use_running_average statically True: inference-mode stats (the
        # transplant use case); training a backbone from scratch on TPU
        # should prefer GroupNorm anyway
        return nn.BatchNorm(use_running_average=True, scale_init=scale_init, name=name)
    return nn.GroupNorm(num_groups=min(32, features), scale_init=scale_init, name=name)


class ConvBNRelu(nn.Module):
    """Conv + norm + relu (reference components.py:8-55 ConvBNRelu)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_norm: bool = True
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    use_bias=not self.use_norm, name="conv")(x)
        if self.use_norm:
            x = _norm(self.norm, self.features, name="bn")(x)
        return nn.relu(x)


class SEBlock(nn.Module):
    """Squeeze-excitation channel attention (reference components.py:57-79)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Dense(max(c // self.reduction, 1))(s))
        s = nn.sigmoid(nn.Dense(c)(s))
        return x * s


class BasicBlock(nn.Module):
    """reference resnet.py:47-109. expansion = 1."""

    features: int
    stride: int = 1
    dilation: int = 1
    norm: str = "group"
    zero_init_residual: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        d = self.dilation
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(d, d), padding=((d, d), (d, d)),
                    use_bias=False, name="conv1")(x)
        y = _norm(self.norm, self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                    padding=((d, d), (d, d)), use_bias=False, name="conv2")(y)
        y = _norm(self.norm, self.features, name="bn2",
                  zero_scale=self.zero_init_residual)(y)
        if identity.shape != y.shape:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            identity = _norm(self.norm, self.features, name="down_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """reference resnet.py:111-182. expansion = 4; groups/width follow the
    torchvision convention (width = features * width_per_group/64 * groups)."""

    features: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    width_per_group: int = 64
    norm: str = "group"
    zero_init_residual: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(self.features * (self.width_per_group / 64.0)) * self.groups
        d = self.dilation
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_norm(self.norm, width, name="bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(d, d), padding=((d, d), (d, d)),
                    feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(_norm(self.norm, width, name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = _norm(self.norm, self.features * 4, name="bn3",
                  zero_scale=self.zero_init_residual)(y)
        if identity.shape != y.shape:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, name="down_conv")(x)
            identity = _norm(self.norm, self.features * 4, name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature-pyramid resnet (reference resnet.py:184-317).

    Returns the final stage-4 feature map, or the 4-stage pyramid with
    ``return_pyramid=True``. ``replace_stride_with_dilation`` mirrors the
    torch surface: 3 bools for stages 2-4; a dilated stage keeps spatial
    resolution and dilates its convs instead (resnet.py:212-222).
    """

    block: Any = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    groups: int = 1
    width_per_group: int = 64
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    norm: str = "group"
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, return_pyramid=False):
        if len(self.replace_stride_with_dilation) != 3:
            raise ValueError("replace_stride_with_dilation needs 3 entries, got {}".format(
                list(self.replace_stride_with_dilation)))
        x = nn.Conv(self.width, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        x = nn.relu(_norm(self.norm, self.width, name="bn1")(x))
        # torch MaxPool2d(3, 2, padding=1): pad with -inf so the pad never wins
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        pyramid = []
        features = self.width
        dilation = 1
        for i, n_blocks in enumerate(self.stage_sizes):
            stride = 1 if i == 0 else 2
            if i > 0 and self.replace_stride_with_dilation[i - 1]:
                dilation *= stride
                stride = 1
            for j in range(n_blocks):
                kw = dict(norm=self.norm, zero_init_residual=self.zero_init_residual,
                          dilation=dilation)
                if self.block is Bottleneck:
                    kw.update(groups=self.groups, width_per_group=self.width_per_group)
                x = self.block(features, stride if j == 0 else 1,
                               name="layer{}_{}".format(i + 1, j), **kw)(x)
            pyramid.append(x)
            features *= 2
        return pyramid if return_pyramid else x


def resnet18(**kw):
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), **kw)


def resnet34(**kw):
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), **kw)


def resnet50(**kw):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), **kw)


def resnet101(**kw):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 23, 3), **kw)


def resnet152(**kw):
    return ResNet(block=Bottleneck, stage_sizes=(3, 8, 36, 3), **kw)


class ResNetWithTail(nn.Module):
    """get_resnet(output_channel=...) shape: backbone + 1x1 ConvBNRelu tail
    converting the stage-4 channel count (reference resnet.py:380-403)."""

    backbone: ResNet
    output_channel: int

    @nn.compact
    def __call__(self, x):
        x = self.backbone(x)
        return ConvBNRelu(self.output_channel, kernel=1, norm=self.backbone.norm,
                          name="tail")(x)


def get_resnet(level, output_channel=None, norm="group", **kwargs):
    """Factory mirroring reference resnet.py:380-403 get_resnet.

    ``level``: one of '18','34','50','101','152' (int accepted).
    ``output_channel``: append a 1x1 ConvBNRelu tail converting the final
    channels. Pretrained weights: no network in this environment — load a
    local torch checkpoint with :func:`load_torch_resnet` instead of the
    reference's URL path.
    """
    level = str(level)
    if level not in RESNET_SPEC:
        raise AssertionError("No level {} in resnet arch...".format(level))
    spec = RESNET_SPEC[level]
    block = BasicBlock if spec["block"] == "basic" else Bottleneck
    model = ResNet(block=block, stage_sizes=spec["layers"], norm=norm, **kwargs)
    if output_channel is not None:
        return ResNetWithTail(backbone=model, output_channel=output_channel)
    return model


# ---------------------------------------------------------------------------
# torch state_dict transplant (reference loads torchvision checkpoints,
# resnet.py:320-340 + model_urls; same tensors, mapped to NHWC/flax)
# ---------------------------------------------------------------------------

def _conv_w(t):
    # torch conv weight OIHW -> flax HWIO
    return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))


def load_torch_resnet(variables, state_dict, stage_sizes):
    """Map a torchvision-style resnet state_dict onto ResNet variables.

    ``variables``: the dict from ``model.init`` with ``norm='batch'``
    (BatchNorm carries the torch running stats; GroupNorm has no slot for
    them). ``state_dict``: torch name->tensor mapping (tensors or numpy).
    Returns a new frozen variables dict. Raises KeyError on a missing
    torch entry so silent partial loads can't happen.
    """
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v) for k, v in state_dict.items()}
    out = unfreeze(variables)
    params, stats = out["params"], out.setdefault("batch_stats", {})

    def put_bn(flax_name, torch_prefix):
        params[flax_name] = {
            "scale": jnp.asarray(sd[torch_prefix + ".weight"]),
            "bias": jnp.asarray(sd[torch_prefix + ".bias"]),
        }
        stats[flax_name] = {
            "mean": jnp.asarray(sd[torch_prefix + ".running_mean"]),
            "var": jnp.asarray(sd[torch_prefix + ".running_var"]),
        }

    params["conv1"] = {"kernel": _conv_w(sd["conv1.weight"])}
    put_bn("bn1", "bn1")
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            fname = "layer{}_{}".format(i + 1, j)
            tpre = "layer{}.{}".format(i + 1, j)
            blk_p = params[fname]
            n_convs = sum(1 for k in blk_p if k.startswith("conv"))
            for c in range(1, n_convs + 1):
                blk_p["conv{}".format(c)] = {"kernel": _conv_w(sd["{}.conv{}.weight".format(tpre, c)])}
                sub = {
                    "scale": jnp.asarray(sd["{}.bn{}.weight".format(tpre, c)]),
                    "bias": jnp.asarray(sd["{}.bn{}.bias".format(tpre, c)]),
                }
                blk_p["bn{}".format(c)] = sub
                stats.setdefault(fname, {})["bn{}".format(c)] = {
                    "mean": jnp.asarray(sd["{}.bn{}.running_mean".format(tpre, c)]),
                    "var": jnp.asarray(sd["{}.bn{}.running_var".format(tpre, c)]),
                }
            if "down_conv" in blk_p:
                blk_p["down_conv"] = {"kernel": _conv_w(sd[tpre + ".downsample.0.weight"])}
                blk_p["down_bn"] = {
                    "scale": jnp.asarray(sd[tpre + ".downsample.1.weight"]),
                    "bias": jnp.asarray(sd[tpre + ".downsample.1.bias"]),
                }
                stats.setdefault(fname, {})["down_bn"] = {
                    "mean": jnp.asarray(sd[tpre + ".downsample.1.running_mean"]),
                    "var": jnp.asarray(sd[tpre + ".downsample.1.running_var"]),
                }
    return freeze(out)
