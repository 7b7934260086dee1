"""Conv backbone zoo (reference common/models/resnet.py:403 +
components.py:79 — ConvBNRelu, SEBlock, resnet18/34/50). Not used by the
NeRF pipeline itself, provided for feature-conditioned extensions (e.g.
pixel-aligned features)."""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvBNRelu(nn.Module):
    """Conv + (optional) norm + relu (reference components.py ConvBNRelu)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_norm: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=min(32, self.features))(x)
        return nn.relu(x)


class SEBlock(nn.Module):
    """Squeeze-excitation channel attention (reference components.py SEBlock)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Dense(max(c // self.reduction, 1))(s))
        s = nn.sigmoid(nn.Dense(c)(s))
        return x * s


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvBNRelu(self.features, 3, self.stride)(x)
        y = nn.Conv(self.features, (3, 3), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=min(32, self.features))(y)
        if identity.shape != y.shape:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride), use_bias=False)(x)
            identity = nn.GroupNorm(num_groups=min(32, self.features))(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = ConvBNRelu(self.features, 1)(x)
        y = ConvBNRelu(self.features, 3, self.stride)(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=32)(y)
        if identity.shape != y.shape:
            identity = nn.Conv(self.features * 4, (1, 1), strides=(self.stride, self.stride), use_bias=False)(x)
            identity = nn.GroupNorm(num_groups=32)(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature-pyramid resnet; returns the final feature map (and pyramid
    with return_pyramid=True)."""

    block: Any = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64

    @nn.compact
    def __call__(self, x, return_pyramid=False):
        x = ConvBNRelu(self.width, 7, 2)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        pyramid = []
        features = self.width
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(features, stride)(x)
            pyramid.append(x)
            features *= 2
        return pyramid if return_pyramid else x


def resnet18():
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2))


def resnet34():
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3))


def resnet50():
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3))
