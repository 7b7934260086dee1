"""Backbone zoo tests (reference common/models/backbones/resnet.py:1-403).

Covers the resnet_spec variants' shapes, the pyramid/dilation surfaces,
the get_resnet factory, and — numerically — the torch state_dict
transplant against a torch.nn.functional re-execution of the exact
torchvision resnet18 graph (same weights, same padding/stride layout).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcnerf_tpu.models.base_modules.backbones import (
    RESNET_SPEC, SEBlock, get_resnet, load_torch_resnet, resnet18, resnet50,
)


def test_resnet_variant_shapes():
    x = jnp.ones((1, 64, 64, 3))
    for level, exp_c in (("18", 512), ("50", 2048)):
        model = get_resnet(level)
        out = model.init_with_output(jax.random.PRNGKey(0), x)[0]
        assert out.shape == (1, 2, 2, exp_c), (level, out.shape)


def test_resnet_pyramid_and_dilation():
    x = jnp.ones((1, 64, 64, 3))
    model = resnet18(replace_stride_with_dilation=(False, True, True))
    pyr, _ = model.init_with_output(jax.random.PRNGKey(0), x, return_pyramid=True)
    # stages 3/4 dilated: spatial size frozen at the stage-2 resolution
    assert [p.shape[1] for p in pyr] == [16, 8, 8, 8]
    assert [p.shape[-1] for p in pyr] == [64, 128, 256, 512]


def test_get_resnet_tail_and_level_check():
    x = jnp.ones((1, 32, 32, 3))
    model = get_resnet(18, output_channel=96)
    out, _ = model.init_with_output(jax.random.PRNGKey(0), x)
    assert out.shape == (1, 1, 1, 96)
    with pytest.raises(AssertionError):
        get_resnet("99")
    assert set(RESNET_SPEC) == {"18", "34", "50", "101", "152"}


def test_se_block_identity_at_zero():
    x = jnp.ones((1, 8, 8, 32))
    se = SEBlock()
    out, _ = se.init_with_output(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape


def _torch_resnet18_state(rng):
    """Random torchvision-named resnet18 state_dict (numpy tensors)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for i, (blocks, cout) in enumerate(((2, 64), (2, 128), (2, 256), (2, 512))):
        for j in range(blocks):
            pre = "layer{}.{}".format(i + 1, j)
            conv(pre + ".conv1", cout, cin, 3)
            bn(pre + ".bn1", cout)
            conv(pre + ".conv2", cout, cout, 3)
            bn(pre + ".bn2", cout)
            if cin != cout:
                conv(pre + ".downsample.0", cout, cin, 1)
                bn(pre + ".downsample.1", cout)
            cin = cout
    return sd


def _torch_forward_resnet18(sd, x_nchw):
    """Execute torchvision resnet18 semantics with torch.nn.functional."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def bn(x, p):
        return F.batch_norm(x, t[p + ".running_mean"], t[p + ".running_var"],
                            t[p + ".weight"], t[p + ".bias"], training=False)

    x = torch.from_numpy(x_nchw)
    x = F.relu(bn(F.conv2d(x, t["conv1.weight"], stride=2, padding=3), "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    cin = 64
    for i, (blocks, cout) in enumerate(((2, 64), (2, 128), (2, 256), (2, 512))):
        for j in range(blocks):
            pre = "layer{}.{}".format(i + 1, j)
            stride = 2 if (i > 0 and j == 0) else 1
            idn = x
            y = F.relu(bn(F.conv2d(x, t[pre + ".conv1.weight"], stride=stride, padding=1),
                          pre + ".bn1"))
            y = bn(F.conv2d(y, t[pre + ".conv2.weight"], padding=1), pre + ".bn2")
            if cin != cout:
                idn = bn(F.conv2d(x, t[pre + ".downsample.0.weight"], stride=stride),
                         pre + ".downsample.1")
            x = F.relu(y + idn)
            cin = cout
    return x.numpy()


def test_torch_transplant_numeric_parity():
    """load_torch_resnet output == the torch graph bit-for-bit layout-wise."""
    rng = np.random.default_rng(0)
    sd = _torch_resnet18_state(rng)
    x_nchw = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)

    ref = _torch_forward_resnet18(sd, x_nchw)  # (1, 512, 1, 1)

    model = resnet18(norm="batch")
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    variables = load_torch_resnet(variables, sd, (2, 2, 2, 2))
    out = model.apply(variables, x_nhwc)  # (1, 1, 1, 512)

    got = np.asarray(out).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
