"""Pallas fused-MLP kernel parity vs the jnp reference — outputs AND
gradients (the reference's CUDA-op parity harness genre,
tests_arcnerf/tests_ops/__init__.py:9-60). Runs in interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcnerf_tpu.ops.fused_mlp import fused_mlp, fused_mlp_reference


def make_net(dims, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])).astype(np.float32) * 0.3)
            for i in range(len(dims) - 1)]


@pytest.mark.parametrize("dims,b", [([32, 64, 16], 100), ([31, 64, 64, 3], 257), ([128, 128, 128], 64)])
def test_forward_parity(dims, b):
    weights = make_net(dims)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(b, dims[0])).astype(np.float32))
    out = fused_mlp(x, weights, tile=128, interpret=True)
    ref = fused_mlp_reference(x, weights)
    assert out.shape == (b, dims[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_gradient_parity():
    dims = [32, 64, 16]
    weights = make_net(dims)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(200, dims[0])).astype(np.float32))
    tgt = jnp.asarray(np.random.default_rng(3).normal(size=(200, dims[-1])).astype(np.float32))

    def loss_pl(x, ws):
        return jnp.mean((fused_mlp(x, ws, tile=128, interpret=True) - tgt) ** 2)

    def loss_ref(x, ws):
        return jnp.mean((fused_mlp_reference(x, ws) - tgt) ** 2)

    (dx_pl, dw_pl) = jax.grad(loss_pl, argnums=(0, 1))(x, weights)
    (dx_ref, dw_ref) = jax.grad(loss_ref, argnums=(0, 1))(x, weights)

    np.testing.assert_allclose(np.asarray(dx_pl), np.asarray(dx_ref), atol=5e-3, rtol=5e-2)
    for a, b_ in zip(dw_pl, dw_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3, rtol=5e-2)


def test_softplus_activation():
    dims = [16, 32, 8]
    weights = make_net(dims, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(64, 16)).astype(np.float32))
    act = jax.nn.softplus
    out = fused_mlp(x, weights, act, tile=64, interpret=True)
    ref = fused_mlp_reference(x, weights, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)
