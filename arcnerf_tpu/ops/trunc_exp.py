"""exp with truncated-input gradient (instant-ngp's trunc_exp).

Replaces /root/reference/arcnerf/ops/trunc_exp.py:7-61 (torch autograd
Function) with jax.custom_vjp: forward exp(x); backward grad * exp(clip(x,
-clip, clip)) so huge densities cannot blow up gradients.
"""

import jax
import jax.numpy as jnp

_CLIP = 15.0


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _fwd(x):
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -_CLIP, _CLIP)),)


trunc_exp.defvjp(_fwd, _bwd)
