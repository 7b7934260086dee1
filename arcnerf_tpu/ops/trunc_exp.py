"""exp with truncated-input gradient (instant-ngp's trunc_exp).

Replaces /root/reference/arcnerf/ops/trunc_exp.py:7-61 (torch autograd
Function) with jax.custom_vjp: forward exp(min(x, clip)); backward
grad * exp(clip(x, -clip, clip)) so huge densities cannot blow up
gradients.

The FORWARD cap is load-bearing, not just the backward's: a transient
density spike past x ~ 88.7 overflows f32 exp to inf, and an inf sigma
at a zero-weight sample (masked slot, zero marching delta) survives the
forward invisibly but turns into inf*0 = NaN in the VJP — the multivol
golden run diverged exactly this way at epoch ~10 (grad NaN with every
forward output finite; bisected via /tmp repro ablations: clipping the
forward alone makes the step clean). exp(15) = 3.3e6 density is opaque
at any step size the recipes use, so the cap is semantically free.
"""

import jax
import jax.numpy as jnp

_CLIP = 15.0


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(jnp.minimum(x, _CLIP))


def _fwd(x):
    return jnp.exp(jnp.minimum(x, _CLIP)), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -_CLIP, _CLIP)),)


trunc_exp.defvjp(_fwd, _bwd)
