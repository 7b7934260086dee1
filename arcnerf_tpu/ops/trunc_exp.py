"""exp with truncated-input gradient (instant-ngp's trunc_exp).

Replaces /root/reference/arcnerf/ops/trunc_exp.py:7-61 (torch autograd
Function) with jax.custom_vjp. Reference semantics: the FORWARD is the
plain exp; only the BACKWARD clamps its input (grad * exp(clip(x, -15,
15))) so huge densities cannot blow up gradients.

History: r3 temporarily capped the forward at exp(15) to stop a multivol
divergence at epoch ~10. The real bug was downstream — ray_marching's
``1 - exp(-relu(sigma) * delta)`` forward is finite even for sigma = inf,
but the alpha VJP multiplies by ``exp(-relu(sigma) * delta)`` whose
cotangent path produces inf * 0 = NaN once sigma overflows f32 exp
(x > ~88.7). ray_marching now sanitizes sigma at the alpha boundary
(finite clamp, zero cotangent beyond it) instead of changing trunc_exp's
forward semantics for every model. See tests/test_ops.py trunc_exp cases
and tests/test_render.py masked-overflow regression.
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
