"""Debiased exponential moving average over parameters.

Capability parity with /root/reference/arcnerf/trainer/ema.py:6-43: shadow =
decay * shadow + (1-decay) * param with bias correction 1 - decay^step;
functional pytree update instead of in-place module mutation.
"""

import jax
import jax.numpy as jnp


def ema_init(params):
    # shadow always accumulates in f32 (params may be stored bf16)
    return jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)


def ema_update(ema_params, params, step, decay=0.95):
    """Returns new shadow params; ``step`` is 1-based for debiasing."""

    def upd(shadow, p):
        new = decay * shadow + (1.0 - decay) * p
        return new

    return jax.tree_util.tree_map(upd, ema_params, params)


def ema_debiased(ema_params, step, decay=0.95):
    """Debias shadow values: shadow / (1 - decay^step)."""
    factor = 1.0 - decay ** jnp.maximum(step, 1)
    return jax.tree_util.tree_map(lambda s: s / factor, ema_params)
