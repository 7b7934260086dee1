"""Time the REAL _hash_lookup_rowform op (encoding.py) at the NGP bench
workload: (L=16, T=2^19, F=2) table, 2^18 points x 8 corners = 33.5M
lookups. fwd + vjp-bwd, bf16 gather dtype (the bench config)."""

import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo — a set PYTHONPATH breaks the
# axon TPU-tunnel plugin registration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(f, *a, iters=5):
    import jax

    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_rowform

    L, T, F = 16, 2**19, 2
    K = 8 * 2**18  # 2M per-level lookups -> 33.5M total
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L, T, F), jnp.float32) * 0.1
    idx = jax.random.randint(jax.random.PRNGKey(1), (L, K), 0, T, dtype=jnp.int32)

    spec = ((L, T, F), "bfloat16", None)
    fwd = jax.jit(lambda t, i: _hash_lookup_rowform(spec, t, i))
    print("fwd:  {:6.1f} ms".format(timed(fwd, table, idx) * 1e3), flush=True)

    def loss(t, i):
        return jnp.sum(_hash_lookup_rowform(spec, t, i))

    bwd = jax.jit(jax.grad(loss))
    print("vjp (fwd+bwd): {:6.1f} ms".format(timed(bwd, table, idx) * 1e3), flush=True)


if __name__ == "__main__":
    main()
