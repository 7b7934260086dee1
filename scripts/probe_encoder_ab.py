"""Encoder-only in-context A/B: pair vs quad hashed levels (r4).

Times fwd and value_and_grad of the REAL HashGridEmbedder at the bench
workload (262144 points, L=16 T=2^19 F=2 bf16 gather) with quad_hash
off/on, plus a decomposition of the quad backward (construction vs
scatter vs fold) if the full A/B disagrees with the standalone scatter
probe (probe_scatter_scaling.py: scatter at K=2^19 is ~2-3 ms vs ~7.4 ms
at 2^20, so quad should save ~50 ms of backward — probe_quad_ab saw only
5 ms on the full step).

Run: python scripts/probe_encoder_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(f, *a, iters=5):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder

    B = 1 << 18
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-0.9, 0.9, size=(B, 3)).astype(np.float32))
    print("backend:", jax.default_backend(), "B:", B, flush=True)

    for quad in (False, True):
        enc = HashGridEmbedder(
            n_levels=16, n_feat_per_entry=2, hashmap_size=19, base_res=16,
            max_res=2048, side=2.0, include_input=True, dtype="bfloat16",
            quad_hash=quad)
        v = enc.init(jax.random.PRNGKey(0), xyz[:128])

        fwd = jax.jit(lambda p, x: jnp.sum(enc.apply(p, x)))
        vg = jax.jit(jax.value_and_grad(lambda p, x: jnp.sum(enc.apply(p, x) ** 2)))
        t_f = timed(fwd, v, xyz)
        t_g = timed(vg, v, xyz)
        print("quad={}: fwd {:6.1f} ms   value_and_grad {:6.1f} ms (bwd ~{:.1f})".format(
            quad, t_f * 1e3, t_g * 1e3, (t_g - t_f) * 1e3), flush=True)


if __name__ == "__main__":
    main()
