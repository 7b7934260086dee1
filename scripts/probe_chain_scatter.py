"""Chained sub-512k scatters vs one big scatter (r4 backward attack #2).

probe_scatter_scaling measured the (K, 128) f32 scatter-add per-row cost
cliff: ~flat (bandwidth-bound, ~0.3 ms) up to K=262k, then 1.7 ms at
524k and 7.4 ms at 1M — superlinear through the 512k knee. The r3
split-scatter probe (scripts/probe_scatter.py make(S)) split into S
INDEPENDENT buffers (summed after) and lost to the extra buffer traffic.
This probes the other split: S CHAINED .at[].add calls into the SAME
buffer, each chunk under the knee. If XLA emits them as S sequential
scatter ops, the chain should ride the fast regime: 4 x 0.3 < 7.4.

Also probes the fused construct+scatter at both forms (the real backward
tail), and whether XLA merges the chained scatters back into one op
(if times match the single form exactly, it did).

Run on the TPU: python scripts/probe_chain_scatter.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(f, *a, iters=4):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    R = 16384
    LH = 11

    for K in (1 << 19, 1 << 20):
        es = jnp.asarray(rng.integers(0, R, size=(LH, K)), jnp.int32)
        upds = jnp.asarray(rng.random((LH, K, 128), dtype=np.float32))

        def single(es, upds):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                acc += jnp.sum(jnp.zeros((R, 128), jnp.float32).at[es[l]].add(upds[l]))
            return acc

        t1 = timed(jax.jit(single), es, upds)
        print("K={:>8}  single: {:6.1f} ms ({:4.2f}/lvl)".format(K, t1 * 1e3, t1 * 1e3 / LH),
              flush=True)

        for S in (2, 4, 8):
            ch = K // S

            def chained(es, upds, S=S, ch=ch):
                acc = jnp.zeros((), jnp.float32)
                for l in range(LH):
                    g = jnp.zeros((R, 128), jnp.float32)
                    for s in range(S):
                        g = g.at[jax.lax.dynamic_slice_in_dim(es[l], s * ch, ch)].add(
                            jax.lax.dynamic_slice_in_dim(upds[l], s * ch, ch))
                    acc += jnp.sum(g)
                return acc

            t2 = timed(jax.jit(chained), es, upds)
            print("            chain S={}: {:6.1f} ms ({:4.2f}/lvl)".format(
                S, t2 * 1e3, t2 * 1e3 / LH), flush=True)

    # fused construct+scatter comparison at the real backward geometry
    # (slot form, pair levels: K = 4B rows, 2 corner terms, F=2)
    F, Scnt = 2, 64
    K = 1 << 20
    lane0 = jnp.asarray(rng.integers(0, Scnt, size=(LH, K)), jnp.int32) * F
    w0 = jnp.asarray(rng.random((LH, K), dtype=np.float32))
    w1 = jnp.asarray(rng.random((LH, K), dtype=np.float32))
    g0 = jnp.asarray(rng.standard_normal((LH, K), dtype=np.float32))
    g1 = jnp.asarray(rng.standard_normal((LH, K), dtype=np.float32))
    es = jnp.asarray(rng.integers(0, R, size=(LH, K)), jnp.int32)

    def build_slot(lane0_c, w0_c, w1_c, g0_c, g1_c):
        n = lane0_c.shape[0]
        slots = jax.lax.broadcasted_iota(jnp.int32, (n, Scnt), 1)
        q = slots - (lane0_c // F)[:, None]
        m = jnp.where(q == 0, w0_c[:, None], 0.0) + jnp.where(q == 1, w1_c[:, None], 0.0)
        vals = jnp.stack([g0_c, g1_c], axis=-1)
        return (m[:, :, None] * vals[:, None, :]).reshape(n, 128)

    def cs_single(lane0, w0, w1, g0, g1, es):
        acc = jnp.zeros((), jnp.float32)
        for l in range(LH):
            upd = build_slot(lane0[l], w0[l], w1[l], g0[l], g1[l])
            acc += jnp.sum(jnp.zeros((R, 128), jnp.float32).at[es[l]].add(upd))
        return acc

    t = timed(jax.jit(cs_single), lane0, w0, w1, g0, g1, es)
    print("cons+scatter single K={}: {:6.1f} ms ({:4.2f}/lvl)".format(
        K, t * 1e3, t * 1e3 / LH), flush=True)

    for S in (2, 4, 8):
        ch = K // S

        def cs_chain(lane0, w0, w1, g0, g1, es, S=S, ch=ch):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                g = jnp.zeros((R, 128), jnp.float32)
                for s in range(S):
                    sl = slice(s * ch, (s + 1) * ch)
                    upd = build_slot(lane0[l, sl], w0[l, sl], w1[l, sl], g0[l, sl], g1[l, sl])
                    g = g.at[es[l, sl]].add(upd)
                acc += jnp.sum(g)
            return acc

        t = timed(jax.jit(cs_chain), lane0, w0, w1, g0, g1, es)
        print("cons+scatter chain S={}: {:6.1f} ms ({:4.2f}/lvl)".format(
            S, t * 1e3, t * 1e3 / LH), flush=True)


if __name__ == "__main__":
    main()
