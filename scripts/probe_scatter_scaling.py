"""Scatter-add cost model on the TPU (r4).

probe_quad_ab showed halving the per-level index count (quad) buys ~5 ms
of a ~270 ms step, so the hashed-level backward scatter is NOT
per-index bound. This probe maps the actual cost surface:

  1. one (K, 128) f32 scatter-add into (R, 128) across K (131k..4M)
     at fixed R — is the cost per-index, per-call, or per-byte?
  2. across R at fixed K — does the destination size matter?
  3. GROUPED scatters: G levels' updates concatenated into one
     (G*K, 128) scatter into (G*R, 128) with level-offset rows,
     vs G separate calls — does merging amortize a per-call floor?

Run: python scripts/probe_scatter_scaling.py
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
    rng = np.random.default_rng(0)
    R0 = 16384  # quad rows at T=2^19

    print("1) K scaling at R={} (one scatter per call, f32):".format(R0), flush=True)
    for K in (1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21, 1 << 22):
        e = jnp.asarray(rng.integers(0, R0, size=(K,)), jnp.int32)
        upd = jnp.asarray(rng.standard_normal((K, 128)).astype(np.float32) * 1e-3)

        def scat(e, upd):
            return jnp.sum(jnp.zeros((R0, 128), jnp.float32).at[e].add(upd))

        t = timed(jax.jit(scat), e, upd)
        print("   K={:8d}: {:7.2f} ms ({:5.2f} ns/idx)".format(K, t * 1e3, t * 1e9 / K), flush=True)

    print("2) R scaling at K=2^19:", flush=True)
    K = 1 << 19
    upd = jnp.asarray(rng.standard_normal((K, 128)).astype(np.float32) * 1e-3)
    for R in (2048, 8322, 16384, 65536, 11 * 16384):
        e = jnp.asarray(rng.integers(0, R, size=(K,)), jnp.int32)

        def scat(e, upd, R=R):
            return jnp.sum(jnp.zeros((R, 128), jnp.float32).at[e].add(upd))

        t = timed(jax.jit(scat), e, upd)
        print("   R={:8d}: {:7.2f} ms".format(R, t * 1e3), flush=True)

    print("3) grouped: 11 quad levels (K=2^19 each, R={} each), G per call:".format(R0), flush=True)
    LH = 11
    es = jnp.asarray(rng.integers(0, R0, size=(LH, K)), jnp.int32)
    upds = jnp.asarray(rng.standard_normal((LH, K, 128)).astype(np.float32) * 1e-3)
    for G in (1, 2, 4, 11):
        n_groups = -(-LH // G)

        def scat_g(es, upds, G=G, n_groups=n_groups):
            acc = jnp.zeros((), jnp.float32)
            for g in range(n_groups):
                lv = list(range(g * G, min((g + 1) * G, LH)))
                # level-offset rows into one concatenated destination
                e_cat = jnp.concatenate([es[l] + l_i * R0 for l_i, l in enumerate(lv)])
                u_cat = jnp.concatenate([upds[l] for l in lv])
                tbl = jnp.zeros((len(lv) * R0, 128), jnp.float32).at[e_cat].add(u_cat)
                acc += jnp.sum(tbl)
            return acc

        t = timed(jax.jit(scat_g), es, upds)
        print("   G={:2d} ({} calls): {:7.2f} ms".format(G, n_groups, t * 1e3), flush=True)

    print("4) grouped WITH one-hot construction fused (the real bwd form),", flush=True)
    print("   quad geometry: K=2^19 idx/level, 8 lane-offset terms:", flush=True)
    w8 = jnp.asarray(rng.random((LH, 8, K), dtype=np.float32))
    lane0s = jnp.asarray(rng.integers(0, 31, size=(LH, K)) * 2, jnp.int32)
    offs = tuple((cy * 31 + cz) * 2 for cy in (0, 1) for cz in (0, 1))

    def build_upd(lane0, ws, F=2):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
        upd = jnp.zeros((K, 128), jnp.float32)
        for f in range(F):
            for i, off in enumerate(offs):
                upd = upd + jnp.where(lanes == (lane0 + off + f)[:, None], ws[2 * i + f][:, None], 0.0)
        return upd

    for G in (1, 2, 4):
        n_groups = -(-LH // G)

        def full_g(es, lane0s, w8, G=G, n_groups=n_groups):
            acc = jnp.zeros((), jnp.float32)
            for g in range(n_groups):
                lv = list(range(g * G, min((g + 1) * G, LH)))
                e_cat = jnp.concatenate([es[l] + l_i * R0 for l_i, l in enumerate(lv)])
                u_cat = jnp.concatenate([build_upd(lane0s[l], w8[l]) for l in lv])
                tbl = jnp.zeros((len(lv) * R0, 128), jnp.float32).at[e_cat].add(u_cat)
                acc += jnp.sum(tbl)
            return acc

        t = timed(jax.jit(full_g), es, lane0s, w8)
        print("   G={:2d} ({} calls): {:7.2f} ms ({:5.2f}/level)".format(
            G, n_groups, t * 1e3, t * 1e3 / LH), flush=True)


if __name__ == "__main__":
    main()
