"""Decompose the per-level encoder BACKWARD cost (r3c).

probe_quad.py showed halving the scatter index count (quad) barely moves
the backward (141 -> 137 ms over 11 levels), so the bwd is NOT
per-index-bound — this probe splits it: one-hot update CONSTRUCTION
(VPU compares over (K, 128)) vs the row SCATTER-ADD, at pair (K=1M) and
quad (K=0.5M) geometry, plus bf16-construction and matmul-construction
variants. All loops over 11 levels inside one jit.

Run: python scripts/probe_bwd_decomp.py
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
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    B = 262144
    LH = 11
    T, F = 1 << 19, 2
    R_pair = -(-T // 63)
    rng = np.random.default_rng(0)

    e4 = jnp.asarray(rng.integers(0, T - 1, size=(LH, 4 * B)), jnp.int32)
    w4 = jnp.asarray(rng.random((LH, 2, 4 * B), dtype=np.float32))
    g4 = jnp.asarray(rng.standard_normal((LH, F, 4 * B)).astype(np.float32) * 1e-3)

    def build_upd(el, w0, w1, gf, dtype):
        K = el.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
        lane0 = (el % 63) * F
        upd = jnp.zeros((K, 128), dtype)
        for f in range(F):
            upd = upd + jnp.where(lanes == (lane0 + f)[:, None], (w0 * gf[f])[:, None].astype(dtype), 0)
            upd = upd + jnp.where(lanes == (lane0 + F + f)[:, None], (w1 * gf[f])[:, None].astype(dtype), 0)
        return upd

    # A: construction only (force materialization via sum)
    def consA(e, w, g):
        acc = 0.0
        for l in range(LH):
            acc += jnp.sum(build_upd(e[l], w[l, 0], w[l, 1], g[l], jnp.float32))
        return acc

    # B: construction + scatter
    def consB(e, w, g):
        acc = jnp.zeros((), jnp.float32)
        for l in range(LH):
            upd = build_upd(e[l], w[l, 0], w[l, 1], g[l], jnp.float32)
            tbl = jnp.zeros((R_pair, 128), jnp.float32).at[e[l] // 63].add(upd)
            acc += jnp.sum(tbl)
        return acc

    # C: scatter of a PRECOMPUTED update (isolate scatter)
    upd_pre = jnp.asarray(rng.standard_normal((4 * B, 128)).astype(np.float32) * 1e-3)

    def scatC(e, upd):
        acc = jnp.zeros((), jnp.float32)
        for l in range(LH):
            tbl = jnp.zeros((R_pair, 128), jnp.float32).at[e[l] // 63].add(upd)
            acc += jnp.sum(tbl)
        return acc

    # D: bf16 construction + f32 scatter (upcast at scatter boundary)
    def consD(e, w, g):
        acc = jnp.zeros((), jnp.float32)
        for l in range(LH):
            upd = build_upd(e[l], w[l, 0], w[l, 1], g[l], jnp.bfloat16)
            tbl = jnp.zeros((R_pair, 128), jnp.float32).at[e[l] // 63].add(upd.astype(jnp.float32))
            acc += jnp.sum(tbl)
        return acc

    # E: bf16 construction + bf16 scatter
    def consE(e, w, g):
        acc = jnp.zeros((), jnp.float32)
        for l in range(LH):
            upd = build_upd(e[l], w[l, 0], w[l, 1], g[l], jnp.bfloat16)
            tbl = jnp.zeros((R_pair, 128), jnp.bfloat16).at[e[l] // 63].add(upd)
            acc += jnp.sum(tbl.astype(jnp.float32))
        return acc

    print("pair geometry, K = 4B = {}, {} hashed levels:".format(4 * B, LH), flush=True)
    for name, fn, args in [
        ("A construction only f32", consA, (e4, w4, g4)),
        ("B cons + scatter f32   ", consB, (e4, w4, g4)),
        ("C scatter only (precomp)", scatC, (e4, upd_pre)),
        ("D bf16 cons + f32 scat ", consD, (e4, w4, g4)),
        ("E bf16 cons + bf16 scat", consE, (e4, w4, g4)),
    ]:
        t = timed(jax.jit(fn), *args)
        print("  {:<26} {:7.1f} ms ({:5.2f}/level)".format(name, t * 1e3, t * 1e3 / LH), flush=True)

    # dense-level loop: take vs mm forward, all 5 levels in one jit
    import math
    scale = math.exp(math.log(2048 / 16) / 15)
    res = [int(math.ceil(16 * scale**i - 1.0)) for i in range(16)]
    dense_R = [-(-((r + 1) ** 3) // 63) for r in res if (r + 1) ** 3 <= T]
    K = 4 * B
    rows_d = [jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32)).astype(jnp.bfloat16)
              for R in dense_R]
    rl_d = [jnp.asarray(rng.integers(0, R, size=(K,)), jnp.int32) for R in dense_R]

    def dense_take(rows_list, rl_list):
        acc = 0.0
        for rows, rl in zip(rows_list, rl_list):
            acc += jnp.sum(jnp.take(rows, rl, axis=0).astype(jnp.float32))
        return acc

    def dense_mm(rows_list, rl_list):
        acc = 0.0
        for rows, rl in zip(rows_list, rl_list):
            R = rows.shape[0]
            e = (rl[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)).astype(jnp.bfloat16)
            acc += jnp.sum(jax.lax.dot_general(
                e, rows, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
        return acc

    print("\ndense fwd, 5 levels in one jit (R = {}):".format(dense_R), flush=True)
    t1 = timed(jax.jit(dense_take), rows_d, rl_d)
    t2 = timed(jax.jit(dense_mm), rows_d, rl_d)
    print("  take: {:6.1f} ms   mm: {:6.1f} ms".format(t1 * 1e3, t2 * 1e3), flush=True)


if __name__ == "__main__":
    main()
