"""Timing probe for the next two encoder forms (r3c):

(a) one-hot-matmul FORWARD for coarse dense levels: replace the row
    gather `jnp.take(rows, rl)` with `E @ rows` (E = one-hot of rl).
    Rows hold bf16 values and E is 0/1, so the TPU's bf16 matmul pass is
    LOSSLESS here (each output element is a single bf16 value accumulated
    in f32) — unlike the backward mm, no quality gate needed.

(b) QUAD packing for hashed levels: a hash additive in y (stride 31) and
    z (stride 1) puts all 4 (dy, dz) corners of a point within a 33-entry
    span; stride-32 overlapped rows (row r = entries [32r, 32r+63]) hold
    the whole span, so ONE gather serves 4 corners (2 gathers/point/level
    vs 4 paired, 8 unpaired). The backward overlap fold is pure slice
    arithmetic (each row = two 32-entry halves -> two shifted slice-adds).

All timings loop the per-level work over the 11 hashed (or 5 dense)
levels INSIDE one jit, approximating in-context cost without the
per-dispatch tunnel floor. Run: python scripts/probe_quad.py
"""

import math
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
    L_HASH = 11
    T, F = 1 << 19, 2
    rng = np.random.default_rng(0)

    # ---------------- pair form (current): 4 indices/pt, stride-63 rows
    R_pair = -(-T // 63)
    rows_pair = jnp.asarray(rng.standard_normal((R_pair, 128)).astype(np.float32)).astype(jnp.bfloat16)
    e_pair = jnp.asarray(rng.integers(0, T - 1, size=(L_HASH, 4 * B)), jnp.int32)
    w_pair = jnp.asarray(rng.random((L_HASH, 2, 4 * B), dtype=np.float32))
    g_pair = jnp.asarray(rng.standard_normal((L_HASH, F, 4 * B)).astype(np.float32) * 1e-3)

    def pair_fwd(rows, e, w):
        acc = 0.0
        for l in range(L_HASH):
            el = e[l]
            r = jnp.take(rows, el // 63, axis=0).astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            lane0 = (el % 63) * F
            for f in range(F):
                m = jnp.where(lanes == (lane0 + f)[:, None], w[l, 0][:, None], 0.0) \
                    + jnp.where(lanes == (lane0 + F + f)[:, None], w[l, 1][:, None], 0.0)
                acc += jnp.sum(r * m)
        return acc

    def pair_bwd(e, w, g):
        acc = jnp.zeros((R_pair, 128), jnp.float32)
        for l in range(L_HASH):
            el = e[l]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (el.shape[0], 128), 1)
            lane0 = (el % 63) * F
            upd = jnp.zeros((el.shape[0], 128), jnp.float32)
            for f in range(F):
                upd = upd + jnp.where(lanes == (lane0 + f)[:, None], (w[l, 0] * g[l, f])[:, None], 0.0)
                upd = upd + jnp.where(lanes == (lane0 + F + f)[:, None], (w[l, 1] * g[l, f])[:, None], 0.0)
            acc = acc + jnp.zeros((R_pair, 128), jnp.float32).at[el // 63].add(upd)
        return jnp.sum(acc)

    # ---------------- quad form: 2 indices/pt, stride-32 rows, 4 corners/row
    SY = 31
    R_quad = T // 32
    rows_quad = jnp.asarray(rng.standard_normal((R_quad, 128)).astype(np.float32)).astype(jnp.bfloat16)
    e_quad = jnp.asarray(rng.integers(0, T - 1, size=(L_HASH, 2 * B)), jnp.int32)
    w_quad = jnp.asarray(rng.random((L_HASH, 4, 2 * B), dtype=np.float32))
    g_quad = jnp.asarray(rng.standard_normal((L_HASH, F, 2 * B)).astype(np.float32) * 1e-3)
    # corner lane offsets within the row: (cy*SY + cz) * F
    QOFF = [(cy * SY + cz) * F for cy in (0, 1) for cz in (0, 1)]

    def quad_fwd(rows, e, w):
        acc = 0.0
        for l in range(L_HASH):
            el = e[l]
            r = jnp.take(rows, el // 32, axis=0).astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            lane0 = (el % 32) * F
            for f in range(F):
                m = 0.0
                for c, off in enumerate(QOFF):
                    m = m + jnp.where(lanes == (lane0 + off + f)[:, None], w[l, c][:, None], 0.0)
                acc += jnp.sum(r * m)
        return acc

    def quad_bwd(e, w, g):
        total = 0.0
        for l in range(L_HASH):
            el = e[l]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (el.shape[0], 128), 1)
            lane0 = (el % 32) * F
            upd = jnp.zeros((el.shape[0], 128), jnp.float32)
            for f in range(F):
                for c, off in enumerate(QOFF):
                    upd = upd + jnp.where(lanes == (lane0 + off + f)[:, None], (w[l, c] * g[l, f])[:, None], 0.0)
            g_rows = jnp.zeros((R_quad, 128), jnp.float32).at[el // 32].add(upd)
            # overlap fold: row = two 32-entry halves -> shifted slice adds
            g2 = g_rows.reshape(R_quad, 2, 64)
            flat = jnp.zeros((R_quad + 1, 64), jnp.float32)
            flat = flat.at[:R_quad].add(g2[:, 0]).at[1:].add(g2[:, 1])
            total = total + jnp.sum(flat)
        return total

    jf = {}
    jf["pair fwd (4B idx)"] = timed(jax.jit(pair_fwd), rows_pair, e_pair, w_pair)
    jf["quad fwd (2B idx)"] = timed(jax.jit(quad_fwd), rows_quad, e_quad, w_quad)
    jf["pair bwd (4B idx)"] = timed(jax.jit(pair_bwd), e_pair, w_pair, g_pair)
    jf["quad bwd (2B idx)"] = timed(jax.jit(quad_bwd), e_quad, w_quad, g_quad)
    for k, v in jf.items():
        print("{:<22} {:7.1f} ms  ({:5.2f} ms/level)".format(k, v * 1e3, v * 1e3 / L_HASH), flush=True)

    # ---------------- dense fwd: gather vs one-hot matmul per level
    print("\ndense fwd per level (K = 4B = {}):".format(4 * B))
    scale = math.exp(math.log(2048 / 16) / 15)
    res = [int(math.ceil(16 * scale**i - 1.0)) for i in range(16)]
    K = 4 * B
    rl_np = rng.integers(0, 1 << 20, size=(K,))
    for r in res:
        n_entry = (r + 1) ** 3
        if n_entry > T:
            continue
        R = -(-n_entry // 63)
        rows = jnp.asarray(rng.standard_normal((R, 128)).astype(np.float32)).astype(jnp.bfloat16)
        rl = jnp.asarray(rl_np % R, jnp.int32)

        def f_take(rows, rl):
            return jnp.sum(jnp.take(rows, rl, axis=0).astype(jnp.float32))

        def f_mm(rows, rl):
            e = (rl[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)).astype(jnp.bfloat16)
            return jnp.sum(jax.lax.dot_general(
                e, rows, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))

        t_take = timed(jax.jit(f_take), rows, rl)
        t_mm = timed(jax.jit(f_mm), rows, rl)
        # exactness check (values are bf16-representable; mm must be exact)
        v1 = jax.jit(f_take)(rows, rl)
        v2 = jax.jit(f_mm)(rows, rl)
        print("  res {:4d} R {:5d}: take {:6.1f} ms  mm {:6.1f} ms  diff {:g}".format(
            r, R, t_take * 1e3, t_mm * 1e3, float(abs(v1 - v2))), flush=True)


if __name__ == "__main__":
    main()
