"""Backward one-hot construction forms (r4 encoder backward attack).

probe_bwd_decomp measured the (K, 128) one-hot update CONSTRUCTION at
~5.4 ms/level — ~5x the pure-write cost of the 512 MB buffer — and
probe_encoder_ab showed the whole encoder backward (~88 ms) is
construction-bound (quad's index halving bought nothing). Hypothesis:
XLA materializes a broadcasted (K, 128) i32 compare operand per where
term (4 terms pair / 8 quad -> 2-4 GB of phantom traffic). This probe
times alternative forms, including a single-pass Pallas kernel that
provably writes the buffer once.

Forms (pair geometry, K = 2^20, 11 levels in one jit; then quad K = 2^19):
  A  current: sum of jnp.where(lanes == (lane0+off+f)[:, None], val, 0)
  B  d-once:  d = lanes - lane0[:, None]; sum of where(d == c, val, 0)
  C  select-free: (d == c) * val products summed
  P  Pallas single-pass tile kernel
Each form also timed + scatter-add (the real backward tail).

Run: python scripts/probe_cons_forms.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LH = 11
R0 = 16384


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


def build_A(lane0, vals, offs, F=2):
    K = lane0.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
    upd = jnp.zeros((K, 128), jnp.float32)
    for i, off in enumerate(offs):
        for f in range(F):
            upd = upd + jnp.where(lanes == (lane0 + off + f)[:, None], vals[2 * i + f][:, None], 0.0)
    return upd


def build_B(lane0, vals, offs, F=2):
    K = lane0.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
    d = lanes - lane0[:, None]
    upd = jnp.zeros((K, 128), jnp.float32)
    for i, off in enumerate(offs):
        for f in range(F):
            upd = upd + jnp.where(d == off + f, vals[2 * i + f][:, None], 0.0)
    return upd


def build_C(lane0, vals, offs, F=2):
    K = lane0.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
    d = lanes - lane0[:, None]
    upd = jnp.zeros((K, 128), jnp.float32)
    for i, off in enumerate(offs):
        for f in range(F):
            upd = upd + (d == off + f).astype(jnp.float32) * vals[2 * i + f][:, None]
    return upd


def _pallas_kernel(offs, F, lane0_ref, vals_ref, out_ref):
    lane0 = lane0_ref[...]  # (bk, 1) block
    lanes = jax.lax.broadcasted_iota(jnp.int32, (lane0.shape[0], 128), 1)
    d = lanes - lane0
    acc = jnp.zeros((lane0.shape[0], 128), jnp.float32)
    for i, off in enumerate(offs):
        for f in range(F):
            acc = acc + jnp.where(d == off + f, vals_ref[..., 2 * i + f][:, None], 0.0)
    out_ref[...] = acc


def build_P(lane0, vals, offs, F=2, bk=2048):
    """Single-pass Pallas construction: one tile write per (bk, 128) block."""
    K = lane0.shape[0]
    nv = len(offs) * F
    vals_t = jnp.stack(vals, axis=-1)  # (K, nv)
    kern = functools.partial(_pallas_kernel, tuple(offs), F)
    return pl.pallas_call(
        kern,
        grid=(K // bk,),
        in_specs=[
            pl.BlockSpec((bk, 1), lambda i: (i, 0)),
            pl.BlockSpec((bk, nv), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bk, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
    )(lane0[:, None], vals_t)


def run_geometry(name, K, offs, F=2):
    rng = np.random.default_rng(0)
    lane0s = jnp.asarray(rng.integers(0, 60, size=(LH, K)), jnp.int32) * F // F
    es = jnp.asarray(rng.integers(0, R0, size=(LH, K)), jnp.int32)
    nv = len(offs) * F
    vals = jnp.asarray(rng.random((LH, nv, K), dtype=np.float32))

    forms = {"A": build_A, "B": build_B, "C": build_C, "P": build_P}
    print("{} geometry (K={}, {} terms):".format(name, K, nv), flush=True)
    for fname, fn in forms.items():
        def cons_only(lane0s, vals):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                u = fn(lane0s[l], [vals[l, j] for j in range(nv)], offs, F)
                acc += jnp.sum(u)
            return acc

        def cons_scatter(lane0s, vals, es):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                u = fn(lane0s[l], [vals[l, j] for j in range(nv)], offs, F)
                acc += jnp.sum(jnp.zeros((R0, 128), jnp.float32).at[es[l]].add(u))
            return acc

        try:
            t1 = timed(jax.jit(cons_only), lane0s, vals)
            t2 = timed(jax.jit(cons_scatter), lane0s, vals, es)
            print("  {}: cons {:6.1f} ms ({:4.2f}/lvl)   +scatter {:6.1f} ms ({:4.2f}/lvl)".format(
                fname, t1 * 1e3, t1 * 1e3 / LH, t2 * 1e3, t2 * 1e3 / LH), flush=True)
        except Exception as e:
            print("  {}: FAILED {}".format(fname, str(e)[:120]), flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    run_geometry("pair", 1 << 20, (0, 2))        # 2 offs x F=2 -> 4 terms
    run_geometry("quad", 1 << 19, (0, 2, 62, 64))  # 4 offs x F=2 -> 8 terms


if __name__ == "__main__":
    main()
