"""P-form backward construction (r4 encoder backward attack, part 2).

The landed slot-form backward (encoding.py build_upd) accumulates
``upd2 (K, S, F) += onehot_c(q) * vals_c`` per corner — each corner pays
a pass over the full (K, S, F) buffer. But the cotangent g is
corner-INDEPENDENT: ``upd2[k,s,f] = (sum_c onehot_c(s) * w_c[k]) * g[k,f]``,
so the corner sum can run on a (K, S) weight-profile m first (F x less
bandwidth per corner) and g applies in ONE (K,S,1)x(K,1,F) broadcast —
exactly the m-form the FORWARD extract already uses.

Forms at the real backward geometries (quad: K=2^19 rows/level, 4
corners; pair: K=2^20 rows/level, 2 corners; F=2, 11 hashed levels in
one jit, S=64 slots):
  slot   landed form: per-corner (K,S,F) accumulation
  pform  m(K,S) corner sum, then m x g outer product
Each timed cons-only and cons+scatter-add (the real tail).

Run: python scripts/probe_pform.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LH = 11
F = 2
S = 128 // F


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


def build_slot(lane0, ws, gf, offs):
    """Landed form (encoding.py build_upd slot branch)."""
    K = lane0.shape[0]
    slots = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1)
    q = slots - (lane0 // F)[:, None]
    upd2 = jnp.zeros((K, S, F), jnp.float32)
    for w_c, off in zip(ws, offs):
        vals = jnp.stack([w_c * gf[f] for f in range(F)], axis=-1)  # (K, F)
        upd2 = upd2 + (q == off // F).astype(jnp.float32)[:, :, None] * vals[:, None, :]
    return upd2.reshape(K, 128)


def build_pform(lane0, ws, gf, offs):
    """m(K,S) corner profile, then one outer product with g."""
    K = lane0.shape[0]
    slots = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1)
    q = slots - (lane0 // F)[:, None]
    m = jnp.zeros((K, S), jnp.float32)
    for w_c, off in zip(ws, offs):
        m = m + jnp.where(q == off // F, w_c[:, None], 0.0)
    g2 = jnp.stack([gf[f] for f in range(F)], axis=-1)  # (K, F)
    return (m[:, :, None] * g2[:, None, :]).reshape(K, 128)


def run_geometry(name, K, offs, R0):
    rng = np.random.default_rng(0)
    nc = len(offs)
    lane0s = jnp.asarray(rng.integers(0, S - 3, size=(LH, K)), jnp.int32) * F
    es = jnp.asarray(rng.integers(0, R0, size=(LH, K)), jnp.int32)
    wss = jnp.asarray(rng.random((LH, nc, K), dtype=np.float32))
    gfs = jnp.asarray(rng.random((LH, F, K), dtype=np.float32))

    forms = {"slot": build_slot, "pform": build_pform}
    print("{} geometry (K={}, {} corners, scatter rows R0={}):".format(
        name, K, nc, R0), flush=True)
    for fname, fn in forms.items():
        def cons_only(lane0s, wss, gfs):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                u = fn(lane0s[l], [wss[l, c] for c in range(nc)], gfs[l], offs)
                acc += jnp.sum(u)
            return acc

        def cons_scatter(lane0s, wss, gfs, es):
            acc = jnp.zeros((), jnp.float32)
            for l in range(LH):
                u = fn(lane0s[l], [wss[l, c] for c in range(nc)], gfs[l], offs)
                acc += jnp.sum(jnp.zeros((R0, 128), jnp.float32).at[es[l]].add(u))
            return acc

        # parity vs the landed form first
        u_ref = build_slot(lane0s[0], [wss[0, c] for c in range(nc)], gfs[0], offs)
        u_new = fn(lane0s[0], [wss[0, c] for c in range(nc)], gfs[0], offs)
        err = float(jnp.max(jnp.abs(u_ref - u_new)))
        t1 = timed(jax.jit(cons_only), lane0s, wss, gfs)
        t2 = timed(jax.jit(cons_scatter), lane0s, wss, gfs, es)
        print("  {}: cons {:6.1f} ms ({:4.2f}/lvl)   +scatter {:6.1f} ms"
              " ({:4.2f}/lvl)   maxerr {:.1e}".format(
                  fname, t1 * 1e3, t1 * 1e3 / LH, t2 * 1e3, t2 * 1e3 / LH, err),
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    # quad hashed levels: 2 gathered rows/point at 262144 points -> K=2^19,
    # each row covering 4 corners (offs in slot units x F)
    run_geometry("quad", 1 << 19, (0, 2, 62, 64), R0=16384)
    # pair levels: 4 rows/point -> K=2^20, 2 corners (z-pair) per row
    run_geometry("pair", 1 << 20, (0, 2), R0=8322)


if __name__ == "__main__":
    main()
