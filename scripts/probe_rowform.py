"""Prototype + measure the ROW-FORM hashgrid gather/scatter.

XLA TPU moves full 128-lane rows at ~500 GB/s through gather AND
scatter-add (probe rounds 1-3), while element-granularity forms serialize
(fwd 203 ms, bwd 2668 ms). So pack the (L, T, F=2) table as
(L*T/64, 128) rows — 64 entries x 2 feats per row — and:
  fwd: row gather + one-hot lane extraction (fusable vector ops)
  bwd: build one-hot lane update rows + row scatter-add
Chunked per level via a static python loop (16 x (2M, 128) intermediates).

Verifies exact equivalence against the element-form ops and times both.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

L, T, F = 16, 2**19, 2
B = 2**18
NL = 8 * B  # per-level corner count (2M)
EPR = 128 // F  # entries per row (64)


def timed(f, *a, iters=3):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L, T, F), jnp.float32) * 0.1
    # per-level indices (already include no level offset here)
    idx = jax.random.randint(key, (L, NL), 0, T, jnp.int32)
    g_out = jax.random.normal(key, (L, NL, F), jnp.float32)  # dL/dfeats

    # ---------------- element-form baseline (current encoder semantics)
    @jax.jit
    def fwd_element(table, idx):
        t16 = table.reshape(L * T, F).T.astype(jnp.bfloat16)  # (F, LT)
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        return jnp.take(t16, flat, axis=1).astype(jnp.float32).reshape(F, L, NL)

    # ---------------- row-form fwd
    @jax.jit
    def fwd_rowform(table, idx):
        rows16 = table.reshape(L, T // EPR, 128).astype(jnp.bfloat16)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (NL, 128), 1)
        outs = []
        for l in range(L):  # static loop: per-level (NL, 128) intermediate
            r = jnp.take(rows16[l], idx[l] // EPR, axis=0)  # (NL, 128) bf16
            lane0 = (idx[l] % EPR) * F
            r32 = r.astype(jnp.float32)
            f0 = jnp.sum(jnp.where(lanes == lane0[:, None], r32, 0.0), axis=1)
            f1 = jnp.sum(jnp.where(lanes == (lane0 + 1)[:, None], r32, 0.0), axis=1)
            outs.append(jnp.stack([f0, f1]))  # (F, NL)
        return jnp.stack(outs, axis=1)  # (F, L, NL)

    # ---------------- element-form bwd (current custom_vjp backward)
    @jax.jit
    def bwd_element(idx, g_out):
        flat = (idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]).reshape(-1)
        g = g_out.transpose(2, 0, 1).reshape(F, L * NL)  # (F, L*NL)
        return jnp.zeros((F, L * T), jnp.float32).at[:, flat].add(g)

    # ---------------- row-form bwd
    @jax.jit
    def bwd_rowform(idx, g_out):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (NL, 128), 1)
        grads = []
        for l in range(L):
            lane0 = (idx[l] % EPR) * F
            upd = (jnp.where(lanes == lane0[:, None], g_out[l, :, 0:1], 0.0)
                   + jnp.where(lanes == (lane0 + 1)[:, None], g_out[l, :, 1:2], 0.0))
            tbl = jnp.zeros((T // EPR, 128), jnp.float32).at[idx[l] // EPR].add(upd)
            grads.append(tbl)
        return jnp.stack(grads)  # (L, T//EPR, 128)

    # correctness: row-form == element-form
    fe = np.asarray(fwd_element(table, idx))
    fr = np.asarray(fwd_rowform(table, idx))
    print("fwd parity:", np.allclose(fe, fr, atol=1e-6), flush=True)

    be = np.asarray(bwd_element(idx, g_out)).reshape(F, L, T).transpose(1, 2, 0)
    br = np.asarray(bwd_rowform(idx, g_out)).reshape(L, T, F)
    print("bwd parity:", np.allclose(be, br, atol=1e-3), "maxdiff",
          float(np.abs(be - br).max()), flush=True)

    print("fwd element: {:7.1f} ms".format(timed(fwd_element, table, idx) * 1e3), flush=True)
    print("fwd rowform: {:7.1f} ms".format(timed(fwd_rowform, table, idx) * 1e3), flush=True)
    print("bwd element: {:7.1f} ms".format(timed(bwd_element, idx, g_out, iters=1) * 1e3), flush=True)
    print("bwd rowform: {:7.1f} ms".format(timed(bwd_rowform, idx, g_out) * 1e3), flush=True)


if __name__ == "__main__":
    main()
