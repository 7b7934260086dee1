"""Measure pair-coalesced hashgrid gathers (r3 encoder candidate).

probe_hotpath2 showed gather cost is per-INDEX (~6 ns/row: 33.5M row
gathers 191 ms ~= 33.5M element gathers 203 ms), so halving the index
count should halve the encoder. Plan: overlapped rows of 63 canonical
entries (row r covers entries [63r, 63r+63], one duplicate) so a corner
pair (e, e+1) always lives in ONE row; z-adjacent indexing makes the two
z-corners of each (x, y) corner a pair -> 4 gathers per point per level
instead of 8.

This probe times, at the NGP bench workload (L=16, T=2^19, F=2 bf16,
2^18 points):
  a) current form: 33.5M single-entry row gathers + 1-entry extract
  b) paired form: 16.7M row gathers (div-63 indexing) + 2-entry extract
  c) raw gather linearity check (16.7M vs 33.5M, trivial consumer)
  d) backward analogues: 33.5M vs 16.7M one-hot row scatter-adds
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=3):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, ms):
    print("{:44s} {:9.2f} ms".format(name, ms * 1e3), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    L, T, F = 16, 1 << 19, 2
    B = 1 << 18
    epr = 128 // F  # 64 entries per 128-lane row (packed form)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = (jax.random.normal(k1, (L, T, F)) * 0.1).astype(jnp.float32)
    # per-(level, point, xy-corner): a base entry e; pair is (e, e+1)
    base_idx = jax.random.randint(k2, (L, 4 * B), 0, T - 1, dtype=jnp.int32)

    # ---------------------------------------------------------------- current
    def cur_form(tbl, bi):
        # emulate today's op: 8 single-entry lookups (e and e+1 separately)
        rows = tbl.reshape(L, T // epr, 128).astype(jnp.bfloat16)
        acc = jnp.zeros((bi.shape[1],), jnp.float32)
        for l in range(L):
            for e_off in range(2):
                e = bi[l] + e_off
                r = jnp.take(rows[l], e // epr, axis=0)  # (4B, 128)
                lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                lane0 = (e % epr) * F
                for f in range(F):
                    acc = acc + jnp.sum(
                        jnp.where(lanes == (lane0 + f)[:, None], r, 0), axis=1
                    ).astype(jnp.float32)
        return acc

    report("current: 33.5M gathers + extract", timed(jax.jit(cur_form), table, base_idx))

    # ----------------------------------------------------------------- paired
    CPR = epr - 1  # canonical entries per overlapped row (63)

    def pack_overlap(tbl):
        # rows of 64 entries with 1-entry overlap: row r = entries[63r : 63r+64]
        R = (T + CPR - 1) // CPR
        pad = R * CPR + 1 - T
        flat = jnp.concatenate([tbl, tbl[:, :pad]], axis=1)  # wrap pad
        idx = (jnp.arange(R)[:, None] * CPR + jnp.arange(epr)[None, :]).reshape(-1)
        return flat[:, idx].reshape(L, R, 128)

    rows_ov = jax.jit(lambda t: pack_overlap(t).astype(jnp.bfloat16))(table)
    print("  overlap rows per level:", rows_ov.shape[1], flush=True)

    def pair_form(rov, bi):
        acc = jnp.zeros((bi.shape[1],), jnp.float32)
        for l in range(L):
            e = bi[l]
            r = jnp.take(rov[l], e // CPR, axis=0)  # (4B, 128) one gather per PAIR
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            lane0 = (e % CPR) * F
            for q in range(2 * F):  # both entries of the pair
                acc = acc + jnp.sum(
                    jnp.where(lanes == (lane0 + q)[:, None], r, 0), axis=1
                ).astype(jnp.float32)
        return acc

    report("paired: 16.7M gathers + extract", timed(jax.jit(pair_form), rows_ov, base_idx))

    # parity: same values?
    a = jax.jit(cur_form)(table, base_idx[:, :1024])
    b = jax.jit(pair_form)(rows_ov, base_idx[:, :1024])
    print("  parity max abs diff: {:.2e}".format(float(jnp.max(jnp.abs(a - b)))), flush=True)

    # ------------------------------------------------------------- raw floors
    rows_plain = table.reshape(L, T // epr, 128).astype(jnp.bfloat16)
    ridx_full = jax.random.randint(k2, (L, 8 * B), 0, T // epr, dtype=jnp.int32)
    ridx_half = ridx_full[:, : 4 * B]

    def raw(rt, ri):
        acc = jnp.zeros((ri.shape[1],), jnp.float32)
        for l in range(L):
            acc = acc + jnp.sum(jnp.take(rt[l], ri[l], axis=0), axis=1).astype(jnp.float32)
        return acc

    report("raw 33.5M row gathers", timed(jax.jit(raw), rows_plain, ridx_full))
    report("raw 16.7M row gathers", timed(jax.jit(raw), rows_plain, ridx_half))

    # --------------------------------------------------------------- backward
    def bwd_form(ri, g):
        grads = []
        for l in range(L):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (ri.shape[1], 128), 1)
            lane0 = (ri[l] % epr) * F
            upd = jnp.where(lanes == lane0[:, None], g[:, None], 0.0)
            upd = upd + jnp.where(lanes == (lane0 + 1)[:, None], g[:, None], 0.0)
            grads.append(jnp.zeros((T // epr, 128), jnp.float32).at[ri[l] // epr].add(upd))
        return jnp.stack(grads)

    gcot = jnp.ones((8 * B,), jnp.float32)
    gcot_h = jnp.ones((4 * B,), jnp.float32)
    eidx_full = jax.random.randint(k1, (L, 8 * B), 0, T - 1, dtype=jnp.int32)
    eidx_half = eidx_full[:, : 4 * B]
    report("bwd: 33.5M one-hot row scatter-adds",
           timed(jax.jit(lambda ri: bwd_form(ri, gcot)), eidx_full))
    report("bwd: 16.7M one-hot row scatter-adds",
           timed(jax.jit(lambda ri: bwd_form(ri, gcot_h)), eidx_half))


if __name__ == "__main__":
    main()
