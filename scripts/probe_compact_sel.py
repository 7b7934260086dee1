"""Round 3: _compact_sel forms at the bench shapes (32k rays x 128, budget
2^18). The surgery probe puts sel+gather at ~53 ms of the 354 ms step;
the global searchsorted (budget keys into a 4.2M-element cumsum) costs
~22 binary-search iterations of 262k gathers. Candidates:

  a. current: global inclusive cumsum + searchsorted(4.2M, 262k keys)
  b. two-level: ray via searchsorted over (B,) offsets (15 iters against
     a 128 KB array) + within-row position table P built by a one-hot
     matmul over the 128-sample axis (MXU, no sort/scatter)
  c. two-level with P built by within-row element scatter
  d. rank scatter: one (4.2M -> budget) element scatter of flat indices

Run: cd /root/repo && python scripts/probe_compact_sel.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(f, *a, iters=3):
    out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def report(name, f, *a):
    try:
        dt = timed(f, *a)
        print("{:<56} {:>9.1f} ms".format(name, dt * 1e3), flush=True)
        return dt
    except Exception as e:
        lines = [l for l in str(e).splitlines() if l.strip()]
        print("{:<56} FAIL: {}".format(name, " | ".join(lines[:2])[:150]), flush=True)
        return None


def main():
    B, N, budget = 32768, 128, 1 << 18
    total = B * N
    rng = np.random.default_rng(0)
    # scattered occupancy-style mask, ~25% valid
    mask = jnp.asarray(rng.random((B, N)) < 0.25)
    print("backend:", jax.default_backend(), "valid:", int(np.asarray(mask).sum()), flush=True)

    @jax.jit
    def form_a(mask):
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot
        csum = (row + off[:, None]).reshape(-1)
        k = jnp.arange(budget, dtype=jnp.int32)
        sel = jnp.clip(jnp.searchsorted(csum, k + 1, side="left"), 0, total - 1)
        return sel.astype(jnp.int32), k < csum[-1]

    report("a global cumsum + searchsorted (current)", form_a, mask)

    @jax.jit
    def form_b(mask):
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # (B, N) inclusive
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot  # (B,) exclusive
        k = jnp.arange(budget, dtype=jnp.int32)
        r = jnp.clip(jnp.searchsorted(off, k, side="right") - 1, 0, B - 1)  # ray of key k
        j = k - jnp.take(off, r)  # within-ray rank
        # P[b, j] = sample index of the j-th valid in row b, via one-hot matmul
        rank = jnp.where(mask, row - 1, N)  # (B, N) in [0, N]
        onehot = (rank[:, :, None] == jnp.arange(N)[None, None, :]).astype(jnp.bfloat16)
        iota = jnp.arange(N, dtype=jnp.bfloat16)
        P = jnp.einsum("bnj,n->bj", onehot, iota,
                       preferred_element_type=jnp.float32).astype(jnp.int32)  # (B, N)
        pos = P[r, jnp.clip(j, 0, N - 1)]
        sel = jnp.clip(r * N + pos, 0, total - 1)
        valid = k < jnp.sum(tot)
        return sel.astype(jnp.int32), valid

    report("b two-level: off-search + one-hot-matmul P", form_b, mask)

    @jax.jit
    def form_c(mask):
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot
        k = jnp.arange(budget, dtype=jnp.int32)
        r = jnp.clip(jnp.searchsorted(off, k, side="right") - 1, 0, B - 1)
        j = k - jnp.take(off, r)
        rank = jnp.where(mask, row - 1, N)  # scatter within rows
        iota_n = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
        P = jnp.zeros((B, N + 1), jnp.int32).at[
            jnp.arange(B)[:, None], rank].set(iota_n)[:, :N]
        pos = P[r, jnp.clip(j, 0, N - 1)]
        sel = jnp.clip(r * N + pos, 0, total - 1)
        return sel.astype(jnp.int32), k < jnp.sum(tot)

    report("c two-level: off-search + row-scatter P", form_c, mask)

    @jax.jit
    def form_d(mask):
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot
        g = (row + off[:, None] - 1).reshape(-1)  # global rank per slot
        g = jnp.where(mask.reshape(-1), jnp.clip(g, 0, budget), budget)
        sel = jnp.zeros((budget + 1,), jnp.int32).at[g].set(
            jnp.arange(total, dtype=jnp.int32), mode="drop")[:budget]
        return sel, jnp.arange(budget) < jnp.sum(tot)

    report("d rank element-scatter", form_d, mask)

    @jax.jit
    def form_e(mask):
        # two-level, NO P table: per-key ROW gather of the inclusive row
        # cumsum (the fast 128-lane-row primitive, ~500 GB/s) + a
        # compare-reduce for the within-row slot. slot = #positions with
        # cumsum <= j == index of the (j+1)-th valid sample.
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # (B, N) inclusive
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot
        k = jnp.arange(budget, dtype=jnp.int32)
        r = jnp.clip(jnp.searchsorted(off, k, side="right") - 1, 0, B - 1)
        j = (k - jnp.take(off, r))[:, None]  # (budget, 1) within-ray rank
        row_g = jnp.take(row, r, axis=0)  # (budget, N) row gather
        slot = jnp.sum((row_g <= j).astype(jnp.int32), axis=1)  # (budget,)
        sel = jnp.clip(r * N + slot, 0, total - 1)
        return sel.astype(jnp.int32), k < jnp.sum(tot)

    report("e two-level: off-search + row-gather compare", form_e, mask)

    @jax.jit
    def form_f(mask):
        # form e with the searchsorted replaced by a SCATTER+CUMSUM ray
        # lookup: ray r owns output ranks [off[r], off[r]+tot[r]) — scatter
        # a 1 at each ray's start rank, cumsum over ranks gives
        # r = (#rays with off <= k) - 1 (exactly searchsorted 'right' - 1).
        # B-element scatter + budget-element cumsum, no 15x262k gathers.
        row = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # (B, N) inclusive
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot
        k = jnp.arange(budget, dtype=jnp.int32)
        mark = jnp.zeros((budget + 1,), jnp.int32).at[
            jnp.clip(off, 0, budget)].add(1, mode="drop")
        r = jnp.clip(jnp.cumsum(mark[:budget]) - 1, 0, B - 1)
        j = (k - jnp.take(off, r))[:, None]
        row_g = jnp.take(row, r, axis=0)  # (budget, N) row gather
        slot = jnp.sum((row_g <= j).astype(jnp.int32), axis=1)
        sel = jnp.clip(r * N + slot, 0, total - 1)
        return sel.astype(jnp.int32), k < jnp.sum(tot)

    report("f two-level: scatter-cumsum ray + row-gather", form_f, mask)

    @jax.jit
    def form_g(mask):
        # form f with the within-row compare on int16 rows (halves the
        # (budget, N) gather+compare traffic; N <= 32767 so counts fit)
        row16 = jnp.cumsum(mask.astype(jnp.int16), axis=1)
        tot = row16[:, -1].astype(jnp.int32)
        off = jnp.cumsum(tot) - tot
        k = jnp.arange(budget, dtype=jnp.int32)
        mark = jnp.zeros((budget + 1,), jnp.int32).at[
            jnp.clip(off, 0, budget)].add(1, mode="drop")
        r = jnp.clip(jnp.cumsum(mark[:budget]) - 1, 0, B - 1)
        j = (k - jnp.take(off, r)).astype(jnp.int16)[:, None]
        row_g = jnp.take(row16, r, axis=0)  # (budget, N) int16 row gather
        slot = jnp.sum((row_g <= j).astype(jnp.int32), axis=1)
        sel = jnp.clip(r * N + slot, 0, total - 1)
        return sel.astype(jnp.int32), k < jnp.sum(tot)

    report("g form f with int16 rows", form_g, mask)

    # numeric parity
    a = jax.device_get(form_a(mask))
    for name, f in (("b", form_b), ("c", form_c), ("d", form_d), ("e", form_e),
                    ("f", form_f), ("g", form_g)):
        got = jax.device_get(f(mask))
        nv = int(a[1].sum())
        ok = np.array_equal(np.asarray(a[0])[:nv], np.asarray(got[0])[:nv])
        print("parity {} vs a (first {} valid): {}".format(name, nv, ok), flush=True)


if __name__ == "__main__":
    main()
