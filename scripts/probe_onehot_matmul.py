"""Coarse-level gather/scatter vs one-hot matmul (MXU) forms.

The encoder's per-index cost (~5 ns gather / ~10 ns scatter per 128-lane
row) is flat in table size, so the COARSE dense levels (res 16..78, R =
39..3875 rows) pay the same per-row tax as the 2^19 hash levels while
their tables are tiny. For small R the same contraction is expressible
as a one-hot matmul that rides the MXU:

  fwd:  rows_sel (K, 128) = E (K, R) @ rows (R, 128)
  bwd:  g_rows (R, 128)   = E^T (R, K) @ upd (K, 128)

with E = (ridx[:, None] == iota(R)) built on the fly in bf16. FLOP cost
scales with R (K*R*128*2), so there is a crossover R below which the
matmul wins. This probe measures both forms per R at K = 2^20 (the
bench workload's per-level index count, 4 paired indices x 262k pts).

bf16 note: the matmul bwd accumulates updates in bf16 operands with f32
accumulation (preferred_element_type) — exact for the 0/1 one-hot side,
rounds the update values to bf16 (the current scatter path accumulates
f32). Quality impact must be gated separately if adopted.

Run: cd /root/repo && python scripts/probe_onehot_matmul.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        # hard sync: host read (block_until_ready is a no-op via tunnel)
        _ = np.asarray(out[0, :1] if out.ndim > 1 else out[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    K = 1 << 20
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.standard_normal((K, 128), dtype=np.float32))

    # R for res 16/22/30/41/57/78 dense levels (cpr=63) + two hash sizes
    for R in (39, 97, 233, 580, 1526, 3875, 8322):
        ridx = jnp.asarray(rng.integers(0, R, size=(K,)), jnp.int32)
        rows = jnp.asarray(rng.standard_normal((R, 128), dtype=np.float32))

        @jax.jit
        def scat(ridx, upd):
            return jnp.zeros((R, 128), jnp.float32).at[ridx].add(upd)

        @jax.jit
        def scat_mm(ridx, upd):
            e = (ridx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1))
            return jax.lax.dot_general(
                e.astype(jnp.bfloat16), upd.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        @jax.jit
        def gath(ridx, rows):
            return jnp.take(rows.astype(jnp.bfloat16), ridx, axis=0).astype(jnp.float32)

        @jax.jit
        def gath_mm(ridx, rows):
            e = (ridx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1))
            return jax.lax.dot_general(
                e.astype(jnp.bfloat16), rows.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        t_s, t_sm = timeit(scat, ridx, upd), timeit(scat_mm, ridx, upd)
        t_g, t_gm = timeit(gath, ridx, rows), timeit(gath_mm, ridx, rows)
        print("R={:5d}: scatter {:7.2f} ms | onehot-mm {:7.2f} ms || gather {:7.2f} ms | onehot-mm {:7.2f} ms".format(
            R, t_s, t_sm, t_g, t_gm), flush=True)


if __name__ == "__main__":
    main()
