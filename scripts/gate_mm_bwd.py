"""Gate for the one-hot-matmul coarse-level encoder BACKWARD.

The fused encoder backward does, per level, a (4B, 128) one-hot-lane
update construction followed by a row scatter-add into (R, 128). The
scatter's per-index cost (~10 ns/row) is flat in R, so the COARSE dense
levels (R = 66..8127 rows at the bench recipe) pay the same tax as the
2^19 hash levels while their row tables are tiny. For small R the same
contraction is a one-hot matmul riding the MXU:

  g_rows (R, 128) = E^T (R, K) @ upd (K, 128),  E = (rl[:,None] == iota(R))

(standalone probe: scripts/probe_onehot_matmul.py — scatter ~5.5 ms vs
mm ~0.5 ms above the dispatch floor at R<=1526). This gate measures the
REAL per-level backward (update construction included, real level
geometry) per dense level and the end-to-end parity + numeric error of
three matmul precisions against the exact f32 scatter:

  bf16:    E bf16 @ upd bf16, f32 accumulation (rounds upd to bf16)
  default: f32 operands, default TPU precision (bf16x1 passes)
  highest: f32 operands, precision=HIGHEST (bf16x6, ~f32-exact)

Adopt (set the static R threshold in encoding.py) if a precision tier
wins time at acceptable error. Run: python scripts/gate_mm_bwd.py
"""

import argparse
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


def build_upd(rl, lane0, wz0, wz1, gf, F):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rl.shape[0], 128), 1)
    upd = jnp.zeros((rl.shape[0], 128), jnp.float32)
    for f in range(F):
        upd = upd + jnp.where(lanes == (lane0 + f)[:, None], (wz0 * gf[f])[:, None], 0.0)
        upd = upd + jnp.where(lanes == (lane0 + F + f)[:, None], (wz1 * gf[f])[:, None], 0.0)
    return upd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=262144)
    args = ap.parse_args()
    B = args.b
    K = 4 * B
    L, T, F = 16, 1 << 19, 2
    cpr = 128 // F - 1

    scale = math.exp(math.log(2048 / 16) / (L - 1))
    res = [int(math.ceil(16 * scale**i - 1.0)) for i in range(L)]
    dense = [(r + 1) ** 3 <= T for r in res]

    rng = np.random.default_rng(0)
    wz0 = jnp.asarray(rng.random(K, dtype=np.float32))
    wz1 = jnp.asarray(rng.random(K, dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((F, K)).astype(np.float32) * 1e-3)

    print("level geometry: res={} dense={}".format(res, ["D" if d else "h" for d in dense]))
    print("{:<6} {:>7} | {:>9} {:>9} {:>9} {:>9} | rel.err bf16 / default".format(
        "level", "R", "scat ms", "bf16 ms", "deflt ms", "high ms"))

    wins = {"bf16": 0.0, "default": 0.0, "highest": 0.0}
    tot_scat = 0.0
    for l, r in enumerate(res):
        if not dense[l]:
            continue
        n_entry = (r + 1) ** 3
        R = -(-n_entry // cpr)
        rl = jnp.asarray(rng.integers(0, R, size=(K,)), jnp.int32)
        lane0 = jnp.asarray(rng.integers(0, cpr, size=(K,)), jnp.int32) * F

        @jax.jit
        def scat(rl, lane0, wz0, wz1, gf, R=R):
            upd = build_upd(rl, lane0, wz0, wz1, gf, F)
            return jnp.zeros((R, 128), jnp.float32).at[rl].add(upd)

        def mk_mm(mode, R=R):
            @jax.jit
            def mm(rl, lane0, wz0, wz1, gf):
                upd = build_upd(rl, lane0, wz0, wz1, gf, F)
                e = rl[:, None] == jax.lax.broadcasted_iota(jnp.int32, (K, R), 1)
                if mode == "bf16":
                    return jax.lax.dot_general(
                        e.astype(jnp.bfloat16), upd.astype(jnp.bfloat16),
                        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                prec = jax.lax.Precision.HIGHEST if mode == "highest" else None
                return jax.lax.dot_general(
                    e.astype(jnp.float32), upd,
                    (((0,), (0,)), ((), ())), precision=prec,
                    preferred_element_type=jnp.float32)
            return mm

        a = (rl, lane0, wz0, wz1, gf)
        ref = np.asarray(scat(*a))
        scale_ref = np.abs(ref).max() + 1e-30
        t_s = timed(scat, *a)
        row = [t_s * 1e3]
        errs = []
        for mode in ("bf16", "default", "highest"):
            mm = mk_mm(mode)
            t = timed(mm, *a)
            row.append(t * 1e3)
            wins[mode] += t
            errs.append(np.abs(np.asarray(mm(*a)) - ref).max() / scale_ref)
        tot_scat += t_s
        print("l={:<4} {:>7} | {:>9.2f} {:>9.2f} {:>9.2f} {:>9.2f} | {:.2e} / {:.2e}".format(
            l, R, *row, errs[0], errs[1]), flush=True)

    print("\ndense-levels total: scatter {:.1f} ms | mm bf16 {:.1f} | default {:.1f} | highest {:.1f}".format(
        tot_scat * 1e3, wins["bf16"] * 1e3, wins["default"] * 1e3, wins["highest"] * 1e3))


if __name__ == "__main__":
    main()
