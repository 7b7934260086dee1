"""Round 3: the fused-encoder BACKWARD is now 53% of the train step
(~296 ms of 557 at the 32k bucket, probe_step_surgery). Its cost is the
row scatter-add: upd is a (N, 128) f32 one-hot tensor (N = L*4*B = 16.7M)
carrying only 4 nonzero lanes per row — 8.6 GB of construction traffic
for 268 MB of payload. Candidates at the real shapes:

  a. current: 4x where -> (N,128) f32 upd -> .at[ridx].add
  b. construction only (no scatter) — isolates build vs scatter cost
  c. scatter only (precomputed upd) — the .at[].add itself
  d. narrow payload: (N,4) f32 upd -> .at[sidx].add into (M,4) buffer
     (sidx = ridx*cpr + slot; layout pads lanes but moves 32x fewer bytes)
  e. (N,8) variant of d
  f. bf16 upd + bf16 buffer -> f32 fold after
  g. per-level loop of 16 (4B,128) scatters (does merging even matter?)
  h. sorted segment_sum over slot ids (sort 16.7M keys, then dense sum)

Run: cd /root/repo && python scripts/probe_fused_bwd.py [--b 262144]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=262144)
    args = ap.parse_args()

    L, T, F = 16, 1 << 19, 2
    cpr = 128 // F - 1
    B = args.b
    R = -(-T // cpr)  # rows per level
    M = L * R
    N = L * 4 * B
    print("backend:", jax.default_backend(), "N:", N, "rows:", M, flush=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    e = jnp.asarray(rng.integers(0, T - 1, size=(L, 4, B)), jnp.int32)
    offs = jnp.arange(L, dtype=jnp.int32)[:, None, None] * R
    ridx = (e // cpr + offs).reshape(-1)
    lane0 = ((e % cpr) * F).reshape(-1)
    slot = (e % cpr).reshape(-1)
    wz0 = jnp.asarray(rng.random(N, dtype=np.float32))
    wz1 = jnp.asarray(rng.random(N, dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((F, N), dtype=np.float32))

    def build_upd(lane0, wz0, wz1, gf):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        upd = jnp.zeros((N, 128), jnp.float32)
        for f in range(F):
            upd = upd + jnp.where(lanes == (lane0 + f)[:, None], (wz0 * gf[f])[:, None], 0.0)
            upd = upd + jnp.where(lanes == (lane0 + F + f)[:, None], (wz1 * gf[f])[:, None], 0.0)
        return upd

    @jax.jit
    def form_a(ridx, lane0, wz0, wz1, gf):
        return jnp.zeros((M, 128), jnp.float32).at[ridx].add(build_upd(lane0, wz0, wz1, gf))

    report("a current 4xwhere (N,128) f32 scatter", form_a, ridx, lane0, wz0, wz1, gf)

    # forms b/c (construction-only / scatter-only) OOM: returning the
    # (N,128) f32 upd as a program output materializes 8.6 GB.

    @jax.jit
    def form_d(slot, ridx, wz0, wz1, gf):
        sidx = ridx * cpr + slot
        upd = jnp.stack([wz0 * gf[0], wz0 * gf[1], wz1 * gf[0], wz1 * gf[1]], axis=1)
        return jnp.zeros((M * cpr, 4), jnp.float32).at[sidx].add(upd)

    report("d narrow (N,4) slot scatter", form_d, slot, ridx, wz0, wz1, gf)

    @jax.jit
    def form_e(slot, ridx, wz0, wz1, gf):
        sidx = ridx * ((cpr + 1) // 2) + slot // 2
        lane = (slot % 2) * 4
        lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 8), 1)
        vals = jnp.stack([wz0 * gf[0], wz0 * gf[1], wz1 * gf[0], wz1 * gf[1]], axis=1)
        upd = jnp.where((lanes >= lane[:, None]) & (lanes < lane[:, None] + 4),
                        jnp.pad(vals, ((0, 0), (0, 4)))[
                            jnp.arange(N)[:, None], (lanes - lane[:, None]) % 8], 0.0)
        return jnp.zeros((M * (cpr + 1) // 2, 8), jnp.float32).at[sidx].add(upd)

    report("e (N,8) two-slot scatter", form_e, slot, ridx, wz0, wz1, gf)

    @jax.jit
    def form_f(ridx, lane0, wz0, wz1, gf):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1)
        upd = jnp.zeros((N, 128), jnp.bfloat16)
        for f in range(F):
            upd = upd + jnp.where(lanes == (lane0 + f)[:, None],
                                  (wz0 * gf[f])[:, None], 0.0).astype(jnp.bfloat16)
            upd = upd + jnp.where(lanes == (lane0 + F + f)[:, None],
                                  (wz1 * gf[f])[:, None], 0.0).astype(jnp.bfloat16)
        return jnp.zeros((M, 128), jnp.bfloat16).at[ridx].add(upd)

    report("f bf16 rows scatter (precision caveat)", form_f, ridx, lane0, wz0, wz1, gf)

    e3 = e  # (L, 4, B)

    @jax.jit
    def form_g(e3, wz0, wz1, gf):
        wz0r = wz0.reshape(L, 4 * B)
        wz1r = wz1.reshape(L, 4 * B)
        gfr = gf.reshape(F, L, 4 * B)
        out = []
        for l in range(L):
            el = e3[l].reshape(-1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (4 * B, 128), 1)
            lane0l = (el % cpr) * F
            upd = jnp.zeros((4 * B, 128), jnp.float32)
            for f in range(F):
                upd = upd + jnp.where(lanes == (lane0l + f)[:, None],
                                      (wz0r[l] * gfr[f, l])[:, None], 0.0)
                upd = upd + jnp.where(lanes == (lane0l + F + f)[:, None],
                                      (wz1r[l] * gfr[f, l])[:, None], 0.0)
            out.append(jnp.zeros((R, 128), jnp.float32).at[el // cpr].add(upd))
        return jnp.stack(out)

    report("g per-level loop of 16 scatters", form_g, e3, wz0, wz1, gf)

    @jax.jit
    def form_h(slot, ridx, wz0, wz1, gf):
        sidx = ridx * cpr + slot  # (N,) unique slot id
        vals = jnp.stack([wz0 * gf[0], wz0 * gf[1], wz1 * gf[0], wz1 * gf[1]], axis=1)
        sk, sv = jax.lax.sort_key_val(sidx, jnp.arange(N, dtype=jnp.int32))
        vs = jnp.take(vals, sv, axis=0)
        seg = jax.ops.segment_sum(vs, sk, num_segments=M * cpr, indices_are_sorted=True)
        return seg

    report("h sort + sorted segment_sum (N,4)", form_h, slot, ridx, wz0, wz1, gf)


if __name__ == "__main__" and "--fwd" not in sys.argv and "--split" not in sys.argv:
    main()


def fwd_forms():
    """FWD forms at the bench shapes: merged all-level gather+extract
    (current _hash_lookup_fused) vs a per-level loop."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=262144)
    ap.add_argument("--fwd", action="store_true")
    args, _ = ap.parse_known_args()

    L, T, F = 16, 1 << 19, 2
    cpr = 128 // F - 1
    B = args.b
    R = -(-T // cpr)
    M = L * R
    N = L * 4 * B
    rng = np.random.default_rng(0)
    rows_all = jnp.asarray(rng.standard_normal((M, 128), dtype=np.float32).astype(np.float16)).astype(jnp.bfloat16)
    e = jnp.asarray(rng.integers(0, T - 1, size=(L, 4, B)), jnp.int32)
    offs = jnp.arange(L, dtype=jnp.int32)[:, None, None] * R
    ridx = (e // cpr + offs).reshape(-1)
    lane0 = ((e % cpr) * F).reshape(-1)
    wz0 = jnp.asarray(rng.random(N, dtype=np.float32))
    wz1 = jnp.asarray(rng.random(N, dtype=np.float32))

    def extract(r, lane0, wz0, wz1):
        lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
        outs = []
        for f in range(F):
            m = jnp.where(lanes == (lane0 + f)[:, None], wz0[:, None], 0.0) \
                + jnp.where(lanes == (lane0 + F + f)[:, None], wz1[:, None], 0.0)
            outs.append(jnp.sum(r * m, axis=1))
        return jnp.stack(outs)

    @jax.jit
    def fwd_merged(rows_all, ridx, lane0, wz0, wz1):
        r = jnp.take(rows_all, ridx, axis=0).astype(jnp.float32)
        return extract(r, lane0, wz0, wz1).reshape(F, L, 4, B).sum(axis=2)

    report("i fwd merged gather+extract", fwd_merged, rows_all, ridx, lane0, wz0, wz1)

    @jax.jit
    def fwd_per_level(rows_all, e, lane0, wz0, wz1):
        lane0r = lane0.reshape(L, 4 * B)
        wz0r = wz0.reshape(L, 4 * B)
        wz1r = wz1.reshape(L, 4 * B)
        out = []
        for l in range(L):
            el = e[l].reshape(-1)
            r = jnp.take(rows_all[l * R:(l + 1) * R], el // cpr, axis=0).astype(jnp.float32)
            out.append(extract(r, lane0r[l], wz0r[l], wz1r[l]).reshape(F, 4, B).sum(axis=1))
        return jnp.stack(out, axis=1)  # (F, L, B)

    report("j fwd per-level loop", fwd_per_level, rows_all, e, lane0, wz0, wz1)


if __name__ == "__main__" and "--fwd" in sys.argv:
    fwd_forms()
    sys.exit(0)


def split_forms():
    """Does splitting a per-level scatter into S independent sub-buffers
    (summed after) beat one scatter? XLA scatter-add serializes duplicate
    indices; independent buffers could overlap."""
    L, T, F = 16, 1 << 19, 2
    cpr = 128 // F - 1
    B = 1 << 18
    R = -(-T // cpr)
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.integers(0, T - 1, size=(L, 4, B)), jnp.int32)
    wz0 = jnp.asarray(rng.random((L, 4 * B), dtype=np.float32))
    wz1 = jnp.asarray(rng.random((L, 4 * B), dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((F, L, 4 * B), dtype=np.float32))

    def upd_of(el, lane0, w0, w1, g0, g1):
        n = el.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        upd = jnp.where(lanes == lane0[:, None], (w0 * g0)[:, None], 0.0)
        upd = upd + jnp.where(lanes == (lane0 + 1)[:, None], (w0 * g1)[:, None], 0.0)
        upd = upd + jnp.where(lanes == (lane0 + F)[:, None], (w1 * g0)[:, None], 0.0)
        upd = upd + jnp.where(lanes == (lane0 + F + 1)[:, None], (w1 * g1)[:, None], 0.0)
        return upd

    def make(S):
        @jax.jit
        def f(e, wz0, wz1, gf):
            out = []
            n = 4 * B
            for l in range(L):
                el = e[l].reshape(-1)
                lane0 = (el % cpr) * F
                accs = []
                for s in range(S):
                    sl = slice(s * n // S, (s + 1) * n // S)
                    upd = upd_of(el[sl], lane0[sl], wz0[l, sl], wz1[l, sl], gf[0, l, sl], gf[1, l, sl])
                    accs.append(jnp.zeros((R, 128), jnp.float32).at[el[sl] // cpr].add(upd))
                out.append(sum(accs) if S > 1 else accs[0])
            return jnp.stack(out)
        return f

    for S in (1, 2, 4):
        report("split S={} per-level scatter".format(S), make(S), e, wz0, wz1, gf)


if __name__ == "__main__" and "--split" in sys.argv:
    split_forms()
    sys.exit(0)
