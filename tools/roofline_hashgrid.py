"""Hashgrid-gather roofline study on the real chip (SURVEY §2.4 evidence).

Answers, with measurements, whether the fused hashgrid+MLP megakernel (the
tiny-cuda-nn centerpiece, reference tcnn_fusedmlp_module.py:16-213) is worth
building on TPU, or whether the XLA gather already sits at the achievable
random-access HBM roofline for the NGP workload (B=2^18 pts, L=16 levels,
F=2 feats, T=2^19 entries).

Probes (each ONE compiled program, lax.scan-amortized, host-read timed —
the tunnel's block_until_ready is a no-op):
  seq_read        sequential HBM read bandwidth ceiling (big-array reduce)
  gather_f32      the production hashgrid encode fwd at f32 gather dtype
  gather_bf16     same at bf16 gather dtype (the shipped NGP setting)
  encode_mlp      encode + fused geo MLP fwd (what a megakernel would fuse)
  matmul_peak     bf16 MXU ceiling through the same measurement path
  pallas_vmem     a Pallas kernel gathering from a VMEM-resident table with
                  in-kernel vector indices — the one plausible fusion route;
                  records the exact Mosaic error if it does not compile

Run on TPU:  python tools/roofline_hashgrid.py
Writes results as a markdown table on stdout (paste into docs/benchmark.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 1 << 18  # compacted point budget (log_max_allowance=18)
L, F, T_LOG = 16, 2, 19
T = 1 << T_LOG
SCAN_ITERS = 8


def timed(fn, *args):
    """Compile, warm, then time one dispatch (host read = hard sync)."""
    out = fn(*args)
    float(jnp.sum(out)) if hasattr(out, "dtype") else None
    t0 = time.perf_counter()
    out = fn(*args)
    s = float(jnp.sum(out))
    dt = time.perf_counter() - t0
    return dt, s


def seq_read_probe():
    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB

    @jax.jit
    def run(x):
        def body(c, _):
            return c + jnp.sum(x), ()
        out, _ = jax.lax.scan(body, 0.0, None, length=SCAN_ITERS)
        return out

    dt, _ = timed(run, big)
    bytes_read = big.size * 4 * SCAN_ITERS
    return bytes_read / dt / 1e9


def _encode(table, xyz, gather_dtype):
    """The production gather path (mirrors HashGridEmbedder.__call__)."""
    from arcnerf_tpu.models.base_modules.encoding import _CORNER_OFFSETS, _HASH_PRIMES

    res = np.array([int(np.ceil(16 * (2048 / 16) ** (i / (L - 1)) - 1)) for i in range(L)], np.int32)
    norm = (xyz + 1.0) / 2.0
    res_j = jnp.asarray(res, dtype=xyz.dtype)
    pos = norm.T[None, :, :] * res_j[:, None, None]
    idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, jnp.asarray(res)[:, None, None] - 1)
    frac = pos - idx0.astype(pos.dtype)
    off = jnp.asarray(_CORNER_OFFSETS)
    corners = idx0[:, None, :, :] + off[None, :, :, None]
    u = corners.astype(jnp.uint32)
    hash_idx = ((u[:, :, 0] * jnp.uint32(_HASH_PRIMES[0]))
                ^ (u[:, :, 1] * jnp.uint32(_HASH_PRIMES[1]))
                ^ (u[:, :, 2] * jnp.uint32(_HASH_PRIMES[2]))) & jnp.uint32(T - 1)
    level_off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
    flat_idx = (hash_idx.astype(jnp.int32) + level_off).reshape(-1)
    table_t = table.reshape(L * T, F).T.astype(gather_dtype)
    feats = jnp.take(table_t, flat_idx, axis=1).astype(jnp.float32).reshape(F, L, 8, B)
    offf = off.astype(pos.dtype)
    w = jnp.prod(offf[None, :, :, None] * frac[:, None, :, :]
                 + (1.0 - offf[None, :, :, None]) * (1.0 - frac[:, None, :, :]), axis=2)
    embed = jnp.sum(feats * w[None], axis=2)  # (F, L, B)
    return embed.transpose(2, 1, 0).reshape(B, L * F)


def gather_probe(gather_dtype):
    table = jnp.zeros((L, T, F), jnp.float32) + 0.01
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-0.95, 0.95, (B, 3)).astype(np.float32))

    @jax.jit
    def run(tab, x):
        def body(c, _):
            e = _encode(tab, x + c * 1e-6, gather_dtype)  # perturb defeats CSE
            return c + jnp.sum(e[:, :1]) * 1e-20, ()
        out, _ = jax.lax.scan(body, 0.0, None, length=SCAN_ITERS)
        return out

    dt, _ = timed(run, table, xyz)
    per_iter = dt / SCAN_ITERS
    elem_bytes = 2 if gather_dtype == jnp.bfloat16 else 4
    raw = B * L * 8 * F * elem_bytes  # gathered element bytes
    return per_iter, raw / per_iter / 1e9


def encode_mlp_probe():
    """Encode + 2-matmul geo MLP fwd (64 wide) — the megakernel fusion scope."""
    table = jnp.zeros((L, T, F), jnp.float32) + 0.01
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-0.95, 0.95, (B, 3)).astype(np.float32))
    w1 = jnp.ones((L * F, 64), jnp.bfloat16) * 0.01
    w2 = jnp.ones((64, 16), jnp.bfloat16) * 0.01

    @jax.jit
    def run(tab, x):
        def body(c, _):
            e = _encode(tab, x + c * 1e-6, jnp.bfloat16)
            h = jax.nn.relu(e.astype(jnp.bfloat16) @ w1)
            o = (h @ w2).astype(jnp.float32)
            return c + jnp.sum(o[:, :1]) * 1e-20, ()
        out, _ = jax.lax.scan(body, 0.0, None, length=SCAN_ITERS)
        return out

    dt, _ = timed(run, table, xyz)
    return dt / SCAN_ITERS


def matmul_peak_probe():
    n, iters = 4096, 32
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            return jnp.tanh(c @ a), ()
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out[0, 0]

    dt, _ = timed(run, jnp.ones((n, n), jnp.bfloat16))
    return 2.0 * n * n * n * iters / dt / 1e9


def pallas_vmem_gather_attempt():
    """Can Mosaic gather from a VMEM-resident table with vector indices?
    Uses a small table (2^14 x 128 lanes, 8 MB bf16) that fits VMEM."""
    try:
        from jax.experimental import pallas as pl

        t_small = 1 << 14
        n_pts = 1 << 15

        def kernel(tab_ref, idx_ref, out_ref):
            idx = idx_ref[:]  # (n_pts,) int32
            out_ref[:] = tab_ref[idx, :]  # vector gather from VMEM

        tab = jnp.ones((t_small, 128), jnp.bfloat16)
        idx = jnp.asarray(np.random.default_rng(0).integers(0, t_small, n_pts), jnp.int32)
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pts, 128), jnp.bfloat16),
        )
        out = jax.jit(fn)(tab, idx)
        dt, _ = timed(jax.jit(fn), tab, idx)
        gb = n_pts * 128 * 2 / dt / 1e9
        return "COMPILES: {:.1f} GB/s".format(gb)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        return "BLOCKED: {}".format(msg)


def main():
    print("backend:", jax.default_backend(), jax.devices()[0])
    rows = []

    seq = seq_read_probe()
    rows.append(("seq_read (256MB reduce)", "{:.1f} GB/s".format(seq)))

    t32, g32 = gather_probe(jnp.float32)
    rows.append(("hashgrid encode fwd f32", "{:.2f} ms | gathered {:.1f} GB/s".format(t32 * 1e3, g32)))

    t16, g16 = gather_probe(jnp.bfloat16)
    rows.append(("hashgrid encode fwd bf16", "{:.2f} ms | gathered {:.1f} GB/s".format(t16 * 1e3, g16)))

    tm = encode_mlp_probe()
    rows.append(("encode+geoMLP fwd bf16", "{:.2f} ms".format(tm * 1e3)))

    peak = matmul_peak_probe()
    rows.append(("bf16 matmul probe", "{:.0f} GFLOP/s".format(peak)))

    rows.append(("pallas VMEM vector-gather", pallas_vmem_gather_attempt()))

    print()
    print("| probe | result |")
    print("|---|---|")
    for name, val in rows:
        print("| {} | {} |".format(name, val))
    print()
    print("workload: B=2^18 pts, L=16, F=2, T=2^19; scan x{} per dispatch".format(SCAN_ITERS))
    # intermediate-traffic bound for a hypothetical fused megakernel:
    inter = B * L * F * 4 * 2  # write + read the (B, L*F) embed tensor, f32
    print("megakernel savable intermediate traffic/iter: {:.0f} MB".format(inter / 1e6))


if __name__ == "__main__":
    main()
