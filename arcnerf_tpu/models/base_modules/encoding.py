"""Input encoders as flax.linen modules.

Capability parity with /root/reference/arcnerf/models/base_modules/encoding/:
- FreqEmbedder (freq_encoder.py:10-88) — NeRF positional encoding
- Gaussian + GaussianEmbedder (gaussian_encoder.py:9-217) — MipNeRF IPE
- SHEmbedder (sh_encoder.py:20-199) — spherical harmonics degree 1..5,
  closed-form jnp (no tcnn needed; SH is pure VPU math on TPU)
- HashGridEmbedder (hashgrid_encoder.py:22-263) — instant-ngp multi-res
  hashgrid. TPU-native design: one uniform (L, T, F) table (static shapes,
  single vectorized gather across all levels) instead of ragged per-level
  offsets; levels whose dense grid fits in T index directly, others use the
  xor-prime hash. XLA turns the backward gather into scatter-add.
- DenseGridEmbedder (densegrid_encoder.py:11-140) — dense voxel features
- CompositeEmbedder (composite_encoder.py:11-44) — sequential chaining

All encoders expose ``out_dim`` and ``__call__(x) -> (B, out_dim)``.
"""

import math
import os
from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...utils.registry import ENCODER_REGISTRY

# instant-ngp xor-hash primes (first is 1 so x varies fastest in dense-ish regions)
_HASH_PRIMES = (1, 2654435761, 805459861)

# corner offsets (8, 3) in z-outer order shared with geometry.volume
_CORNER_OFFSETS = np.array(
    [[0, 0, 0], [0, 1, 0], [1, 0, 0], [1, 1, 0], [0, 0, 1], [0, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.int32
)


def canonical_dtype(d):
    """Map config strings to jnp dtypes (yaml carries 'bfloat16' etc.)."""
    if isinstance(d, str):
        return {"float32": jnp.float32, "fp32": jnp.float32,
                "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                "float16": jnp.float16, "fp16": jnp.float16}[d]
    return d


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_cols_f32(spec, table_t, flat_idx):
    """Gather columns of (F, n_entries) ``table_t`` (f32 storage), reading
    at ``spec.gather_dtype`` and returning f32.

    ``spec`` is the static (table_shape, gather_dtype_name). With a bf16
    gather dtype XLA materializes one bf16 copy of the table per step and
    the hot random-access gather reads HALF the HBM bytes; parameters,
    gradients, and the adam trajectory stay entirely f32 (the backward
    scatter-add accumulates in f32 — thousands of point-gradients land on
    the same hash entry, bf16 += would swallow them). The bf16 rounding of
    the table values is the standard instant-ngp/tcnn half-table regime."""
    shape, gather_dtype = spec
    return jnp.take(table_t.astype(gather_dtype), flat_idx, axis=1).astype(jnp.float32)


def _gather_cols_f32_fwd(spec, table_t, flat_idx):
    return _gather_cols_f32(spec, table_t, flat_idx), flat_idx


def _gather_cols_f32_bwd(spec, flat_idx, g):
    shape, _ = spec
    grad = jnp.zeros(shape, jnp.float32).at[:, flat_idx].add(g)
    return grad, np.zeros(flat_idx.shape, dtype=jax.dtypes.float0)


_gather_cols_f32.defvjp(_gather_cols_f32_fwd, _gather_cols_f32_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_rowform(spec, table, entry_idx):
    """Hash-table lookup in ROW form: (L, T, F) table, (L, K) per-level
    entry indices -> (F, L, K) features, f32.

    Measured on TPU v5e (scripts/probe_rowform.py, 33.5M lookups into a
    16x2^19x2 table): XLA moves full 128-lane rows at ~500 GB/s through
    both gather and scatter-add, while element-granularity forms serialize
    (fwd 205 ms, bwd 2682 ms). Packing 128/F entries per row makes the
    forward a row gather + fused one-hot lane extraction (157 ms) and the
    backward a row scatter-add of one-hot lane updates (305 ms, 8.8x) with
    EXACT f32 accumulation (bit-identical to element-form .at[].add).
    Replaces the tcnn atomic-add backward (reference tiny-cuda-nn) with the
    TPU-native equivalent."""
    shape, gather_dtype, _ = spec
    L, T, F = shape
    epr = 128 // F  # entries per 128-lane row
    K = entry_idx.shape[1]
    rows = table.reshape(L, T // epr, 128).astype(gather_dtype)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
    outs = []
    for l in range(L):  # static per-level loop caps the (K, 128) intermediate
        r = jnp.take(rows[l], entry_idx[l] // epr, axis=0).astype(jnp.float32)  # (K, 128)
        lane0 = (entry_idx[l] % epr) * F
        feats = [jnp.sum(jnp.where(lanes == (lane0[:, None] + f), r, 0.0), axis=1) for f in range(F)]
        outs.append(jnp.stack(feats))  # (F, K)
    return jnp.stack(outs, axis=1)  # (F, L, K)


def _hash_lookup_rowform_fwd(spec, table, entry_idx):
    return _hash_lookup_rowform(spec, table, entry_idx), entry_idx


def _hash_lookup_rowform_bwd(spec, entry_idx, g):
    """g (F, L, K) -> table grad (L, T, F) via per-level row scatter-add
    (f32 accumulation, exact)."""
    shape, _, _ = spec
    L, T, F = shape
    epr = 128 // F
    K = entry_idx.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
    grads = []
    for l in range(L):
        lane0 = (entry_idx[l] % epr) * F
        upd = jnp.zeros((K, 128), jnp.float32)
        for f in range(F):
            upd = upd + jnp.where(lanes == (lane0[:, None] + f), g[f, l][:, None], 0.0)
        tbl = jnp.zeros((T // epr, 128), jnp.float32).at[entry_idx[l] // epr].add(upd)
        grads.append(tbl.reshape(T, F))
    return jnp.stack(grads), np.zeros(entry_idx.shape, dtype=jax.dtypes.float0)


_hash_lookup_rowform.defvjp(_hash_lookup_rowform_fwd, _hash_lookup_rowform_bwd)


def _level_fields(spec):
    """Normalize spec fields 4/5 into per-level (paired, quad) bool lists.

    spec = ((L,T,F), gather_dtype, res, dense_ok, pair_field[, quad_field]).
    Each field is either a per-level tuple passed by the embedder (which
    knows exactly which levels it routed to which index array) or a legacy
    scalar bool (pair: dense-or-flag; quad: hashed-and-flag). Quad takes
    precedence: a quad level is never pair-laid-out, so the lists the ops
    see always match the index arrays the embedder actually built."""
    (L, _, _), _, _, dense_ok = spec[:4]
    pf = spec[4]
    qf = spec[5] if len(spec) > 5 else False
    if isinstance(qf, (tuple, list)):
        quad = [bool(v) for v in qf]
    else:
        quad = [(not bool(dense_ok[l])) and bool(qf) for l in range(L)]
    if isinstance(pf, (tuple, list)):
        paired = [bool(v) for v in pf]
    else:
        paired = [bool(dense_ok[l]) or bool(pf) for l in range(L)]
    paired = [paired[l] and not quad[l] for l in range(L)]
    return paired, quad


def _pair_layout(spec):
    """Static helpers for the overlapped-row pair layout.

    A level is PAIRED when its two z-corners are adjacent table entries
    (dense layout has z minor-most; pair_hash makes hashed levels
    z-additive): one row gather then serves both corners of each (x, y)
    combination — 4 gathers per point per level instead of 8. Rows overlap
    by one entry (row r = entries [CPR*r, CPR*r + CPR], CPR = 128/F - 1)
    so a pair (e, e+1) never crosses a row. Measured: gather cost is
    per-INDEX (~4-6 ns/row, probe_pair_gather.py), so paired levels cut
    the encoder's dominant term roughly in half."""
    (L, T, F), _, res, dense_ok = spec[:4]
    epr = 128 // F
    cpr = epr - 1
    paired, _ = _level_fields(spec)
    n_entries = []
    for l in range(L):
        if dense_ok[l]:
            n_entries.append(int(res[l] + 1) ** 3)
        else:
            n_entries.append(T)
    return epr, cpr, paired, n_entries


def _pack_overlap_rows(table_l, n_entry, cpr, F, gather_dtype):
    """(T, F) level table -> (R, 128) overlapped rows covering the first
    ``n_entry`` entries (R = ceil(n_entry/cpr)); built with slices/reshape
    only (no gather). Entry e lives in row e//cpr at lane (e%cpr)*F, and
    e+1 (< n_entry, or the wrap entry 0) is always in the same row."""
    T = table_l.shape[0]
    R = -(-n_entry // cpr)
    need = cpr * R + 1
    if need <= T:
        can = table_l[:need]
    else:  # wrap pad (hashed levels: e+1 may wrap to entry 0)
        can = jnp.concatenate([table_l, table_l[: need - T]], axis=0)
    main = can[:-1].reshape(R, cpr, F)
    extra = can[cpr::cpr][:, None, :]  # entries cpr*(r+1), r = 0..R-1
    rows = jnp.concatenate([main, extra], axis=1).reshape(R, (cpr + 1) * F)
    return rows.astype(gather_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_paired(spec, table, pair_idx, single_idx):
    """Mixed paired/single hash-table lookup.

    table (L, T, F) f32 storage. pair_idx (n_paired, 4, B): base entries
    (the z0 corner of each (x, y) pair) for PAIRED levels, in level order.
    single_idx (n_single, 8, B): per-corner entries for the remaining
    levels. -> feats (F, L, 8, B) f32, corners in _CORNER_OFFSETS order
    (z-outer: corners 0-3 are z0, 4-7 are z1 of the same (x, y))."""
    (L, T, F), gather_dtype, res, dense_ok, pair_hash = spec[:5]
    epr, cpr, paired, n_entries = _pair_layout(spec)
    B = pair_idx.shape[2] if pair_idx.size else single_idx.shape[2]
    out_levels = []
    pi = si = 0
    for l in range(L):
        if paired[l]:
            rows = _pack_overlap_rows(table[l], n_entries[l], cpr, F, gather_dtype)
            e = pair_idx[pi].reshape(-1)  # (4B,)
            pi += 1
            r = jnp.take(rows, e // cpr, axis=0).astype(jnp.float32)  # (4B, 128)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            lane0 = (e % cpr) * F
            feats = []
            for z in range(2):  # z0 then z1 corners
                for f in range(F):
                    v = jnp.sum(jnp.where(lanes == (lane0 + z * F + f)[:, None], r, 0.0), axis=1)
                    feats.append(v.reshape(4, B))
            # feats index order: z*F + f -> assemble (F, 8, B)
            lvl = jnp.stack(
                [jnp.concatenate([feats[f], feats[F + f]], axis=0) for f in range(F)]
            )  # (F, 8, B)
            out_levels.append(lvl)
        else:
            rows = table[l].reshape(T // epr, 128).astype(gather_dtype)
            e = single_idx[si].reshape(-1)  # (8B,)
            si += 1
            r = jnp.take(rows, e // epr, axis=0).astype(jnp.float32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
            lane0 = (e % epr) * F
            lvl = jnp.stack([
                jnp.sum(jnp.where(lanes == (lane0 + f)[:, None], r, 0.0), axis=1).reshape(8, B)
                for f in range(F)
            ])
            out_levels.append(lvl)
    return jnp.stack(out_levels, axis=1)  # (F, L, 8, B)


def _hash_lookup_paired_fwd(spec, table, pair_idx, single_idx):
    return _hash_lookup_paired(spec, table, pair_idx, single_idx), (pair_idx, single_idx)


def _hash_lookup_paired_bwd(spec, resid, g):
    """g (F, L, 8, B) -> table grad (L, T, F); paired levels scatter-add
    one-hot PAIR rows into the overlapped layout then fold the overlap
    column back onto its canonical entry (slice arithmetic, no gather)."""
    pair_idx, single_idx = resid
    (L, T, F), _, res, dense_ok, pair_hash = spec[:5]
    epr, cpr, paired, n_entries = _pair_layout(spec)
    grads = []
    pi = si = 0
    for l in range(L):
        if paired[l]:
            e = pair_idx[pi].reshape(-1)  # (4B,)
            gl = g[:, l]  # (F, 8, B)
            pi += 1
            K = e.shape[0]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
            lane0 = (e % cpr) * F
            upd = jnp.zeros((K, 128), jnp.float32)
            for z in range(2):
                for f in range(F):
                    gv = gl[f, 4 * z: 4 * z + 4].reshape(-1)  # (4B,)
                    upd = upd + jnp.where(lanes == (lane0 + z * F + f)[:, None], gv[:, None], 0.0)
            R = -(-n_entries[l] // cpr)
            g_rows = jnp.zeros((R, 128), jnp.float32).at[e // cpr].add(upd)
            g4 = g_rows.reshape(R, cpr + 1, F)
            main = g4[:, :cpr].reshape(R * cpr, F)
            extra = g4[:, cpr]  # (R, F) -> canonical entries cpr*(r+1)
            need = cpr * R + 1
            flat = jnp.zeros((max(need, T), F), jnp.float32)
            flat = flat.at[: R * cpr].add(main)
            flat = flat.at[cpr: cpr * R + 1: cpr].add(extra)
            if need > T:  # wrap pad folds back onto the head
                flat = flat.at[: need - T].add(flat[T:need]).at[T:].set(0.0)
            grads.append(flat[:T])
        else:
            e = single_idx[si].reshape(-1)  # (8B,)
            gl = g[:, l].reshape(F, -1)  # (F, 8B)
            si += 1
            K = e.shape[0]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
            lane0 = (e % epr) * F
            upd = jnp.zeros((K, 128), jnp.float32)
            for f in range(F):
                upd = upd + jnp.where(lanes == (lane0 + f)[:, None], gl[f][:, None], 0.0)
            tbl = jnp.zeros((T // epr, 128), jnp.float32).at[e // epr].add(upd)
            grads.append(tbl.reshape(T, F))
    zero_p = np.zeros(pair_idx.shape, dtype=jax.dtypes.float0)
    zero_s = np.zeros(single_idx.shape, dtype=jax.dtypes.float0)
    return jnp.stack(grads), zero_p, zero_s


_hash_lookup_paired.defvjp(_hash_lookup_paired_fwd, _hash_lookup_paired_bwd)


# QUAD packing (hashed levels, r3c): a hash additive in y (stride
# _QUAD_SY) and z (stride 1) puts all four (dy, dz) corners of a point
# within a 33-entry span, so stride-32 overlapped rows (row r = entries
# [32r, 32r+63], each row = two aligned 32-entry halves) serve 4 corners
# with ONE gather — 2 indices/point/level vs 4 paired. Measured at bench
# shapes (scripts/probe_quad.py, v5e): fwd 85.3 -> 60.1 ms over the 11
# hashed levels; bwd is scatter-bound at a flat ~10 ms/level either way
# (probe_bwd_decomp.py: scatter 9.6 ms/level independent of index count).
# The overlap fold in the backward is pure slice arithmetic: each row's
# two halves slice-add into consecutive half-slots. Like pair_hash this
# changes the collision structure ((x*p1) + y*SY + z mod T — cells
# (y+1, z) and (y, z+SY) alias), so it is quality-gated
# (scripts/gate_quad_hash.sh) before becoming a default.
_QUAD_SY = 31
_QUAD_STRIDE = 32


def _quad_levels(spec):
    """Per-level quad flags (spec field 5: per-level tuple or legacy bool)."""
    return _level_fields(spec)[1]


def _pack_quad_rows(table_l, T, F, gather_dtype):
    """(T, F) level table -> (T//32, 128/F-entry) stride-32 overlapped rows
    (row r = entries [32r, 32r+63]); built with slices/reshape only. Only
    valid for F=2 (64 entries/row); entry e's quad span [e, e+SY+1] stays
    inside row e//32 because (e%32) + 32 <= 63."""
    R = T // _QUAD_STRIDE
    can = jnp.concatenate([table_l, table_l[:_QUAD_STRIDE]], axis=0)  # wrap pad
    h = can.reshape(R + 1, _QUAD_STRIDE * F)
    return jnp.concatenate([h[:R], h[1 : R + 1]], axis=1).astype(gather_dtype)


def _pack_quad_rows_batched(table_q, T, F, gather_dtype):
    """(Q, T, F) stacked quad-level tables -> (Q, T//32, 128) overlapped
    rows in ONE retile. Per-level _pack_quad_rows reshapes are
    LATENCY-bound on TPU (xprof r5b: ~0.8 ms for a 4 MB retile, ~80x off
    bandwidth); batching all quad levels amortizes that into one
    bandwidth-bound pass over the ~50 MB stack."""
    Q = table_q.shape[0]
    R = T // _QUAD_STRIDE
    can = jnp.concatenate([table_q, table_q[:, :_QUAD_STRIDE]], axis=1)
    h = can.reshape(Q, R + 1, _QUAD_STRIDE * F)
    return jnp.concatenate([h[:, :R], h[:, 1:]], axis=2).astype(gather_dtype)


def _fused_row_offsets(spec):
    """Per-level row offsets into the concatenated overlapped-row table."""
    (L, T, F), _, res, dense_ok, pair_hash = spec[:5]
    _, cpr, _, n_entries = _pair_layout(spec)
    quad = _quad_levels(spec)
    sizes = [T // _QUAD_STRIDE if quad[l] else -(-n_entries[l] // cpr) for l in range(L)]
    offs = np.cumsum([0] + sizes)
    return offs, cpr


# Coarse-level backward form: levels whose overlapped-row table has at
# most this many rows compute their gradient as a one-hot MATMUL
# (g_rows = E^T @ upd, E = (rl[:, None] == iota(R))) instead of a row
# scatter-add. The scatter's per-index cost (~10 ns/row) is flat in R,
# so tiny dense levels pay the same tax as the 2^19 hash levels; the
# matmul rides the MXU at FLOP cost K*R*128*2. Measured per dense level
# at bench shapes (scripts/gate_mm_bwd.py, v5e): scatter ~7 ms vs mm
# ~2-4 ms above the dispatch floor, ~18 ms/step across the 5 dense
# levels; crossover near R ~ 3000. TPU numerics: default-precision f32
# matmul runs bf16 passes, rounding each update term to bf16 before the
# f32 accumulation (max rel err ~2e-3 vs exact scatter — the tcnn
# half-precision grad-accumulation regime); quality-gated like
# pair_hash (scripts/gate_mm_bwd.sh). Set ARCNERF_MM_BWD=0 to force the
# exact scatter everywhere (CPU matmuls are exact f32 either way).
_MM_BWD_MAX_R = int(os.environ.get("ARCNERF_MM_BWD", "2048"))


# The fused lookup merges ALL levels into one flat (N = L*4*B,) index
# stream; its gather output is (N, 128). Above this row cap the stream is
# processed in lax.map/scan chunks so no single buffer exceeds ~1 GB bf16
# (the unchunked form AOT-OOMs at inference scales — e.g. the recipe's
# 128^3 occupancy eval puts N at 2^27 -> a 32 GB gather output).
_FUSED_CHUNK_ROWS = 1 << 22


def _fused_chunk_split(n):
    """(n_chunks, chunk, pad) splitting ``n`` rows at _FUSED_CHUNK_ROWS."""
    n_chunks = -(-n // _FUSED_CHUNK_ROWS)
    ch = -(-n // n_chunks)
    return n_chunks, ch, n_chunks * ch - n


# Lane-extraction construction form: "slot" builds masks on the (n, S)
# slot view and multiplies the (n, S, F) row view (fewest mask ops);
# "direct" builds everything on the native (n, 128) row layout (more mask
# arithmetic, zero relayout). A/B'd in-step on the chip
# (scripts/probe_laneform.py, v5e, 32k-ray bench shapes): slot 262.7 vs
# direct 208.2 ms/step — the slot views' physical relayouts cost ~21% of
# the whole step. Default direct; values/grads are test-pinned identical
# across forms (tests/test_pair_encoder.py lane_form tests).
_LANE_FORM = os.environ.get("ARCNERF_LANE_FORM", "direct")

# Backward update rows in bf16 (scatter-add still accumulates f32 in the
# destination): the (K, 128) update tensor is the encoder backward's
# dominant HBM term (~268 MB/level at bench shapes); storing it bf16
# halves that traffic, rounding each update TERM to bf16 before the f32
# accumulation — the same numerics regime as the one-hot-matmul backward
# (_MM_BWD_MAX_R note: TPU bf16 matmul passes round terms identically) and
# tcnn's half-precision grad accumulation. In-step A/B + quality gate:
# scripts/probe_bf16_upd.py / docs/benchmark.md r5.
_BF16_UPD = os.environ.get("ARCNERF_BF16_UPD", "0") == "1"

# Batched quad-level pack (fwd) / overlap fold (bwd): amortize the
# per-level latency-bound retiles into one bandwidth-bound batched op.
# MEASURED AND REJECTED (r5): xprof r5b showed 11 x ~1.2 ms of per-level
# data-formatting retiles, but batching both directions REGRESSED the
# step 172.5 -> 198.9 ms (probe_seg_march A/B) — the (Q, R, 128) batch
# extends every level's buffer lifetime across the whole encoder pass,
# costing more in scheduling than the retiles; and the fold-only variant
# hung the remote XLA compile twice (>16 min vs the usual ~9). Both
# default OFF; kept behind env flags as documentation of the experiment.
_BATCH_PACK = os.environ.get("ARCNERF_BATCH_PACK", "0") == "1"
_BATCH_FOLD = os.environ.get("ARCNERF_BATCH_FOLD", "0") == "1"


# One-hot-matmul FORWARD row fetch: dense levels with at most this many
# overlapped rows fetch their (n, 128) gathered-rows tensor as
# E @ rows (E = one-hot of ridx, bf16) instead of jnp.take. EXACT: rows
# hold bf16 values and E is 0/1, so the TPU's default bf16 matmul pass
# is lossless (one bf16 term per output, f32-accumulated) — unlike the
# backward mm no quality gate is needed. Measured in-jit over the 5
# dense levels (probe_bwd_decomp.py): take 36.2 ms vs all-mm 33.4 ms —
# the win concentrates at small R (FLOP cost = n*R*256), hence the cap.
# Env ARCNERF_MM_FWD overrides; 0 disables.
_MM_FWD_MAX_R = int(os.environ.get("ARCNERF_MM_FWD", "1263"))


def _fetch_rows(rows_all, ridx, mm):
    """(R, 128) rows + (n,) row ids -> (n, 128) rows, via one-hot matmul
    when ``mm`` (static, f32 out) else row gather — which keeps the TABLE
    dtype: the f32 upcast happens inside the consumer's fused
    multiply-reduce, so a bf16 table never materializes an (n, 128) f32
    copy (xprof r5: the astype-then-extract form spent 51 ms/step
    re-reading f32 rows the gather had just written — half of it was the
    upcast's own traffic)."""
    if mm:
        R = rows_all.shape[0]
        e = (ridx[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (ridx.shape[0], R), 1)).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            e, rows_all.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jnp.take(rows_all, ridx, axis=0)


def _fused_gather_extract(rows_all, ridx, lane0, ws, offs, F, mm=False):
    """One chunk of the fused lookup: row fetch + weight-folded lane
    extraction at the static per-corner lane offsets ``offs`` (pair:
    (0, F); quad: ((cy*SY+cz)*F, ...)). ``ws`` is the matching tuple of
    per-corner weight vectors. -> (F, n) interpolated partial sums."""
    r = _fetch_rows(rows_all, ridx, mm)  # (n, 128)
    n = r.shape[0]
    if 128 % F == 0 and all(off % F == 0 for off in offs):
        # SLOT form: entries are F-aligned in the row, so view the row as
        # (128//F) F-wide slots — ONE (n, S) mask per corner then serves
        # every feature lane of that corner (the per-f masks are the same
        # mask shifted by one lane). Mask work shrinks F x and the
        # F-lane values apply in a single broadcast multiply
        # (scripts/probe_cons_forms.py slot forms vs per-lane forms).
        S = 128 // F
        if _LANE_FORM == "direct":
            # DIRECT-LANE form: masks and reduce on the (n, 128) row layout
            # itself — the slot form's (n, S, F) view forces a physical
            # relayout on TPU (T(8,128) -> T(2,128)(2,1) reshape + copy in
            # the xprof r5 trace). Extra mask arithmetic rides the VPU; no
            # HBM round-trip.
            lanes = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
            q = lanes // F - (lane0 // F)[:, None]
            m = 0.0
            for w, off in zip(ws, offs):
                m = m + jnp.where(q == off // F, w[:, None], 0.0)
            rm = r.astype(jnp.float32) * m
            return jnp.stack([
                jnp.sum(jnp.where(lanes % F == f, rm, 0.0), axis=1) for f in range(F)])
        slots = jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)
        q = slots - (lane0 // F)[:, None]
        m = 0.0
        for w, off in zip(ws, offs):
            m = m + jnp.where(q == off // F, w[:, None], 0.0)
        # upcast INSIDE the reduce so it fuses (bf16 rows never round-trip
        # HBM as f32); value-identical to astype-then-multiply
        rf = r.reshape(n, S, F).astype(jnp.float32)
        return jnp.sum(rf * m[:, :, None], axis=1).T  # (F, n)
    # fallback (F doesn't tile the row): shared lane-delta per-lane form
    lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    d = lanes - lane0[:, None]
    outs = []
    for f in range(F):
        m = 0.0
        for w, off in zip(ws, offs):
            m = m + jnp.where(d == off + f, w[:, None], 0.0)
        outs.append(jnp.sum(r.astype(jnp.float32) * m, axis=1))  # (n,)
    return jnp.stack(outs)


def _fused_level_idx(spec, pair_idx, w, l):
    """Per-level index pieces of the fused lookup (no table access): row
    ids, base lanes, per-corner weight vectors + static lane offsets, the
    mm-forward flag, and the number of gathered corners per point (4 for
    pair levels, 2 for quad levels)."""
    (L, T, F), gather_dtype, _, dense_ok = spec[:4]
    _, cpr, _, n_entries = _pair_layout(spec)
    if _quad_levels(spec)[l]:
        el = pair_idx[l, :2].reshape(-1)  # (2B,) x-corner-major
        rl = el // _QUAD_STRIDE
        lane0 = (el % _QUAD_STRIDE) * F
        offs = tuple((cy * _QUAD_SY + cz) * F for cy in (0, 1) for cz in (0, 1))
        # corner (cx, cy, cz) sits at weight index cz*4 + cx*2 + cy
        ws = tuple(jnp.concatenate([w[l, cz * 4 + cy], w[l, cz * 4 + 2 + cy]])
                   for cy in (0, 1) for cz in (0, 1))
        return rl, lane0, ws, offs, False, 2
    el = pair_idx[l].reshape(-1)  # (4B,) corner-major
    rl = el // cpr
    lane0 = (el % cpr) * F
    ws = (w[l, :4].reshape(-1), w[l, 4:].reshape(-1))
    R = -(-n_entries[l] // cpr)
    # mm fetch is exact ONLY when the rows are already bf16 (E is 0/1, so
    # the TPU's bf16 matmul pass reproduces the gathered value bit-exactly);
    # f32 tables must keep the gather or they'd be silently bf16-rounded.
    mm = (bool(dense_ok[l]) and 0 < _MM_FWD_MAX_R and R <= _MM_FWD_MAX_R
          and gather_dtype == "bfloat16")
    return rl, lane0, ws, (0, F), mm, 4


def _fused_level_rows(spec, table, l, gather_dtype):
    """Packed overlapped rows for level ``l`` (quad or pair layout)."""
    (L, T, F), _, _, _, _ = spec[:5]
    _, cpr, _, n_entries = _pair_layout(spec)
    if _quad_levels(spec)[l]:
        return _pack_quad_rows(table[l], T, F, gather_dtype)
    return _pack_overlap_rows(table[l], n_entries[l], cpr, F, gather_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hash_lookup_fused(spec, table, pair_idx, w):
    """All-levels-paired lookup with the trilinear interpolation FUSED in:
    ONE row gather across the concatenated per-level overlapped-row tables,
    weights folded into the lane extraction, output (F, L, B) — the
    interpolated feature itself, not per-corner features.

    vs _hash_lookup_paired + weighted-sum: the (F, L, 8, B) per-corner
    tensor never exists (neither does its cotangent in the backward — the
    incoming g is 8x smaller), the 16 per-level gathers merge into one
    pipelined gather, and the backward is one row scatter-add with w*g
    folded into the one-hot rows.

    pair_idx (L, 4, B): base entries (z0 corner of each (x, y) pair) per
    level. w (L, 8, B): trilinear corner weights in _CORNER_OFFSETS z-outer
    order (corners 0-3 = z0, 4-7 = z1 of the same (x, y)).

    GRADIENT CONTRACT: grads flow to ``table`` only; the cotangent wrt
    ``w`` (and hence wrt xyz through the interpolation weights) is ZERO.
    NGP-style training never differentiates wrt input points (zvals are
    stop-gradient), but SDF models autodiff normals through the encoder —
    they must build their geo net with needs_input_grad=True, which sets
    HashGridEmbedder.fuse_interp=False (build_geo_model)."""
    (L, T, F), gather_dtype, _, dense_ok, _ = spec[:5]
    B = pair_idx.shape[2]
    # per-level gathers (not one merged gather over concatenated tables):
    # measured 94.1 vs 121.2 ms at the bench shapes — the per-level
    # transients schedule/free better (scripts/probe_fused_bwd.py --fwd)
    quad = _quad_levels(spec)
    q_lvls = [l for l in range(L) if quad[l]]
    q_of = {l: i for i, l in enumerate(q_lvls)} if _BATCH_PACK else {}
    if q_of:
        contig = q_lvls == list(range(q_lvls[0], q_lvls[0] + len(q_lvls)))
        tq = (table[q_lvls[0]: q_lvls[0] + len(q_lvls)] if contig  # free slice
              else jnp.stack([table[l] for l in q_lvls]))
        rows_q = _pack_quad_rows_batched(tq, T, F, gather_dtype)
    outs = []
    for l in range(L):
        rows = rows_q[q_of[l]] if l in q_of else _fused_level_rows(spec, table, l, gather_dtype)
        rl, lane0, ws, offs, mm, nc = _fused_level_idx(spec, pair_idx, w, l)
        Nl = nc * B
        if Nl <= _FUSED_CHUNK_ROWS:
            s = _fused_gather_extract(rows, rl, lane0, ws, offs, F, mm)  # (F, nc*B)
        else:
            n_chunks, ch, pad = _fused_chunk_split(Nl)

            def padc(x):  # pad with index 0 / weight 0 rows: they contribute 0
                return jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x

            xs = tuple(padc(x).reshape(n_chunks, ch) for x in (rl, lane0) + ws)
            s = jax.lax.map(
                lambda c: _fused_gather_extract(rows, c[0], c[1], tuple(c[2:]), offs, F, mm), xs)
            s = s.transpose(1, 0, 2).reshape(F, n_chunks * ch)[:, :Nl]
        outs.append(s.reshape(F, nc, B).sum(axis=1))  # (F, B)
    return jnp.stack(outs, axis=1)  # (F, L, B)


def _hash_lookup_fused_fwd(spec, table, pair_idx, w):
    return _hash_lookup_fused(spec, table, pair_idx, w), (pair_idx, w)


def _hash_lookup_fused_bwd(spec, resid, g):
    """g (F, L, B) -> table grad (L, T, F): PER-LEVEL row accumulation of
    w*g-valued one-hot rows into the overlapped layout — a row scatter-add
    for large levels, a one-hot MATMUL for levels with R <= _MM_BWD_MAX_R
    rows (the coarse dense levels; see that constant's note) — then a
    per-level overlap fold (slice arithmetic, no gather).

    Per-level (not one merged scatter) is a measured choice: at the bench
    shapes (N = 16.7M) the 16 per-level (4B, 128) scatters run 2x faster
    than one (N, 128) scatter into the concatenated rows — the merged
    form's giant update tensor serializes behind its own materialization,
    while the per-level transients free between levels
    (scripts/probe_fused_bwd.py: merged 334.7 ms, per-level 166.4 ms,
    narrow (N,4) rows 1382.8 ms, sort+segment_sum 1736.5 ms)."""
    pair_idx, w = resid
    (L, T, F), _, _, _, _ = spec[:5]
    row_offs, cpr = _fused_row_offsets(spec)
    _, _, _, n_entries = _pair_layout(spec)
    quad = _quad_levels(spec)
    B = pair_idx.shape[2]

    def build_profile(lane0_c, ws_c, gf_c, lane_offs):
        """P-FORM construction: the cotangent g is corner-INDEPENDENT, so
        the corner sum can run on a (K, S) slot weight-profile
        ``P[k,s] = sum_c onehot(s - s0_k - d_c) * w_c[k]`` — each corner
        pays a pass over (K, S), F x less bandwidth than accumulating
        (K, S, F) per corner — and g lands in ONE outer product
        ``upd2 = P[:, :, None] * g2[:, None, :]`` (the m-form the forward
        extract already uses). Returns (P, g2) factored, or None when F
        doesn't tile the row."""
        K = lane0_c.shape[0]
        if not (128 % F == 0 and all(off % F == 0 for off in lane_offs)):
            return None
        S = 128 // F
        slots = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1)
        q = slots - (lane0_c // F)[:, None]
        prof = jnp.zeros((K, S), jnp.float32)
        for w_c, off in zip(ws_c, lane_offs):
            prof = prof + jnp.where(q == off // F, w_c[:, None], 0.0)
        g2 = jnp.stack([gf_c[f] for f in range(F)], axis=-1)  # (K, F)
        return prof, g2

    def build_upd(rl_c, lane0_c, ws_c, gf_c, lane_offs):
        if (_LANE_FORM == "direct" and 128 % F == 0
                and all(off % F == 0 for off in lane_offs)):
            # DIRECT-LANE form: the update is born (K, 128) in the
            # scatter's own row layout — the P-form's (K, S, F) outer
            # product paid a physical reshape + copy per level on TPU
            # (xprof r5: ~1.7 ms/level of pure relayout)
            K = lane0_c.shape[0]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
            q = lanes // F - (lane0_c // F)[:, None]
            m = 0.0
            for w_c, off in zip(ws_c, lane_offs):
                m = m + jnp.where(q == off // F, w_c[:, None], 0.0)
            gsel = gf_c[F - 1][:, None]
            for f in range(F - 2, -1, -1):
                gsel = jnp.where(lanes % F == f, gf_c[f][:, None], gsel)
            upd = m * gsel
            return upd.astype(jnp.bfloat16) if _BF16_UPD else upd
        fac = build_profile(lane0_c, ws_c, gf_c, lane_offs)
        if fac is not None:
            prof, g2 = fac
            K = prof.shape[0]
            return (prof[:, :, None] * g2[:, None, :]).reshape(K, 128)
        # fallback (F doesn't tile the row): shared lane-delta form
        K = rl_c.shape[0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
        d = lanes - lane0_c[:, None]
        upd = jnp.zeros((K, 128), jnp.float32)
        for f in range(F):
            for w_c, off in zip(ws_c, lane_offs):
                upd = upd + (d == off + f).astype(jnp.float32) * (w_c * gf_c[f])[:, None]
        return upd

    def accum_rows(g_rows, rl_c, lane0_c, ws_c, gf_c, lane_offs):
        R = g_rows.shape[0]
        if R <= _MM_BWD_MAX_R:  # one-hot matmul form (see _MM_BWD_MAX_R)
            e = (rl_c[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (rl_c.shape[0], R), 1)).astype(jnp.float32)
            fac = build_profile(lane0_c, ws_c, gf_c, lane_offs)
            if fac is not None:
                # factored mm: F small matmuls on (K, S) operands — the
                # (K, 128) update never materializes for mm levels
                prof, g2 = fac
                S = prof.shape[1]
                cols = [jax.lax.dot_general(
                    e, prof * g2[:, f][:, None], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) for f in range(F)]
                return g_rows + jnp.stack(cols, axis=-1).reshape(R, S * F)
            upd = build_upd(rl_c, lane0_c, ws_c, gf_c, lane_offs)
            return g_rows + jax.lax.dot_general(
                e, upd, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        upd = build_upd(rl_c, lane0_c, ws_c, gf_c, lane_offs)
        # bf16 upd rows upcast inside the scatter's operand read; the
        # destination accumulation stays f32
        return g_rows.at[rl_c].add(upd.astype(jnp.float32))

    grads = [None] * L
    quad_halves = []  # per quad level: (R+1, 64) half-slot gradients
    for l in range(L):
        R = int(row_offs[l + 1] - row_offs[l])
        rl, lane0, ws, lane_offs, _, nc = _fused_level_idx(spec, pair_idx, w, l)
        gf = jnp.stack([jnp.broadcast_to(g[f, l][None], (nc, B)).reshape(-1) for f in range(F)])
        Nl = nc * B
        g_rows0 = jnp.zeros((R, 128), jnp.float32)
        if Nl <= _FUSED_CHUNK_ROWS:
            g_rows = accum_rows(g_rows0, rl, lane0, ws, gf, lane_offs)
        else:
            n_chunks, ch, pad = _fused_chunk_split(Nl)

            def padc(x):  # pad rows carry weight 0 -> scatter adds nothing
                if not pad:
                    return x
                z = jnp.zeros(x.shape[:-1] + (pad,), x.dtype)
                return jnp.concatenate([x, z], axis=-1)

            xs = tuple(padc(x).reshape(n_chunks, ch) for x in (rl, lane0) + ws)
            gf_c = padc(gf).reshape(F, n_chunks, ch).transpose(1, 0, 2)
            nw = len(ws)
            g_rows, _ = jax.lax.scan(
                lambda gr, c: (accum_rows(gr, c[0], c[1], tuple(c[2:2 + nw]), c[-1], lane_offs), None),
                g_rows0, xs + (gf_c,))
        if quad[l]:
            # overlap fold, stage 1 (per level): row = two aligned
            # 32-entry halves -> two shifted slice-adds into (R+1)
            # half-slots. Under _BATCH_FOLD the half-slot -> entry retile
            # is deferred to ONE batched reshape over all quad levels
            # below: the per-level (R+1, 64) -> (T+32, F) retiles are
            # latency-bound on TPU (xprof r5b: 11 x ~1.2 ms of pure data
            # formatting).
            g2 = g_rows.reshape(R, 2, _QUAD_STRIDE * F)
            half = jnp.zeros((R + 1, _QUAD_STRIDE * F), jnp.float32)
            half = half.at[:R].add(g2[:, 0]).at[1:].add(g2[:, 1])
            if _BATCH_FOLD:
                quad_halves.append(half)
                continue
            ent = half.reshape((R + 1) * _QUAD_STRIDE, F)
            grads[l] = ent[:T].at[:_QUAD_STRIDE].add(ent[T:])
            continue
        g4 = g_rows.reshape(R, cpr + 1, F)
        main = g4[:, :cpr].reshape(R * cpr, F)
        extra = g4[:, cpr]  # canonical entries cpr*(r+1)
        need = cpr * R + 1
        flat = jnp.zeros((max(need, T), F), jnp.float32)
        flat = flat.at[: R * cpr].add(main)
        flat = flat.at[cpr: cpr * R + 1: cpr].add(extra)
        if need > T:  # wrap pad folds back onto the head
            flat = flat.at[: need - T].add(flat[T:need]).at[T:].set(0.0)
        grads[l] = flat[:T]
    if quad_halves:
        # overlap fold, stage 2 (batched): one (Q, R+1, 64) -> (Q, T+32, F)
        # retile for every quad level, then the 32-entry wrap pad folds
        # onto each level's head with one slice-add.
        H = jnp.stack(quad_halves)  # (Q, R+1, 64)
        Q = H.shape[0]
        ent = H.reshape(Q, (T // _QUAD_STRIDE + 1) * _QUAD_STRIDE, F)
        gq = ent[:, :T].at[:, :_QUAD_STRIDE].add(ent[:, T:])
        for i, l in enumerate([l for l in range(L) if quad[l]]):
            grads[l] = gq[i]
        q_lvls = [l for l in range(L) if quad[l]]
        if q_lvls == list(range(q_lvls[0], q_lvls[0] + Q)):
            # contiguous quad suffix/run: stack the non-quad prefix/suffix
            # around the batched block so no per-level slice of gq is ever
            # materialized (XLA treats gq[i] re-stacks as copies)
            pre = grads[: q_lvls[0]]
            post = grads[q_lvls[0] + Q:]
            parts = ([jnp.stack(pre)] if pre else []) + [gq] + ([jnp.stack(post)] if post else [])
            out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            zero_i = np.zeros(pair_idx.shape, dtype=jax.dtypes.float0)
            return out, zero_i, jnp.zeros_like(w)
    zero_i = np.zeros(pair_idx.shape, dtype=jax.dtypes.float0)
    return jnp.stack(grads), zero_i, jnp.zeros_like(w)


_hash_lookup_fused.defvjp(_hash_lookup_fused_fwd, _hash_lookup_fused_bwd)


@ENCODER_REGISTRY.register()
class FreqEmbedder(nn.Module):
    """sin/cos positional encoding: x -> [x?, sin(f_i x), cos(f_i x)...]."""

    input_dim: int = 3
    n_freqs: int = 10
    log_sampling: bool = True
    include_input: bool = True

    @property
    def out_dim(self):
        return self.include_input * self.input_dim + self.input_dim * 2 * self.n_freqs

    def get_output_dim(self):
        return self.out_dim

    def _freq_bands(self):
        if self.n_freqs == 0:
            return None
        if self.log_sampling:
            return 2.0 ** np.linspace(0.0, self.n_freqs - 1, self.n_freqs)
        return np.linspace(2.0**0.0, 2.0 ** (self.n_freqs - 1), self.n_freqs)

    @nn.compact
    def __call__(self, x):
        out = [x] if self.include_input else []
        bands = self._freq_bands()
        if bands is not None:
            # (B, D) x (F,) -> (B, F, D) -> sin/cos stacked on feature axis
            scaled = x[..., None, :] * jnp.asarray(bands, dtype=x.dtype)[:, None]
            sin = jnp.sin(scaled)
            cos = jnp.cos(scaled)
            enc = jnp.stack([sin, cos], axis=-2)  # (B, F, 2, D)
            out.append(enc.reshape(x.shape[:-1] + (-1,)))
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=-1)


class Gaussian:
    """zvals + rays -> per-interval Gaussian (mean, diag cov) for MipNeRF.

    ``gaussian_fn``: 'cone' or 'cylinder' (reference gaussian_encoder.py:9-135).
    Parameterless plain class (usable inside any linen method).
    """

    def __init__(self, gaussian_fn="cone"):
        self.gaussian_fn = gaussian_fn

    def __call__(self, zvals, rays_o, rays_d, rays_r):
        """zvals (B, N+1), rays_o/d (B, 3), rays_r (B, 1) -> (B, N, 6)."""
        means, covs = self.get_conical_frustum(zvals, rays_o, rays_d, rays_r)
        return jnp.concatenate([means, covs], axis=-1)

    def get_conical_frustum(self, zvals, rays_o, rays_d, rays_r):
        t_start, t_end = zvals[:, :-1], zvals[:, 1:]
        if self.gaussian_fn == "cone":
            means, covs = self._cone_to_gaussian(rays_d, t_start, t_end, rays_r)
        elif self.gaussian_fn == "cylinder":
            means, covs = self._cylinder_to_gaussian(rays_d, t_start, t_end, rays_r)
        else:
            raise NotImplementedError("invalid gaussian fn {}".format(self.gaussian_fn))
        return means + rays_o[:, None, :], covs

    @staticmethod
    def _lift(rays_d, t_mean, t_var, r_var):
        mean = rays_d[:, None, :] * t_mean[..., None]
        d_mag_sq = jnp.maximum(jnp.sum(rays_d**2, axis=-1, keepdims=True), 1e-10)
        d_outer = rays_d**2
        null_outer = 1.0 - d_outer / d_mag_sq
        cov = t_var[..., None] * d_outer[:, None, :] + r_var[..., None] * null_outer[:, None, :]
        return mean, cov

    def _cone_to_gaussian(self, rays_d, t0, t1, rays_r):
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        common = 3.0 * mu**2 + hw**2
        t_mean = mu + (2.0 * mu * hw**2) / common
        t_var = (hw**2) / 3.0 - (4.0 / 15.0) * ((hw**4 * (12.0 * mu**2 - hw**2)) / common**2)
        r_var = rays_r**2 * ((mu**2) / 4.0 + (5.0 / 12.0) * hw**2 - (4.0 / 15.0) * (hw**4) / common)
        return self._lift(rays_d, t_mean, t_var, r_var)

    def _cylinder_to_gaussian(self, rays_d, t0, t1, rays_r):
        t_mean = (t0 + t1) / 2.0
        t_var = (t1 - t0) ** 2 / 12.0
        r_var = jnp.broadcast_to(rays_r**2 / 4.0, t_mean.shape)
        return self._lift(rays_d, t_mean, t_var, r_var)


@ENCODER_REGISTRY.register()
class GaussianEmbedder(nn.Module):
    """Integrated positional encoding: exp(-f^2 cov / 2) * sin/cos(f mean)."""

    input_dim: int = 3
    n_freqs: int = 10
    log_sampling: bool = True
    include_input: bool = True

    @property
    def out_dim(self):
        return self.include_input * self.input_dim + self.input_dim * 2 * self.n_freqs

    def get_output_dim(self):
        return self.out_dim

    @nn.compact
    def __call__(self, x):
        """x (B, input_dim*2): [mean, diag cov] -> (B, out_dim)."""
        means, covs = x[..., : self.input_dim], x[..., self.input_dim:]
        out = [means] if self.include_input else []
        if self.n_freqs > 0:
            if self.log_sampling:
                bands = 2.0 ** np.linspace(0.0, self.n_freqs - 1, self.n_freqs)
            else:
                bands = np.linspace(2.0**0.0, 2.0 ** (self.n_freqs - 1), self.n_freqs)
            bands = jnp.asarray(bands, dtype=x.dtype)
            scaled = means[..., None, :] * bands[:, None]  # (B, F, D)
            damp = jnp.exp(-0.5 * (bands**2)[:, None] * covs[..., None, :])  # (B, F, D)
            enc = jnp.stack([damp * jnp.sin(scaled), damp * jnp.cos(scaled)], axis=-2)
            out.append(enc.reshape(x.shape[:-1] + (-1,)))
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=-1)


def sh_basis(dirs, degree):
    """Real spherical-harmonic basis values up to ``degree`` (1..5).

    dirs (B, 3) unit vectors -> (B, degree^2). Hard-coded polynomial
    coefficients (same basis family as tcnn's SphericalHarmonics).
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    ones = jnp.ones_like(x)
    comps = [0.28209479177387814 * ones]
    if degree >= 2:
        comps += [
            -0.4886025119029199 * y,
            0.4886025119029199 * z,
            -0.4886025119029199 * x,
        ]
    if degree >= 3:
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (2.0 * zz - xx - yy),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if degree >= 4:
        comps += [
            -0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            -0.4570457994644658 * y * (4.0 * zz - xx - yy),
            0.3731763325901154 * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            -0.4570457994644658 * x * (4.0 * zz - xx - yy),
            1.445305721320277 * z * (xx - yy),
            -0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    if degree >= 5:
        comps += [
            2.5033429417967046 * xy * (xx - yy),
            -1.7701307697799304 * yz * (3.0 * xx - yy),
            0.9461746957575601 * xy * (7.0 * zz - 1.0),
            -0.6690465435572892 * yz * (7.0 * zz - 3.0),
            0.10578554691520431 * (35.0 * zz * zz - 30.0 * zz + 3.0),
            -0.6690465435572892 * xz * (7.0 * zz - 3.0),
            0.47308734787878004 * (xx - yy) * (7.0 * zz - 1.0),
            -1.7701307697799304 * xz * (xx - 3.0 * yy),
            0.6258357354491761 * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)


@ENCODER_REGISTRY.register()
class SHEmbedder(nn.Module):
    """Spherical-harmonics direction encoding, degree = n_freqs in 1..5."""

    input_dim: int = 3
    n_freqs: int = 4
    include_input: bool = False

    @property
    def out_dim(self):
        return self.include_input * self.input_dim + self.n_freqs**2

    def get_output_dim(self):
        return self.out_dim

    @nn.compact
    def __call__(self, dirs):
        assert 1 <= self.n_freqs <= 5, "SH degree must be 1..5"
        out = [dirs] if self.include_input else []
        out.append(sh_basis(dirs, self.n_freqs))
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=-1)


def hash_variant_from_cfgs(model_cfgs):
    """Resolved hash-structure variant of the model's hashgrid encoder:
    'quad' | 'pair' | 'ngp', or None when the geometry encoder is not a
    HashGrid. Recorded in checkpoints (model_io.save_model meta) and
    asserted at load: a table trained under one hash layout decodes as
    noise under another (quad_hash/pair_hash change the hash function on
    hashed levels), so a default flip must never silently re-interpret an
    existing checkpoint."""
    from ...utils.cfgs import get_value_from_cfgs_field

    geo = get_value_from_cfgs_field(model_cfgs, "geometry", None)
    enc = get_value_from_cfgs_field(geo, "encoder", None)
    if enc is None or str(get_value_from_cfgs_field(enc, "type", "")) != "HashGrid":
        return None
    if bool(get_value_from_cfgs_field(enc, "quad_hash", HashGridEmbedder.quad_hash)):
        return "quad"
    if bool(get_value_from_cfgs_field(enc, "pair_hash", HashGridEmbedder.pair_hash)):
        return "pair"
    return "ngp"


def fast_hash(idx, table_size):
    """xor-prime spatial hash of integer corner coords.

    idx (..., 3) int32 -> (...,) int32 in [0, table_size). table_size must be
    a power of two (bitwise-and modulus); multiplication wraps in uint32.
    """
    u = idx.astype(jnp.uint32)
    h = u[..., 0] * jnp.uint32(_HASH_PRIMES[0])
    h = h ^ (u[..., 1] * jnp.uint32(_HASH_PRIMES[1]))
    h = h ^ (u[..., 2] * jnp.uint32(_HASH_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


@ENCODER_REGISTRY.register()
class HashGridEmbedder(nn.Module):
    """Multi-resolution hash grid (instant-ngp).

    One (L, T, F) table; per-level resolution r_l = ceil(base * s^l - 1),
    s = exp(ln(max/base)/(L-1)). Levels with (r_l+1)^3 <= T index densely,
    others hash. All levels are gathered in one vectorized op.
    """

    input_dim: int = 3
    n_levels: int = 16
    n_feat_per_entry: int = 2
    hashmap_size: int = 19  # log2(T)
    base_res: int = 16
    max_res: int = 2048
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    side: Any = None
    xyz_len: Any = None
    include_input: bool = True
    dtype: Any = jnp.float32
    init_std: float = 1e-4
    # pair-coalesced gathers (TPU): dense levels have z-adjacent entries by
    # construction, so both z-corners of an (x, y) pair come from ONE row
    # gather — exact, no hash change. pair_hash extends this to hashed
    # levels by switching their hash to z-additive ((x*p0 ^ y*p1) + z mod
    # T) — a different collision structure, so it was quality-gated before
    # becoming the default: scripts/gate_pair_hash.sh on the TPU measured
    # eval PSNR 25.62 (pair_hash) vs 25.57 (instant-ngp hash) at 600 steps
    # with a ~35% faster step. Set pair_hash=False AND quad_hash=False in
    # the encoder cfg to recover the exact instant-ngp hash.
    pair_dense: bool = True
    pair_hash: bool = True
    # QUAD packing of hashed levels (fused path only): a hash additive in
    # y (stride 31) AND z ((x*p1) + y*31 + z mod T) puts all four (dy, dz)
    # corners in one stride-32 overlapped row — 2 gathers/point/level vs 4
    # paired. Measured fwd 85.3 -> 60.1 ms over the 11 hashed levels at
    # bench shapes (scripts/probe_quad.py); the backward is scatter-bound
    # either way. Changes collision structure ((y+1, z) aliases with
    # (y, z+31)); quality-gated via scripts/gate_quad_hash.sh (same
    # protocol as pair_hash): 600-step NGP val PSNR seed 0: 25.49 off /
    # 25.15 on; seed 7: 24.99 off / 25.24 on — means differ 0.04 dB with
    # run-to-run noise ~0.5 dB, while the step drops 275.6 -> 235.1 ms at
    # the 4096-ray bench bucket (+17% throughput). Default ON. Set
    # quad_hash=False to recover the pair-hash collision structure.
    # Takes precedence over pair_hash on hashed levels when True.
    quad_hash: bool = True
    # fuse the trilinear interpolation into the lookup op (TPU, all levels
    # paired): one merged gather across levels, weights folded into the
    # lane extraction, (F, L, B) output. Gradients then flow to the table
    # ONLY — xyz gets no gradient through the interpolation weights. SDF
    # models (autodiff normals) build their geo nets with
    # needs_input_grad=True which turns this off (build_geo_model).
    fuse_interp: bool = True

    @property
    def out_dim(self):
        return self.n_levels * self.n_feat_per_entry + self.include_input * self.input_dim

    def get_output_dim(self):
        return self.out_dim

    @property
    def table_size(self):
        return 2**self.hashmap_size

    def _resolutions(self):
        scale = math.exp(math.log(self.max_res / self.base_res) / (self.n_levels - 1))
        return np.array(
            [int(math.ceil(self.base_res * (scale**i) - 1.0)) for i in range(self.n_levels)], dtype=np.int32
        )

    def _aabb(self):
        assert self.side is not None or self.xyz_len is not None, "hashgrid needs a volume size"
        origin = np.asarray(self.origin, dtype=np.float32)
        xyz_len = (
            np.array([self.side] * 3, dtype=np.float32)
            if self.side is not None
            else np.asarray(self.xyz_len, dtype=np.float32)
        )
        return origin - xyz_len / 2.0, origin + xyz_len / 2.0

    @nn.compact
    def __call__(self, xyz):
        """xyz (B, 3) world coords inside the volume -> (B, out_dim)."""
        T, L, F = self.table_size, self.n_levels, self.n_feat_per_entry
        # dtype selects the GATHER/compute precision; storage stays f32
        # (f32 params keep grads/adam/collectives f32 — bf16 only rides the
        # bandwidth-bound random-access read)
        gather_dtype = canonical_dtype(self.dtype)
        table = self.param(
            "embeddings",
            lambda key, shape: nn.initializers.uniform(scale=2 * self.init_std)(key, shape, jnp.float32)
            - self.init_std,
            (L, T, F),
        )
        res = self._resolutions()  # (L,) static
        dense_ok = (res.astype(np.int64) + 1) ** 3 <= T  # (L,) static bools
        mn, mx = self._aabb()
        B = xyz.shape[0]
        lane_ok = 128 % F == 0 and T % (128 // F) == 0
        on_tpu = jax.default_backend() == "tpu" and lane_ok
        # quad packing needs 64-entry rows (F=2) and stride | T. The quad
        # HASH choice must NOT depend on the backend (a table trained with
        # the quad hash must be read with it on CPU too), so quad_lvls is
        # layout-independent; only the fused LAYOUT below is TPU-gated.
        quad_ok = self.quad_hash and F == 2 and T % _QUAD_STRIDE == 0
        quad_lvls = [(not bool(d)) and quad_ok for d in dense_ok]
        # levels that can ride the FUSED op (pair- or quad-coalesced)
        fusable = [
            on_tpu and ((bool(d) and self.pair_dense)
                        or ((not bool(d)) and (self.pair_hash or quad_ok)))
            for d in dense_ok
        ]
        use_fused = on_tpu and self.fuse_interp and all(fusable)
        # levels that use the pair-coalesced gather in the NON-fused op
        # (quad levels fall back to 8-corner single entries there — the
        # quad HASH still applies so train/eval paths stay consistent)
        paired = [fusable[l] and not quad_lvls[l] for l in range(L)]

        # TPU layout note: keep the huge point dim B minor-most everywhere.
        # A (B, L, 8, F) gather pads its tiny trailing dims to the (8, 128)
        # tile — a 16-64x HBM blowup. With B last, every tensor tiles clean.
        norm = (xyz - jnp.asarray(mn)) / jnp.asarray(mx - mn)  # (B, 3) in [0,1]
        nx, ny, nz = norm[:, 0], norm[:, 1], norm[:, 2]

        # per-level index math ((B,)-shaped intermediates; per-axis hash
        # terms are computed once and combined per corner — 6 uint32
        # multiplies per level instead of 24)
        pair_bases, single_entries, weights = [], [], []
        for l in range(L):
            r = int(res[l])
            px, py, pz = nx * r, ny * r, nz * r
            x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, r - 1)
            y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, r - 1)
            z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, r - 1)
            fx = px - x0.astype(px.dtype)
            fy = py - y0.astype(py.dtype)
            fz = pz - z0.astype(pz.dtype)
            # trilinear weights, corners in _CORNER_OFFSETS (z-outer) order
            wx = (1.0 - fx, fx)
            wy = (1.0 - fy, fy)
            wz = (1.0 - fz, fz)
            weights.append(jnp.stack([
                wx[cx] * wy[cy] * wz[cz]
                for (cx, cy, cz) in _CORNER_OFFSETS.tolist()
            ]))  # (8, B)

            if dense_ok[l]:
                n1 = r + 1
                ax = (x0 * (n1 * n1), (x0 + 1) * (n1 * n1))
                ay = (y0 * n1, (y0 + 1) * n1)
                if paired[l]:
                    pair_bases.append(jnp.stack(
                        [ax[cx] + ay[cy] + z0 for cx in (0, 1) for cy in (0, 1)]))  # (4, B)
                else:
                    single_entries.append(jnp.stack([
                        ax[cx] + ay[cy] + z0 + cz
                        for (cx, cy, cz) in _CORNER_OFFSETS.tolist()
                    ]))
            elif quad_lvls[l]:
                # quad hash: additive in y (stride _QUAD_SY) AND z, so the
                # 4 (dy, dz) corners of a point span 33 entries from each
                # x-corner base — one stride-32 row gather serves all 4
                ux, uy, uz = x0.astype(jnp.uint32), y0.astype(jnp.uint32), z0.astype(jnp.uint32)
                p = jnp.uint32(_HASH_PRIMES[1])
                qb = [(((ux + cx) * p + uy * jnp.uint32(_QUAD_SY) + uz)
                       & jnp.uint32(T - 1)).astype(jnp.int32) for cx in (0, 1)]
                if use_fused:
                    # dedicated quad rows: x-corner bases in rows 0/1
                    # (_fused_level_idx reads pair_idx[l, :2]); rows 2/3
                    # are never read, duplicate to keep the stack uniform
                    pair_bases.append(jnp.stack([qb[0], qb[1], qb[0], qb[1]]))
                else:
                    # per-corner entries with the SAME quad hash (wraps mod
                    # T exactly like the packed rows' wrap pad)
                    single_entries.append(jnp.stack([
                        (qb[cx] + cy * _QUAD_SY + cz) % T
                        for (cx, cy, cz) in _CORNER_OFFSETS.tolist()
                    ]))
            elif self.pair_hash:
                # z-additive hash: (x*p0 ^ y*p1) + z mod T — z-pairs adjacent
                ux, uy = x0.astype(jnp.uint32), y0.astype(jnp.uint32)
                hx = (ux * jnp.uint32(_HASH_PRIMES[0]), (ux + 1) * jnp.uint32(_HASH_PRIMES[0]))
                hy = (uy * jnp.uint32(_HASH_PRIMES[1]), (uy + 1) * jnp.uint32(_HASH_PRIMES[1]))
                uz = z0.astype(jnp.uint32)
                base = [(((hx[cx] ^ hy[cy]) + uz) & jnp.uint32(T - 1)).astype(jnp.int32)
                        for cx in (0, 1) for cy in (0, 1)]
                if paired[l]:
                    pair_bases.append(jnp.stack(base))  # (4, B)
                else:
                    single_entries.append(jnp.stack(
                        [((b + cz) % T) for (_, _, cz), b in
                         zip(_CORNER_OFFSETS.tolist(), base * 2)]))
            else:
                ux, uy, uz = x0.astype(jnp.uint32), y0.astype(jnp.uint32), z0.astype(jnp.uint32)
                hx = (ux * jnp.uint32(_HASH_PRIMES[0]), (ux + 1) * jnp.uint32(_HASH_PRIMES[0]))
                hy = (uy * jnp.uint32(_HASH_PRIMES[1]), (uy + 1) * jnp.uint32(_HASH_PRIMES[1]))
                hz = (uz * jnp.uint32(_HASH_PRIMES[2]), (uz + 1) * jnp.uint32(_HASH_PRIMES[2]))
                single_entries.append(jnp.stack([
                    ((hx[cx] ^ hy[cy] ^ hz[cz]) & jnp.uint32(T - 1)).astype(jnp.int32)
                    for (cx, cy, cz) in _CORNER_OFFSETS.tolist()
                ]))

        w = jnp.stack(weights)  # (L, 8, B)

        if use_fused:
            pair_idx = jnp.stack(pair_bases)  # (L, 4, B)
            spec = ((L, T, F), jnp.dtype(gather_dtype).name,
                    tuple(int(v) for v in res), tuple(bool(v) for v in dense_ok),
                    tuple(not q for q in quad_lvls), tuple(quad_lvls))
            embed = _hash_lookup_fused(
                spec, table, pair_idx, jax.lax.stop_gradient(w))  # (F, L, B)
            embed = embed.transpose(2, 1, 0).reshape(B, L * F).astype(xyz.dtype)
            if self.include_input:
                return jnp.concatenate([xyz, embed], axis=-1)
            return embed

        if on_tpu:
            n_pair, n_single = sum(paired), L - sum(paired)
            pair_idx = (jnp.stack(pair_bases) if n_pair else
                        jnp.zeros((0, 4, B), jnp.int32))
            single_idx = (jnp.stack(single_entries) if n_single else
                          jnp.zeros((0, 8, B), jnp.int32))
            spec = ((L, T, F), jnp.dtype(gather_dtype).name,
                    tuple(int(v) for v in res), tuple(bool(v) for v in dense_ok),
                    tuple(paired), tuple(quad_lvls))
            feats = _hash_lookup_paired(spec, table, pair_idx, single_idx)  # (F, L, 8, B)
        else:
            # CPU/fallback: element-granularity gather (row forms serialize
            # there); identical entry math, corners expanded explicitly
            entries = []
            pi = si = 0
            for l in range(L):
                if paired[l]:
                    base = pair_bases[pi]
                    pi += 1
                    e0 = base
                    e1 = (base + 1) % T if not dense_ok[l] else base + 1
                    entries.append(jnp.concatenate([e0, e1], axis=0))
                else:
                    entries.append(single_entries[si])
                    si += 1
            entry_idx = jnp.stack(entries)  # (L, 8, B)
            level_off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None, None]
            flat_idx = (entry_idx + level_off).reshape(-1)
            table_t = table.reshape(L * T, F).T  # (F, L*T)
            feats = _gather_cols_f32(
                (table_t.shape, jnp.dtype(gather_dtype).name), table_t, flat_idx
            ).reshape(F, L, 8, B)

        embed = jnp.sum(feats * w[None], axis=2)  # (F, L, B)
        embed = embed.transpose(2, 1, 0).reshape(B, L * F).astype(xyz.dtype)

        if self.include_input:
            return jnp.concatenate([xyz, embed], axis=-1)
        return embed


@ENCODER_REGISTRY.register()
class DenseGridEmbedder(nn.Module):
    """Dense voxel grid of learnable features with trilinear interpolation
    (reference densegrid_encoder.py:11-140). Optional W_feat_sigma channels
    can act as a direct density head; optional sphere-sdf init on channel 0."""

    input_dim: int = 3
    n_grid: int = 128
    n_feat: int = 4
    origin: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    side: Any = None
    xyz_len: Any = None
    include_input: bool = True
    radius_init: Any = None  # if set, init channel 0 as sphere sdf of this radius
    dtype: Any = jnp.float32

    @property
    def out_dim(self):
        return self.n_feat + self.include_input * self.input_dim

    def get_output_dim(self):
        return self.out_dim

    def _aabb(self):
        assert self.side is not None or self.xyz_len is not None
        origin = np.asarray(self.origin, dtype=np.float32)
        xyz_len = (
            np.array([self.side] * 3, dtype=np.float32)
            if self.side is not None
            else np.asarray(self.xyz_len, dtype=np.float32)
        )
        return origin - xyz_len / 2.0, origin + xyz_len / 2.0

    def _init_grid(self, key, shape, dtype):
        feats = nn.initializers.normal(stddev=1e-2)(key, shape, dtype)
        if self.radius_init is not None:
            mn, mx = self._aabb()
            n1 = self.n_grid + 1
            axes = [np.linspace(mn[i], mx[i], n1) for i in range(3)]
            pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
            sdf = np.linalg.norm(pts, axis=-1) - float(self.radius_init)
            feats = feats.at[:, 0].set(jnp.asarray(sdf, dtype=dtype))
        return feats

    @nn.compact
    def __call__(self, xyz):
        """xyz (B, 3) -> (B, out_dim); zeros outside the volume."""
        n1 = self.n_grid + 1
        feats = self.param("grid", self._init_grid, (n1**3, self.n_feat), self.dtype)
        mn, mx = self._aabb()
        norm = (xyz - jnp.asarray(mn)) / jnp.asarray(mx - mn)
        pos = norm * self.n_grid  # (B, 3)
        valid = jnp.all((norm >= 0) & (norm <= 1.0), axis=-1)
        idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, self.n_grid - 1)
        frac = jnp.clip(pos - idx0.astype(pos.dtype), 0.0, 1.0)

        corners = idx0[:, None, :] + jnp.asarray(_CORNER_OFFSETS)[None]  # (B, 8, 3)
        flat = (corners[..., 0] * n1 + corners[..., 1]) * n1 + corners[..., 2]  # (B, 8)
        vals = feats[flat]  # (B, 8, F)
        off = jnp.asarray(_CORNER_OFFSETS, dtype=pos.dtype)
        w = jnp.prod(off[None] * frac[:, None, :] + (1 - off[None]) * (1 - frac[:, None, :]), axis=-1)  # (B, 8)
        out = jnp.sum(vals * w[..., None], axis=1)  # (B, F)
        out = jnp.where(valid[:, None], out, 0.0)
        if self.include_input:
            return jnp.concatenate([xyz, out], axis=-1)
        return out


@ENCODER_REGISTRY.register()
class CompositeEmbedder(nn.Module):
    """Sequential chain of sub-encoders (NSVF style: DenseGrid -> Freq).

    ``sub_encoder_cfgs``: tuple of dicts, each a sub-encoder config with
    ``type`` key (reference composite_encoder.py:11-44).
    """

    sub_encoder_cfgs: Sequence[Any] = ()

    @property
    def out_dim(self):
        dim = None
        for sub in self._build_subs():
            dim = sub.out_dim
        return dim

    def get_output_dim(self):
        return self.out_dim

    def _build_subs(self):
        from ...utils.registry import ENCODER_REGISTRY as REG

        subs = []
        for cfg in self.sub_encoder_cfgs:
            kwargs = dict(cfg)
            enc_type = kwargs.pop("type")
            subs.append(REG.get(enc_type)(**kwargs))
        return subs

    @nn.compact
    def __call__(self, x):
        for sub in self._build_subs():
            x = sub(x)
        return x
