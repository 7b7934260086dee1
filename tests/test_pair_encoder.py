"""Pair-coalesced hashgrid lookup parity (r3 encoder rework).

The TPU path groups levels into PAIRED (one row gather serves both
z-corners of an (x, y) pair — exact for dense levels) and SINGLE
(per-corner gathers). These tests run the paired op's jnp graph on CPU
and pin it against the element-form gather: identical values and
bit-identical f32 gradient accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arcnerf_tpu.models.base_modules.encoding import (
    HashGridEmbedder,
    _hash_lookup_paired,
)


def _mixed_case(seed=0, L=4, T=1 << 10, F=2, B=64):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(L, T, F)).astype(np.float32) * 0.1)
    res = (7, 9, 40, 80)  # levels 0/1 dense ((r+1)^3 <= T), 2/3 hashed
    dense_ok = tuple((np.asarray(res) + 1) ** 3 <= T)
    assert dense_ok == (True, True, False, False)
    # paired levels: the two dense ones; hashed stay single
    pair_bases = []
    for l in range(2):
        n_entry = (res[l] + 1) ** 3
        pair_bases.append(rng.integers(0, n_entry - 1, size=(4, B)))
    pair_idx = jnp.asarray(np.stack(pair_bases), dtype=jnp.int32)
    single_idx = jnp.asarray(rng.integers(0, T, size=(2, 8, B)), dtype=jnp.int32)
    spec = ((L, T, F), "float32", res, dense_ok, False)
    return spec, table, pair_idx, single_idx


def _reference_feats(spec, table, pair_idx, single_idx):
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    feats = np.zeros((F, L, 8, B), np.float32)
    tbl = np.asarray(table)
    pi = si = 0
    for l in range(L):
        if dense_ok[l]:
            base = np.asarray(pair_idx[pi])
            pi += 1
            for c in range(8):
                e = base[c % 4] + (1 if c >= 4 else 0)
                feats[:, l, c] = tbl[l, e].T
        else:
            e = np.asarray(single_idx[si])
            si += 1
            for c in range(8):
                feats[:, l, c] = tbl[l, e[c]].T
    return feats


def test_paired_lookup_values():
    spec, table, pair_idx, single_idx = _mixed_case()
    out = _hash_lookup_paired(spec, table, pair_idx, single_idx)
    ref = _reference_feats(spec, table, pair_idx, single_idx)
    np.testing.assert_allclose(np.asarray(out), ref, atol=0, rtol=0)


def test_paired_lookup_grads_exact():
    spec, table, pair_idx, single_idx = _mixed_case(seed=3)
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(F, L, 8, B)).astype(np.float32))

    def loss(t):
        return jnp.sum(_hash_lookup_paired(spec, t, pair_idx, single_idx) * g)

    grad = jax.grad(loss)(table)

    # element-form reference gradient: exact scatter-add
    ref = np.zeros((L, T, F), np.float32)
    gn = np.asarray(g)
    pi = si = 0
    for l in range(L):
        if dense_ok[l]:
            base = np.asarray(pair_idx[pi]); pi += 1
            for c in range(8):
                e = base[c % 4] + (1 if c >= 4 else 0)
                for f in range(F):
                    np.add.at(ref[l, :, f], e, gn[f, l, c])
        else:
            e = np.asarray(single_idx[si]); si += 1
            for c in range(8):
                for f in range(F):
                    np.add.at(ref[l, :, f], e[c], gn[f, l, c])
    np.testing.assert_allclose(np.asarray(grad), ref, rtol=1e-6, atol=1e-6)


def test_paired_wrap_hashed_level():
    """pair_hash mode: hashed pairs may wrap T-1 -> 0; the overlap-row wrap
    pad and its backward fold must route values/grads to entry 0."""
    L, T, F, B = 1, 256, 2, 8
    table = jnp.asarray(np.random.default_rng(0).normal(size=(L, T, F)).astype(np.float32))
    spec = ((L, T, F), "float32", (1024,), (False,), True)  # hashed + paired
    base = jnp.full((1, 4, B), T - 1, dtype=jnp.int32)  # every pair wraps
    single = jnp.zeros((0, 8, B), jnp.int32)
    out = _hash_lookup_paired(spec, table, base, single)
    # z0 corners read entry T-1, z1 corners read entry 0 (wrap)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0]), np.asarray(table[0, T - 1]))
    np.testing.assert_allclose(np.asarray(out[:, 0, 4, 0]), np.asarray(table[0, 0]))

    g = jnp.ones((F, L, 8, B), jnp.float32)
    grad = jax.grad(lambda t: jnp.sum(_hash_lookup_paired(spec, t, base, single) * g))(table)
    gn = np.asarray(grad[0])
    assert gn[T - 1, 0] == 4 * B  # 4 z0 corners x B points
    assert gn[0, 0] == 4 * B  # wrap fold: 4 z1 corners x B points
    assert np.count_nonzero(gn) == 2 * F


def test_embedder_cpu_golden_unchanged():
    """With pair_hash=False the per-level CPU index math must reproduce the
    original vectorized formulation exactly (same xor hash, same dense
    layout). pair_hash=True (the r3 default, quality-gated on TPU) swaps
    hashed levels to the z-additive hash and is covered by
    test_pair_hash_default_changes_hashed_levels below."""
    enc = HashGridEmbedder(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
                           max_res=64, side=2.0, include_input=False, pair_hash=False,
                           quad_hash=False)
    xyz = jnp.asarray(np.random.default_rng(5).uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), xyz)
    out = enc.apply(v, xyz)
    assert out.shape == (32, 8)
    # golden: recompute with the original (L, 8, 3, B) vectorized math
    import math as _math

    from arcnerf_tpu.models.base_modules.encoding import _CORNER_OFFSETS, _HASH_PRIMES

    table = np.asarray(v["params"]["embeddings"])
    L, T, F = table.shape
    scale = _math.exp(_math.log(64 / 4) / 3)
    res = np.array([int(np.ceil(4 * scale**i - 1.0)) for i in range(4)])
    dense_ok = (res.astype(np.int64) + 1) ** 3 <= T
    x = np.asarray(xyz)
    normp = (x + 1.0) / 2.0
    ref = np.zeros((32, 8), np.float32)
    for l in range(L):
        pos = normp * res[l]
        i0 = np.clip(np.floor(pos).astype(np.int64), 0, res[l] - 1)
        frac = pos - i0
        acc = np.zeros((32, F), np.float32)
        for c, off in enumerate(_CORNER_OFFSETS):
            corner = i0 + off
            if dense_ok[l]:
                n1 = res[l] + 1
                e = (corner[:, 0] * n1 + corner[:, 1]) * n1 + corner[:, 2]
            else:
                u = corner.astype(np.uint32)
                e = ((u[:, 0] * np.uint32(_HASH_PRIMES[0]))
                     ^ (u[:, 1] * np.uint32(_HASH_PRIMES[1]))
                     ^ (u[:, 2] * np.uint32(_HASH_PRIMES[2]))) & np.uint32(T - 1)
            w = np.prod(off * frac + (1 - off) * (1 - frac), axis=1)
            acc += table[l, e.astype(np.int64)] * w[:, None]
        ref[:, l * F:(l + 1) * F] = acc
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-6)


def test_pair_hash_default_changes_hashed_levels():
    """The default encoder (pair_hash=True) must differ from the classic
    xor hash ONLY on hashed levels: dense-level features (and the trilinear
    weights) are hash-free, so a dense-only encoder must match exactly."""
    kw = dict(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
              max_res=64, side=2.0, include_input=False)
    xyz = jnp.asarray(np.random.default_rng(5).uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32))

    enc_zadd = HashGridEmbedder(**kw, quad_hash=False)
    enc_xor = HashGridEmbedder(**kw, pair_hash=False, quad_hash=False)
    v = enc_zadd.init(jax.random.PRNGKey(0), xyz)
    out_zadd = enc_zadd.apply(v, xyz)
    out_xor = enc_xor.apply(v, xyz)
    # levels 2/3 are hashed at T=1024 (res 16, 40, 64) -> must differ
    assert not np.allclose(np.asarray(out_zadd[:, 4:]), np.asarray(out_xor[:, 4:]))

    # dense-only config (T covers (res+1)^3): identical regardless of flag
    kw_dense = dict(n_levels=2, n_feat_per_entry=2, hashmap_size=12, base_res=4,
                    max_res=8, side=2.0, include_input=False)
    enc_a = HashGridEmbedder(**kw_dense)
    enc_b = HashGridEmbedder(**kw_dense, pair_hash=False)
    vd = enc_a.init(jax.random.PRNGKey(1), xyz)
    np.testing.assert_allclose(np.asarray(enc_a.apply(vd, xyz)),
                               np.asarray(enc_b.apply(vd, xyz)), atol=0, rtol=0)


# ------------------------------------------------ fused-interp lookup (r3b)

def _all_paired_case(seed=0, L=4, T=1 << 10, F=2, B=64):
    """All levels paired (dense z-adjacent or z-additive hash)."""
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(L, T, F)).astype(np.float32) * 0.1)
    res = (7, 9, 40, 80)
    dense_ok = tuple((np.asarray(res) + 1) ** 3 <= T)
    pair_bases = []
    for l in range(L):
        n_entry = (res[l] + 1) ** 3 if dense_ok[l] else T
        pair_bases.append(rng.integers(0, n_entry - 1, size=(4, B)))
    pair_idx = jnp.asarray(np.stack(pair_bases), dtype=jnp.int32)
    w = jnp.asarray(rng.random(size=(L, 8, B)).astype(np.float32))
    spec = ((L, T, F), "float32", res, dense_ok, True)
    return spec, table, pair_idx, w


def _reference_fused(spec, table, pair_idx, w):
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    tbl = np.asarray(table)
    wn = np.asarray(w)
    out = np.zeros((F, L, B), np.float32)
    for l in range(L):
        n_entry = (res[l] + 1) ** 3 if dense_ok[l] else T
        base = np.asarray(pair_idx[l])  # (4, B)
        for c in range(8):
            e = base[c % 4] + (1 if c >= 4 else 0)
            e = np.where(e >= n_entry, e - n_entry, e)  # hashed wrap
            out[:, l] += tbl[l, e].T * wn[l, c][None]
    return out


def test_fused_lookup_values():
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w = _all_paired_case()
    out = _hash_lookup_fused(spec, table, pair_idx, w)
    ref = _reference_fused(spec, table, pair_idx, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_fused_lookup_matches_unfused_composition():
    """fused(table, idx, w) == sum_c paired_feats * w — same math, one op."""
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w = _all_paired_case(seed=11)
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    single = jnp.zeros((0, 8, B), jnp.int32)
    feats = _hash_lookup_paired(spec, table, pair_idx, single)  # (F, L, 8, B)
    ref = jnp.sum(feats * w[None], axis=2)
    out = _hash_lookup_fused(spec, table, pair_idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_fused_lookup_table_grad_exact():
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w = _all_paired_case(seed=3)
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(F, L, B)).astype(np.float32))

    grad = jax.grad(lambda t: jnp.sum(_hash_lookup_fused(spec, t, pair_idx, w) * g))(table)

    ref = np.zeros((L, T, F), np.float32)
    gn, wn = np.asarray(g), np.asarray(w)
    for l in range(L):
        n_entry = (res[l] + 1) ** 3 if dense_ok[l] else T
        base = np.asarray(pair_idx[l])
        for c in range(8):
            e = base[c % 4] + (1 if c >= 4 else 0)
            e = np.where(e >= n_entry, e - n_entry, e)
            for f in range(F):
                np.add.at(ref[l, :, f], e, gn[f, l] * wn[l, c])
    np.testing.assert_allclose(np.asarray(grad), ref, rtol=1e-5, atol=1e-6)


def test_fused_lookup_w_grad_is_zero():
    """The fused op's gradient contract: zero cotangent wrt w."""
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w = _all_paired_case(seed=5)
    gw = jax.grad(lambda ww: jnp.sum(_hash_lookup_fused(spec, table, pair_idx, ww) ** 2))(w)
    assert float(jnp.abs(gw).max()) == 0.0


def test_embedder_fused_matches_unfused(monkeypatch):
    """Full embedder on the (forced) TPU path: fuse_interp=True output must
    equal fuse_interp=False output exactly (same entries, same weights)."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
              max_res=64, side=2.0, include_input=True)
    xyz = jnp.asarray(np.random.default_rng(5).uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    enc_f = enc_mod.HashGridEmbedder(**kw)
    enc_u = enc_mod.HashGridEmbedder(**kw, fuse_interp=False)
    v = enc_f.init(jax.random.PRNGKey(0), xyz)
    out_f = enc_f.apply(v, xyz)
    out_u = enc_u.apply(v, xyz)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), rtol=1e-6, atol=1e-6)

    # table grads agree too
    gf = jax.grad(lambda p: jnp.sum(enc_f.apply(p, xyz) ** 2))(v)["params"]["embeddings"]
    gu = jax.grad(lambda p: jnp.sum(enc_u.apply(p, xyz) ** 2))(v)["params"]["embeddings"]
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu), rtol=1e-5, atol=1e-6)


def test_sdf_geo_net_disables_fusion():
    """build_geo_model(needs_input_grad=True) must set fuse_interp=False on
    a hashgrid encoder so autodiff normals see the interpolation weights."""
    from arcnerf_tpu.models.base_modules import build_geo_model

    cfg = {"type": "GeoNet", "W": 16, "D": 1, "W_feat": 0, "skips": [],
           "encoder": {"type": "HashGridEmbedder", "n_levels": 2, "hashmap_size": 10,
                       "base_res": 4, "max_res": 8, "side": 2.0}}
    net = build_geo_model(cfg, needs_input_grad=True)
    assert net.encoder["fuse_interp"] is False
    net2 = build_geo_model(cfg)
    assert "fuse_interp" not in net2.encoder  # field default (True) applies


def test_fused_lookup_chunked_matches_single_shot(monkeypatch):
    """Above _FUSED_CHUNK_ROWS the fused op processes the flat index stream
    in lax.map/scan chunks (the unchunked gather output is (L*4B, 128) —
    32 GB at the recipe's 128^3 occupancy eval). Values and table grads
    must match the single-shot form exactly, including the padded tail."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod

    spec, table, pair_idx, w = _all_paired_case(seed=21, B=48)  # N = 4*4*48 = 768
    rng = np.random.default_rng(13)
    g = jnp.asarray(rng.normal(size=(2, 4, 48)).astype(np.float32))

    out1 = enc_mod._hash_lookup_fused(spec, table, pair_idx, w)
    gr1 = jax.grad(lambda t: jnp.sum(enc_mod._hash_lookup_fused(spec, t, pair_idx, w) * g))(table)

    monkeypatch.setattr(enc_mod, "_FUSED_CHUNK_ROWS", 100)  # 768 -> 8 chunks of 96
    out2 = enc_mod._hash_lookup_fused(spec, table, pair_idx, w)
    gr2 = jax.grad(lambda t: jnp.sum(enc_mod._hash_lookup_fused(spec, t, pair_idx, w) * g))(table)

    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gr2), np.asarray(gr1), rtol=1e-6, atol=1e-6)

    monkeypatch.setattr(enc_mod, "_FUSED_CHUNK_ROWS", 96)  # exact division, no pad
    out3 = enc_mod._hash_lookup_fused(spec, table, pair_idx, w)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out1), rtol=1e-6, atol=1e-6)


def test_fused_mm_bwd_matches_scatter(monkeypatch):
    """The one-hot-matmul coarse-level backward (_MM_BWD_MAX_R /
    ARCNERF_MM_BWD) must reproduce the exact row scatter-add: force each
    path via the threshold and compare (CPU f32 matmuls are exact up to
    summation order)."""
    import arcnerf_tpu.models.base_modules.encoding as enc

    spec, table, pair_idx, w = _all_paired_case(seed=11)
    (L, T, F), _, _, _, _ = spec
    B = pair_idx.shape[2]
    g = jnp.asarray(np.random.default_rng(13).normal(size=(F, L, B)).astype(np.float32))

    def loss(t):
        return jnp.sum(enc._hash_lookup_fused(spec, t, pair_idx, w) * g)

    monkeypatch.setattr(enc, "_MM_BWD_MAX_R", 0)
    g_scatter = jax.grad(loss)(table)
    monkeypatch.setattr(enc, "_MM_BWD_MAX_R", 1 << 30)
    g_mm = jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_scatter), rtol=1e-5, atol=1e-6)


# ------------------------------------------------ quad-coalesced lookup (r4)

def _quad_case(seed=0, L=4, T=1 << 10, F=2, B=64):
    """2 dense pair levels + 2 hashed QUAD levels (6-field spec)."""
    from arcnerf_tpu.models.base_modules.encoding import _QUAD_SY

    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(L, T, F)).astype(np.float32) * 0.1)
    res = (7, 9, 40, 80)
    dense_ok = tuple(bool(v) for v in (np.asarray(res) + 1) ** 3 <= T)
    quad = tuple(not d for d in dense_ok)
    bases = []
    for l in range(L):
        if dense_ok[l]:
            n_entry = (res[l] + 1) ** 3
            bases.append(rng.integers(0, n_entry - 1, size=(4, B)))
        else:
            qb = rng.integers(0, T, size=(2, B))  # x-corner quad bases
            bases.append(np.stack([qb[0], qb[1], qb[0], qb[1]]))
    pair_idx = jnp.asarray(np.stack(bases), dtype=jnp.int32)
    w = jnp.asarray(rng.random(size=(L, 8, B)).astype(np.float32))
    spec = ((L, T, F), "float32", res, dense_ok,
            tuple(not q for q in quad), quad)
    return spec, table, pair_idx, w, _QUAD_SY


def _reference_fused_quad(spec, table, pair_idx, w, sy):
    """Element-form reference honoring the quad corner addressing:
    corner (cx, cy, cz) of a quad level reads (qb[cx] + cy*sy + cz) % T."""
    (L, T, F), _, res, dense_ok, _, quad = spec
    B = pair_idx.shape[2]
    tbl, wn = np.asarray(table), np.asarray(w)
    out = np.zeros((F, L, B), np.float32)
    corners = [(cx, cy, cz) for cz in (0, 1) for cx in (0, 1) for cy in (0, 1)]
    for l in range(L):
        base = np.asarray(pair_idx[l])
        for c, (cx, cy, cz) in enumerate(corners):
            if quad[l]:
                e = (base[cx] + cy * sy + cz) % T
            else:
                n_entry = (res[l] + 1) ** 3 if dense_ok[l] else T
                e = base[cz * 0 + cx * 2 + cy] + (1 if cz else 0)
                e = np.where(e >= n_entry, e - n_entry, e)
            out[:, l] += tbl[l, e].T * wn[l, c][None]
    return out


def test_fused_quad_lookup_values():
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w, sy = _quad_case()
    out = _hash_lookup_fused(spec, table, pair_idx, w)
    ref = _reference_fused_quad(spec, table, pair_idx, w, sy)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_fused_quad_table_grad_exact():
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w, sy = _quad_case(seed=3)
    (L, T, F), _, res, dense_ok, _, quad = spec
    B = pair_idx.shape[2]
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=(F, L, B)).astype(np.float32))
    grad = jax.grad(lambda t: jnp.sum(_hash_lookup_fused(spec, t, pair_idx, w) * g))(table)

    ref = np.zeros((L, T, F), np.float32)
    gn, wn = np.asarray(g), np.asarray(w)
    corners = [(cx, cy, cz) for cz in (0, 1) for cx in (0, 1) for cy in (0, 1)]
    for l in range(L):
        base = np.asarray(pair_idx[l])
        for c, (cx, cy, cz) in enumerate(corners):
            if quad[l]:
                e = (base[cx] + cy * sy + cz) % T
            else:
                n_entry = (res[l] + 1) ** 3 if dense_ok[l] else T
                e = base[cx * 2 + cy] + (1 if cz else 0)
                e = np.where(e >= n_entry, e - n_entry, e)
            for f in range(F):
                np.add.at(ref[l, :, f], e, gn[f, l] * wn[l, c])
    np.testing.assert_allclose(np.asarray(grad), ref, rtol=1e-5, atol=1e-6)


def test_embedder_quad_fused_matches_unfused(monkeypatch):
    """quad_hash=True end-to-end: the fused path (quad rows) must equal the
    non-fused path (8-corner single entries, same quad hash) exactly —
    values AND table grads. Also covers that quad_hash traces at all with
    pair_hash left at its default (regression: the spec used to mark quad
    levels paired and statically indexed pair_idx out of bounds)."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
              max_res=64, side=2.0, include_input=True, quad_hash=True)
    xyz = jnp.asarray(np.random.default_rng(5).uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    enc_f = enc_mod.HashGridEmbedder(**kw)
    enc_u = enc_mod.HashGridEmbedder(**kw, fuse_interp=False)
    v = enc_f.init(jax.random.PRNGKey(0), xyz)
    out_f = enc_f.apply(v, xyz)
    out_u = enc_u.apply(v, xyz)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u), rtol=1e-6, atol=1e-6)
    gf = jax.grad(lambda p: jnp.sum(enc_f.apply(p, xyz) ** 2))(v)["params"]["embeddings"]
    gu = jax.grad(lambda p: jnp.sum(enc_u.apply(p, xyz) ** 2))(v)["params"]["embeddings"]
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gu), rtol=1e-5, atol=1e-6)


def test_embedder_quad_cpu_fallback_consistent(monkeypatch):
    """The CPU element path must read a quad-hash table with the SAME quad
    hash the TPU paths trained it with (backend-independent semantics)."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod

    kw = dict(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
              max_res=64, side=2.0, include_input=True, quad_hash=True)
    xyz = jnp.asarray(np.random.default_rng(5).uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    enc = enc_mod.HashGridEmbedder(**kw)
    v = enc.init(jax.random.PRNGKey(0), xyz)
    out_cpu = enc.apply(v, xyz)  # real backend: cpu element path
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out_tpu = enc.apply(v, xyz)  # fused quad path (jnp graph runs on cpu)
    np.testing.assert_allclose(np.asarray(out_cpu), np.asarray(out_tpu), rtol=1e-6, atol=1e-6)


def test_lane_form_direct_matches_slot(monkeypatch):
    """The direct-lane construction form (masks + update built on the
    native (n, 128) row layout, ARCNERF_LANE_FORM=direct) must reproduce
    the slot form's fused-lookup values and table gradients — same math,
    different reduction layout (tolerance covers reduce-order float
    association)."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod
    from arcnerf_tpu.models.base_modules.encoding import _hash_lookup_fused

    spec, table, pair_idx, w = _all_paired_case(seed=13)
    (L, T, F), _, res, dense_ok, _ = spec
    B = pair_idx.shape[2]
    g = jnp.asarray(np.random.default_rng(3).normal(size=(F, L, B)).astype(np.float32))

    def run():
        out = _hash_lookup_fused(spec, table, pair_idx, w)
        grad = jax.grad(
            lambda t: jnp.sum(_hash_lookup_fused(spec, t, pair_idx, w) * g))(table)
        return np.asarray(out), np.asarray(grad)

    monkeypatch.setattr(enc_mod, "_LANE_FORM", "slot")
    out_s, grad_s = run()
    monkeypatch.setattr(enc_mod, "_LANE_FORM", "direct")
    out_d, grad_d = run()
    np.testing.assert_allclose(out_d, out_s, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(grad_d, grad_s, rtol=1e-5, atol=1e-6)


def test_lane_form_direct_embedder_quad_levels(monkeypatch):
    """Direct lane form through the FULL embedder (quad-hash levels
    included — their lane offsets exercise the multi-corner masks) must
    match the slot form's output and table grad."""
    import arcnerf_tpu.models.base_modules.encoding as enc_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(n_levels=4, n_feat_per_entry=2, hashmap_size=10, base_res=4,
              max_res=64, side=2.0)
    xyz = jnp.asarray(np.random.default_rng(9).uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    enc = enc_mod.HashGridEmbedder(**kw)
    v = enc.init(jax.random.PRNGKey(0), xyz)

    monkeypatch.setattr(enc_mod, "_LANE_FORM", "slot")
    out_s = np.asarray(enc.apply(v, xyz))
    g_s = np.asarray(jax.grad(lambda p: jnp.sum(enc.apply(p, xyz) ** 2))(v)["params"]["embeddings"])
    monkeypatch.setattr(enc_mod, "_LANE_FORM", "direct")
    out_d = np.asarray(enc.apply(v, xyz))
    g_d = np.asarray(jax.grad(lambda p: jnp.sum(enc.apply(p, xyz) ** 2))(v)["params"]["embeddings"])
    np.testing.assert_allclose(out_d, out_s, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g_d, g_s, rtol=1e-5, atol=1e-6)
