"""Candidate-fix measurements for the r3 hot-path rework, side by side.

probe_hotpath.py located the waste (argsort compaction 281 ms, (B,N,3)
point layout 191 ms, threefry perturb 80 ms, cumprod marching bwd 100 ms,
radiance scatter layout 59 ms). This probe times each candidate
replacement at the same shapes so the rework commits only measured wins.

Run: cd /root/repo && python scripts/probe_hotpath2.py
"""

import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo (breaks axon plugin registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=5):
    import jax

    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def report(name, ms):
    print("{:42s} {:9.2f} ms".format(name, ms * 1e3), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    B, N = 32768, 128
    total = B * N
    budget = 1 << 18

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # ------------------------------------------------------------------ rng
    u_tf = jax.jit(lambda k: jax.random.uniform(k, (B, N)))
    report("uniform (32k,128) threefry", timed(u_tf, k1, iters=5))
    rbg_key = jax.random.key(0, impl="rbg")
    u_rbg = jax.jit(lambda k: jax.random.uniform(k, (B, N)))
    report("uniform (32k,128) rbg", timed(u_rbg, rbg_key, iters=5))

    # --------------------------------------------------------- SoA point math
    rays_o = jax.random.normal(k1, (B, 3)) * 0.1 + jnp.array([0.0, 0.0, 2.5])
    rays_d = jax.random.normal(k2, (B, 3)) * 0.08 + jnp.array([0.0, 0.0, -1.0])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    zvals = jnp.linspace(0.5, 4.0, N)[None, :] * jnp.ones((B, 1))

    def pts_soa(o, d, z):
        # three (B, N) planes: tile-clean, no (.., 3) minor-dim padding
        return tuple(o[:, a:a + 1] + z * d[:, a:a + 1] for a in range(3))

    report("pts SoA 3x(B,N)", timed(jax.jit(pts_soa), rays_o, rays_d, zvals, iters=5))
    xs, ys, zs = jax.jit(pts_soa)(rays_o, rays_d, zvals)

    # ----------------------------------------------- occupancy on SoA coords
    bitfield = jax.random.uniform(k3, (64, 64, 64)) < 0.15

    def occ_soa_row(x, y, z, bf):
        vs = 2.0 / 64
        ix = jnp.floor((x + 1.0) / vs).astype(jnp.int32)
        iy = jnp.floor((y + 1.0) / vs).astype(jnp.int32)
        iz = jnp.floor((z + 1.0) / vs).astype(jnp.int32)
        valid = (ix >= 0) & (ix < 64) & (iy >= 0) & (iy < 64) & (iz >= 0) & (iz < 64)
        flat = (jnp.clip(ix, 0, 63) * 64 + jnp.clip(iy, 0, 63)) * 64 + jnp.clip(iz, 0, 63)
        rows = bf.reshape(2048, 128).astype(jnp.uint8)
        fr = flat.reshape(-1)
        r = jnp.take(rows, fr >> 7, axis=0)  # (P, 128)
        lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
        hit = jnp.sum(jnp.where(lanes == (fr & 127)[:, None], r, 0), axis=1)
        return valid & (hit > 0).reshape(x.shape)

    report("occ SoA + row-form (end-to-end)", timed(jax.jit(occ_soa_row), xs, ys, zs, bitfield, iters=5))
    mask = jax.jit(occ_soa_row)(xs, ys, zs, bitfield)

    # ------------------------------------------- global-cumsum compaction sel
    def sel_global(m):
        row = jnp.cumsum(m.astype(jnp.int32), axis=1)  # (B, N)
        tot = row[:, -1]
        off = jnp.cumsum(tot) - tot  # (B,) exclusive
        C = (row + off[:, None]).reshape(-1)  # global inclusive cumsum, sorted
        kk = jnp.arange(budget, dtype=jnp.int32)
        src = jnp.searchsorted(C, kk + 1, side="left")
        sel_valid = kk < C[-1]
        return jnp.clip(src, 0, total - 1), sel_valid

    report("sel: global cumsum+ss (4.2M)", timed(jax.jit(sel_global), mask, iters=5))
    sel, sel_valid = jax.jit(sel_global)(mask)

    # parity vs the per-ray prefix form on a PREFIX mask
    from arcnerf_tpu.render.ray_helper import handle_valid_mask_zvals

    # ---------------------------------------------- next-valid delta pipeline
    def deltas_scattered(z, m):
        iota = jax.lax.broadcasted_iota(jnp.int32, (z.shape[0], N), 1)
        slot = jnp.where(m, iota, N + 1)
        # exclusive reverse cummin: next valid slot strictly after j
        rc = jnp.flip(jax.lax.cummin(jnp.flip(slot, 1), axis=1), 1)
        nv = jnp.concatenate([rc[:, 1:], jnp.full((z.shape[0], 1), N + 1, jnp.int32)], axis=1)
        has = nv <= N - 1
        znv = jnp.take_along_axis(z, jnp.clip(nv, 0, N - 1), axis=1)
        return jnp.where(m & has, znv - z, 0.0)

    report("scattered next-valid deltas", timed(jax.jit(deltas_scattered), zvals, mask, iters=5))

    # ------------------------------------------------ marching: cumprod vs log
    sigma = jnp.abs(jax.random.normal(k3, (B, N)))
    rad = jax.random.uniform(k4, (B, N, 3))
    deltas = jax.jit(deltas_scattered)(zvals, mask)

    def march_cumprod(s, r, dl, m):
        alpha = jnp.where(m, 1.0 - jnp.exp(-jax.nn.relu(s) * dl), 0.0)
        ones = jnp.ones_like(alpha[:, :1])
        trans = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)[:, :-1]
        w = alpha * trans
        return jnp.sum(w[..., None] * r, -2)

    def march_log(s, r, dl, m):
        alpha = jnp.where(m, 1.0 - jnp.exp(-jax.nn.relu(s) * dl), 0.0)
        logt = jnp.cumsum(jnp.log(1.0 - alpha + 1e-10), -1)
        trans = jnp.exp(jnp.concatenate([jnp.zeros_like(logt[:, :1]), logt[:, :-1]], -1))
        w = alpha * trans
        return jnp.sum(w[..., None] * r, -2)

    g_cp = jax.jit(jax.grad(lambda s, r: jnp.sum(march_cumprod(s, r, deltas, mask)), argnums=(0, 1)))
    g_lg = jax.jit(jax.grad(lambda s, r: jnp.sum(march_log(s, r, deltas, mask)), argnums=(0, 1)))
    report("march fwd+bwd cumprod", timed(g_cp, sigma, rad, iters=5))
    report("march fwd+bwd log-cumsum", timed(g_lg, sigma, rad, iters=5))
    a = march_cumprod(sigma, rad, deltas, mask)
    b = march_log(sigma, rad, deltas, mask)
    print("  parity cumprod vs log: {:.2e}".format(float(jnp.max(jnp.abs(a - b)))), flush=True)

    # ------------------------------------------------- scatter-back variants
    sigma_c = jax.random.normal(k1, (budget,))
    rad_c = jax.random.normal(k2, (budget, 3))
    sel_safe = jnp.where(sel_valid, sel, total)

    def sb_cur(sg, rd, ss):
        s_full = jnp.zeros((total + 1,)).at[ss].set(sg)[:total]
        r_full = jnp.zeros((total + 1, 3)).at[ss].set(rd)[:total]
        return s_full, r_full

    def sb_flat4(sg, rd, ss):
        s_full = jnp.zeros((total + 1,)).at[ss].set(sg)[:total]
        chans = [jnp.zeros((total + 1,)).at[ss].set(rd[:, c])[:total] for c in range(3)]
        return s_full, chans

    report("scatter-back (total,3) cur", timed(jax.jit(sb_cur), sigma_c, rad_c, sel_safe, iters=5))
    report("scatter-back 4x flat", timed(jax.jit(sb_flat4), sigma_c, rad_c, sel_safe, iters=5))

    v_cur = jax.jit(lambda sg, rd, ss: jax.vjp(lambda a_, b_: sb_cur(a_, b_, ss), sg, rd)[1](
        (jnp.ones((total,)), jnp.ones((total, 3)))))
    v_f4 = jax.jit(lambda sg, rd, ss: jax.vjp(lambda a_, b_: sb_flat4(a_, b_, ss), sg, rd)[1](
        (jnp.ones((total,)), [jnp.ones((total,))] * 3)))
    report("scatter-back vjp cur", timed(v_cur, sigma_c, rad_c, sel_safe, iters=5))
    report("scatter-back vjp 4x flat", timed(v_f4, sigma_c, rad_c, sel_safe, iters=5))

    # ---------------------------------------------------- raw gather floor
    L, T, F = 16, 1 << 19, 2
    epr = 128 // F
    K = 8 * budget
    rows_tbl = (jax.random.normal(k3, (L, T // epr, 128)) * 0.1).astype(jnp.bfloat16)
    ridx = jax.random.randint(k4, (L, K), 0, T // epr, dtype=jnp.int32)

    def raw_gather(rt, ri):
        acc = jnp.zeros((K,), jnp.float32)
        for l in range(L):
            r = jnp.take(rt[l], ri[l], axis=0)  # (K, 128) bf16
            acc = acc + jnp.sum(r, axis=1).astype(jnp.float32)  # cheap consumer
        return acc

    report("RAW row gather 33.5M (floor)", timed(jax.jit(raw_gather), rows_tbl, ridx, iters=3))

    def raw_gather_1shot(rt, ri):
        flat = rt.reshape(L * (T // epr), 128)
        off = (jnp.arange(L, dtype=jnp.int32) * (T // epr))[:, None]
        r = jnp.take(flat, (ri + off).reshape(-1), axis=0)
        return jnp.sum(r, axis=1).astype(jnp.float32)

    report("RAW row gather merged 1 take", timed(jax.jit(raw_gather_1shot), rows_tbl, ridx, iters=3))

    # ------------------------------------------- per-level index math variant
    from arcnerf_tpu.models.base_modules.encoding import _HASH_PRIMES

    pts_c = jax.random.uniform(k1, (budget, 3), minval=-0.99, maxval=0.99)
    res = np.array([int(np.ceil(16 * (np.exp(np.log(2048 / 16) / 15)) ** i - 1.0)) for i in range(16)],
                   dtype=np.int32)
    dense_ok = (res.astype(np.int64) + 1) ** 3 <= T

    def idx_vectorized(xyz):
        # the current encoder formulation: (L, 8, 3, B) intermediates
        from arcnerf_tpu.models.base_modules.encoding import _CORNER_OFFSETS

        norm = (xyz + 1.0) / 2.0
        res_j = jnp.asarray(res, dtype=xyz.dtype)
        pos = norm.T[None, :, :] * res_j[:, None, None]
        idx0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, jnp.asarray(res)[:, None, None] - 1)
        off = jnp.asarray(_CORNER_OFFSETS)
        corners = idx0[:, None, :, :] + off[None, :, :, None]  # (L, 8, 3, B)
        n1 = jnp.asarray(res + 1, dtype=jnp.int32)[:, None, None]
        dense_idx = (corners[:, :, 0] * n1 + corners[:, :, 1]) * n1 + corners[:, :, 2]
        u = corners.astype(jnp.uint32)
        hash_idx = ((u[:, :, 0] * jnp.uint32(_HASH_PRIMES[0]))
                    ^ (u[:, :, 1] * jnp.uint32(_HASH_PRIMES[1]))
                    ^ (u[:, :, 2] * jnp.uint32(_HASH_PRIMES[2]))) & jnp.uint32(T - 1)
        use_dense = jnp.asarray(dense_ok)[:, None, None]
        return jnp.where(use_dense, dense_idx % T, hash_idx.astype(jnp.int32))

    def idx_perlevel(xyz):
        # per-level loop, decomposed per-axis hashes: 6 multiplies per level,
        # (B,)-shaped intermediates only
        x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
        outs = []
        for l in range(16):
            r = float(res[l])
            px, py, pz = (x + 1.0) / 2.0 * r, (y + 1.0) / 2.0 * r, (z + 1.0) / 2.0 * r
            x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, res[l] - 1)
            y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, res[l] - 1)
            z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, res[l] - 1)
            if dense_ok[l]:
                n1 = int(res[l] + 1)
                ax = (x0 * (n1 * n1), (x0 + 1) * (n1 * n1))
                ay = (y0 * n1, (y0 + 1) * n1)
                az = (z0, z0 + 1)
                corners = [ax[cx] + ay[cy] + az[cz]
                           for cz in range(2) for cy in range(2) for cx in range(2)]
                outs.append(jnp.stack(corners) % T)
            else:
                ux, uy, uz = x0.astype(jnp.uint32), y0.astype(jnp.uint32), z0.astype(jnp.uint32)
                ax = (ux * jnp.uint32(_HASH_PRIMES[0]),
                      (ux + 1) * jnp.uint32(_HASH_PRIMES[0]))
                ay = (uy * jnp.uint32(_HASH_PRIMES[1]),
                      (uy + 1) * jnp.uint32(_HASH_PRIMES[1]))
                az = (uz * jnp.uint32(_HASH_PRIMES[2]),
                      (uz + 1) * jnp.uint32(_HASH_PRIMES[2]))
                corners = [((ax[cx] ^ ay[cy] ^ az[cz]) & jnp.uint32(T - 1)).astype(jnp.int32)
                           for cz in range(2) for cy in range(2) for cx in range(2)]
                outs.append(jnp.stack(corners))
        return jnp.stack(outs)  # (L, 8, B)

    report("hash index math: vectorized (cur)", timed(jax.jit(idx_vectorized), pts_c, iters=3))
    report("hash index math: per-level loop", timed(jax.jit(idx_perlevel), pts_c, iters=3))
    ia = jax.jit(idx_vectorized)(pts_c)
    ib = jax.jit(idx_perlevel)(pts_c)
    # corner order differs (z-outer vs x-inner); compare as sorted sets per level
    same = bool(jnp.all(jnp.sort(ia.reshape(16, -1), axis=1) == jnp.sort(ib.reshape(16, -1), axis=1)))
    print("  index parity (set-wise): {}".format(same), flush=True)


if __name__ == "__main__":
    main()
