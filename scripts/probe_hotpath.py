"""Per-stage timing of the NGP hot path at bench shapes (r3).

Times each stage of the train step as its OWN jitted dispatch on the real
backend, at the bench workload (32768 rays x 128 samples, 64^3 occupancy
grid, 2^18 compaction budget, L=16 T=2^19 F=2 bf16 hashgrid), to locate
the ~700 ms/step of non-encoder work the r2 bisection left unprofiled
below one-line labels. Also measures candidate replacements side by side
(row-form occupancy gather, sort-free compaction) before committing them.

Run: cd /root/repo && python scripts/probe_hotpath.py [--rays 32768]
"""

import argparse
import os
import sys
import time

import numpy as np

# NOTE: do NOT run with PYTHONPATH=/root/repo — a set PYTHONPATH breaks the
# axon TPU-tunnel plugin registration ('axon' missing from known backends).
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
    print("{:38s} {:9.2f} ms".format(name, ms * 1e3), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--n-sample", type=int, default=128)
    ap.add_argument("--budget", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from arcnerf_tpu.geometry.ray import get_ray_points_by_zvals
    from arcnerf_tpu.geometry.volume import Volume
    from arcnerf_tpu.render.ray_helper import (
        get_zvals_from_near_far_fix_step,
        handle_valid_mask_zvals,
        ray_marching,
    )

    print("backend:", jax.default_backend(), flush=True)
    B, N, budget = args.rays, args.n_sample, args.budget
    total = B * N
    it = args.iters

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    vol = Volume(n_grid=64, origin=(0.0, 0.0, 0.0), side=2.0)
    # rays through the volume, like the bench scene
    rays_o = jax.random.normal(k1, (B, 3)) * 0.1 + jnp.array([0.0, 0.0, 2.5])
    rays_d = jax.random.normal(k2, (B, 3)) * 0.08 + jnp.array([0.0, 0.0, -1.0])
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    # ~50% occupied voxels
    bitfield = jax.random.uniform(k3, (64, 64, 64)) < 0.15

    # ---------------------------------------------------------------- stage 1
    aabb = jax.jit(lambda o, d: vol.ray_volume_intersection(o, d)[0])
    report("aabb intersection ({} rays)".format(B), timed(aabb, rays_o, rays_d, iters=it))

    near, far, _, mask_rays = jax.jit(lambda o, d: vol.ray_volume_intersection(o, d))(rays_o, rays_d)
    fix_t = vol.get_diag_len() / N

    zfix = jax.jit(lambda n, f, k: get_zvals_from_near_far_fix_step(n, f, fix_t, N, key=k))
    report("fix-step zvals + perturb", timed(zfix, near, far, k4, iters=it))
    zvals, mask_step = zfix(near, far, k4)

    pts_fn = jax.jit(lambda o, d, z: get_ray_points_by_zvals(o, d, z).reshape(-1, 3))
    report("pts = o + z*d ({}x{})".format(B, N), timed(pts_fn, rays_o, rays_d, zvals, iters=it))
    pts = pts_fn(rays_o, rays_d, zvals)

    # ------------------------------------------------- occupancy check forms
    occ_cur = jax.jit(lambda p, bf: vol.check_pts_in_occ_voxel(p, bf))
    report("occ check: current 3d-index gather", timed(occ_cur, pts, bitfield, iters=it))

    def occ_flat(p, bf):
        voxel_idx, valid = vol.get_voxel_idx_from_xyz(p)
        safe = jnp.clip(voxel_idx, 0, 63)
        flat = (safe[:, 0] * 64 + safe[:, 1]) * 64 + safe[:, 2]
        return valid & jnp.take(bf.reshape(-1), flat)

    report("occ check: flat take", timed(jax.jit(occ_flat), pts, bitfield, iters=it))

    def occ_row(p, bf):
        # row-form: (2048, 128) uint8 rows; gather row flat>>7, extract lane
        voxel_idx, valid = vol.get_voxel_idx_from_xyz(p)
        safe = jnp.clip(voxel_idx, 0, 63)
        flat = (safe[:, 0] * 64 + safe[:, 1]) * 64 + safe[:, 2]
        rows = bf.reshape(2048, 128).astype(jnp.uint8)
        r = jnp.take(rows, flat >> 7, axis=0)  # (P, 128)
        lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
        hit = jnp.sum(jnp.where(lanes == (flat & 127)[:, None], r, 0), axis=1)
        return valid & (hit > 0)

    report("occ check: row-form u8", timed(jax.jit(occ_row), pts, bitfield, iters=it))

    def occ_dot(p, bf):
        # (B, N) points of one ray are coherent: check via per-ray slab walk?
        # simpler candidate: bitfield as f32 + trilinear-nearest via matmul is
        # overkill; instead try int32-packed bits + flat take of words
        voxel_idx, valid = vol.get_voxel_idx_from_xyz(p)
        safe = jnp.clip(voxel_idx, 0, 63)
        flat = (safe[:, 0] * 64 + safe[:, 1]) * 64 + safe[:, 2]
        words = jnp.sum(
            bf.reshape(-1, 32).astype(jnp.uint32) << jnp.arange(32, dtype=jnp.uint32)[None], axis=1
        )  # (8192,) packed
        w = jnp.take(words, flat >> 5)
        bit = (w >> (flat.astype(jnp.uint32) & 31)) & 1
        return valid & (bit > 0)

    report("occ check: packed-word take", timed(jax.jit(occ_dot), pts, bitfield, iters=it))

    in_occ = occ_cur(pts, bitfield).reshape(B, N)
    mask_pts_raw = mask_step & in_occ

    # ------------------------------------------------------ compaction forms
    hv_cur = jax.jit(handle_valid_mask_zvals)
    report("zvals left-compact: argsort (cur)", timed(hv_cur, zvals, mask_pts_raw, iters=it))

    def hv_cumsum(z, m):
        # sort-free left-compaction: output slot k takes the (k+1)-th valid
        csum = jnp.cumsum(m.astype(jnp.int32), axis=1)  # (B, N) inclusive
        kk = jnp.arange(1, N + 1)[None, :]
        src = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="left"))(csum, jnp.broadcast_to(kk, (z.shape[0], N)))
        src = jnp.clip(src, 0, N - 1)
        zs = jnp.take_along_axis(z, src, axis=1)
        n_valid = csum[:, -1]
        ms = kk <= n_valid[:, None]
        last = jnp.take_along_axis(zs, jnp.maximum(n_valid - 1, 0)[:, None], axis=1)
        zo = jnp.where(ms, zs, last)
        zo = jnp.where((n_valid == 0)[:, None], 0.0, zo)
        return zo, ms

    report("zvals left-compact: cumsum+ss", timed(jax.jit(hv_cumsum), zvals, mask_pts_raw, iters=it))

    z_cur, m_cur = hv_cur(zvals, mask_pts_raw)
    z_new, m_new = jax.jit(hv_cumsum)(zvals, mask_pts_raw)
    print("  compaction parity: zvals {} mask {}".format(
        float(jnp.max(jnp.abs(z_cur - z_new))), bool(jnp.all(m_cur == m_new))), flush=True)

    zvals_c, mask_pts = z_cur, m_cur

    # -------------------------------------------------------- point-budget sel
    def sel_math(m):
        n_valid = jnp.sum(m, axis=1)
        offsets = jnp.cumsum(n_valid) - n_valid
        kk = jnp.arange(budget)
        ray_id = jnp.clip(jnp.searchsorted(offsets, kk, side="right") - 1, 0, B - 1)
        slot = jnp.clip(kk - offsets[ray_id], 0, N - 1)
        return ray_id * N + slot, kk < (offsets[-1] + n_valid[-1])

    report("budget sel math (cumsum+ss)", timed(jax.jit(sel_math), mask_pts, iters=it))
    sel, sel_valid = jax.jit(sel_math)(mask_pts)

    gather_pts = jax.jit(lambda p, s: (p[s], p[s]))
    report("pts[sel]+dirs[sel] gather", timed(gather_pts, pts, sel, iters=it))

    sigma_c = jax.random.normal(k1, (budget,))
    rad_c = jax.random.normal(k2, (budget, 3))
    sel_safe = jnp.where(sel_valid, sel, total)

    def scatter_back(sg, rd, ss):
        s_full = jnp.zeros((total + 1,)).at[ss].set(sg)[:total]
        r_full = jnp.zeros((total + 1, 3)).at[ss].set(rd)[:total]
        return s_full, r_full

    report("scatter-back .at[sel].set", timed(jax.jit(scatter_back), sigma_c, rad_c, sel_safe, iters=it))

    sb_vjp = jax.jit(lambda sg, rd, ss: jax.vjp(lambda a, b: scatter_back(a, b, ss), sg, rd)[1](
        (jnp.ones((total,)), jnp.ones((total, 3)))))
    report("scatter-back vjp (gather)", timed(sb_vjp, sigma_c, rad_c, sel_safe, iters=it))

    # ------------------------------------------------------------ ray marching
    sigma_full = jnp.abs(jax.random.normal(k3, (B, N)))
    rad_full = jax.random.uniform(k4, (B, N, 3))

    march = jax.jit(lambda s, r, z: ray_marching(s, r, z)["rgb"])
    report("ray marching fwd", timed(march, sigma_full, rad_full, zvals_c, iters=it))

    march_g = jax.jit(jax.grad(lambda s, r, z: jnp.sum(ray_marching(s, r, z)["rgb"])))
    report("ray marching fwd+bwd", timed(march_g, sigma_full, rad_full, zvals_c, iters=it))

    # ------------------------------------------------------------ encoder ref
    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder

    enc = HashGridEmbedder(n_levels=16, n_feat_per_entry=2, hashmap_size=19, base_res=16,
                           max_res=2048, side=2.0, include_input=False, dtype=jnp.bfloat16)
    pts_c = jnp.clip(pts[sel], -0.99, 0.99)
    vars_enc = enc.init(jax.random.PRNGKey(0), pts_c[:128])
    enc_fwd = jax.jit(lambda v, p: enc.apply(v, p))
    report("hashgrid encoder fwd ({} pts)".format(budget), timed(enc_fwd, vars_enc, pts_c, iters=it))
    enc_vg = jax.jit(jax.grad(lambda v, p: jnp.sum(enc.apply(v, p)) * 1e-3))
    report("hashgrid encoder fwd+bwd", timed(enc_vg, vars_enc, pts_c, iters=it))

    # ------------------------------------------------------------- adam update
    import optax

    table = jax.random.normal(k1, (16, 1 << 19, 2)) * 1e-4
    mlp_w = [jax.random.normal(k2, (64, 64)) for _ in range(4)]
    params = {"table": table, "mlp": mlp_w}
    tx = optax.adam(1e-2, eps=1e-15)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    adam_up = jax.jit(lambda g, s, p: tx.update(g, s, p))
    report("adam update (17M params)", timed(adam_up, grads, opt_state, params, iters=it))


if __name__ == "__main__":
    main()
