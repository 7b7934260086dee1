"""Per-stage timing of the NGP train step on the current jax backend.

Times each suspect of the 2.6 s/step measured by bench.py at the real
workload sizes (B=2^18 compacted points, 16384 rays x 128 samples,
hashgrid L=16 T=2^19 F=2), each as its own jitted dispatch with a host
read as the hard sync. Run on the TPU tunnel (default env) or CPU.

Usage: python scripts/profile_stages.py [--smoke]
"""

import sys
import time

import numpy as np

SMOKE = "--smoke" in sys.argv


def timed(fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def report(results, name, fn, *args, **kw):
    try:
        dt = timed(fn, *args, **kw)
        results[name] = dt
        print("{:<44} {:>9.2f} ms".format(name, dt * 1e3), flush=True)
    except Exception as e:
        print("{:<44} FAILED: {}".format(name, str(e).splitlines()[0][:120]), flush=True)


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0])

    B = 2**14 if SMOKE else 2**18      # compacted points
    L, F, T = 8 if SMOKE else 16, 2, 2**(15 if SMOKE else 19)
    n_idx = L * 8 * B
    key = jax.random.PRNGKey(0)
    table_f32 = jax.random.normal(key, (F, L * T), jnp.float32)
    idx = jax.random.randint(key, (n_idx,), 0, L * T, jnp.int32)

    results = {}

    # 1. the forward gather as written (bf16 read, B-minor layout)
    @jax.jit
    def gather_bf16(t, i):
        return jnp.take(t.astype(jnp.bfloat16), i, axis=1).astype(jnp.float32)

    report(results, "gather (F, LT) axis1 bf16", gather_bf16, table_f32, idx)

    # 1b. same gather, promise_in_bounds (no oob clamp path)
    @jax.jit
    def gather_pib(t, i):
        return t.astype(jnp.bfloat16).at[:, i].get(mode="promise_in_bounds").astype(jnp.float32)

    report(results, "gather axis1 bf16 promise_in_bounds", gather_pib, table_f32, idx)

    # 1d. two 1-D gathers (one per feature)
    @jax.jit
    def gather_1d(t, i):
        t16 = t.astype(jnp.bfloat16)
        return jnp.stack([jnp.take(t16[0], i), jnp.take(t16[1], i)]).astype(jnp.float32)

    report(results, "2x 1-D gathers bf16", gather_1d, table_f32, idx)

    # 2. backward scatter-add as written
    g = jax.random.normal(key, (F, n_idx), jnp.float32)

    @jax.jit
    def scatter_add(i, g):
        return jnp.zeros((F, L * T), jnp.float32).at[:, i].add(g)

    report(results, "scatter-add (F, LT) axis1", scatter_add, idx, g)

    # 2b. segment_sum formulation
    @jax.jit
    def scatter_seg(i, g):
        return jax.ops.segment_sum(g.T, i, num_segments=L * T).T

    report(results, "scatter via segment_sum", scatter_seg, idx, g)

    # 3. full hashgrid encode fwd + vjp
    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder

    enc = HashGridEmbedder(n_levels=L, hashmap_size=int(np.log2(T)), side=2.0,
                           include_input=False, dtype=jnp.bfloat16)
    pts = jax.random.uniform(key, (B, 3), jnp.float32, -0.9, 0.9)
    params = enc.init(key, pts)

    @jax.jit
    def enc_fwd(p, x):
        return enc.apply(p, x)

    report(results, "hashgrid encode fwd", enc_fwd, params, pts)

    @jax.jit
    def enc_bwd(p, x):
        def loss(p):
            return jnp.sum(enc.apply(p, x) ** 2)
        return jax.grad(loss)(p)

    report(results, "hashgrid encode fwd+bwd", enc_bwd, params, pts)

    # 4. fused MLP chain fwd/bwd at the compacted budget
    w1 = jax.random.normal(key, (L * F, 64), jnp.float32) * 0.1
    w2 = jax.random.normal(key, (64, 64), jnp.float32) * 0.1
    w3 = jax.random.normal(key, (64, 16), jnp.float32) * 0.1
    feats = jax.random.normal(key, (B, L * F), jnp.float32)

    @jax.jit
    def mlp_bwd(w1, w2, w3, x):
        def loss(w1, w2, w3):
            h = jnp.maximum(x.astype(jnp.bfloat16) @ w1.astype(jnp.bfloat16), 0)
            h = jnp.maximum(h @ w2.astype(jnp.bfloat16), 0)
            return jnp.sum((h @ w3.astype(jnp.bfloat16)).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(w1, w2, w3)

    report(results, "mlp (B,32)->64->64->16 fwd+bwd", mlp_bwd, w1, w2, w3, feats)

    # 5. compaction: prefix-cumsum + searchsorted at the ray batch
    n_rays = 1024 if SMOKE else 16384
    n_sample = 32 if SMOKE else 128
    mask = jax.random.bernoulli(key, 0.2, (n_rays, n_sample))

    @jax.jit
    def compact(mask):
        flat = mask.reshape(-1)
        cum = jnp.cumsum(flat.astype(jnp.int32))
        ranks = jnp.arange(1, B + 1, dtype=jnp.int32)
        src = jnp.searchsorted(cum, ranks)
        return jnp.clip(src, 0, flat.shape[0] - 1)

    report(results, "compaction cumsum+searchsorted", compact, mask)

    # 6. ray marching at full batch
    from arcnerf_tpu.render.ray_helper import ray_marching

    sigma = jax.random.uniform(key, (n_rays, n_sample), jnp.float32, 0, 5)
    radiance = jax.random.uniform(key, (n_rays, n_sample, 3), jnp.float32)
    zvals = jnp.cumsum(jax.random.uniform(key, (n_rays, n_sample), jnp.float32, 0.01, 0.05), axis=-1)

    @jax.jit
    def march(s, r, z):
        return ray_marching(s, r, z)["rgb"]

    report(results, "ray_marching", march, sigma, radiance, zvals)

    pass


if __name__ == "__main__":
    main()
