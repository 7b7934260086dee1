"""Ops parity harness (reference tests_arcnerf/tests_ops genre:
log_custom_benchmark compares custom op vs reference impl outputs AND
gradients). Here: trunc_exp custom vjp, hashgrid encode vs a naive python
reference, SH basis properties, occupancy update semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from arcnerf_tpu.models.base_modules.encoding import (
    _CORNER_OFFSETS,
    _HASH_PRIMES,
    HashGridEmbedder,
    SHEmbedder,
    fast_hash,
    sh_basis,
)
from arcnerf_tpu.ops.trunc_exp import trunc_exp


class TestTruncExp:

    def test_forward_matches_exp(self):
        x = jnp.asarray([-2.0, 0.0, 3.0])
        np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)), rtol=1e-6)

    def test_gradient_clipped(self):
        g_small = jax.grad(lambda v: trunc_exp(v))(5.0)
        np.testing.assert_allclose(float(g_small), np.exp(5.0), rtol=1e-5)
        # beyond clip=15, grad saturates at exp(15) while plain exp explodes
        g_big = jax.grad(lambda v: trunc_exp(v))(30.0)
        np.testing.assert_allclose(float(g_big), np.exp(15.0), rtol=1e-5)


def naive_hashgrid_encode(table, xyz, resolutions, dense_ok, T, mn, mx):
    """Straight-line per-point python reference of the hashgrid encode."""
    L, _, F = table.shape
    out = np.zeros((xyz.shape[0], L * F), dtype=np.float32)
    norm = (xyz - mn) / (mx - mn)
    for b in range(xyz.shape[0]):
        for l in range(L):
            res = int(resolutions[l])
            pos = norm[b] * res
            i0 = np.clip(np.floor(pos).astype(np.int64), 0, res - 1)
            frac = pos - i0
            acc = np.zeros(F)
            for corner in _CORNER_OFFSETS:
                c = i0 + corner
                if dense_ok[l]:
                    idx = int((c[0] * (res + 1) + c[1]) * (res + 1) + c[2]) % T
                else:
                    h = (np.uint32(c[0]) * np.uint32(_HASH_PRIMES[0])) ^ \
                        (np.uint32(c[1]) * np.uint32(_HASH_PRIMES[1])) ^ \
                        (np.uint32(c[2]) * np.uint32(_HASH_PRIMES[2]))
                    idx = int(h & np.uint32(T - 1))
                w = np.prod(np.where(corner == 1, frac, 1 - frac))
                acc += w * table[l, idx]
            out[b, l * F:(l + 1) * F] = acc
    return out


class TestHashGrid:

    def test_matches_naive_reference(self):
        enc = HashGridEmbedder(
            n_levels=4, hashmap_size=8, base_res=4, max_res=32, side=2.0, include_input=False
        )
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(xyz))
        out = np.asarray(enc.apply(variables, jnp.asarray(xyz)))

        table = np.asarray(variables["params"]["embeddings"])
        res = enc._resolutions()
        dense_ok = (res.astype(np.int64) + 1) ** 3 <= enc.table_size
        mn, mx = enc._aabb()
        ref = naive_hashgrid_encode(table, xyz, res, dense_ok, enc.table_size, mn, mx)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_gradients_reach_table(self):
        enc = HashGridEmbedder(
            n_levels=4, hashmap_size=8, base_res=4, max_res=32, side=2.0, include_input=False
        )
        xyz = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
        variables = enc.init(jax.random.PRNGKey(0), xyz)

        grads = jax.grad(lambda v: jnp.sum(enc.apply(v, xyz) ** 2))(variables)
        g = np.asarray(grads["params"]["embeddings"])
        assert np.isfinite(g).all() and np.abs(g).sum() > 0

    def test_continuity_across_voxel(self):
        """Trilinear interp must be continuous at voxel boundaries."""
        enc = HashGridEmbedder(
            n_levels=2, hashmap_size=10, base_res=4, max_res=8, side=2.0, include_input=False
        )
        variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
        eps = 1e-4
        boundary = 0.0  # grid plane at x=0 for res 4 over [-1, 1]
        a = enc.apply(variables, jnp.asarray([[boundary - eps, 0.3, 0.2]]))
        b = enc.apply(variables, jnp.asarray([[boundary + eps, 0.3, 0.2]]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)

    def test_fast_hash_range(self):
        idx = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (128, 3)), dtype=jnp.int32)
        h = np.asarray(fast_hash(idx, 1 << 10))
        assert (h >= 0).all() and (h < 1024).all()
        # deterministic
        h2 = np.asarray(fast_hash(idx, 1 << 10))
        np.testing.assert_array_equal(h, h2)


class TestSH:

    def test_orthonormality(self):
        """SH basis integrates to identity gram matrix over the sphere."""
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh_basis(jnp.asarray(v.astype(np.float32)), 4))  # (N, 16)
        gram = basis.T @ basis / v.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(16), atol=0.05)

    def test_degrees(self):
        v = jnp.asarray([[0.0, 0.0, 1.0]])
        for deg in range(1, 6):
            out = sh_basis(v, deg)
            assert out.shape == (1, deg**2)

    def test_embedder(self):
        emb = SHEmbedder(n_freqs=4)
        v = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        out = emb.apply({}, v)
        assert out.shape == (8, 16)
        assert emb.out_dim == 16
