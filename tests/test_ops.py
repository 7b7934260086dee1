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


def naive_hashgrid_encode(table, xyz, resolutions, dense_ok, T, mn, mx, pair_hash=False):
    """Straight-line per-point python reference of the hashgrid encode.

    ``pair_hash`` selects the z-additive hash ((x*p0 ^ y*p1) + z mod T)
    that HashGridEmbedder uses by default on hashed levels (encoding.py
    pair_hash docstring); False gives the classic instant-ngp xor hash."""
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
                elif pair_hash:
                    h = (np.uint32(c[0]) * np.uint32(_HASH_PRIMES[0])) ^ \
                        (np.uint32(c[1]) * np.uint32(_HASH_PRIMES[1]))
                    idx = int((h + np.uint32(c[2])) & np.uint32(T - 1))
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

    def _check_naive(self, pair_hash):
        enc = HashGridEmbedder(
            n_levels=4, hashmap_size=8, base_res=4, max_res=32, side=2.0,
            include_input=False, pair_hash=pair_hash, quad_hash=False,
        )
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-0.9, 0.9, size=(32, 3)).astype(np.float32)
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(xyz))
        out = np.asarray(enc.apply(variables, jnp.asarray(xyz)))

        table = np.asarray(variables["params"]["embeddings"])
        res = enc._resolutions()
        dense_ok = (res.astype(np.int64) + 1) ** 3 <= enc.table_size
        mn, mx = enc._aabb()
        ref = naive_hashgrid_encode(
            table, xyz, res, dense_ok, enc.table_size, mn, mx, pair_hash=pair_hash)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_matches_naive_reference(self):
        self._check_naive(pair_hash=False)  # classic instant-ngp xor hash

    def test_matches_naive_reference_pair_hash(self):
        self._check_naive(pair_hash=True)  # default z-additive hash

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


class TestHashGridBf16:
    """bf16 GATHER dtype: the hot random-access read touches half the HBM
    bytes while storage/grads/adam stay f32; the custom VJP accumulates the
    backward scatter-add in f32."""

    def _enc(self, dtype):
        return HashGridEmbedder(
            n_levels=4, hashmap_size=8, base_res=4, max_res=32, side=2.0,
            include_input=False, dtype=dtype,
        )

    def test_forward_close_to_f32(self):
        rng = np.random.default_rng(2)
        xyz = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
        enc32, enc16 = self._enc("float32"), self._enc("bfloat16")
        v32 = enc32.init(jax.random.PRNGKey(0), xyz)
        # storage is f32 regardless of gather dtype -> same param pytree
        assert v32["params"]["embeddings"].dtype == jnp.float32
        v16 = enc16.init(jax.random.PRNGKey(0), xyz)
        assert v16["params"]["embeddings"].dtype == jnp.float32
        out32 = np.asarray(enc32.apply(v32, xyz))
        out16 = np.asarray(enc16.apply(v16, xyz))
        assert out16.dtype == np.float32  # output stays f32
        scale = np.abs(out32).max() + 1e-8
        err = np.abs(out16 - out32).max() / scale
        assert 0 < err < 2e-2, err  # quantized reads differ but only ~2^-8

    def test_grads_accumulate_in_f32(self):
        """Many points hitting the SAME hash entries: a bf16 scatter-add
        would swallow most contributions; the f32-accumulating VJP must stay
        close to the all-f32 gradient (and stay f32-dtyped)."""
        rng = np.random.default_rng(3)
        # 4096 points inside one tiny region -> few distinct corners
        xyz = jnp.asarray((rng.uniform(0.0, 0.05, (4096, 3)) + 0.1).astype(np.float32))
        enc32, enc16 = self._enc("float32"), self._enc("bfloat16")
        v = enc32.init(jax.random.PRNGKey(0), xyz)
        g32 = jax.grad(lambda vv: jnp.sum(enc32.apply(vv, xyz)))(v)["params"]["embeddings"]
        g16 = jax.grad(lambda vv: jnp.sum(enc16.apply(vv, xyz)))(v)["params"]["embeddings"]
        assert g16.dtype == jnp.float32
        g32, g16 = np.asarray(g32), np.asarray(g16)
        denom = np.abs(g32).max()
        assert np.abs(g16 - g32).max() / denom < 1e-2

    def test_f32_master_optimizer(self):
        """Repeated tiny updates must not stall: bf16 params alone would
        swallow updates ~256x smaller than the weight; the f32 master
        integrates them."""
        import optax
        from arcnerf_tpu.trainer.optimizer import with_f32_master

        params = {"w": jnp.full((128,), 1.0, dtype=jnp.bfloat16)}
        tx = with_f32_master(optax.sgd(1.0))
        state = tx.init(params)
        grad = {"w": jnp.full((128,), -1e-4, dtype=jnp.bfloat16)}  # 1e-4 step vs weight 1.0
        for _ in range(100):
            updates, state = tx.update(grad, state, params)
            params = optax.apply_updates(params, updates)
        # f32 master: 1.0 + 100*1e-4 = 1.01; raw bf16 adds would stay ~1.0
        w = np.asarray(params["w"], dtype=np.float32)
        np.testing.assert_allclose(w, 1.01, rtol=3e-3)
        master = np.asarray(state[1]["w"])
        # bf16 quantizes the 1e-4 gradient itself (~0.14% off); the master
        # integrates exactly what it was given
        np.testing.assert_allclose(master, 1.01, rtol=3e-3)


def test_hash_lookup_rowform_parity():
    """ROW-FORM hash-table lookup (full 128-lane row gather/scatter — the
    TPU fast path, see scripts/probe_rowform.py) must match the element-form
    gather exactly, including the backward scatter accumulation."""
    import jax

    from arcnerf_tpu.models.base_modules.encoding import _gather_cols_f32, _hash_lookup_rowform

    L, T, F, K = 3, 2**12, 2, 501  # deliberately non-128-multiple K
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (L, T, F), jnp.float32)
    idx = jax.random.randint(key, (L, K), 0, T, jnp.int32)
    spec_r = ((L, T, F), "float32", None)

    out_r = _hash_lookup_rowform(spec_r, table, idx)
    flat = (idx + (jnp.arange(L) * T)[:, None]).reshape(-1)
    out_e = _gather_cols_f32(((F, L * T), "float32"), table.reshape(L * T, F).T, flat).reshape(F, L, K)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_e), atol=1e-6)

    g = jax.random.normal(key, out_r.shape, jnp.float32)
    gr = jax.grad(lambda t: jnp.sum(_hash_lookup_rowform(spec_r, t, idx) * g))(table)
    ge = jax.grad(lambda t: jnp.sum(
        _gather_cols_f32(((F, L * T), "float32"), t.reshape(L * T, F).T, flat).reshape(F, L, K) * g
    ))(table)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(ge), atol=1e-5)
    assert float(jnp.abs(gr).sum()) > 0  # duplicate-index accumulation happened


def test_hashgrid_embedder_rowform_grads():
    """End-to-end HashGridEmbedder on the row-form path: finite outputs,
    nonzero table grads, same values as a manual trilinear reference on a
    probe point."""
    import jax

    from arcnerf_tpu.models.base_modules.encoding import HashGridEmbedder

    enc = HashGridEmbedder(n_levels=4, hashmap_size=12, side=2.0, include_input=False)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (257, 3), jnp.float32, -0.9, 0.9)
    params = enc.init(key, pts)
    out = enc.apply(params, pts)
    assert out.shape == (257, 4 * 2)
    assert bool(jnp.isfinite(out).all())
    grads = jax.grad(lambda p: jnp.sum(enc.apply(p, pts) ** 2))(params)
    assert float(jnp.abs(grads["params"]["embeddings"]).sum()) > 0


class TestTruncExpOverflow:

    def test_forward_is_plain_exp(self):
        """Reference semantics (reference trunc_exp.py:7-61): the FORWARD is
        the plain exp — it may overflow f32 to inf; only the gradient is
        clamped. The inf-safety lives at the ray_marching alpha boundary
        (see test_marching_overflow_grad_finite), not here."""
        x = jnp.asarray([100.0, 89.0, 15.0, 0.0])
        y = np.asarray(trunc_exp(x))
        assert np.isinf(y[:2]).all()
        np.testing.assert_allclose(y[2:], np.exp(np.asarray(x[2:])), rtol=1e-6)

    def test_marching_overflow_grad_finite(self):
        """The multivol epoch-10 divergence: sigma that overflowed f32 exp
        (trunc_exp forward is plain exp) meets a zero marching delta (last
        valid slot / crushed duplicate zvals) — inf * 0 = NaN in the alpha
        forward and VJP. ray_marching's finite clamp at the alpha boundary
        must keep BOTH the render and the gradient finite."""
        from arcnerf_tpu.render.ray_helper import ray_marching

        zvals = jnp.asarray([[1.0, 1.0 + 1e-7, 2.0]])  # duplicate -> delta[0] = 0

        def f(x):
            sigma = trunc_exp(x).reshape(1, 3)
            radiance = jnp.ones((1, 3, 3)) * 0.5
            out = ray_marching(sigma, radiance, zvals, add_inf_z=True)
            return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

        # overflow at the ZERO-DELTA slot: inf * 0 = NaN without the clamp
        x = jnp.asarray([200.0, 1.0, 2.0])
        val, g = jax.value_and_grad(f)(x)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(g)).all()
        # and at a positive-delta slot: alpha saturates to 1, grads stay finite
        val2, g2 = jax.value_and_grad(f)(jnp.asarray([1.0, 200.0, 2.0]))
        assert np.isfinite(float(val2)) and np.isfinite(np.asarray(g2)).all()
