"""Probe which dynamic-indexing forms Mosaic/Pallas supports on this TPU.

Round 1 recorded 'Cannot do int indexing on TPU' as the fused-kernel
blocker; this enumerates every candidate gather/scatter formulation at
small sizes and reports compile+run success and correctness. Also times
jax.lax.sort at the real workload size to cost the sort-based fallback.
"""

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn):
    try:
        out, ref = fn()
        ok = np.allclose(np.asarray(out), np.asarray(ref), atol=1e-2)
        print("{:<44} {}".format(name, "OK" if ok else "WRONG RESULT"), flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if l.strip()), "")[:110]
        print("{:<44} FAIL: {}".format(name, head), flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    T, N = 2048, 1024
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, 128), jnp.float32)  # lane-aligned rows
    table_1d = jax.random.normal(key, (8, T), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    # 1. jnp.take 1-D over lanes inside kernel
    def case_take_1d():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[0], i_ref[0], axis=0)[None]

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table_1d, idx[None])
        return out, table_1d[0][np.asarray(idx)][None]

    try_case("jnp.take 1-D (lane gather)", case_take_1d)

    # 2. take_along_axis on axis 0 (sublane gather), full rows
    def case_taa0():
        def kernel(t_ref, i_ref, o_ref):
            ii = jnp.broadcast_to(i_ref[:, :1], (N, 128))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:, None])
        return out, np.asarray(table)[np.asarray(idx)]

    try_case("take_along_axis axis0 (sublane gather)", case_taa0)

    # 3. take_along_axis on axis 1 (lane gather) of (8, T)
    def case_taa1():
        def kernel(t_ref, i_ref, o_ref):
            ii = jnp.broadcast_to(i_ref[:1, :], (8, N))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table_1d, idx[None])
        return out, np.asarray(table_1d)[:, np.asarray(idx)]

    try_case("take_along_axis axis1 (lane gather)", case_taa1)

    # 4. vector ref indexing t_ref[i_vec]
    def case_ref_vec():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = t_ref[i_ref[:, 0]]

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:, None])
        return out, np.asarray(table)[np.asarray(idx)]

    try_case("vector ref indexing t_ref[ivec]", case_ref_vec)

    # 5. scalar loop with dynamic row slice (pl.ds)
    def case_scalar_loop():
        M = 64

        def kernel(t_ref, i_ref, o_ref):
            def body(k, _):
                o_ref[pl.ds(k, 1), :] = t_ref[pl.ds(i_ref[k, 0], 1), :]
                return 0

            jax.lax.fori_loop(0, M, body, 0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:M, None])
        return out, np.asarray(table)[np.asarray(idx[:M])]

    try_case("scalar fori_loop + pl.ds row copy", case_scalar_loop)

    # 6. one-hot matmul gather in kernel (always works; baseline)
    def case_onehot():
        def kernel(t_ref, i_ref, o_ref):
            ids = jax.lax.broadcasted_iota(jnp.int32, (N, T), 1)
            onehot = (ids == i_ref[:, :1]).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(onehot, t_ref[:].astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:, None])
        return out, np.asarray(table)[np.asarray(idx)]

    try_case("one-hot matmul gather", case_onehot)

    # 7. scatter-add via ref[idx] += inside kernel
    def case_scatter_ref():
        g = jax.random.normal(key, (N, 128), jnp.float32)

        def kernel(i_ref, g_ref, o_ref):
            o_ref[:] = jnp.zeros_like(o_ref)
            o_ref[i_ref[:, 0]] += g_ref[:]

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx[:, None], g)
        ref = np.zeros((T, 128), np.float32)
        np.add.at(ref, np.asarray(idx), np.asarray(g))
        return out, ref

    try_case("vector ref scatter o_ref[ivec] +=", case_scatter_ref)

    # 8. XLA sort cost at the real size (33.5M keys + payload)
    NN = 2**18 * 16 * 8
    big_idx = jax.random.randint(key, (NN,), 0, 2**19 * 16, jnp.int32)
    payload = jax.random.normal(key, (NN,), jnp.float32)

    @jax.jit
    def do_sort(k, v):
        return jax.lax.sort_key_val(k, v)

    k, v = do_sort(big_idx, payload)
    float(k[0])
    t0 = time.perf_counter()
    k, v = do_sort(big_idx, payload)
    float(k[0])
    print("XLA sort_key_val 33.5M:               {:.1f} ms".format((time.perf_counter() - t0) * 1e3), flush=True)

    # 9. cumsum at the same size
    @jax.jit
    def do_cumsum(v):
        return jnp.cumsum(v)

    s = do_cumsum(payload)
    float(s[0])
    t0 = time.perf_counter()
    s = do_cumsum(payload)
    float(s[0])
    print("XLA cumsum 33.5M:                      {:.1f} ms".format((time.perf_counter() - t0) * 1e3), flush=True)


if __name__ == "__main__":
    main()
