"""Round 2: find the exact 2D-gather form Mosaic supports + time candidates.

'Only 2D gather is supported' (round 1 probe) implies some lax.gather DOES
lower. Enumerate 2D forms with full error text, then time whatever works
at the real per-level workload (2M indices into a 2^19-entry level table).
"""

import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_case(name, fn, atol=3e-2):
    try:
        out, ref = fn()
        ok = np.allclose(np.asarray(out), np.asarray(ref), atol=atol)
        err = float(np.max(np.abs(np.asarray(out) - np.asarray(ref)))) if not ok else 0
        print("{:<52} {}".format(name, "OK" if ok else "WRONG maxerr={:.3g}".format(err)), flush=True)
        return ok
    except Exception as e:
        lines = [l for l in str(e).splitlines() if l.strip()]
        print("{:<52} FAIL: {}".format(name, " | ".join(lines[:2])[:160]), flush=True)
        return False


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    T, N = 2048, 1024
    table = jax.random.normal(key, (T, 128), jnp.float32)
    table_wide = jax.random.normal(key, (8, T), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    # A. jnp.take rows of (T, 128) by 1-D idx (2D operand!)
    def case_a():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[:, 0], axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:, None])
        return out, np.asarray(table)[np.asarray(idx)]

    try_case("A jnp.take rows (T,128) axis0 idx 1-D", case_a)

    # B. jnp.take of (8, T) along axis1 with 1-D idx
    def case_b():
        def kernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[0], axis=1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table_wide, idx[None])
        return out, np.asarray(table_wide)[:, np.asarray(idx)]

    try_case("B jnp.take (8,T) axis1 idx 1-D", case_b)

    # C. take_along_axis (T,128) axis0, idx broadcast to (N,128)
    def case_c():
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

    try_case("C take_along_axis (T,128) axis0 bcast idx", case_c)

    # D. take_along_axis (8, T) axis1 with (8, N) idx
    def case_d():
        def kernel(t_ref, i_ref, o_ref):
            ii = jnp.broadcast_to(i_ref[:1, :], (8, N))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=1)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table_wide, idx[None])
        return out, np.asarray(table_wide)[:, np.asarray(idx)]

    ok_d = try_case("D take_along_axis (8,T) axis1", case_d)

    # E. same-shape take_along_axis axis0: permutation within (N, 128)
    def case_e():
        src = jax.random.normal(key, (N, 128), jnp.float32)
        perm = jax.random.randint(key, (N,), 0, N, jnp.int32)

        def kernel(t_ref, i_ref, o_ref):
            ii = jnp.broadcast_to(i_ref[:, :1], (N, 128))
            o_ref[:] = jnp.take_along_axis(t_ref[:], ii, axis=0)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, perm[:, None])
        return out, np.asarray(src)[np.asarray(perm)]

    try_case("E take_along_axis same-rows (N,128) axis0", case_e)

    # F. lax.gather explicit, rows of (T, 128)
    def case_f():
        def kernel(t_ref, i_ref, o_ref):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
            o_ref[:] = jax.lax.gather(
                t_ref[:], i_ref[:], dn, slice_sizes=(1, 128))

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx[:, None])
        return out, np.asarray(table)[np.asarray(idx)]

    ok_f = try_case("F lax.gather rows (T,128) sl=(1,128)", case_f)

    # G. dynamic_gather via pltpu API if present
    names = [n for n in dir(pltpu) if "gather" in n.lower()]
    print("pltpu gather-ish symbols:", names, flush=True)

    # time whatever worked at the per-level scale: 2M indices, T=2^19 table
    TT, NN = 2**19, 2**21
    big_table = jax.random.normal(key, (TT, 128), jnp.float32)  # padded rows
    big_idx = jax.random.randint(key, (NN,), 0, TT, jnp.int32)

    def timed(f, *a, iters=3):
        out = f(*a)
        np.asarray(jax.device_get(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        np.asarray(jax.device_get(out.ravel()[0]))
        return (time.perf_counter() - t0) / iters

    if ok_f or True:
        # scalar-loop gather rate at scale: grid over tiles of 2048 rows,
        # each kernel instance loops 2048 scalar row copies of width 128
        TILE = 2048

        def loop_kernel(i_ref, t_ref, o_ref):
            def body(k, _):
                o_ref[pl.ds(k, 1), :] = t_ref[pl.ds(i_ref[k], 1), :]
                return 0

            jax.lax.fori_loop(0, TILE, body, 0, unroll=8)

        @jax.jit
        def loop_gather(t, i):
            grid = NN // TILE
            return pl.pallas_call(
                loop_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(grid,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec((TILE, 128), lambda g, *_: (g, 0),
                                           memory_space=pltpu.VMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((NN, 128), jnp.float32),
            )(i, t)

        try:
            # correctness on a slice
            small = np.asarray(jax.device_get(loop_gather(big_table, big_idx)[:4]))
            ref = np.asarray(big_table)[np.asarray(big_idx[:4])]
            ok = np.allclose(small, ref, atol=1e-5)
            dt = timed(loop_gather, big_table, big_idx)
            print("scalar-loop row gather 2M rows x 128:      {:.1f} ms {}".format(
                dt * 1e3, "OK" if ok else "WRONG"), flush=True)
        except Exception as e:
            lines = [l for l in str(e).splitlines() if l.strip()]
            print("scalar-loop gather at scale FAIL:", " | ".join(lines[:2])[:160], flush=True)

    # XLA row gather at scale outside pallas (for reference)
    @jax.jit
    def xla_row_gather(t, i):
        return jnp.take(t, i, axis=0)

    try:
        dt = timed(xla_row_gather, big_table, big_idx[: 2**19])  # 512k rows -> 256MB out
        print("XLA row gather 512k rows x 128:            {:.1f} ms".format(dt * 1e3), flush=True)
    except Exception as e:
        print("XLA row gather FAIL:", str(e).splitlines()[0][:140], flush=True)


if __name__ == "__main__":
    main()
