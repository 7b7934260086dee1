"""Pallas TPU fused MLP: the tiny-cuda-nn FullyFusedMLP equivalent.

Replaces tcnn.Network (reference arcnerf/models/base_modules/geo_rad_model/
tcnn_fusedmlp_module.py + the tiny-cuda-nn submodule) with a TPU-native
kernel: all layer weights live in VMEM for the whole kernel; points stream
through in row tiles; every layer's matmul hits the MXU back-to-back with
NO intermediate HBM traffic. Channel dims are zero-padded to 128 lanes so
the systolic array runs full-width (a 64-wide tcnn-style MLP only fills a
quarter of the MXU otherwise).

Forward runs bf16 with f32 accumulation; backward is a custom VJP. The
differentiated forward additionally streams each hidden pre-activation to
HBM as bf16 (one (B, 128) tile per hidden layer — sequential-write cheap),
so the backward does only the 2 matmuls per layer it must (dW and dX)
instead of re-running the forward chain (3 per layer). dW accumulates
across row tiles via sequential-grid output revisiting. The undifferentiated
(inference) path writes no residuals.

Falls back to a pure-jnp implementation off-TPU (and under
``interpret=True`` for tests).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_TILE = 512


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _fwd_kernel(x_ref, *refs, n_layers, activation, save_pre):
    w_refs = refs[:n_layers]
    out_ref = refs[n_layers]
    pre_refs = refs[n_layers + 1:]  # n_layers-1 hidden pre-activation tiles
    h = x_ref[:].astype(jnp.bfloat16)
    for i in range(n_layers):
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32)
        if i < n_layers - 1:
            if save_pre:
                pre_refs[i][:] = z.astype(jnp.bfloat16)
            z = activation(z)
        h = z.astype(jnp.bfloat16)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, *refs, n_layers, activation):
    """Backprop from saved pre-activations (no forward recompute — only the
    dW and dX matmuls run). Outputs: dx tile + per-layer dw accumulated
    across the sequential grid."""
    w_refs = refs[:n_layers]
    pre_refs = refs[n_layers:2 * n_layers - 1]
    dx_ref = refs[2 * n_layers - 1]
    dw_refs = refs[2 * n_layers:]

    # rebuild per-layer inputs from the saved pre-activations (elementwise)
    posts = [x_ref[:].astype(jnp.bfloat16)]
    pres = []
    for i in range(n_layers - 1):
        z = pre_refs[i][:].astype(jnp.float32)
        pres.append(z)
        posts.append(activation(z).astype(jnp.bfloat16))

    # backward
    step = pl.program_id(0)
    g = g_ref[:].astype(jnp.float32)
    for i in reversed(range(n_layers)):
        if i < n_layers - 1:
            # d(activation): vjp of activation at the pre-activation
            _, dact = jax.vjp(activation, pres[i])
            (g,) = dact(g)
        dw = jnp.dot(
            posts[i].astype(jnp.float32).T, g, preferred_element_type=jnp.float32
        )

        @pl.when(step == 0)
        def _init(dw_ref=dw_refs[i], dw=dw):
            dw_ref[:] = dw

        @pl.when(step != 0)
        def _acc(dw_ref=dw_refs[i], dw=dw):
            dw_ref[:] = dw_ref[:] + dw

        g = jnp.dot(g.astype(jnp.bfloat16), w_refs[i][:].T, preferred_element_type=jnp.float32)
    dx_ref[:] = g.astype(dx_ref.dtype)


def _jnp_forward(x, weights, activation):
    h = x.astype(jnp.bfloat16)
    for i, w in enumerate(weights):
        h = jnp.dot(h, w.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        if i < len(weights) - 1:
            h = activation(h)
        h = h.astype(jnp.bfloat16)
    return h.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_mlp(x, weights, activation=jax.nn.relu, tile=DEFAULT_TILE, interpret=False):
    """Fused no-bias MLP chain: x (B, D_in) through weights [(D_i, D_{i+1})].

    Returns (B, D_out) f32. All dims are padded to 128 internally; B is
    padded to ``tile``. ``activation`` applies to every layer but the last.
    """
    # inference path: no residual writes (jax.grad uses _fused_mlp_fwd)
    return _run_forward(x, weights, activation, tile, interpret)


def _run_forward(x, weights, activation, tile, interpret, save_pre=False):
    b, d_in = x.shape
    dims = [d_in] + [w.shape[1] for w in weights]
    dims_p = [_round_up(d, LANE) for d in dims]
    n_layers = len(weights)

    xp = _pad_to(x, dims_p[0], 1)
    bp = _round_up(max(b, tile), tile)
    xp = _pad_to(xp, bp, 0)
    wp = [
        _pad_to(_pad_to(w.astype(jnp.bfloat16), dims_p[i], 0), dims_p[i + 1], 1)
        for i, w in enumerate(weights)
    ]

    grid = (bp // tile,)
    out_specs = [pl.BlockSpec((tile, dims_p[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((bp, dims_p[-1]), jnp.float32)]
    if save_pre:
        out_specs += [
            pl.BlockSpec((tile, dims_p[j + 1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for j in range(n_layers - 1)
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((bp, dims_p[j + 1]), jnp.bfloat16) for j in range(n_layers - 1)
        ]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers, activation=activation, save_pre=save_pre),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, dims_p[0]), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec((dims_p[j], dims_p[j + 1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for j in range(n_layers)
        ],
        out_specs=out_specs if save_pre else out_specs[0],
        out_shape=out_shapes if save_pre else out_shapes[0],
        interpret=interpret,
    )(xp, *wp)
    if save_pre:
        return outs[0][:b, : dims[-1]], list(outs[1:])
    return outs[:b, : dims[-1]]


def _fused_mlp_fwd(x, weights, activation, tile, interpret):
    out, pres = _run_forward(x, weights, activation, tile, interpret, save_pre=True)
    return out, (x, weights, pres)


def _fused_mlp_bwd(activation, tile, interpret, res, g):
    x, weights, pres = res
    b, d_in = x.shape
    dims = [d_in] + [w.shape[1] for w in weights]
    dims_p = [_round_up(d, LANE) for d in dims]
    n_layers = len(weights)

    xp = _pad_to(x, dims_p[0], 1)
    bp = _round_up(max(b, tile), tile)
    xp = _pad_to(xp, bp, 0)
    gp = _pad_to(_pad_to(g, dims_p[-1], 1), bp, 0)
    wp = [
        _pad_to(_pad_to(w.astype(jnp.bfloat16), dims_p[i], 0), dims_p[i + 1], 1)
        for i, w in enumerate(weights)
    ]

    grid = (bp // tile,)
    out_shapes = [jax.ShapeDtypeStruct((bp, dims_p[0]), jnp.float32)] + [
        jax.ShapeDtypeStruct((dims_p[i], dims_p[i + 1]), jnp.float32) for i in range(n_layers)
    ]
    out_specs = [pl.BlockSpec((tile, dims_p[0]), lambda i: (i, 0), memory_space=pltpu.VMEM)] + [
        pl.BlockSpec((dims_p[j], dims_p[j + 1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for j in range(n_layers)
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers, activation=activation),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, dims_p[0]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dims_p[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec((dims_p[j], dims_p[j + 1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for j in range(n_layers)
        ]
        + [
            pl.BlockSpec((tile, dims_p[j + 1]), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for j in range(n_layers - 1)
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(xp, gp, *wp, *pres)

    dx = outs[0][:b, :d_in]
    dws = [
        outs[1 + i][: dims[i], : dims[i + 1]].astype(weights[i].dtype) for i in range(n_layers)
    ]
    # match the primal weights container (list vs tuple)
    if isinstance(weights, tuple):
        dws = tuple(dws)
    return dx, dws


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_reference(x, weights, activation=jax.nn.relu):
    """Pure-jnp reference (same bf16/f32 mixed precision) for parity tests
    and non-TPU backends."""
    return _jnp_forward(x, weights, activation)
