"""FusedMLP backend shootout at the REAL training batch (roadmap item).

Measures fwd and value&grad of the NGP geometry MLP (64-wide, D=1,
in 35 -> out 1+15) and radiance MLP shapes at the compacted-point batch
(2^18 rows) for the XLA path vs the Pallas kernel across tile sizes.
Decides whether ops.fused_mlp should be the TPU default for training
shapes (r2 measured fwd +17% at small batch; bwd parity).

Run on the TPU when the chip is quiet:
    python scripts/probe_fused_mlp_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    print("backend:", jax.default_backend(), flush=True)
    B = 1 << 18
    key = jax.random.PRNGKey(0)

    from arcnerf_tpu.ops.fused_mlp import fused_mlp

    # geo: 35 -> 64 -> 16 ; radiance: 27+16 -> 64 -> 3 (ngp recipe shapes)
    for name, dims in (("geo", (35, 64, 16)), ("radiance", (43, 64, 3))):
        ks = jax.random.split(key, len(dims))
        ws = [jax.random.normal(ks[i], (dims[i], dims[i + 1]), jnp.float32) * 0.1
              for i in range(len(dims) - 1)]
        x = jax.random.normal(key, (B, dims[0]), jnp.float32)

        def xla_fwd(x, ws):
            h = x
            for i, w in enumerate(ws):
                h = h @ w
                if i < len(ws) - 1:
                    h = jax.nn.relu(h)
            return h

        def loss_of(fwd):
            return lambda ws, x: jnp.sum(fwd(x, ws) ** 2) * 1e-6

        t_x_f = timed(jax.jit(xla_fwd), x, ws)
        t_x_g = timed(jax.jit(jax.grad(loss_of(xla_fwd))), ws, x)
        print(f"{name:9s} XLA        fwd {t_x_f*1e3:7.2f} ms   v&g {t_x_g*1e3:7.2f} ms", flush=True)

        for tile in (256, 512, 1024, 2048):
            pf = jax.jit(lambda x, ws, t=tile: fused_mlp(x, ws, tile=t))
            try:
                t_p_f = timed(pf, x, ws)
                t_p_g = timed(
                    jax.jit(jax.grad(lambda ws, x, t=tile: jnp.sum(
                        fused_mlp(x, ws, tile=t) ** 2) * 1e-6)), ws, x)
                print(f"{name:9s} pallas{tile:5d} fwd {t_p_f*1e3:7.2f} ms   v&g {t_p_g*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001 - probe records failures
                print(f"{name:9s} pallas{tile:5d} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
