"""Static-shape chunked evaluation (reference common/utils/torch_utils.py:79-178).

The reference splits huge ray/point batches into chunks with a python loop;
on TPU we keep everything jittable: pad the leading axis to a multiple of
``chunk``, reshape to (n_chunks, chunk, ...), and run ``jax.lax.map`` over
chunks so only one chunk is resident in VMEM-adjacent working set at a time.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def pad_to_multiple(x, multiple, axis=0):
    """Pad ``x`` along ``axis`` (edge-replicating) up to a multiple. Returns
    (padded, original_size)."""
    n = x.shape[axis]
    target = int(math.ceil(n / multiple)) * multiple if n > 0 else multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad, mode="edge"), n


def chunk_processing(fn, chunk_size, *args):
    """Apply ``fn`` over leading-axis chunks of every array arg.

    Non-array args (None, python scalars) are broadcast to every chunk.
    ``fn`` may return an array, a dict of arrays, or a tuple; results are
    concatenated back and truncated to the original length. Jit-safe.
    """
    arrays = [a for a in args if isinstance(a, (jnp.ndarray, np.ndarray)) and getattr(a, "ndim", 0) > 0]
    if not arrays:
        return fn(*args)
    n = arrays[0].shape[0]
    if n <= chunk_size:
        return fn(*args)

    padded_args = []
    for a in args:
        if isinstance(a, (jnp.ndarray, np.ndarray)) and getattr(a, "ndim", 0) > 0:
            p, _ = pad_to_multiple(jnp.asarray(a), chunk_size, axis=0)
            padded_args.append(p.reshape((-1, chunk_size) + p.shape[1:]))
        else:
            padded_args.append(a)

    def body(chunked):
        call_args = []
        it = iter(chunked)
        for a in args:
            if isinstance(a, (jnp.ndarray, np.ndarray)) and getattr(a, "ndim", 0) > 0:
                call_args.append(next(it))
            else:
                call_args.append(a)
        return fn(*call_args)

    chunked_arrays = [p for p in padded_args if isinstance(p, jnp.ndarray)]
    out = jax.lax.map(body, tuple(chunked_arrays))
    return jax.tree_util.tree_map(lambda o: o.reshape((-1,) + o.shape[2:])[:n], out)


def np_wrapper(fn, *args):
    """Call a jnp function with numpy inputs, get numpy outputs (reference
    torch_utils.py:9 ``np_wrapper`` analogue, used by tests)."""
    jargs = [jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args]
    out = fn(*jargs)
    return jax.tree_util.tree_map(lambda o: np.asarray(o) if isinstance(o, jnp.ndarray) else o, out)


def get_start_time():
    import time

    return time.perf_counter()


def get_end_time(start, sync_on=None):
    """Wall time since ``start``; blocks on ``sync_on`` (a jax array) first —
    the TPU analogue of torch.cuda.synchronize (reference torch_utils.py:62-76)."""
    import time

    if sync_on is not None:
        jax.block_until_ready(sync_on)
    return time.perf_counter() - start
