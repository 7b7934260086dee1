"""chunk_processing tests (reference tests_common/tests_torch.py genre) +
profiler helpers."""

import numpy as np

import jax.numpy as jnp

from arcnerf_tpu.utils.chunk import chunk_processing, np_wrapper, pad_to_multiple
from arcnerf_tpu.utils.profiler import StepTimer, device_memory_stats, hard_sync


def test_pad_to_multiple():
    x = jnp.ones((10, 3))
    p, n = pad_to_multiple(x, 8)
    assert p.shape == (16, 3) and n == 10
    p2, _ = pad_to_multiple(jnp.ones((16, 3)), 8)
    assert p2.shape == (16, 3)


def test_chunk_processing_array():
    x = jnp.arange(100, dtype=jnp.float32)[:, None]
    out = chunk_processing(lambda a: a * 2, 32, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)


def test_chunk_processing_multi_args_and_dict():
    x = jnp.arange(50, dtype=jnp.float32)[:, None]
    y = jnp.ones((50, 2))

    def fn(a, b, scale):
        return {"sum": a + b[:, :1] * scale, "prod": a * 2}

    out = chunk_processing(fn, 16, x, y, 3.0)
    assert out["sum"].shape == (50, 1)
    np.testing.assert_allclose(np.asarray(out["sum"]), np.asarray(x) + 3.0)
    np.testing.assert_allclose(np.asarray(out["prod"]), np.asarray(x) * 2)


def test_chunk_small_input_no_chunking():
    x = jnp.ones((5, 3))
    out = chunk_processing(lambda a: a + 1, 32, x)
    assert out.shape == (5, 3)


def test_np_wrapper():
    out = np_wrapper(lambda a, b: a @ b, np.ones((3, 4), np.float32), np.ones((4, 2), np.float32))
    assert isinstance(out, np.ndarray) and out.shape == (3, 2)


def test_profiler_helpers():
    assert hard_sync() == 0.0
    t = StepTimer(window=3)
    assert t.tick() is None
    assert t.tick() is None
    assert t.tick() is None
    dt = t.tick()
    assert dt is not None and dt >= 0
    stats = device_memory_stats()
    assert len(stats) >= 1
