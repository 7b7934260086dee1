"""Profiling helpers (SURVEY.md section 5 tracing parity): jax.profiler
traces + hard-sync step timers.

The reference only has cuda-synchronized wall timers
(common/utils/torch_utils.py:62-76) + s/iter logging; here we add real
xprof trace capture on top.
"""

import contextlib
import time

import jax
import jax.numpy as jnp


def hard_sync():
    """Force full device completion. (block_until_ready can be a no-op
    through remote-tunnel backends; a host read is the only hard sync.)"""
    return float(jnp.zeros(()).sum())


class StepTimer:
    """Windowed s/iter timer with hard sync at window edges."""

    def __init__(self, window=100):
        self.window = window
        self._t0 = None
        self._count = 0

    def tick(self):
        """Call once per step; returns s/iter when a window completes else None."""
        if self._t0 is None:
            hard_sync()
            self._t0 = time.perf_counter()
            self._count = 0
            return None
        self._count += 1
        if self._count >= self.window:
            hard_sync()
            dt = (time.perf_counter() - self._t0) / self._count
            self._t0 = time.perf_counter()
            self._count = 0
            return dt
        return None


@contextlib.contextmanager
def trace(log_dir, with_memory=True):
    """Capture a jax.profiler trace viewable in TensorBoard/xprof.

    with trace('experiments/x/profile'):
        run_steps()
    """
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False  # some backends (tunnels) don't support tracing
    try:
        yield
    finally:
        if started:
            hard_sync()
            jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name):
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats():
    """Per-device memory stats dict (None entries if unsupported)."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
