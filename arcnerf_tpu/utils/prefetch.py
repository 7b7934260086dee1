"""Batch prefetcher (reference common/utils/data_prefetch.py:34 — the
CUDA-stream prefetcher's role): stage the next ray batch host-side and
start its device transfer while the current step executes.

With jax's async dispatch the device_put already overlaps compute; this
adds host-side overlap (pipeline sampling + numpy slicing happen on a
worker thread) which matters when per-step host work is non-trivial.
"""

import queue
import threading


class BatchPrefetcher:

    def __init__(self, make_batch_fn, depth=2):
        """make_batch_fn(epoch) -> staged batch (should end with the
        device_put so the transfer is in flight when consumed)."""
        self.make_batch_fn = make_batch_fn
        self.depth = depth
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = None
        self._next_epoch = 0

    def start(self, start_epoch=0, end_epoch=None):
        self._next_epoch = start_epoch
        self._end_epoch = end_epoch

        def worker():
            epoch = self._next_epoch
            while not self._stop.is_set() and (self._end_epoch is None or epoch < self._end_epoch):
                batch = self.make_batch_fn(epoch)
                while not self._stop.is_set():
                    try:
                        self._q.put((epoch, batch), timeout=0.5)
                        break
                    except queue.Full:
                        continue
                epoch += 1

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()
        return self

    def next(self):
        """-> (epoch, batch)."""
        return self._q.get()

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        if self._thread is not None:
            self._thread.join(timeout=2)
