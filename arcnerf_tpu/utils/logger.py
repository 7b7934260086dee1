"""Run logger + metric monitor (reference common/utils/logger.py, monitor.py).

``Logger`` writes to console and optionally a file, gated to process 0.
``Monitor`` wraps tensorboardX SummaryWriter (scalars, images, figures);
degrades to a JSONL scalar log when tensorboardX is unavailable.
"""

import json
import logging
import os
import sys

import jax


def is_master():
    return jax.process_index() == 0


class Logger:

    def __init__(self, path=None, name="arcnerf_tpu", rank_zero_only=True):
        self.enabled = is_master() or not rank_zero_only
        self._logger = logging.getLogger(name)
        self._logger.setLevel(logging.INFO)
        self._logger.handlers = []
        if self.enabled:
            sh = logging.StreamHandler(sys.stdout)
            sh.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
            self._logger.addHandler(sh)
            if path:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                fh = logging.FileHandler(path)
                fh.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
                self._logger.addHandler(fh)

    def add_log(self, msg, level="info"):
        if self.enabled:
            getattr(self._logger, level)(msg)

    info = add_log

    def warn(self, msg):
        self.add_log(msg, "warning")

    def error(self, msg):
        self.add_log(msg, "error")


class Monitor:
    """Scalar/image monitor. TensorBoard if available, JSONL fallback."""

    def __init__(self, log_dir, use_tb=True):
        self.log_dir = log_dir
        self.writer = None
        self.jsonl = None
        if not is_master():
            return
        os.makedirs(log_dir, exist_ok=True)
        if use_tb:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(log_dir)
            except Exception:
                pass
        if self.writer is None:
            self.jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)
        elif self.jsonl is not None:
            self.jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
            self.jsonl.flush()

    def add_img(self, tag, img, step):
        """img: (H, W, 3) uint8 or float [0,1] numpy array."""
        if self.writer is not None:
            self.writer.add_image(tag, img, step, dataformats="HWC")

    def add_fig(self, tag, fig, step):
        if self.writer is not None:
            self.writer.add_figure(tag, fig, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()
