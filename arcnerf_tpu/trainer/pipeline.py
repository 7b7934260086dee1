"""Training-ray pipeline: precrop, full/random sampling, dynamic batch
size, background-color handling.

Capability parity with /root/reference/arcnerf/trainer/pipeline.py:10-309:
- process_train_data:53 — concat all rays of all images, optional precrop
  center crop, shuffle,
- step_ray_sample:131 — 'full' (epoch-permutation walk) / 'random'
  (with replacement), cross_view or per-view,
- fetch_step_update_dynamic_bs:222 — pick the ray count from a bucket list
  so the valid-point count tracks a fixed budget without recompiling every
  step (each bucket size compiles once),
- fetch_step_bkg_color:279 — random or fixed background color composited
  onto gt when masks exist.

Host-side numpy scheduling; the sampled batch is handed to the jitted step.
"""

import numpy as np

from ..utils.cfgs import get_value_from_cfgs_field

# static bucket ladder for dynamic batch size: powers of two keep the
# number of distinct compiled graphs tiny
_BS_BUCKETS = [1024, 2048, 4096, 8192, 16384, 32768, 65536, 131072]


class Pipeline:

    def __init__(self, cfgs, n_rays, wh, seed=0):
        """cfgs: dataset.train.scheduler node; wh: (W, H) of train images."""
        self.cfgs = cfgs
        self.base_n_rays = n_rays
        self.n_rays = n_rays
        self.W, self.H = wh
        self.rng = np.random.default_rng(seed)

        sched = cfgs if cfgs is not None else None
        ray_sample = get_value_from_cfgs_field(sched, "ray_sample", None)
        self.sample_mode = get_value_from_cfgs_field(ray_sample, "mode", "random")
        self.cross_view = get_value_from_cfgs_field(ray_sample, "cross_view", True)

        precrop = get_value_from_cfgs_field(sched, "precrop", None)
        self.precrop_ratio = get_value_from_cfgs_field(precrop, "ratio", 1.0)
        self.precrop_max_epoch = get_value_from_cfgs_field(precrop, "max_epoch", 0)

        bkg = get_value_from_cfgs_field(sched, "bkg_color", None)
        self.bkg_color_mode = get_value_from_cfgs_field(bkg, "color", None)

        dyn = get_value_from_cfgs_field(sched, "dynamic_batch_size", None)
        self.dynamic_update_epoch = get_value_from_cfgs_field(dyn, "update_epoch", None)
        self.dynamic_max_bs = get_value_from_cfgs_field(dyn, "max_batch_size", 32768)

        self.data = None  # dict of (n_total, ...) numpy arrays
        self.precrop_data = None
        self.precrop_idx = None  # indices of the precrop subset into data
        self._perm = None
        self._cursor = 0
        self._measured = []

    # ------------------------------------------------------------- ingestion
    def process_train_data(self, samples):
        """samples: list of per-image dicts from the dataset. Concatenates
        into flat (N_img*HW, ...) arrays; builds the precrop subset."""
        keys = [k for k in ("img", "mask", "rays_o", "rays_d", "rays_r", "bounds", "exp_time")
                if k in samples[0]]
        data = {k: np.concatenate([s[k] for s in samples], axis=0) for k in keys}
        self.data = data

        if self.precrop_ratio < 1.0 and self.precrop_max_epoch > 0:
            # center crop indices on the (H, W) grid, hw order
            h, w = self.H, self.W
            dh = int(h / 2 * self.precrop_ratio)
            dw = int(w / 2 * self.precrop_ratio)
            rows = np.arange(h // 2 - dh, h // 2 + dh)
            cols = np.arange(w // 2 - dw, w // 2 + dw)
            grid = (rows[:, None] * w + cols[None, :]).reshape(-1)
            per_img = np.concatenate(
                [grid + i * h * w for i in range(len(samples))]
            )
            self.precrop_data = {k: v[per_img] for k, v in data.items()}
            self.precrop_idx = per_img
        return self.data

    @property
    def n_total_rays(self):
        return self.data["rays_o"].shape[0]

    # -------------------------------------------------------------- sampling
    def _active_data(self, epoch):
        if self.precrop_data is not None and epoch < self.precrop_max_epoch:
            return self.precrop_data
        return self.data

    def get_train_batch(self, epoch=0):
        """Sample n_rays for this step -> dict of (1, n_rays, ...) arrays."""
        data = self._active_data(epoch)
        total = data["rays_o"].shape[0]
        n = min(self.n_rays, total)

        if self.sample_mode == "full":
            if self._perm is None or self._cursor + n > total:
                self._perm = self.rng.permutation(total)
                self._cursor = 0
            select = self._perm[self._cursor:self._cursor + n]
            self._cursor += n
        else:  # random
            select = self.rng.integers(0, total, size=n)

        batch = {k: v[select][None] for k, v in data.items()}
        batch = self.fetch_step_bkg_color(batch)
        return batch

    def fetch_step_bkg_color(self, batch):
        """Random/fixed bkg color composite (train only; needs mask)."""
        if self.bkg_color_mode is None or "mask" not in batch:
            return batch
        n = batch["rays_o"].shape[1]
        if self.bkg_color_mode == "random":
            color = self.rng.random((1, n, 3)).astype(np.float32)
        else:
            color = np.tile(np.asarray(self.bkg_color_mode, dtype=np.float32)[None, None], (1, n, 1))
        mask = batch["mask"][..., None]
        batch["img"] = batch["img"] * mask + color * (1.0 - mask)
        batch["bkg_color"] = color
        return batch

    # -------------------------------------------------------- dynamic batch
    def record_valid_pts(self, n_valid_pts, n_pts_per_ray, n_rays=None):
        """Feed back the measured valid-point count of a step. Accepts a
        device array — NOT read until update_dynamic_bs fires, so no
        per-step device->host sync. ``n_rays`` is the count the step
        ACTUALLY sampled (the on-device sampler may round to a mesh
        multiple or clamp to the pool size); defaults to self.n_rays."""
        self._measured.append((n_valid_pts, float(n_rays if n_rays else self.n_rays),
                               float(n_pts_per_ray)))

    def update_dynamic_bs(self, epoch, log_max_allowance):
        """Every update_epoch steps, rescale n_rays so that expected valid
        points ~= 1 << log_max_allowance, snapped to a power-of-two bucket
        (recompile-free: each bucket is one compiled graph)."""
        if self.dynamic_update_epoch is None or log_max_allowance is None or log_max_allowance <= 0:
            return self.n_rays
        if epoch % self.dynamic_update_epoch != 0 or not self._measured:
            return self.n_rays
        budget = float(1 << log_max_allowance)
        valid_per_ray = sum(float(m[0]) / m[1] for m in self._measured) / len(self._measured)
        self._measured = []
        target = min(budget / max(valid_per_ray, 1.0), float(self.dynamic_max_bs))
        for b in _BS_BUCKETS:
            if b >= target:
                self.n_rays = b
                break
        else:
            self.n_rays = min(_BS_BUCKETS[-1], int(self.dynamic_max_bs))
        return self.n_rays
