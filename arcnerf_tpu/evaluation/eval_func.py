"""Evaluation loop over a test dataset.

Capability parity with /root/reference/arcnerf/eval/eval_func.py:9-58:
per-image full render (chunked), metric averaging, forward-time logging,
progress image writing.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..metrics import AverageDictCounter, psnr, ssim


def render_full_image(render_chunk_fn, sample, chunk_rays=8192, bkg_color=None):
    """Render all rays of one dataset sample through a jitted chunk renderer
    ``render_chunk_fn(feed_in) -> output dict``; returns (H, W, ...) dict.
    ``bkg_color`` (3,) composites the background at render time (training
    may have used random background compositing)."""
    h, w = int(sample["H"]), int(sample["W"])
    n = sample["rays_o"].shape[0]
    outs = []
    for s in range(0, n, chunk_rays):
        e = min(s + chunk_rays, n)
        chunk = {}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
            if k in sample and sample[k] is not None:
                piece = np.asarray(sample[k][s:e])
                if piece.shape[0] < chunk_rays:
                    pad = chunk_rays - piece.shape[0]
                    piece = np.concatenate([piece, np.repeat(piece[-1:], pad, axis=0)], axis=0)
                chunk[k] = jnp.asarray(piece)[None]
        if bkg_color is not None:
            chunk["bkg_color"] = jnp.tile(jnp.asarray(bkg_color, dtype=jnp.float32), (1, chunk_rays, 1))
        out = render_chunk_fn(chunk)
        outs.append({
            k: np.asarray(v[0])[: e - s]
            for k, v in out.items()
            if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[1] == chunk_rays
        })
    merged = {k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]}
    return {k: v.reshape(h, w, *v.shape[1:]) for k, v in merged.items()}


def run_eval(render_chunk_fn, dataset, logger=None, out_dir=None, max_samples=None, chunk_rays=8192,
             compute_ssim=True, bkg_color=None):
    """Evaluate every (or max_samples) image: PSNR/SSIM + wall time.

    Returns (summary dict, list of per-image output dicts).
    """
    counter = AverageDictCounter()
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    results = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    for i in range(n):
        sample = dataset[i]
        t0 = time.perf_counter()
        imgs = render_full_image(render_chunk_fn, sample, chunk_rays, bkg_color=bkg_color)
        jax.block_until_ready(jnp.zeros(()))
        dt = time.perf_counter() - t0

        gt = np.asarray(sample["img"]).reshape(imgs["rgb"].shape)
        metrics = {"psnr": float(psnr(jnp.asarray(imgs["rgb"]), jnp.asarray(gt))), "fwd_time": dt}
        if compute_ssim:
            metrics["ssim"] = float(ssim(jnp.asarray(imgs["rgb"]), jnp.asarray(gt)))
        if "mask" in sample:
            m = np.asarray(sample["mask"]).reshape(imgs["rgb"].shape[:2])
            metrics["mask_psnr"] = float(psnr(jnp.asarray(imgs["rgb"]), jnp.asarray(gt), jnp.asarray(m)))
        counter(metrics)
        results.append(imgs)

        if out_dir:
            _write_eval_imgs(out_dir, i, imgs, gt)
        if logger is not None:
            logger.add_log("eval img {}: {}".format(i, " ".join("{}={:.3f}".format(k, v) for k, v in metrics.items())))

    summary = counter.get_avg_summary()
    if logger is not None:
        logger.add_log("Eval summary ({} imgs): {}".format(n, counter.get_metric_info()))
    if out_dir:
        with open(os.path.join(out_dir, "eval_log.txt"), "w") as f:
            f.write("n_imgs: {}\n".format(n))
            for k, v in summary.items():
                f.write("{}: {:.4f}\n".format(k, v))
    return summary, results


def _write_eval_imgs(out_dir, idx, imgs, gt):
    import cv2

    pred = (np.clip(imgs["rgb"], 0, 1) * 255).astype(np.uint8)
    gtc = (np.clip(gt, 0, 1) * 255).astype(np.uint8)
    panels = [gtc, pred]
    if "depth" in imgs:
        d = imgs["depth"]
        d = (d - d.min()) / (d.max() - d.min() + 1e-8)
        panels.append((np.stack([d] * 3, -1) * 255).astype(np.uint8))
    if "mask" in imgs:
        m = np.clip(imgs["mask"], 0, 1)
        panels.append((np.stack([m] * 3, -1) * 255).astype(np.uint8))
    panel = np.concatenate(panels, axis=1)
    cv2.imwrite(os.path.join(out_dir, "eval_{:03d}.png".format(idx)), panel[..., ::-1])
