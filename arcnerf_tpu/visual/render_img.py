"""Progress imagery: panels of gt/pred rgb, depth, mask, normal, error.

Capability parity with /root/reference/arcnerf/visual/render_img.py:22-322
(render_progress_imgs, get_sample_ray_imgs 2d sigma/alpha/weight curves,
write_progress_imgs).
"""

import os

import numpy as np


def _to_u8(img):
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def _colorize_depth(depth):
    d = np.asarray(depth, dtype=np.float64)
    lo, hi = d.min(), d.max()
    d = (d - lo) / (hi - lo + 1e-8)
    return np.stack([d] * 3, axis=-1)


def _gray3(x):
    return np.stack([np.clip(x, 0, 1)] * 3, axis=-1)


def render_progress_imgs(inputs, output):
    """Assemble visualization panels from a rendered (H, W, ...) output dict
    and the gt sample. Returns {'imgs': {'color': (H, W*k, 3) u8 panel},
    'rays': optional curve data}."""
    h, w = int(inputs["H"]), int(inputs["W"])
    panels = []
    gt = np.asarray(inputs["img"]).reshape(h, w, 3)
    panels.append(gt)

    for key in ("rgb", "rgb_fine", "rgb_coarse"):
        if key in output and output[key] is not None:
            pred = np.asarray(output[key]).reshape(h, w, 3)
            panels.append(pred)
            err = np.abs(pred - gt).mean(-1)
            panels.append(_gray3(err * 5.0))
            break

    for key in ("depth", "depth_fine", "depth_coarse"):
        if key in output and output[key] is not None:
            panels.append(_colorize_depth(np.asarray(output[key]).reshape(h, w)))
            break
    for key in ("mask", "mask_fine", "mask_coarse"):
        if key in output and output[key] is not None:
            panels.append(_gray3(np.asarray(output[key]).reshape(h, w)))
            break
    for key in ("normal", "normal_fine", "normal_coarse"):
        if key in output and output[key] is not None:
            n = np.asarray(output[key]).reshape(h, w, 3)
            panels.append((n + 1.0) / 2.0)
            break

    panel = np.concatenate([_to_u8(p) for p in panels], axis=1)
    imgs = {"names": ["color"], "imgs": [panel]}
    return imgs


def get_sample_ray_imgs(output, index=None, n_rays=1):
    """2d sigma/alpha/trans/weights curves for sampled rays (matplotlib
    figure as uint8 image); needs progress_* keys."""
    from ..render.ray_helper import sample_ray_marching_output_by_index

    progress = {k.replace("progress_", ""): np.asarray(v) for k, v in output.items()
                if k.startswith("progress_") and hasattr(v, "shape")}
    if "sigma" not in progress or "zvals" not in progress:
        return None
    out_list, sample_index = sample_ray_marching_output_by_index(progress, index, n_rays)
    figs = []
    for res in out_list:
        figs.append(draw_ray_curves(res))
    return figs, sample_index


def draw_ray_curves(res):
    """One ray's curves -> uint8 image via matplotlib Agg."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3), dpi=100)
    for (x, y), legend in zip(res["lines"], res["legends"]):
        ax.plot(x, y, label=legend, linewidth=1)
    for (x, y) in res["points"]:
        ax.scatter(x, y, s=2)
    ax.legend(fontsize=6)
    ax.set_xlabel("zvals")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def write_progress_imgs(imgs_dict, folder, name_prefix="progress", epoch=0, monitor=None):
    """Write panels to disk and/or a Monitor (reference render_img.py:208)."""
    os.makedirs(folder, exist_ok=True)
    import cv2

    paths = []
    for name, img in zip(imgs_dict.get("names", []), imgs_dict.get("imgs", [])):
        path = os.path.join(folder, "{}_{}_ep{}.png".format(name_prefix, name, epoch))
        cv2.imwrite(path, img[..., ::-1])
        paths.append(path)
        if monitor is not None:
            monitor.add_img("{}/{}".format(name_prefix, name), img, epoch)
    return paths
