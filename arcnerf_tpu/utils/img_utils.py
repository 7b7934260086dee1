"""Image IO + processing helpers (reference common/utils/img_utils.py:170).

read/write, [0,1] <-> uint8, resizing, blur metric (Laplacian variance).
"""

import numpy as np


def read_img(path, norm_by_255=True, rgb=True, gray=False):
    import cv2

    flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_UNCHANGED
    img = cv2.imread(path, flag)
    assert img is not None, "could not read {}".format(path)
    if not gray and rgb and img.ndim == 3:
        order = [2, 1, 0, 3] if img.shape[-1] == 4 else [2, 1, 0]
        img = img[..., order]
    if norm_by_255:
        img = img.astype(np.float32) / 255.0
    return img


def write_img(path, img, rgb=True):
    import cv2

    if img.dtype != np.uint8:
        img = img_to_uint8(img)
    if rgb and img.ndim == 3:
        img = img[..., ::-1]
    cv2.imwrite(path, img)


def img_to_uint8(img):
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def uint8_to_img(img):
    return img.astype(np.float32) / 255.0


def img_scale(img, scale, nearest=False):
    import cv2

    interp = cv2.INTER_NEAREST if nearest else (cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR)
    return cv2.resize(img, None, fx=scale, fy=scale, interpolation=interp)


def get_img_blur(img):
    """Laplacian-variance sharpness score (higher = sharper)."""
    import cv2

    if img.dtype != np.uint8:
        img = img_to_uint8(img)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return float(cv2.Laplacian(img, cv2.CV_64F).var())


def heatmap_img(values, cmap="jet"):
    """(H, W) scalars -> (H, W, 3) uint8 colormap."""
    import cv2

    v = np.asarray(values, dtype=np.float64)
    v = (v - v.min()) / (v.max() - v.min() + 1e-8)
    cmaps = {"jet": cv2.COLORMAP_JET, "viridis": cv2.COLORMAP_VIRIDIS, "turbo": cv2.COLORMAP_TURBO}
    out = cv2.applyColorMap((v * 255).astype(np.uint8), cmaps.get(cmap, cv2.COLORMAP_JET))
    return out[..., ::-1]
