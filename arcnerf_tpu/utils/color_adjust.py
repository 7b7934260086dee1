"""Color adjustment transforms (reference common/visual/color_adjust.py:239):
CLAHE contrast equalization, gray-world white balance, gamma."""

import numpy as np


def clahe(img, clip_limit=2.0, tile_grid=(8, 8)):
    """Contrast-limited adaptive histogram equalization on the L channel.
    img (H, W, 3) float [0,1] rgb -> same."""
    import cv2

    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    lab = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB)
    op = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=tile_grid)
    lab[..., 0] = op.apply(lab[..., 0])
    out = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    return out.astype(np.float32) / 255.0


def white_balance_grayworld(img):
    """Gray-world white balance. img float [0,1] rgb."""
    means = img.reshape(-1, 3).mean(0)
    scale = means.mean() / np.maximum(means, 1e-6)
    return np.clip(img * scale[None, None, :], 0.0, 1.0).astype(np.float32)


def adjust_gamma(img, gamma=1.0):
    return np.clip(img, 0.0, 1.0) ** (1.0 / gamma)


def match_color_stats(img, ref):
    """Shift/scale img's per-channel mean/std to match ref (simple color
    transfer)."""
    out = img.copy()
    for c in range(3):
        m, s = img[..., c].mean(), img[..., c].std() + 1e-6
        mr, sr = ref[..., c].mean(), ref[..., c].std() + 1e-6
        out[..., c] = (img[..., c] - m) / s * sr + mr
    return np.clip(out, 0.0, 1.0).astype(np.float32)
