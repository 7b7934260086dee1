"""2d plotting utilities (reference common/visual/plot_2d.py:38
draw_2d_components + cv2 pixel/bbox draws)."""

import numpy as np


def draw_2d_components(points=None, lines=None, legends=None, xlabel="x", ylabel="y", title="",
                       save_path=None, return_fig=False):
    """points: list of [x_list, y_list]; lines: list of [x_list, y_list]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4), dpi=100)
    if lines:
        for i, (x, y) in enumerate(lines):
            label = legends[i] if legends and i < len(legends) else None
            ax.plot(x, y, label=label, linewidth=1)
    if points:
        for x, y in points:
            ax.scatter(x, y, s=4)
    if legends:
        ax.legend(fontsize=7)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path)
    if return_fig:
        return fig
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return img


def draw_points_on_img(img, pixels, color=(255, 0, 0), radius=1):
    """img (H, W, 3) uint8; pixels (N, 2) xy."""
    import cv2

    out = img.copy()
    for p in np.asarray(pixels).astype(int):
        cv2.circle(out, tuple(p), radius, color, -1)
    return out


def draw_bbox_on_img(img, bboxes, color=(0, 255, 0), thickness=1):
    """bboxes (N, 4) xyxy."""
    import cv2

    out = img.copy()
    for b in np.asarray(bboxes).astype(int):
        cv2.rectangle(out, (b[0], b[1]), (b[2], b[3]), color, thickness)
    return out
