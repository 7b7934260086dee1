"""Point cloud I/O (reference arcnerf/geometry/point_cloud.py).

Minimal PLY save/load in pure python (trimesh is not available in this
environment).
"""

import numpy as np


def save_point_cloud(path, pts, colors=None):
    """Write ascii PLY. pts (N, 3) float; colors (N, 3) float [0,1] or uint8."""
    n = pts.shape[0]
    has_color = colors is not None
    if has_color:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0.0, 1.0) * 255).astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex {}\n".format(n))
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = "{:.6f} {:.6f} {:.6f}".format(*pts[i])
            if has_color:
                row += " {} {} {}".format(*colors[i])
            f.write(row + "\n")


def load_point_cloud(path):
    """Read ascii PLY vertices. Returns pts (N, 3), colors (N, 3) uint8 or None."""
    with open(path, "r") as f:
        lines = f.read().splitlines()
    n = 0
    props = []
    header_end = 0
    for i, line in enumerate(lines):
        if line.startswith("element vertex"):
            n = int(line.split()[-1])
        elif line.startswith("property"):
            props.append(line.split()[-1])
        elif line.startswith("end_header"):
            header_end = i + 1
            break
    data = np.array([[float(v) for v in row.split()] for row in lines[header_end:header_end + n]])
    pts = data[:, :3].astype(np.float32)
    colors = data[:, 3:6].astype(np.uint8) if "red" in props else None
    return pts, colors
