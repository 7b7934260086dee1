"""COLMAP model readers (binary + text) and quaternion helpers.

Capability parity with /root/reference/arcnerf/colmap/colmap_lib.py:258:
cameras.bin / images.bin / points3D.bin readers following the public COLMAP
sparse-model binary layout, plus qvec<->rotmat conversion.
"""

import collections
import os
import struct

import numpy as np

CameraModel = collections.namedtuple("CameraModel", ["model_id", "model_name", "num_params"])
Camera = collections.namedtuple("Camera", ["id", "model", "width", "height", "params"])
Image = collections.namedtuple("Image", ["id", "qvec", "tvec", "camera_id", "name", "xys", "point3D_ids"])
Point3D = collections.namedtuple("Point3D", ["id", "xyz", "rgb", "error", "image_ids", "point2D_idxs"])

CAMERA_MODELS = [
    CameraModel(0, "SIMPLE_PINHOLE", 3),
    CameraModel(1, "PINHOLE", 4),
    CameraModel(2, "SIMPLE_RADIAL", 4),
    CameraModel(3, "RADIAL", 5),
    CameraModel(4, "OPENCV", 8),
    CameraModel(5, "OPENCV_FISHEYE", 8),
    CameraModel(6, "FULL_OPENCV", 12),
    CameraModel(7, "FOV", 5),
    CameraModel(8, "SIMPLE_RADIAL_FISHEYE", 4),
    CameraModel(9, "RADIAL_FISHEYE", 5),
    CameraModel(10, "THIN_PRISM_FISHEYE", 12),
]
CAMERA_MODEL_IDS = {m.model_id: m for m in CAMERA_MODELS}
CAMERA_MODEL_NAMES = {m.model_name: m for m in CAMERA_MODELS}


def _read(f, n_bytes, fmt):
    return struct.unpack("<" + fmt, f.read(n_bytes))


def read_cameras_binary(path):
    cameras = {}
    with open(path, "rb") as f:
        n = _read(f, 8, "Q")[0]
        for _ in range(n):
            cam_id, model_id, width, height = _read(f, 24, "iiQQ")
            model = CAMERA_MODEL_IDS[model_id]
            params = np.array(_read(f, 8 * model.num_params, "d" * model.num_params))
            cameras[cam_id] = Camera(cam_id, model.model_name, width, height, params)
    return cameras


def read_images_binary(path):
    images = {}
    with open(path, "rb") as f:
        n = _read(f, 8, "Q")[0]
        for _ in range(n):
            vals = _read(f, 64, "idddddddi")
            img_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            cam_id = vals[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            n_pts = _read(f, 8, "Q")[0]
            data = _read(f, 24 * n_pts, "ddq" * n_pts)
            xys = np.array(data).reshape(-1, 3)[:, :2] if n_pts else np.zeros((0, 2))
            ids = np.array(data[2::3], dtype=np.int64) if n_pts else np.zeros(0, dtype=np.int64)
            images[img_id] = Image(img_id, qvec, tvec, cam_id, name.decode(), xys, ids)
    return images


def read_points3d_binary(path):
    points = {}
    with open(path, "rb") as f:
        n = _read(f, 8, "Q")[0]
        for _ in range(n):
            vals = _read(f, 43, "QdddBBBd")
            pid = vals[0]
            xyz = np.array(vals[1:4])
            rgb = np.array(vals[4:7])
            error = vals[7]
            track_len = _read(f, 8, "Q")[0]
            track = _read(f, 8 * track_len, "ii" * track_len)
            points[pid] = Point3D(
                pid, xyz, rgb, error,
                np.array(track[0::2], dtype=np.int64), np.array(track[1::2], dtype=np.int64),
            )
    return points


def read_cameras_text(path):
    cameras = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            width, height = int(parts[2]), int(parts[3])
            params = np.array([float(p) for p in parts[4:]])
            cameras[cam_id] = Camera(cam_id, model, width, height, params)
    return cameras


def read_images_text(path):
    images = {}
    with open(path) as f:
        lines = [ln for ln in f if not ln.startswith("#") and ln.strip()]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        img_id = int(parts[0])
        qvec = np.array([float(p) for p in parts[1:5]])
        tvec = np.array([float(p) for p in parts[5:8]])
        cam_id = int(parts[8])
        name = parts[9]
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array([float(p) for p in pts]).reshape(-1, 3)[:, :2] if pts else np.zeros((0, 2))
        ids = np.array(pts[2::3], dtype=np.int64) if pts else np.zeros(0, dtype=np.int64)
        images[img_id] = Image(img_id, qvec, tvec, cam_id, name, xys, ids)
    return images


def read_model(model_dir):
    """Read a sparse model dir (binary preferred, text fallback)."""
    if os.path.exists(os.path.join(model_dir, "cameras.bin")):
        cams = read_cameras_binary(os.path.join(model_dir, "cameras.bin"))
        imgs = read_images_binary(os.path.join(model_dir, "images.bin"))
        pts = read_points3d_binary(os.path.join(model_dir, "points3D.bin"))
    else:
        cams = read_cameras_text(os.path.join(model_dir, "cameras.txt"))
        imgs = read_images_text(os.path.join(model_dir, "images.txt"))
        pts = {}
    return cams, imgs, pts


def qvec2rotmat(qvec):
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rotmat2qvec(R):
    from ..geometry.transformation import matrix_to_quaternion
    import jax.numpy as jnp

    return np.asarray(matrix_to_quaternion(jnp.asarray(R[None]))[0])
