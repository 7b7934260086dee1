"""COLMAP model -> llff-style poses_bounds.npy + sparse point cloud.

Capability parity with /root/reference/arcnerf/colmap/colmap_func.py:14-282
(estimate_poses, load_colmap_data, save_poses, unregistered-image handling,
minify downsampling).
"""

import os

import numpy as np

from .colmap_lib import qvec2rotmat, read_model
from .colmap_wrapper import run_colmap


def load_colmap_data(scene_dir, model_sub="sparse/0"):
    """Read the sparse model -> (poses llff (N, 3, 5), pts3d dict,
    perm image-name order, image names)."""
    cams, imgs, pts3d = read_model(os.path.join(scene_dir, model_sub))

    cam = next(iter(cams.values()))
    h, w = cam.height, cam.width
    if cam.model == "SIMPLE_PINHOLE" or cam.model == "SIMPLE_RADIAL":
        f = cam.params[0]
    else:
        f = cam.params[0]  # fx
    hwf = np.array([h, w, f]).reshape(3, 1)

    names = [imgs[k].name for k in imgs]
    perm = np.argsort(names)
    w2c_mats = []
    for k in imgs:
        R = qvec2rotmat(imgs[k].qvec)
        t = imgs[k].tvec.reshape(3, 1)
        m = np.concatenate([np.concatenate([R, t], 1), np.array([[0, 0, 0, 1.0]])], 0)
        w2c_mats.append(m)
    w2c = np.stack(w2c_mats)
    c2w = np.linalg.inv(w2c)[:, :3, :4]  # (N, 3, 4)

    # colmap (right, down, forward) -> llff (down, right, back) columns
    poses = np.concatenate(
        [c2w[:, :, 1:2], c2w[:, :, 0:1], -c2w[:, :, 2:3], c2w[:, :, 3:4],
         np.tile(hwf[None], (c2w.shape[0], 1, 1))],
        axis=2,
    )  # (N, 3, 5)
    return poses, pts3d, perm, names


def save_poses(scene_dir, poses, pts3d, perm):
    """Write poses_bounds.npy with per-image near/far from visible 3d points
    (reference colmap_func.py:173)."""
    pts = np.stack([p.xyz for p in pts3d.values()]) if pts3d else np.zeros((0, 3))
    vis = {pid: p.image_ids for pid, p in pts3d.items()}

    n = poses.shape[0]
    # depth of each point in each image: z along camera forward
    save_arr = []
    img_ids = sorted({iid for p in pts3d.values() for iid in p.image_ids}) if pts3d else []
    id_to_row = {iid: i for i, iid in enumerate(img_ids)}

    zs_per_img = [[] for _ in range(n)]
    for p in pts3d.values():
        for iid in p.image_ids:
            row = id_to_row.get(iid)
            if row is None or row >= n:
                continue
            c2w = poses[row, :, :4]
            # llff cols (down, right, back): forward = -col2
            t = c2w[:, 3]
            forward = -c2w[:, 2]
            zs_per_img[row].append(float(np.dot(p.xyz - t, forward)))

    for i in perm:
        zs = np.array(zs_per_img[i]) if i < len(zs_per_img) and zs_per_img[i] else np.array([0.1, 10.0])
        zs = zs[zs > 0] if (zs > 0).any() else np.array([0.1, 10.0])
        near, far = np.percentile(zs, 0.5), np.percentile(zs, 99.5)
        save_arr.append(np.concatenate([poses[i].ravel(), np.array([near, far])]))
    save_arr = np.stack(save_arr)
    np.save(os.path.join(scene_dir, "poses_bounds.npy"), save_arr)

    # also persist the sparse cloud for bounds/visualization
    if pts.shape[0] > 0:
        colors = np.stack([p.rgb for p in pts3d.values()])
        from ..geometry.point_cloud import save_point_cloud

        save_point_cloud(os.path.join(scene_dir, "sparse_points.ply"), pts, colors.astype(np.uint8))
    return save_arr


def estimate_poses(scene_dir, match_type="sequential_matcher", dense_reconstruct=False, logger=None):
    """End-to-end: run colmap on scene_dir/images, convert to
    poses_bounds.npy (reference colmap_func.py:14)."""
    if not os.path.exists(os.path.join(scene_dir, "sparse", "0")):
        run_colmap(scene_dir, match_type)
    poses, pts3d, perm, names = load_colmap_data(scene_dir)
    arr = save_poses(scene_dir, poses, pts3d, perm)
    if logger is not None:
        logger.add_log("estimated poses for {} images -> poses_bounds.npy".format(arr.shape[0]))
    if dense_reconstruct:
        from .colmap_wrapper import run_colmap_dense

        run_colmap_dense(scene_dir)
    return arr


def minify(scene_dir, factors=(4, 8)):
    """Write images_{f}/ downsampled copies (reference colmap_func.py:226)."""
    import cv2
    import glob

    img_list = sorted(glob.glob(os.path.join(scene_dir, "images", "*")))
    for f in factors:
        out_dir = os.path.join(scene_dir, "images_{}".format(f))
        os.makedirs(out_dir, exist_ok=True)
        for p in img_list:
            img = cv2.imread(p)
            img = cv2.resize(img, (img.shape[1] // f, img.shape[0] // f), interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(out_dir, os.path.basename(p)), img)
