"""COLMAP sparse-model binary/text round-trip tests: write a model with
struct.pack following the public COLMAP layout, read it back through
colmap_lib, and run the full load_colmap_data -> save_poses pipeline
(poses_bounds.npy + sparse ply) that feeds the Capture/LLFF loaders."""

import os
import os.path as osp
import struct

import numpy as np

from arcnerf_tpu.colmap.colmap_lib import (
    qvec2rotmat,
    read_cameras_binary,
    read_cameras_text,
    read_images_binary,
    read_images_text,
    read_model,
    read_points3d_binary,
    rotmat2qvec,
)
from arcnerf_tpu.colmap.colmap_func import load_colmap_data, save_poses

W, H, FOCAL = 64, 48, 60.0


def _write_cameras_bin(path, n=1):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for cid in range(1, n + 1):
            # PINHOLE (model 1): fx fy cx cy
            f.write(struct.pack("<iiQQ", cid, 1, W, H))
            f.write(struct.pack("<dddd", FOCAL, FOCAL, W / 2, H / 2))


def _ring_w2c(n):
    """n cameras on a ring looking at the origin -> list of (qvec, tvec)."""
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(a), 0.5, 3 * np.sin(a)])
        fwd = -pos / np.linalg.norm(pos)
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_c2w = np.stack([right, down, fwd], axis=1)
        R_w2c = R_c2w.T
        t = -R_w2c @ pos
        out.append((rotmat2qvec(R_w2c), t))
    return out


def _write_images_bin(path, cams_w2c, pts_per_img=2):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams_w2c)))
        for i, (q, t) in enumerate(cams_w2c):
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write("img_{:03d}.png".format(i).encode() + b"\x00")
            f.write(struct.pack("<Q", pts_per_img))
            for j in range(pts_per_img):
                f.write(struct.pack("<ddq", 10.0 + j, 20.0 + j, j + 1))


def _write_points_bin(path, pts, image_ids):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(pts)))
        for pid, xyz in enumerate(pts, start=1):
            f.write(struct.pack("<QdddBBBd", pid, *xyz, 200, 100, 50, 0.5))
            f.write(struct.pack("<Q", len(image_ids)))
            for k, iid in enumerate(image_ids):
                f.write(struct.pack("<ii", iid, k))


def _make_model(model_dir, n_imgs=4, n_pts=20):
    os.makedirs(model_dir, exist_ok=True)
    _write_cameras_bin(osp.join(model_dir, "cameras.bin"))
    cams = _ring_w2c(n_imgs)
    _write_images_bin(osp.join(model_dir, "images.bin"), cams)
    pts = np.random.default_rng(0).uniform(-0.5, 0.5, size=(n_pts, 3))
    _write_points_bin(osp.join(model_dir, "points3D.bin"), pts, list(range(1, n_imgs + 1)))
    return cams, pts


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        # rotmat2qvec goes through the f32 jax quaternion helper
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-6)


def test_binary_readers(tmp_path):
    model_dir = str(tmp_path / "sparse" / "0")
    cams_w2c, pts = _make_model(model_dir)

    cams = read_cameras_binary(osp.join(model_dir, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == W and cams[1].height == H
    np.testing.assert_allclose(cams[1].params, [FOCAL, FOCAL, W / 2, H / 2])

    imgs = read_images_binary(osp.join(model_dir, "images.bin"))
    assert len(imgs) == 4
    assert imgs[1].name == "img_000.png" and imgs[1].camera_id == 1
    np.testing.assert_allclose(imgs[2].qvec, cams_w2c[1][0], atol=1e-10)
    np.testing.assert_allclose(imgs[2].tvec, cams_w2c[1][1], atol=1e-10)
    assert imgs[1].xys.shape == (2, 2) and list(imgs[1].point3D_ids) == [1, 2]

    points = read_points3d_binary(osp.join(model_dir, "points3D.bin"))
    assert len(points) == 20
    np.testing.assert_allclose(points[1].xyz, pts[0], atol=1e-10)
    assert tuple(points[1].rgb) == (200, 100, 50)
    assert list(points[1].image_ids) == [1, 2, 3, 4]


def test_text_readers_match_binary(tmp_path):
    model_dir = str(tmp_path / "sparse" / "0")
    cams_w2c, _ = _make_model(model_dir)
    bin_cams = read_cameras_binary(osp.join(model_dir, "cameras.bin"))
    bin_imgs = read_images_binary(osp.join(model_dir, "images.bin"))

    txt_dir = str(tmp_path / "txt")
    os.makedirs(txt_dir, exist_ok=True)
    with open(osp.join(txt_dir, "cameras.txt"), "w") as f:
        f.write("# cameras\n")
        for c in bin_cams.values():
            f.write("{} {} {} {} {}\n".format(
                c.id, c.model, c.width, c.height, " ".join(str(p) for p in c.params)))
    with open(osp.join(txt_dir, "images.txt"), "w") as f:
        f.write("# images\n")
        for im in bin_imgs.values():
            f.write("{} {} {} {} {}\n".format(
                im.id, " ".join(str(v) for v in im.qvec), " ".join(str(v) for v in im.tvec),
                im.camera_id, im.name))
            f.write(" ".join("{} {} {}".format(x, y, p)
                             for (x, y), p in zip(im.xys, im.point3D_ids)) + "\n")

    t_cams = read_cameras_text(osp.join(txt_dir, "cameras.txt"))
    t_imgs = read_images_text(osp.join(txt_dir, "images.txt"))
    for cid in bin_cams:
        np.testing.assert_allclose(t_cams[cid].params, bin_cams[cid].params)
    for iid in bin_imgs:
        np.testing.assert_allclose(t_imgs[iid].qvec, bin_imgs[iid].qvec, atol=1e-12)
        assert t_imgs[iid].name == bin_imgs[iid].name


def test_load_and_save_poses_pipeline(tmp_path):
    scene = str(tmp_path)
    _make_model(osp.join(scene, "sparse", "0"))

    poses, pts3d, perm, names = load_colmap_data(scene)
    assert poses.shape == (4, 3, 5)
    np.testing.assert_allclose(poses[0, :, 4], [H, W, FOCAL])
    assert sorted(names) == [names[i] for i in perm]
    # camera centers sit on the radius-3 ring
    centers = poses[:, :, 3]
    np.testing.assert_allclose(np.linalg.norm(centers, axis=1),
                               np.sqrt(9 + 0.25), rtol=1e-6)

    arr = save_poses(scene, poses, pts3d, perm)
    assert arr.shape == (4, 17)
    on_disk = np.load(osp.join(scene, "poses_bounds.npy"))
    np.testing.assert_allclose(on_disk, arr)
    # near/far bracket the ring-to-origin distance (~3) and are positive
    assert np.all(on_disk[:, 15] > 0) and np.all(on_disk[:, 16] > on_disk[:, 15])
    assert np.all(on_disk[:, 15] < 3.2) and np.all(on_disk[:, 16] > 2.0)
    assert osp.exists(osp.join(scene, "sparse_points.ply"))


def test_read_model_binary_preferred(tmp_path):
    model_dir = str(tmp_path / "sparse" / "0")
    _make_model(model_dir)
    cams, imgs, pts = read_model(model_dir)
    assert len(cams) == 1 and len(imgs) == 4 and len(pts) == 20
