"""On-disk format-parsing tests for the dataset loaders: synthesize a
minimal scene in each source format (NeRF blender json, LLFF/Capture/HDRReal
poses_bounds.npy, DTU cameras.npz, nerf++/TT txt, NSVF txt) and load it
through the registry (reference test genre: tests_datasets loads real
scenes; here fixtures are generated so no downloads are needed)."""

import json
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from arcnerf_tpu.datasets import get_dataset  # noqa: E402
from arcnerf_tpu.geometry.poses import generate_cam_pose_on_sphere  # noqa: E402
from arcnerf_tpu.utils.cfgs import dict_to_obj  # noqa: E402

H, W, N = 16, 20, 4


def _write_imgs(img_dir, names, rgba=False):
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for name in names:
        img = (rng.uniform(size=(H, W, 4 if rgba else 3)) * 255).astype(np.uint8)
        if rgba:
            img[..., 3] = (img[..., 0] > 64) * 255  # nontrivial alpha
        cv2.imwrite(osp.join(img_dir, name), img)


def _ring_c2ws(n=N, radius=3.0):
    return generate_cam_pose_on_sphere("circle", radius, n, v_ratio=-0.3)


def _check_common(ds, with_mask=False, with_bounds=False):
    assert len(ds) > 0
    sample = ds[0]
    assert sample["img"].shape == (ds.H * ds.W, 3)
    assert sample["rays_o"].shape == (ds.H * ds.W, 3)
    assert sample["rays_d"].shape == (ds.H * ds.W, 3)
    assert np.all(np.isfinite(sample["rays_o"])) and np.all(np.isfinite(sample["rays_d"]))
    assert abs(float(np.linalg.norm(sample["rays_d"][0])) - 1.0) < 1e-4
    if with_mask:
        assert sample["mask"] is not None and sample["mask"].shape == (ds.H * ds.W,)
    if with_bounds:
        assert sample["bounds"].shape == (ds.H * ds.W, 2)
    return sample


def test_nerf_blender_json(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "NeRF", "toy")
    c2ws = _ring_c2ws()
    for split, n in (("train", N), ("val", 1), ("test", 1)):
        _write_imgs(osp.join(scene, split), ["r_{}.png".format(i) for i in range(n)], rgba=True)
        frames = [{"transform_matrix": c2ws[i % N].tolist()} for i in range(n)]
        with open(osp.join(scene, "transforms_{}.json".format(split)), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

    cfgs = dict_to_obj({"type": "NeRF", "scene_name": "toy"})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N and (ds.H, ds.W) == (H, W)
    _check_common(ds, with_mask=True)
    # val/eval splits pick their own images
    assert len(get_dataset(cfgs, root, mode="val")) == 1
    assert len(get_dataset(cfgs, root, mode="eval")) == 1


def _poses_bounds(c2ws, extra_cols=0):
    """(N, 17[+extra]) llff-style rows: 3x4 pose (down/right/back cols) +
    hwf column + near/far [+ exposure]."""
    rows = []
    for c2w in c2ws:
        r, d, fwd = c2w[:3, 0], c2w[:3, 1], c2w[:3, 2]
        llff = np.stack([d, r, -fwd], axis=1)  # (3, 3) down right back
        pose = np.concatenate([llff, c2w[:3, 3:4], np.array([[H], [W], [25.0]])], axis=1)
        row = list(pose.reshape(-1)) + [2.0, 6.0] + [0.5] * extra_cols
        rows.append(row)
    return np.asarray(rows, dtype=np.float64)


def test_llff_poses_bounds(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "LLFF", "fern")
    _write_imgs(osp.join(scene, "images"), ["{:03d}.png".format(i) for i in range(N)])
    np.save(osp.join(scene, "poses_bounds.npy"), _poses_bounds(_ring_c2ws()))

    cfgs = dict_to_obj({"type": "LLFF", "scene_name": "fern", "test_holdout": 4})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - N // 4  # holdout removed
    sample = _check_common(ds, with_bounds=True)
    assert np.all(sample["bounds"][:, 0] < sample["bounds"][:, 1])
    ds_eval = get_dataset(cfgs, root, mode="eval")
    assert len(ds_eval) == N // 4


def test_dtu_cameras_npz(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "DTU", "scan1")
    _write_imgs(osp.join(scene, "image"), ["{:06d}.png".format(i) for i in range(N)])
    os.makedirs(osp.join(scene, "mask"), exist_ok=True)
    for i in range(N):
        cv2.imwrite(osp.join(scene, "mask", "{:06d}.png".format(i)),
                    np.full((H, W), 255, dtype=np.uint8))

    K = np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1.0]])
    cams = {}
    for i, c2w in enumerate(_ring_c2ws()):
        w2c = np.linalg.inv(c2w)
        P = np.eye(4)
        P[:3, :4] = K @ w2c[:3, :4]
        cams["world_mat_{}".format(i)] = P
        cams["scale_mat_{}".format(i)] = np.eye(4)
    np.savez(osp.join(scene, "cameras.npz"), **cams)

    cfgs = dict_to_obj({"type": "DTU", "scan_id": 1, "test_holdout": 4})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - N // 4
    _check_common(ds, with_mask=True)
    # decomposition must recover the intrinsics (norm_cam_pose rescales
    # translations but K is untouched)
    K_rec = ds.cameras[0].get_intrinsic()
    np.testing.assert_allclose(K_rec[0, 0], 25.0, rtol=1e-3)
    np.testing.assert_allclose(K_rec[0, 2], W / 2, rtol=1e-3)


def test_tt_nerfpp_txt(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "TanksAndTemples", "truck")
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 25.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    for split, n in (("train", N), ("test", 2)):
        _write_imgs(osp.join(scene, split, "rgb"), ["{:03d}.png".format(i) for i in range(n)])
        os.makedirs(osp.join(scene, split, "pose"), exist_ok=True)
        os.makedirs(osp.join(scene, split, "intrinsics"), exist_ok=True)
        for i, c2w in enumerate(_ring_c2ws(n)):
            np.savetxt(osp.join(scene, split, "pose", "{:03d}.txt".format(i)), c2w.reshape(1, -1))
            np.savetxt(osp.join(scene, split, "intrinsics", "{:03d}.txt".format(i)), K.reshape(1, -1))

    cfgs = dict_to_obj({"type": "TT", "scene_name": "truck"})
    assert len(get_dataset(cfgs, root, mode="train")) == N
    ds_eval = get_dataset(cfgs, root, mode="eval")
    assert len(ds_eval) == 2
    _check_common(ds_eval)


def test_nsvf_txt(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "NSVF", "robot")
    _write_imgs(osp.join(scene, "rgb"), ["0_{:03d}.png".format(i) for i in range(N)]
                + ["1_{:03d}.png".format(i) for i in range(1)], rgba=True)
    os.makedirs(osp.join(scene, "pose"), exist_ok=True)
    for i, c2w in enumerate(_ring_c2ws(N + 1)):
        prefix = 0 if i < N else 1
        np.savetxt(osp.join(scene, "pose", "{}_{:03d}.txt".format(prefix, i % N)), c2w)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 25.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    np.savetxt(osp.join(scene, "intrinsics.txt"), K)

    cfgs = dict_to_obj({"type": "NSVF", "scene_name": "robot"})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N
    _check_common(ds, with_mask=True)
    assert len(get_dataset(cfgs, root, mode="val")) == 1


def test_capture_poses_bounds_with_pc(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "Capture", "desk")
    _write_imgs(osp.join(scene, "images"), ["{:03d}.png".format(i) for i in range(N)])
    np.save(osp.join(scene, "poses_bounds.npy"), _poses_bounds(_ring_c2ws()))
    pts = np.random.default_rng(2).uniform(-0.5, 0.5, size=(50, 3))
    np.save(osp.join(scene, "points3D.npy"), pts)

    cfgs = dict_to_obj({"type": "Capture", "scene_name": "desk", "test_holdout": 4,
                        "pc_radius": 2.0})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - N // 4
    sample = _check_common(ds)
    if sample.get("bounds") is not None:
        assert np.all(np.isfinite(sample["bounds"]))


def test_hdrreal_exposures(tmp_path):
    root = str(tmp_path)
    scene = osp.join(root, "HDR-Real", "lamp")
    n = 10  # exposure split keeps a subset per mode
    _write_imgs(osp.join(scene, "images"), ["{:03d}.png".format(i) for i in range(n)])
    np.save(osp.join(scene, "poses_bounds_exps.npy"), _poses_bounds(_ring_c2ws(n), extra_cols=1))

    cfgs = dict_to_obj({"type": "HDRReal", "scene_name": "lamp"})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) > 0
    sample = ds[0]
    assert "exp_time" in sample and float(np.asarray(sample["exp_time"]).reshape(-1)[0]) > 0.0


def test_blendedmvs_cameras_npz(tmp_path):
    """Reference layout (blendedmvs_dataset.py:24-89): BlendedMVS/<scene>/
    image/*.jpg + cameras.npz with world_mat_i @ scale_mat_i projections."""
    root = str(tmp_path)
    scene = osp.join(root, "BlendedMVS", "bmvs_bear")
    _write_imgs(osp.join(scene, "image"), ["{:08d}.jpg".format(i) for i in range(N)])

    K = np.array([[25.0, 0, W / 2], [0, 25.0, H / 2], [0, 0, 1.0]])
    cams = {}
    for i, c2w in enumerate(_ring_c2ws()):
        w2c = np.linalg.inv(c2w)
        P = np.eye(4)
        P[:3, :4] = K @ w2c[:3, :4]
        cams["world_mat_{}".format(i)] = P
        cams["scale_mat_{}".format(i)] = np.eye(4)
    np.savez(osp.join(scene, "cameras.npz"), **cams)

    cfgs = dict_to_obj({"type": "BlendedMVS", "scene_name": "bmvs_bear", "test_holdout": 4})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - N // 4
    _check_common(ds)
    K_rec = ds.cameras[0].get_intrinsic()
    np.testing.assert_allclose(K_rec[0, 0], 25.0, rtol=1e-3)
    assert len(get_dataset(cfgs, root, mode="eval")) == N // 4


def test_mipnerf360_poses_bounds_jpg(tmp_path):
    """Reference layout (mipnerf360_dataset.py:25-79): MipNeRF360/<scene>/
    images/*.JPG + poses_bounds.npy (llff rows)."""
    root = str(tmp_path)
    scene = osp.join(root, "MipNeRF360", "garden")
    _write_imgs(osp.join(scene, "images"), ["IMG_{:04d}.JPG".format(i) for i in range(N)])
    np.save(osp.join(scene, "poses_bounds.npy"), _poses_bounds(_ring_c2ws()))

    cfgs = dict_to_obj({"type": "MipNeRF360", "scene_name": "garden", "test_holdout": 4})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - N // 4
    sample = _check_common(ds, with_bounds=True)
    assert np.all(sample["bounds"][:, 0] < sample["bounds"][:, 1])


def _try_write_exr(path, arr):
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    try:
        ok = cv2.imwrite(path, arr.astype(np.float32))
    except cv2.error:
        return False
    return bool(ok) and osp.exists(path)


def test_rtmv_json_frames(tmp_path):
    """Reference layout (rtmv_dataset.py:27-118): RTMV/<split>/<scene>/
    NNNNN.json (camera_data: cam2world + intrinsics) + NNNNN.exr images +
    NNNNN.seg.exr masks. Falls back to png frames if this cv2 build has no
    OpenEXR codec (the loader accepts both)."""
    import json as _json

    root = str(tmp_path)
    scene = osp.join(root, "RTMV", "google_scanned", "toy")
    os.makedirs(scene, exist_ok=True)
    rng = np.random.default_rng(0)

    use_exr = _try_write_exr(osp.join(scene, "_probe.exr"), np.zeros((4, 4, 3)))
    n_masks = 0
    for i, c2w in enumerate(_ring_c2ws()):
        name = osp.join(scene, "{:05d}".format(i))
        img = rng.uniform(size=(H, W, 3)).astype(np.float32)
        if use_exr:
            assert _try_write_exr(name + ".exr", img)
            if _try_write_exr(name + ".seg.exr", (img[..., :1] > 0.5).astype(np.float32)):
                n_masks += 1
        else:
            cv2.imwrite(name + ".png", (img * 255).astype(np.uint8))
        meta = {"camera_data": {
            "cam2world": c2w.T.tolist(),  # RTMV stores transposed
            "intrinsics": {"fx": 25.0, "fy": 25.0, "cx": W / 2, "cy": H / 2},
            "width": W, "height": H,
        }}
        with open(name + ".json", "w") as f:
            _json.dump(meta, f)

    cfgs = dict_to_obj({"type": "RTMV", "scene_name": "toy",
                        "split_name": "google_scanned"})
    ds = get_dataset(cfgs, root, mode="train")
    assert len(ds) == N - (-(-N // 8))  # default test_holdout=8 takes every 8th
    assert len(get_dataset(cfgs, root, mode="eval")) == -(-N // 8)
    _check_common(ds, with_mask=(use_exr and n_masks == N))
    sample = ds[0]
    assert float(np.asarray(sample["img"]).max()) <= 1.0 + 1e-6
