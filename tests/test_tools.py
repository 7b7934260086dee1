"""Tools CLI tests: extract_video on a generated mp4; visual-hull bbox on
the synthetic dataset; colmap poses_bounds export from a fake model dir."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_extract_video(tmp_path):
    from arcnerf_tpu.utils.video_utils import write_video

    video = str(tmp_path / "v.mp4")
    frames = [np.full((48, 64, 3), i / 20.0, dtype=np.float32) for i in range(20)]
    write_video(video, frames, fps=10)

    scene = str(tmp_path / "scene")
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "extract_video.py"),
         "--video_path", video, "--scene_dir", scene, "--video_downsample", "2"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0, out.stderr
    imgs = os.listdir(os.path.join(scene, "images"))
    assert len(imgs) == 10


def test_visual_hull_bbox():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from get_3d_bbox_from_silhouette import visual_hull_bbox

    from arcnerf_tpu.datasets.synthetic_dataset import Synthetic
    from arcnerf_tpu.utils.cfgs import dict_to_obj

    ds = Synthetic(dict_to_obj({"n_imgs": 8, "wh": [48, 48], "cam_radius": 2.5}), None, "train")
    bbox = visual_hull_bbox(ds, n_grid=32, side=2.5, thres=0.9)
    assert bbox is not None and bbox.shape == (3, 2)
    # scene spheres live within roughly [-0.7, 0.7]
    assert (bbox[:, 0] > -1.0).all() and (bbox[:, 1] < 1.0).all()
    assert (bbox[:, 1] - bbox[:, 0] > 0.4).all()


def test_colmap_save_poses(tmp_path):
    """poses_bounds export from synthetic colmap structures."""
    from arcnerf_tpu.colmap.colmap_func import save_poses
    from arcnerf_tpu.colmap.colmap_lib import Point3D

    n = 4
    hwf = np.array([48.0, 64.0, 60.0])
    poses = np.concatenate(
        [np.tile(np.eye(3, 4)[None], (n, 1, 1)), np.tile(hwf.reshape(1, 3, 1), (n, 1, 1))], axis=2
    )
    pts3d = {
        i: Point3D(i, np.array([0.0, 0.0, -2.0 - i]), np.array([200, 100, 50]), 0.1,
                   np.array([1, 2]), np.array([0, 0]))
        for i in range(10)
    }
    arr = save_poses(str(tmp_path), poses, pts3d, np.arange(n))
    assert arr.shape == (n, 17)
    assert os.path.exists(tmp_path / "poses_bounds.npy")
    assert os.path.exists(tmp_path / "sparse_points.ply")
