"""Self-captured (COLMAP) dataset loaders.

Capability parity with /root/reference/arcnerf/datasets/capture_dataset.py
(COLMAP poses_bounds.npy + sparse point cloud, pc_radius filtering, per-ray
near/far bounds from point-cloud projection — the Base3dPCDataset role of
base_3d_pc_dataset.py) and mipnerf360_dataset.py (same poses_bounds.npy
format, unbounded scenes).
"""

import glob
import os.path as osp

import numpy as np

from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset
from .llff_dataset import LLFF


class PosesBoundsDataset(Base3dDataset):
    """Shared loader for poses_bounds.npy captures."""

    folder = "Capture"

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, self.folder, cfgs.scene_name)
        self.identifier = cfgs.scene_name

        img_list = sorted(
            glob.glob(osp.join(self.data_spec_dir, "images", "*.png"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.jpg"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.JPG"))
        )
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        poses_bounds = np.load(osp.join(self.data_spec_dir, "poses_bounds.npy"))
        poses = poses_bounds[:, :15].reshape(-1, 3, 5)
        self.bounds = [poses_bounds[i, 15:17] for i in range(self.n_imgs)]
        hwf = poses[0, :, 4]
        self.H, self.W = int(hwf[0]), int(hwf[1])
        focal = float(hwf[2])

        import cv2

        self.images = []
        for p in img_list:
            img = cv2.imread(p)[..., [2, 1, 0]].astype(np.float32) / 255.0
            if img.shape[:2] != (self.H, self.W):
                img = cv2.resize(img, (self.W, self.H), interpolation=cv2.INTER_AREA)
            self.images.append(img)

        intrinsic = np.eye(3)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2], intrinsic[1, 2] = self.W / 2.0, self.H / 2.0
        self.cameras = [
            PerspectiveCamera(intrinsic, LLFF.llff_to_our_pose(poses[i, :, :4]), self.W, self.H)
            for i in range(self.n_imgs)
        ]

        # sparse point cloud from colmap (optional)
        self.point_cloud = self.get_sparse_point_cloud()

        self.adjust_cam_translation()
        self.norm_cam_pose()
        self.center_cam_poses_by_view_dirs()
        self.align_cam_horizontal()
        self.exchange_coord()
        self.filter_point_cloud()
        self.set_bounds_from_pc()

        self.remove_blur_images()
        holdout = self.get_holdout_index()
        self.apply_holdout(holdout)
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()

    def get_sparse_point_cloud(self):
        ply_path = osp.join(self.data_spec_dir, "sparse_points.ply")
        npy_path = osp.join(self.data_spec_dir, "points3D.npy")
        if osp.exists(ply_path):
            from ..geometry.point_cloud import load_point_cloud

            pts, colors = load_point_cloud(ply_path)
            return {"pts": pts, "color": colors.astype(np.float32) / 255.0 if colors is not None else None}
        if osp.exists(npy_path):
            data = np.load(npy_path)
            return {"pts": data[:, :3].astype(np.float32),
                    "color": data[:, 3:6].astype(np.float32) / 255.0 if data.shape[1] >= 6 else None}
        # colmap binary model
        bin_path = osp.join(self.data_spec_dir, "sparse", "0", "points3D.bin")
        if osp.exists(bin_path):
            from ..colmap.colmap_lib import read_points3d_binary

            pts3d = read_points3d_binary(bin_path)
            pts = np.stack([p.xyz for p in pts3d.values()]).astype(np.float32)
            colors = np.stack([p.rgb for p in pts3d.values()]).astype(np.float32) / 255.0
            return {"pts": pts, "color": colors}
        return None

    def filter_point_cloud(self):
        """Keep point cloud within pc_radius of origin (reference
        capture_dataset.py:49)."""
        pc_radius = get_value_from_cfgs_field(self.cfgs, "pc_radius", None)
        if self.point_cloud is None or pc_radius is None:
            return
        keep = np.linalg.norm(self.point_cloud["pts"], axis=-1) <= pc_radius
        self.point_cloud["pts"] = self.point_cloud["pts"][keep]
        if self.point_cloud.get("color") is not None:
            self.point_cloud["color"] = self.point_cloud["color"][keep]

    def set_bounds_from_pc(self, extend_ratio=0.2):
        """Per-image near/far from projecting the point cloud into each cam
        (reference base_3d_pc_dataset.py role)."""
        if self.point_cloud is None or not get_value_from_cfgs_field(self.cfgs, "bounds_from_pc", True):
            return
        pts = self.point_cloud["pts"]
        if pts.shape[0] == 0:
            return
        bounds = []
        for cam in self.cameras:
            cam_pts = np.asarray(cam.proj_world_to_cam(pts))
            z = cam_pts[:, 2]
            z = z[z > 0]
            if z.size == 0:
                bounds.append(np.array([0.1, 10.0]))
                continue
            near = max(float(np.percentile(z, 1)) * (1 - extend_ratio), 1e-2)
            far = float(np.percentile(z, 99)) * (1 + extend_ratio)
            bounds.append(np.array([near, far]))
        self.bounds = bounds


@DATASET_REGISTRY.register()
class Capture(PosesBoundsDataset):
    folder = "Capture"


@DATASET_REGISTRY.register()
class MipNeRF360(PosesBoundsDataset):
    folder = "MipNeRF360"
