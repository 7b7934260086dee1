"""LLFF forward-facing dataset loader (poses_bounds.npy).

Capability parity with /root/reference/arcnerf/datasets/llff_dataset.py:
poses_bounds.npy (N, 17) -> 3x5 pose + hwf + near/far bounds; llff
(down-right-back) -> our camera convention; NDC option via base class.
"""

import glob
import os.path as osp

import numpy as np

from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset


@DATASET_REGISTRY.register()
class LLFF(Base3dDataset):

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, "LLFF", cfgs.scene_name)
        self.identifier = cfgs.scene_name

        img_list = sorted(
            glob.glob(osp.join(self.data_spec_dir, "images", "*.JPG"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.jpg"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.png"))
        )
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images found in {}".format(self.data_spec_dir)

        poses_bounds = np.load(osp.join(self.data_spec_dir, "poses_bounds.npy"))  # (N, 17)
        assert poses_bounds.shape[0] == self.n_imgs, "poses_bounds vs image count mismatch"
        poses = poses_bounds[:, :15].reshape(-1, 3, 5)  # (N, 3, 5)
        self.bounds = [poses_bounds[i, 15:17] for i in range(self.n_imgs)]

        hwf = poses[0, :, 4]
        self.H, self.W = int(hwf[0]), int(hwf[1])
        focal = float(hwf[2])

        import cv2

        self.images = []
        for path in img_list:
            img = cv2.imread(path)[..., [2, 1, 0]].astype(np.float32) / 255.0
            if img.shape[:2] != (self.H, self.W):
                img = cv2.resize(img, (self.W, self.H), interpolation=cv2.INTER_AREA)
            self.images.append(img)

        intrinsic = np.eye(3)
        intrinsic[0, 0] = intrinsic[1, 1] = focal
        intrinsic[0, 2] = self.W / 2.0
        intrinsic[1, 2] = self.H / 2.0

        self.cameras = []
        for i in range(self.n_imgs):
            c2w = self.llff_to_our_pose(poses[i, :, :4])
            self.cameras.append(PerspectiveCamera(intrinsic, c2w, self.W, self.H))

        self.norm_cam_pose()
        self.center_cam_poses_by_view_dirs()
        self.align_cam_horizontal()

        holdout = self.get_holdout_index()
        self.apply_holdout(holdout)
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()

    @staticmethod
    def llff_to_our_pose(pose_3x4):
        """llff [down right back] -> our [right down forward] c2w."""
        c2w = np.concatenate([pose_3x4, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)
        # llff columns: (down, right, back); ours: (right, down, forward)
        fix = np.stack(
            [c2w[:, 1], c2w[:, 0], -c2w[:, 2], c2w[:, 3]], axis=-1
        )
        return fix
