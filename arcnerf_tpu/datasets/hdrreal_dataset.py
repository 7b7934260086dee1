"""HDR-Real dataset: LLFF-style capture with per-image exposure times.

Capability parity with /root/reference/arcnerf/datasets/hdrreal_dataset.py:
poses_bounds_exps.npy (17 pose/bounds cols + exposure); exposure split —
{t1, t3, t5} exposures for train/val, {t2, t4} held out for eval.
"""

import glob
import os.path as osp

import numpy as np

from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset
from .llff_dataset import LLFF


@DATASET_REGISTRY.register()
class HDRReal(Base3dDataset):

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, "HDR-Real", cfgs.scene_name)
        self.identifier = cfgs.scene_name

        img_list = sorted(
            glob.glob(osp.join(self.data_spec_dir, "images", "*.jpg"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.png"))
            + glob.glob(osp.join(self.data_spec_dir, "images", "*.JPG"))
        )
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        cam_file = osp.join(self.data_spec_dir, "poses_bounds_exps.npy")
        if not osp.exists(cam_file):
            cam_file = osp.join(self.data_spec_dir, "poses_bounds.npy")
        data = np.load(cam_file)
        poses = data[:, :15].reshape(-1, 3, 5)
        self.bounds = [data[i, 15:17] for i in range(self.n_imgs)]
        exps = data[:, 17] if data.shape[1] > 17 else np.ones(self.n_imgs)
        self.exp_times = [float(e) for e in exps]

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

        self.norm_cam_pose()
        self.apply_holdout(self.get_exposure_split(mode))
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()

    def get_exposure_split(self, mode):
        """Odd exposure ranks {t1, t3, t5} -> train/val, even {t2, t4} ->
        eval (reference hdrreal_dataset.py:73)."""
        uniq = sorted(set(self.exp_times))
        rank = {t: i for i, t in enumerate(uniq)}
        if mode in ("train", "val"):
            keep = [i for i, t in enumerate(self.exp_times) if rank[t] % 2 == 0]
        else:
            keep = [i for i, t in enumerate(self.exp_times) if rank[t] % 2 == 1]
        if not keep:
            keep = list(range(self.n_imgs))
        if mode == "val":
            keep = keep[:: max(len(keep) // 2, 1)][:2]
        return keep
