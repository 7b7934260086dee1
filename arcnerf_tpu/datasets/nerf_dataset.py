"""NeRF-synthetic (blender) dataset loader.

Capability parity with /root/reference/arcnerf/datasets/nerf_dataset.py:
transforms_{train,val,test}.json cameras, RGBA -> rgb + mask, blender->our
pose axis fix, intrinsic from camera_angle_x.
"""

import glob
import json
import os.path as osp
import re

import numpy as np

from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset


@DATASET_REGISTRY.register()
class NeRF(Base3dDataset):

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, "NeRF", cfgs.scene_name)
        self.identifier = cfgs.scene_name

        img_list, self.n_imgs = self.get_image_list(mode)
        self.images, self.masks = self.read_image_list(img_list)
        self.H, self.W = self.images[0].shape[:2]

        self.cameras, cam_split_idx = self.read_cameras_by_mode(mode)
        self.norm_cam_pose()
        self.align_cam_horizontal()
        self.cameras = [self.cameras[i] for i in cam_split_idx]
        assert self.n_imgs == len(self.cameras)

        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()

    @staticmethod
    def convert_mode(mode):
        return "test" if mode == "eval" else mode

    def get_image_list(self, mode):
        img_dir = osp.join(self.data_spec_dir, self.convert_mode(mode))
        img_list = [f for f in glob.glob(img_dir + "/r_*.png") if re.search(r"r_[0-9]+\.png", f)]
        n_imgs = len(img_list)
        assert n_imgs > 0, "no images in {}".format(img_dir)
        return [osp.join(img_dir, "r_{}.png".format(i)) for i in range(n_imgs)], n_imgs

    @staticmethod
    def read_image_list(img_list):
        import cv2

        images, masks = [], []
        for path in img_list:
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img.shape[-1] == 4:
                img = img[..., [2, 1, 0, 3]].astype(np.float32) / 255.0  # bgr(a) -> rgba
                masks.append(img[:, :, -1])
                images.append(img[..., :3])
            else:
                images.append(img[..., [2, 1, 0]].astype(np.float32) / 255.0)
        return images, masks

    def load_cam_json(self, mode):
        path = osp.join(self.data_spec_dir, "transforms_{}.json".format(self.convert_mode(mode)))
        assert osp.exists(path), "camera file {} missing".format(path)
        with open(path) as f:
            return json.load(f)

    @staticmethod
    def blender_to_our_pose(pose):
        """Blender c2w -> our convention (x right, y down-ish, z forward):
        flip y/z columns then swap y/z axes (reference nerf_dataset.py:149)."""
        pose = pose.copy()
        pose[:, 1:3] *= -1.0
        pose = pose[[0, 2, 1, 3], :]
        pose[1, :] *= -1
        return pose

    def read_cameras_by_mode(self, mode):
        all_mode = ["train", "val", "eval"]
        cam_json, idx = {}, [[-1]]
        for i, m in enumerate(all_mode):
            try:
                cam_json[m] = self.load_cam_json(m)
            except AssertionError:
                cam_json[m] = {"frames": [], "camera_angle_x": 0.6911}
            last = idx[i][-1] + 1
            idx.append(list(range(last, last + len(cam_json[m]["frames"]))))
        split_idx = idx[all_mode.index(mode) + 1]

        cameras = []
        for m in all_mode:
            for frame in cam_json[m]["frames"]:
                pose = self.blender_to_our_pose(np.array(frame["transform_matrix"], dtype=np.float32))
                cameras.append(
                    PerspectiveCamera(
                        intrinsic=self.get_intrinsic_by_angle(float(cam_json[m]["camera_angle_x"])),
                        c2w=pose,
                        W=self.W,
                        H=self.H,
                    )
                )
        return cameras, split_idx

    def get_intrinsic_by_angle(self, camera_angle_x):
        focal = 0.5 * self.W / np.tan(0.5 * camera_angle_x)
        intrinsic = np.eye(3)
        intrinsic[0, 0] = focal
        intrinsic[1, 1] = focal
        intrinsic[0, 2] = self.W / 2.0
        intrinsic[1, 2] = self.H / 2.0
        return intrinsic
