"""DTU dataset loader (cameras.npz with world/scale projection matrices).

Capability parity with /root/reference/arcnerf/datasets/dtu_dataset.py:
P = world_mat @ scale_mat decomposed into intrinsic + c2w via
cv2.decomposeProjectionMatrix (camera.load_K_Rt_from_P).
"""

import glob
import os.path as osp

import numpy as np

from ..render.camera import PerspectiveCamera, load_K_Rt_from_P
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset


@DATASET_REGISTRY.register()
class DTU(Base3dDataset):

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        scan_id = get_value_from_cfgs_field(cfgs, "scan_id", 1)
        self.data_spec_dir = osp.join(data_dir, "DTU", "scan{}".format(scan_id))
        self.identifier = "scan{}".format(scan_id)

        img_list = sorted(glob.glob(osp.join(self.data_spec_dir, "image", "*.png")))
        mask_list = sorted(glob.glob(osp.join(self.data_spec_dir, "mask", "*.png")))
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        import cv2

        self.images = [cv2.imread(p)[..., [2, 1, 0]].astype(np.float32) / 255.0 for p in img_list]
        if mask_list:
            self.masks = [
                (cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0 > 0.5).astype(np.float32)
                for p in mask_list
            ]
        self.H, self.W = self.images[0].shape[:2]

        cam_dict = np.load(osp.join(self.data_spec_dir, "cameras.npz"))
        self.cameras = []
        for i in range(self.n_imgs):
            proj = (cam_dict["world_mat_{}".format(i)] @ cam_dict["scale_mat_{}".format(i)])[:3, :4]
            intrinsic, pose = load_K_Rt_from_P(proj.astype(np.float64))
            self.cameras.append(PerspectiveCamera(intrinsic[:3, :3], pose, self.W, self.H))

        self.norm_cam_pose()
        holdout = self.get_holdout_index()
        self.apply_holdout(holdout)
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()


@DATASET_REGISTRY.register()
class BlendedMVS(Base3dDataset):
    """BlendedMVS loader: same projection-matrix decomposition as DTU but
    with per-image cams txt/npz (reference blendedmvs_dataset.py)."""

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        # reference layout (blendedmvs_dataset.py:24-28): scene_name dir
        # with image/*.jpg; scan_id kept as a fallback identifier
        scene = get_value_from_cfgs_field(cfgs, "scene_name", None)
        if scene is None:
            scene = str(get_value_from_cfgs_field(cfgs, "scan_id", 1))
        self.data_spec_dir = osp.join(data_dir, "BlendedMVS", str(scene))
        self.identifier = str(scene)

        img_list = sorted(
            glob.glob(osp.join(self.data_spec_dir, "image", "*.jpg"))
            + glob.glob(osp.join(self.data_spec_dir, "image", "*.png"))
        )
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        import cv2

        self.images = [cv2.imread(p)[..., [2, 1, 0]].astype(np.float32) / 255.0 for p in img_list]
        self.H, self.W = self.images[0].shape[:2]

        cam_path = osp.join(self.data_spec_dir, "cameras.npz")
        cam_dict = np.load(cam_path)
        self.cameras = []
        for i in range(self.n_imgs):
            proj = (cam_dict["world_mat_{}".format(i)])[:3, :4]
            if "scale_mat_{}".format(i) in cam_dict:
                proj = (cam_dict["world_mat_{}".format(i)] @ cam_dict["scale_mat_{}".format(i)])[:3, :4]
            intrinsic, pose = load_K_Rt_from_P(proj.astype(np.float64))
            self.cameras.append(PerspectiveCamera(intrinsic[:3, :3], pose, self.W, self.H))

        self.norm_cam_pose()
        holdout = self.get_holdout_index()
        self.apply_holdout(holdout)
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()
