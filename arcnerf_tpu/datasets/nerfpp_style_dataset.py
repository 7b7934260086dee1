"""NeRF++-format datasets (Tanks&Temples) and NSVF-format datasets.

Capability parity with /root/reference/arcnerf/datasets/tt_dataset.py
(per-image pose/*.txt 4x4 c2w + intrinsics/*.txt) and nsvf_dataset.py
(pose/*.txt + shared intrinsics.txt; rgb/ split-prefixed files; blender
axis fix).
"""

import glob
import os.path as osp

import numpy as np

from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset


def _read_mat_txt(path):
    return np.loadtxt(path).reshape(4, 4) if np.loadtxt(path).size == 16 else np.loadtxt(path)


@DATASET_REGISTRY.register(name="TanksAndTemples")
@DATASET_REGISTRY.register()
class TT(Base3dDataset):
    """Tanks & Temples in nerf++ layout:
    <scene>/{train,test}/{rgb,pose,intrinsics}/* (reference configs use
    type: TanksAndTemples; both names resolve here)."""

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, "TanksAndTemples", cfgs.scene_name)
        self.identifier = cfgs.scene_name
        split = "train" if mode in ("train", "val") else "test"

        img_list = sorted(glob.glob(osp.join(self.data_spec_dir, split, "rgb", "*")))
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        import cv2

        self.images = [cv2.imread(p)[..., [2, 1, 0]].astype(np.float32) / 255.0 for p in img_list]
        self.H, self.W = self.images[0].shape[:2]

        pose_list = sorted(glob.glob(osp.join(self.data_spec_dir, split, "pose", "*.txt")))
        intr_list = sorted(glob.glob(osp.join(self.data_spec_dir, split, "intrinsics", "*.txt")))
        assert len(pose_list) == self.n_imgs

        self.cameras = []
        for i in range(self.n_imgs):
            c2w = np.loadtxt(pose_list[i]).reshape(4, 4)
            K = np.loadtxt(intr_list[i] if i < len(intr_list) else intr_list[0]).reshape(4, 4)[:3, :3]
            self.cameras.append(PerspectiveCamera(K, c2w, self.W, self.H))

        self.norm_cam_pose()
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()


@DATASET_REGISTRY.register()
class NSVF(Base3dDataset):
    """NSVF layout: rgb/<split>_xxx.png, pose/<split>_xxx.txt, shared
    intrinsics.txt; blender-style pose axis fix."""

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.data_spec_dir = osp.join(data_dir, "NSVF", cfgs.scene_name)
        self.identifier = cfgs.scene_name
        split_id = {"train": 0, "val": 1, "eval": 2}.get(mode, 0)

        img_list = sorted(glob.glob(osp.join(self.data_spec_dir, "rgb", "{}_*".format(split_id))))
        self.n_imgs = len(img_list)
        assert self.n_imgs > 0, "no images in {}".format(self.data_spec_dir)

        import cv2

        self.images, self.masks = [], []
        for p in img_list:
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            if img.shape[-1] == 4:
                img = img[..., [2, 1, 0, 3]].astype(np.float32) / 255.0
                self.masks.append(img[..., -1])
                self.images.append(img[..., :3])
            else:
                self.images.append(img[..., [2, 1, 0]].astype(np.float32) / 255.0)
        self.H, self.W = self.images[0].shape[:2]

        K = np.loadtxt(osp.join(self.data_spec_dir, "intrinsics.txt"))
        if K.size == 16:
            K = K.reshape(4, 4)[:3, :3]
        elif K.size != 9:
            # single focal format: f cx cy ...
            vals = K.reshape(-1)
            K = np.eye(3)
            K[0, 0] = K[1, 1] = vals[0]
            K[0, 2], K[1, 2] = vals[1], vals[2]

        pose_list = sorted(glob.glob(osp.join(self.data_spec_dir, "pose", "{}_*".format(split_id))))
        self.cameras = []
        for p in pose_list:
            pose = np.loadtxt(p).reshape(4, 4)
            # blender-ish axis fix (reference nsvf_dataset.py:136-140)
            pose = pose[[0, 2, 1, 3], :]
            pose[1, :] *= -1
            self.cameras.append(PerspectiveCamera(K, pose, self.W, self.H))

        self.norm_cam_pose()
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()


@DATASET_REGISTRY.register()
class RTMV(Base3dDataset):
    """RTMV layout: per-frame json cam + image (exr or png) + optional
    *.seg.exr masks (reference rtmv_dataset.py:22-118). The reference
    nests scenes under a split dir (``RTMV/<split_name>/<scene>``,
    rtmv_dataset.py:27) — set cfgs.split_name for that layout; without it
    the scene dir sits directly under RTMV/."""

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        split_name = get_value_from_cfgs_field(cfgs, "split_name", None)
        parts = [data_dir, "RTMV"] + ([str(split_name)] if split_name else []) + [cfgs.scene_name]
        self.data_spec_dir = osp.join(*parts)
        self.identifier = cfgs.scene_name
        import json

        json_list = sorted(glob.glob(osp.join(self.data_spec_dir, "*.json")))
        assert json_list, "no frame jsons in {}".format(self.data_spec_dir)

        import cv2

        self.images, self.cameras, masks = [], [], []
        for jp in json_list:
            base = jp[:-5]
            img_path = None
            for ext in (".png", ".jpg", ".exr"):
                if osp.exists(base + ext):
                    img_path = base + ext
                    break
            if img_path is None:
                continue
            img = cv2.imread(img_path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
            if img is None:
                img = cv2.imread(img_path, cv2.IMREAD_UNCHANGED)
            if img.dtype == np.uint8:
                img = img.astype(np.float32) / 255.0
            img = img[..., [2, 1, 0]] if img.ndim == 3 and img.shape[-1] >= 3 else img
            self.images.append(np.clip(img[..., :3].astype(np.float32), 0.0, 1.0))

            # reference mask source: the seg channel (rtmv_dataset.py:88-96)
            seg_path = base + ".seg.exr"
            if osp.exists(seg_path):
                seg = cv2.imread(seg_path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
                if seg is not None:
                    seg = seg[..., 0] if seg.ndim == 3 else seg
                    masks.append((seg.astype(np.float32) > 0).astype(np.float32))

            with open(jp) as f:
                meta = json.load(f)
            cam = meta["camera_data"] if "camera_data" in meta else meta
            self.H, self.W = self.images[-1].shape[:2]
            K = np.eye(3)
            intr = cam.get("intrinsics", {})
            K[0, 0] = intr.get("fx", self.W)
            K[1, 1] = intr.get("fy", self.W)
            K[0, 2] = intr.get("cx", self.W / 2)
            K[1, 2] = intr.get("cy", self.H / 2)
            c2w = np.array(cam.get("cam2world", np.eye(4))).reshape(4, 4)
            if c2w[3, 3] != 1.0 or abs(np.linalg.det(c2w[:3, :3])) < 0.5:
                c2w = c2w.T
            self.cameras.append(PerspectiveCamera(K, c2w, self.W, self.H))

        self.n_imgs = len(self.images)
        if len(masks) == self.n_imgs and self.n_imgs > 0:
            self.masks = masks
        self.norm_cam_pose()
        holdout = self.get_holdout_index()
        self.apply_holdout(holdout)
        self.skip_samples()
        self.keep_eval_samples()
        self.rescale_img_and_pose()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()
