"""Base 3d dataset: images + cameras + ray precaching, pure numpy.

Capability parity with /root/reference/arcnerf/datasets/base_3d_dataset.py:
14-371: train/eval holdout split (:60), skip decimation (:94), eval subset
near avg pose (:115), image+intrinsic rescale (:143), pose normalization to
a sphere radius (:208), view-dir recentering (:228), horizontal alignment
(:255), coordinate exchange (:271), blur filtering (:280), ray precache
(:294), __getitem__ (:312) returning img/mask/rays/H/W/pc/bounds.

No torch DataLoader: batches are plain numpy dicts; the trainer
concatenates everything into device arrays once (the reference's
concat_train_batch pattern, which suits TPU host->device transfer).
"""

import numpy as np

from ..geometry.poses import average_poses_up, center_poses
from ..geometry.ray import closest_point_to_rays
from ..utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs
from ..utils.chunk import np_wrapper


class Base3dDataset:

    def __init__(self, cfgs, data_dir, mode="train", transforms=None):
        self.cfgs = cfgs
        self.data_dir = data_dir
        self.mode = mode
        self.transforms = transforms

        self.images = []
        self.masks = []
        self.cameras = []
        self.bounds = []
        self.exp_times = []
        self.point_cloud = None
        self.n_imgs = 0
        self.H, self.W = 0, 0
        self.identifier = ""
        self.ray_bundles = None
        self.precache = False

        self.skip = get_value_from_cfgs_field(cfgs, "skip", 1)
        self.test_holdout = get_value_from_cfgs_field(cfgs, "test_holdout", 8)
        self.eval_max_sample = get_value_from_cfgs_field(cfgs, "eval_max_sample")
        self.ndc_space = get_value_from_cfgs_field(cfgs, "ndc_space", False)
        self.center_pixel = get_value_from_cfgs_field(cfgs, "center_pixel", False)
        self.normalize_rays_d = get_value_from_cfgs_field(cfgs, "normalize_rays_d", True)

    # ------------------------------------------------------------- selection
    def get_holdout_index(self):
        """Every test_holdout-th image goes to val/eval; rest to train."""
        full_idx = list(range(self.n_imgs))
        if self.test_holdout <= 1:
            return full_idx
        skip_idx = full_idx[:: self.test_holdout]
        if self.mode == "train":
            return [i for i in full_idx if i not in skip_idx]
        return skip_idx

    def apply_holdout(self, holdout_index):
        self.images = [self.images[i] for i in holdout_index]
        self.masks = [self.masks[i] for i in holdout_index] if self.masks else []
        self.cameras = [self.cameras[i] for i in holdout_index]
        self.bounds = [self.bounds[i] for i in holdout_index] if self.bounds else []
        self.exp_times = [self.exp_times[i] for i in holdout_index] if self.exp_times else []
        self.n_imgs = len(holdout_index)

    def skip_samples(self):
        if self.skip > 1:
            self.apply_holdout(list(range(self.n_imgs))[:: self.skip])

    def keep_eval_samples(self):
        """Eval keeps at most eval_max_sample images nearest the avg pose."""
        if self.eval_max_sample is None or self.eval_max_sample >= self.n_imgs:
            return
        ind = self.find_closest_cam_ind(self.eval_max_sample)
        self.apply_holdout(ind)

    def find_closest_cam_ind(self, n_close):
        c2ws = np.stack([cam.get_pose(as_jnp=False) for cam in self.cameras])
        center = c2ws[:, :3, 3].mean(0)
        dist = np.linalg.norm(c2ws[:, :3, 3] - center, axis=-1)
        return np.argsort(dist)[:n_close].tolist()

    # --------------------------------------------------------------- scaling
    def rescale_img_and_pose(self):
        """Rescale image resolution + intrinsics by cfgs.img_scale."""
        scale = get_value_from_cfgs_field(self.cfgs, "img_scale", 1.0)
        if scale == 1.0:
            return
        import cv2

        new_imgs = []
        for img in self.images:
            new_imgs.append(
                cv2.resize(img, None, fx=scale, fy=scale, interpolation=cv2.INTER_AREA)
            )
        self.images = new_imgs
        if self.masks:
            self.masks = [
                cv2.resize(m, None, fx=scale, fy=scale, interpolation=cv2.INTER_NEAREST) for m in self.masks
            ]
        for cam in self.cameras:
            cam.rescale(scale)
        self.H, self.W = self.images[0].shape[:2]

    # ---------------------------------------------------------- pose handling
    def get_poses(self, concat=False):
        poses = [cam.get_pose(as_jnp=False) for cam in self.cameras]
        return np.stack(poses) if concat else poses

    def get_intrinsic(self, idx=0):
        return self.cameras[idx].get_intrinsic(as_jnp=False)

    def adjust_cam_translation(self):
        if valid_key_in_cfgs(self.cfgs, "cam_t_offset") and len(self.cfgs.cam_t_offset) == 3:
            offset = np.asarray(self.cfgs.cam_t_offset)
            for cam in self.cameras:
                cam.adjust_translation(-offset)

    def norm_cam_pose(self):
        """Scale camera distances so max norm ~= cfgs.scale_radius."""
        if not (valid_key_in_cfgs(self.cfgs, "scale_radius") and self.cfgs.scale_radius > 0):
            return None
        norms = [cam.get_cam_pose_norm() for cam in self.cameras]
        max_norm = max(norms)
        scale = self.cfgs.scale_radius / (max_norm * 1.05)
        for cam in self.cameras:
            cam.rescale_pose(scale)
        self.bounds = [b * scale for b in self.bounds] if self.bounds else []
        if self.point_cloud is not None and "pts" in self.point_cloud:
            self.point_cloud["pts"] = self.point_cloud["pts"] * scale
        return max_norm

    def center_cam_poses_by_view_dirs(self):
        """Shift world center to the common view point of all central rays."""
        if not get_value_from_cfgs_field(self.cfgs, "center_by_view_dirs", False):
            return None
        center_idx = np.array([[int(self.W / 2.0), int(self.H / 2.0)]])
        rays_o, rays_d = [], []
        for cam in self.cameras:
            ro, rd, _, _ = cam.get_rays(index=center_idx, center_pixel=True)
            rays_o.append(np.asarray(ro))
            rays_d.append(np.asarray(rd))
        view_point, _, _ = np_wrapper(closest_point_to_rays, np.concatenate(rays_o), np.concatenate(rays_d))
        c2ws = self.get_poses(concat=True)
        centered = center_poses(c2ws, view_point[0])
        for i, cam in enumerate(self.cameras):
            cam.reset_pose(centered[i])
        return view_point

    def align_cam_horizontal(self):
        if not get_value_from_cfgs_field(self.cfgs, "align_cam", False):
            return None
        c2ws = self.get_poses(concat=True)
        avg_pose = average_poses_up(c2ws)
        rot = np.eye(4)
        rot[:3, :3] = np.linalg.inv(avg_pose)[:3, :3]
        for cam in self.cameras:
            cam.apply_transform(rot)
        return rot

    def exchange_coord(self):
        ex = get_value_from_cfgs_field(self.cfgs, "exchange_coord", None)
        if ex is not None:
            for cam in self.cameras:
                cam.exchange_coord(ex[0], ex[1], ex[2])

    def remove_blur_images(self):
        """Drop images whose Laplacian-variance blur metric is below thres."""
        thres = get_value_from_cfgs_field(self.cfgs, "blur_thres", None)
        if thres is None:
            return
        import cv2

        keep = []
        for i, img in enumerate(self.images):
            gray = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
            if cv2.Laplacian(gray, cv2.CV_64F).var() >= thres:
                keep.append(i)
        self.apply_holdout(keep)

    # -------------------------------------------------------------- rays/item
    def precache_ray(self):
        if self.ray_bundles is None:
            self.ray_bundles = []
            for cam in self.cameras:
                ro, rd, _, rr = cam.get_rays(
                    wh_order=False,
                    ndc=self.ndc_space,
                    center_pixel=self.center_pixel,
                    normalize_rays_d=self.normalize_rays_d,
                )
                self.ray_bundles.append((np.asarray(ro), np.asarray(rd), np.asarray(rr)))
            self.precache = True

    def __len__(self):
        return self.n_imgs

    def __getitem__(self, idx):
        img = self.images[idx].reshape(-1, 3).astype(np.float32)
        mask = self.masks[idx].reshape(-1).astype(np.float32) if self.masks else None

        if self.precache:
            rays_o, rays_d, rays_r = self.ray_bundles[idx]
        else:
            ro, rd, _, rr = self.cameras[idx].get_rays(
                wh_order=False,
                ndc=self.ndc_space,
                center_pixel=self.center_pixel,
                normalize_rays_d=self.normalize_rays_d,
            )
            rays_o, rays_d, rays_r = np.asarray(ro), np.asarray(rd), np.asarray(rr)

        bounds = None
        if self.ndc_space:
            bounds = np.tile(np.array([[0.0, 1.0]], dtype=np.float32), (img.shape[0], 1))
        elif self.bounds:
            bounds = np.tile(np.asarray(self.bounds[idx], dtype=np.float32)[None], (img.shape[0], 1))

        inputs = {
            "img": img,
            "mask": mask,
            "c2w": self.cameras[idx].get_pose(as_jnp=False).astype(np.float32),
            "intrinsic": self.cameras[idx].get_intrinsic(as_jnp=False).astype(np.float32),
            "rays_o": rays_o.astype(np.float32),
            "rays_d": rays_d.astype(np.float32),
            "rays_r": rays_r.astype(np.float32),
            "H": self.H,
            "W": self.W,
            "pc": self.point_cloud,
            "bounds": bounds,
        }
        if self.exp_times:
            inputs["exp_time"] = np.full((img.shape[0],), self.exp_times[idx], dtype=np.float32)
        inputs = {k: v for k, v in inputs.items() if v is not None}
        if self.transforms is not None:
            inputs = self.transforms(inputs)
        return inputs
