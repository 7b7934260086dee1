"""Procedural synthetic scene dataset — analytic sphere scene rendered by
exact ray tracing.

This environment ships no capture data, so this dataset provides real
trainable ground truth for end-to-end tests and benchmarks: a handful of
colored lambertian spheres inside the unit volume, viewed from a camera
ring — the same role the lego scene plays for the reference benchmarks
(SURVEY.md section 6). Deterministic given ``seed``.
"""

import numpy as np

from ..geometry.poses import generate_cam_pose_on_sphere
from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field
from ..utils.registry import DATASET_REGISTRY
from .base import Base3dDataset

# (center xyz, radius, rgb color)
_DEFAULT_SPHERES = [
    ((0.0, 0.15, 0.0), 0.42, (0.85, 0.25, 0.2)),
    ((0.45, -0.25, 0.1), 0.22, (0.2, 0.7, 0.3)),
    ((-0.4, -0.3, -0.15), 0.25, (0.25, 0.35, 0.85)),
    ((0.05, -0.32, -0.45), 0.18, (0.9, 0.8, 0.2)),
]
_LIGHT_DIR = np.array([0.5, -0.8, 0.3])


def trace_sphere_scene(rays_o, rays_d, spheres=None, bkg_color=(1.0, 1.0, 1.0)):
    """Exact-render a sphere scene. rays (N, 3) -> rgb (N, 3), depth (N,),
    mask (N,). Lambertian shading with a fixed directional light."""
    spheres = spheres or _DEFAULT_SPHERES
    n = rays_o.shape[0]
    light = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)

    best_t = np.full(n, np.inf)
    rgb = np.tile(np.asarray(bkg_color, dtype=np.float32), (n, 1))
    mask = np.zeros(n, dtype=np.float32)

    for center, radius, color in spheres:
        c = np.asarray(center)
        oc = c[None, :] - rays_o
        b = np.sum(oc * rays_d, axis=-1)
        disc = b**2 - (np.sum(oc * oc, axis=-1) - radius**2)
        hit = disc > 0
        sq = np.sqrt(np.maximum(disc, 0.0))
        t = b - sq
        t = np.where(t > 1e-3, t, b + sq)
        valid = hit & (t > 1e-3) & (t < best_t)

        pts = rays_o + rays_d * t[:, None]
        normal = (pts - c[None, :]) / radius
        lam = 0.35 + 0.65 * np.maximum(0.0, -np.sum(normal * light[None, :], axis=-1))
        shaded = np.asarray(color)[None, :] * lam[:, None]

        rgb = np.where(valid[:, None], shaded, rgb)
        best_t = np.where(valid, t, best_t)
        mask = np.where(valid, 1.0, mask)

    depth = np.where(np.isfinite(best_t), best_t, 0.0)
    return rgb.astype(np.float32), depth.astype(np.float32), mask


@DATASET_REGISTRY.register()
class Synthetic(Base3dDataset):
    """Analytic sphere-scene dataset; cfgs: n_imgs, wh (W, H), cam_radius,
    focal_ratio, white_bkg, seed."""

    def __init__(self, cfgs, data_dir=None, mode="train", transforms=None):
        super().__init__(cfgs, data_dir, mode, transforms)
        self.identifier = "synthetic_spheres"
        n_imgs = get_value_from_cfgs_field(cfgs, "n_imgs", 20)
        wh = get_value_from_cfgs_field(cfgs, "wh", [128, 128])
        self.W, self.H = int(wh[0]), int(wh[1])
        cam_radius = get_value_from_cfgs_field(cfgs, "cam_radius", 2.5)
        focal_ratio = get_value_from_cfgs_field(cfgs, "focal_ratio", 1.2)
        white_bkg = get_value_from_cfgs_field(cfgs, "white_bkg", True)
        seed = get_value_from_cfgs_field(cfgs, "seed", 42)
        bkg = (1.0, 1.0, 1.0) if white_bkg else (0.0, 0.0, 0.0)

        # spiral poses cover elevation; mode-dependent offset decorrelates
        # train/val/eval viewpoints
        u_start = {"train": 0.0, "val": 0.37, "eval": 0.71}.get(mode, 0.0)
        c2ws = generate_cam_pose_on_sphere(
            "spiral", cam_radius, n_imgs, u_start=u_start, v_range=(-0.6, 0.3), n_rot=3,
            rng=np.random.default_rng(seed),
        )

        intrinsic = np.eye(3)
        intrinsic[0, 0] = intrinsic[1, 1] = focal_ratio * self.W
        intrinsic[0, 2] = self.W / 2.0
        intrinsic[1, 2] = self.H / 2.0

        self.cameras = [PerspectiveCamera(intrinsic, c2ws[i], self.W, self.H) for i in range(n_imgs)]
        self.n_imgs = n_imgs

        self.images, self.masks = [], []
        for cam in self.cameras:
            ro, rd, _, _ = cam.get_rays(wh_order=False, center_pixel=self.center_pixel)
            rgb, _, mask = trace_sphere_scene(np.asarray(ro), np.asarray(rd), bkg_color=bkg)
            self.images.append(rgb.reshape(self.H, self.W, 3))
            self.masks.append(mask.reshape(self.H, self.W))

        self.skip_samples()
        self.keep_eval_samples()
        if get_value_from_cfgs_field(cfgs, "precache", False):
            self.precache_ray()
