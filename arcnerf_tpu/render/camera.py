"""Perspective camera container.

Capability parity with /root/reference/arcnerf/render/camera.py
(PerspectiveCamera:12, load_K_Rt_from_P:185): intrinsic/c2w storage,
rescaling, coordinate exchange, ray generation, world->pixel projection.
Intrinsic/pose live as numpy (host-side dataset prep); ray generation and
projection run in jnp.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.poses import invert_poses
from ..geometry.projection import world_to_cam, world_to_pixel
from .ray_helper import get_rays


@functools.lru_cache(maxsize=64)
def _full_image_rays_jit(W, H, wh_order, ndc, center_pixel, normalize_rays_d):
    """Jitted full-image ray generation, cached per static config — and
    pinned to the HOST CPU backend when one exists: this runs during
    dataset preparation, where a remote-accelerator compile costs minutes
    per image shape (measured 7+ min of the quad-hash gate's startup was
    ONE 80x80 ray-gen compile through the TPU tunnel) while the math is
    trivial elementwise work the host compiles in milliseconds. Training
    re-uploads the pooled rays to the mesh afterwards either way."""
    dev = None
    try:
        dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        pass  # cpu backend unavailable: compile for the default device

    @jax.jit
    def fn(intrinsic, c2w):
        return get_rays(
            W, H, intrinsic, c2w, wh_order=wh_order, ndc=ndc,
            center_pixel=center_pixel, normalize_rays_d=normalize_rays_d,
        )

    if dev is None:
        return fn

    def on_host(intrinsic, c2w):
        # committed-to-CPU inputs make jit compile/run on the host backend.
        # np.asarray FIRST: device_put of a numpy array is a free host put,
        # while device_put of an accelerator-resident array compiles a
        # transfer program through the tunnel (~10 s per operand, measured
        # on the axon relay) — so never let the operands touch the default
        # device on the way here.
        return fn(jax.device_put(np.asarray(intrinsic, np.float32), dev),
                  jax.device_put(np.asarray(c2w, np.float32), dev))

    return on_host


class PerspectiveCamera:

    def __init__(self, intrinsic, c2w, W=None, H=None):
        """intrinsic np(3, 3), c2w np(4, 4). W/H default to 2*cx, 2*cy."""
        self.intrinsic = np.asarray(intrinsic, dtype=np.float64).copy()
        self.c2w = np.asarray(c2w, dtype=np.float64).copy()
        self.W = int(W) if W is not None else int(round(self.intrinsic[0, 2] * 2))
        self.H = int(H) if H is not None else int(round(self.intrinsic[1, 2] * 2))

    def rescale(self, scale):
        """Rescale image plane: intrinsic and W/H by ``scale``."""
        self.intrinsic[0, 0] *= scale
        self.intrinsic[1, 1] *= scale
        self.intrinsic[0, 2] *= scale
        self.intrinsic[1, 2] *= scale
        self.intrinsic[0, 1] *= scale
        self.W = int(self.W * scale)
        self.H = int(self.H * scale)

    def get_cam_pose_norm(self):
        """Distance of camera from world origin."""
        return float(np.linalg.norm(self.c2w[:3, 3]))

    def get_wh(self):
        return self.W, self.H

    def rescale_pose(self, scale):
        self.c2w[:3, 3] *= scale

    def get_intrinsic(self, as_jnp=True):
        return jnp.asarray(self.intrinsic, dtype=jnp.float32) if as_jnp else self.intrinsic

    def get_pose(self, as_jnp=True, w2c=False):
        pose = self.c2w.copy()
        if w2c:
            pose = invert_poses(pose[None])[0]
        return jnp.asarray(pose, dtype=jnp.float32) if as_jnp else pose

    def exchange_coord(self, src, dst, flip):
        """Swap two axes of the pose rows; optionally flip one (e.g. x->-y)."""
        mapping = {"x": 0, "y": 1, "z": 2}
        assert src in mapping and dst in mapping
        order = [0, 1, 2, 3]
        order[mapping[src]], order[mapping[dst]] = order[mapping[dst]], order[mapping[src]]
        self.c2w = self.c2w[order, :]
        if flip != "nan":
            assert flip in mapping
            self.c2w[mapping[flip], :] *= -1

    def reset_pose(self, c2w):
        self.c2w = np.asarray(c2w).copy()

    def reset_intrinsic(self, intrinsic):
        self.intrinsic = np.asarray(intrinsic).copy()

    def adjust_translation(self, offset):
        self.c2w[:3, 3] += offset

    def apply_transform(self, rot):
        self.c2w = np.matmul(rot, self.c2w)

    def get_rays(self, wh_order=True, index=None, n_rays=-1, key=None, ndc=False, center_pixel=False,
                 normalize_rays_d=True):
        """Rays in world coords; see render.ray_helper.get_rays."""
        if index is None and n_rays <= 0:
            fn = _full_image_rays_jit(self.W, self.H, wh_order, ndc, center_pixel, normalize_rays_d)
            # pass numpy, NOT get_intrinsic()/get_pose(): those create
            # default-device (accelerator) arrays eagerly, and pulling them
            # back to the host costs a remote transfer-program compile each
            return fn(self.intrinsic, self.c2w)
        return get_rays(
            self.W,
            self.H,
            self.get_intrinsic(),
            self.get_pose(),
            wh_order,
            index,
            n_rays,
            key,
            ndc,
            center_pixel=center_pixel,
            normalize_rays_d=normalize_rays_d,
        )

    def proj_world_to_pixel(self, points):
        """points (N, 3) -> pixels (N, 2)."""
        pixels = world_to_pixel(
            jnp.asarray(points)[None], self.get_intrinsic()[None], self.get_pose(w2c=True)[None]
        )
        return pixels[0]

    def proj_world_to_cam(self, points):
        """points (N, 3) -> camera-space (N, 3)."""
        return world_to_cam(jnp.asarray(points)[None], self.get_pose(w2c=True)[None])[0]


def load_K_Rt_from_P(proj_mat):
    """Decompose a 3x4 projection matrix into intrinsic (4, 4) + c2w (4, 4)
    (IDR/DTU convention; reference camera.py:185)."""
    import cv2

    out = cv2.decomposeProjectionMatrix(np.asarray(proj_mat))
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=proj_mat.dtype)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose
