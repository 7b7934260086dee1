"""Inference: novel-view video rendering, surface rendering, volume
extraction (point cloud + colored mesh).

Capability parity with /root/reference/arcnerf/eval/infer_func.py:31-791:
- cfgs.inference.render: camera paths (circle/spiral/swing) around the
  scene, volume-render video frames -> mp4,
- surface render video via sphere tracing / secant,
- cfgs.inference.volume: dense sigma grid via forward_pts -> thresholded
  point cloud (ply) + marching-tets mesh with vertex colors queried from
  the model -> ply; optional simplification.
"""

import os

import numpy as np

import jax.numpy as jnp

from ..geometry.mesh import extract_mesh, save_meshes, simplify_mesh
from ..geometry.point_cloud import save_point_cloud
from ..geometry.poses import generate_cam_pose_on_sphere
from ..render.camera import PerspectiveCamera
from ..utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs
from .eval_func import render_full_image


def write_video(path, frames, fps=20):
    """frames: list of (H, W, 3) float [0,1] -> mp4 via cv2."""
    import cv2

    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write((np.clip(f, 0, 1) * 255).astype(np.uint8)[..., ::-1])
    writer.release()


class Inferencer:

    def __init__(self, cfgs, intrinsic, wh, logger=None):
        """cfgs: the ``inference`` cfg node; intrinsic (3, 3); wh (W, H)."""
        self.cfgs = cfgs
        self.logger = logger
        self.intrinsic = np.asarray(intrinsic)
        self.W, self.H = wh
        self.render_data = self.set_render_data()
        self.volume_data = self.set_volume_data()

    # ------------------------------------------------------------ cam paths
    def set_render_data(self):
        """Camera path cfgs -> list of render jobs (reference
        infer_func.py:154)."""
        if not valid_key_in_cfgs(self.cfgs, "render"):
            return None
        render_cfgs = self.cfgs.render
        jobs = []
        types = get_value_from_cfgs_field(render_cfgs, "type", ["circle"])
        n_cam = get_value_from_cfgs_field(render_cfgs, "n_cam", [20])
        radius = get_value_from_cfgs_field(render_cfgs, "radius", 3.0)
        u_start = get_value_from_cfgs_field(render_cfgs, "u_start", 0.0)
        v_ratio = get_value_from_cfgs_field(render_cfgs, "v_ratio", 0.0)
        v_range = tuple(get_value_from_cfgs_field(render_cfgs, "v_range", [-0.5, 0.0]))
        n_rot = get_value_from_cfgs_field(render_cfgs, "n_rot", 3)
        fps = get_value_from_cfgs_field(render_cfgs, "fps", 20)
        bkg_color = get_value_from_cfgs_field(render_cfgs, "bkg_color", None)
        if not isinstance(types, list):
            types = [types]
        if not isinstance(n_cam, list):
            n_cam = [n_cam] * len(types)

        for mode, n in zip(types, n_cam):
            if mode == "custom":
                c2ws = self.read_json_cam(get_value_from_cfgs_field(render_cfgs, "custom_path"))
                n = c2ws.shape[0]
            else:
                c2ws = generate_cam_pose_on_sphere(
                    mode, radius, n, u_start=u_start, v_ratio=v_ratio, v_range=v_range, n_rot=n_rot, close=True
                )
            cams = [PerspectiveCamera(self.intrinsic, c2ws[i], self.W, self.H) for i in range(n)]
            jobs.append({"mode": mode, "cams": cams, "fps": fps, "bkg_color": bkg_color})
        return jobs

    @staticmethod
    def read_json_cam(path):
        """Custom camera path from a nerfstudio-style json (reference
        infer_func.py:229 read_json_cam): {'camera_path': [{'camera_to_world':
        [16 floats]} ...]} or a plain {'c2ws': [...]} list -> (N, 4, 4)."""
        import json

        with open(path) as f:
            data = json.load(f)
        if "camera_path" in data:
            mats = [np.asarray(f_["camera_to_world"], dtype=np.float64).reshape(4, 4)
                    for f_ in data["camera_path"]]
        elif "c2ws" in data:
            mats = [np.asarray(m, dtype=np.float64).reshape(4, 4) for m in data["c2ws"]]
        else:
            raise ValueError("unrecognized camera path json: {}".format(path))
        return np.stack(mats)

    def set_volume_data(self):
        if not valid_key_in_cfgs(self.cfgs, "volume"):
            return None
        vol_cfgs = self.cfgs.volume
        return {
            "n_grid": get_value_from_cfgs_field(vol_cfgs, "n_grid", 256),
            "side": get_value_from_cfgs_field(vol_cfgs, "side", 2.0),
            "origin": tuple(get_value_from_cfgs_field(vol_cfgs, "origin", (0.0, 0.0, 0.0))),
            "level": get_value_from_cfgs_field(vol_cfgs, "level", 50.0),
            "grad_dir": get_value_from_cfgs_field(vol_cfgs, "grad_dir", "descent"),
            "chunk_pts": get_value_from_cfgs_field(vol_cfgs, "chunk_pts", 131072),
            "max_faces": get_value_from_cfgs_field(vol_cfgs, "max_faces", None),
            "pc_max_pts": get_value_from_cfgs_field(vol_cfgs, "pc_max_pts", 200000),
        }

    # ------------------------------------------------------------- rendering
    def run_infer(self, render_chunk_fn, forward_pts_fn, forward_pts_dir_fn, out_dir,
                  surface_render_fn=None, chunk_rays=8192):
        """Run all configured inference jobs; writes into out_dir."""
        os.makedirs(out_dir, exist_ok=True)
        results = {}
        if self.render_data is not None:
            results["video"] = self.run_infer_render(render_chunk_fn, out_dir, chunk_rays)
            if surface_render_fn is not None:
                results["surface_video"] = self.run_infer_render(
                    surface_render_fn, out_dir, chunk_rays, suffix="_surface"
                )
        if self.volume_data is not None:
            results["volume"] = self.run_infer_volume(forward_pts_fn, forward_pts_dir_fn, out_dir)
        return results

    def run_infer_render(self, render_chunk_fn, out_dir, chunk_rays=8192, suffix=""):
        paths = []
        for job in self.render_data:
            frames = []
            for cam in job["cams"]:
                ro, rd, _, rr = cam.get_rays(wh_order=False)
                sample = {
                    "rays_o": np.asarray(ro), "rays_d": np.asarray(rd), "rays_r": np.asarray(rr),
                    "H": self.H, "W": self.W,
                }
                imgs = render_full_image(render_chunk_fn, sample, chunk_rays,
                                         bkg_color=job.get("bkg_color"))
                frames.append(imgs["rgb"])
            path = os.path.join(out_dir, "render_{}{}.mp4".format(job["mode"], suffix))
            write_video(path, frames, job["fps"])
            paths.append(path)
            if self.logger is not None:
                self.logger.add_log("wrote {} ({} frames)".format(path, len(frames)))
        return paths

    # ------------------------------------------------------------ extraction
    def run_infer_volume(self, forward_pts_fn, forward_pts_dir_fn, out_dir):
        """Dense grid query -> point cloud + colored mesh (reference
        infer_func.py:447-632)."""
        vd = self.volume_data
        n, side, origin = vd["n_grid"], vd["side"], np.asarray(vd["origin"])
        axes = [np.linspace(origin[i] - side / 2.0, origin[i] + side / 2.0, n) for i in range(3)]
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3).astype(np.float32)

        sigma = np.zeros((grid.shape[0],), dtype=np.float32)
        chunk = vd["chunk_pts"]
        for s in range(0, grid.shape[0], chunk):
            e = min(s + chunk, grid.shape[0])
            piece = grid[s:e]
            if piece.shape[0] < chunk:
                piece = np.concatenate([piece, np.repeat(piece[-1:], chunk - piece.shape[0], axis=0)])
            sigma[s:e] = np.asarray(forward_pts_fn(jnp.asarray(piece)))[: e - s]
        field = sigma.reshape(n, n, n)

        out = {}
        # point cloud of occupied cells
        level, grad_dir = vd["level"], vd["grad_dir"]
        occ = field > level if grad_dir == "descent" else field < level
        pts = grid.reshape(n, n, n, 3)[occ]
        if pts.shape[0] > vd["pc_max_pts"]:
            sel = np.random.default_rng(0).choice(pts.shape[0], vd["pc_max_pts"], replace=False)
            pts = pts[sel]
        if pts.shape[0] > 0:
            colors = self._query_colors(forward_pts_dir_fn, pts, chunk)
            pc_path = os.path.join(out_dir, "pointcloud.ply")
            save_point_cloud(pc_path, pts, colors)
            out["pc"] = pc_path

        # mesh
        spacing = (side / (n - 1),) * 3
        grid_origin = tuple(origin - side / 2.0)
        verts, faces = extract_mesh(field, level, spacing, grid_origin, grad_dir)
        if verts.shape[0] > 0:
            if vd["max_faces"]:
                verts, faces = simplify_mesh(verts, faces, max_faces=vd["max_faces"])
            vert_colors = self._query_colors(forward_pts_dir_fn, verts, chunk)
            mesh_path = os.path.join(out_dir, "mesh.ply")
            save_meshes(mesh_path, verts, faces, vert_colors)
            out["mesh"] = mesh_path
            if self.logger is not None:
                self.logger.add_log("mesh: {} verts {} faces".format(verts.shape[0], faces.shape[0]))
        return out

    def _query_colors(self, forward_pts_dir_fn, pts, chunk):
        """Query model rgb at points (view dir = -normalized(pt), looking at
        center, like reference colorization)."""
        colors = np.zeros((pts.shape[0], 3), dtype=np.float32)
        dirs = -pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
        for s in range(0, pts.shape[0], chunk):
            e = min(s + chunk, pts.shape[0])
            p, d = pts[s:e], dirs[s:e]
            if p.shape[0] < chunk:
                pad = chunk - p.shape[0]
                p = np.concatenate([p, np.repeat(p[-1:], pad, axis=0)])
                d = np.concatenate([d, np.repeat(d[-1:], pad, axis=0)])
            _, rgb = forward_pts_dir_fn(jnp.asarray(p), jnp.asarray(d))
            colors[s:e] = np.asarray(rgb)[: e - s]
        return colors
