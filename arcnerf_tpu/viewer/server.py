"""Viewer server: websocket camera-in / JPEG-frame-out bridge.

Capability parity with /root/reference/ns_viewer/server/ (tornado+zmq
websocket bridge server.py, ViewerState viewer_utils.py:205 —
init_scene:280, update_scene:357, _render_image_in_viewer:657 adaptive
resolution). TPU-native twist: rendering goes through one jitted
chunk-renderer at a few fixed resolutions (static shapes — no recompile per
drag), low-res while interacting, high-res when the camera settles.
"""

import base64
import json
import os
import threading
import time

import numpy as np


class TrainControl:
    """Pause/resume gate polled by the trainer between strides (reference
    viewer's training-control messages, ns_viewer/server/viewer_utils.py)."""

    def __init__(self):
        self._run = threading.Event()
        self._run.set()

    @property
    def paused(self):
        return not self._run.is_set()

    def pause(self):
        self._run.clear()

    def resume(self):
        self._run.set()

    def wait_if_paused(self, poll=0.2):
        while not self._run.is_set():
            time.sleep(poll)


def build_scene_graph(dataset, bounds=None, max_thumbs=24, thumb_px=96):
    """Scene-graph JSON for the client overlay (reference init_scene,
    viewer_utils.py:280: dataset cameras + thumbnails + bounds).

    dataset: any loader exposing cameras + indexable samples with 'img'.
    Returns {cameras: [{c2w, thumb(b64 jpeg)}...], intrinsic, wh, bounds}.
    """
    import cv2

    n = len(dataset)
    take = np.linspace(0, n - 1, min(n, max_thumbs)).astype(int)
    cams = []
    for i in take:
        c2w = np.asarray(dataset.cameras[i].get_pose(as_jnp=False), dtype=np.float64)
        thumb = None
        try:
            sample = dataset[int(i)]
            h, w = int(sample["H"]), int(sample["W"])
            img = np.asarray(sample["img"]).reshape(h, w, 3)
            scale = thumb_px / max(h, w)
            small = cv2.resize((np.clip(img, 0, 1) * 255).astype(np.uint8),
                               (max(int(w * scale), 8), max(int(h * scale), 8)))
            ok, buf = cv2.imencode(".jpg", small[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), 70])
            if ok:
                thumb = base64.b64encode(buf.tobytes()).decode()
        except Exception:
            pass
        cams.append({"c2w": c2w.tolist(), "thumb": thumb})
    graph = {
        "cameras": cams,
        "intrinsic": np.asarray(dataset.get_intrinsic(), dtype=np.float64).tolist(),
        "wh": [int(dataset.W), int(dataset.H)],
    }
    if bounds:
        graph["bounds"] = bounds
    # sparse point cloud (COLMAP captures) -> client scene overlay
    # (reference ns_viewer scene tree shows dataset geometry)
    pc = getattr(dataset, "point_cloud", None)
    if pc is not None and pc.get("pts") is not None and len(pc["pts"]):
        graph["points"] = _pack_points(pc["pts"], pc.get("color"))
    return graph


def _pack_points(pts, colors=None, max_points=4096):
    """Subsample points (+optional colors) to a JSON-friendly payload."""
    pts = np.asarray(pts, dtype=np.float32)
    take = np.linspace(0, len(pts) - 1, min(len(pts), max_points)).astype(int)
    out = {"xyz": np.round(pts[take], 4).tolist()}
    if colors is not None and len(colors) == len(pts):
        out["rgb"] = np.round(np.clip(np.asarray(colors)[take], 0, 1), 3).tolist()
    return out


def colorize_output(imgs, mode="rgb"):
    """Render-output dict -> (h, w, 3) uint8 for the requested view mode.

    depth: robust 2-98 percentile normalization + turbo colormap (matches
    the reference viewer's depth visualization); mask: grayscale opacity.
    Falls back to rgb when the requested channel is absent."""
    import cv2

    if mode == "depth" and "depth" in imgs:
        d = np.asarray(imgs["depth"], dtype=np.float32)
        lo, hi = np.percentile(d, 2.0), np.percentile(d, 98.0)
        norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0.0, 1.0)
        turbo = cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_TURBO)
        return turbo[..., ::-1]  # BGR -> RGB
    if mode == "mask" and "mask" in imgs:
        m = (np.clip(np.asarray(imgs["mask"], dtype=np.float32), 0, 1) * 255).astype(np.uint8)
        return np.stack([m, m, m], axis=-1)
    return (np.clip(imgs["rgb"], 0, 1) * 255).astype(np.uint8)


def _ray_aabb_bounds(rays_o, rays_d, box):
    """Slab-test ray/AABB entry-exit (N, 2) for the crop box; misses get
    t1 <= t0 (fg_model masks them to background). Host-side numpy — the
    crop geometry never touches the device."""
    lo, hi = box[:3], box[3:]
    # keep the SIGN of near-zero components: +1e-9 for a negative-going
    # ray would flip the slab orientation and invert the crop interval
    inv = 1.0 / np.where(np.abs(rays_d) < 1e-9, np.copysign(1e-9, rays_d), rays_d)
    ta = (lo[None] - rays_o) * inv
    tb = (hi[None] - rays_o) * inv
    t0 = np.max(np.minimum(ta, tb), axis=1)
    t1 = np.min(np.maximum(ta, tb), axis=1)
    t0 = np.maximum(t0, 0.0)
    return np.stack([t0, t1], axis=1).astype(np.float32)


class ViewerState:
    """Holds the render function + scene metadata; renders on demand."""

    # fixed resolution ladder -> static shapes, one compile each
    RES_LADDER = (64, 128, 256, 512)

    def __init__(self, render_chunk_fn, intrinsic, wh, chunk_rays=8192, train_state_info=None,
                 scene_graph=None, control=None, render_image_fn=None, save_dir=None,
                 export_info=None, render_tier_fns=None, tier_quality=None):
        self.render_chunk_fn = render_chunk_fn
        # named render TIERS (reference settle-res behavior,
        # ns_viewer/server/viewer_utils.py:657): the client renders through
        # a cheap tier while the camera moves and escalates to an exact
        # tier on settle. Each fn: sample dict -> imgs dict. tier_quality
        # carries the calibration shown in the client badge (e.g. measured
        # psnr_vs_full from bench.py, or an eps error bound).
        self.render_tier_fns = render_tier_fns or {}
        self.tier_quality = tier_quality or {}
        # where client-authored camera paths get written (reference
        # _check_camera_path_payload, ns_viewer/server/viewer_utils.py:323)
        self.save_dir = save_dir or "."
        # config/checkpoint paths for the export-command panel (reference
        # app ExportPanel generates CLI commands the user copies)
        self.export_info = export_info or {}
        # optional whole-frame fast path: sample dict -> imgs dict. The
        # trainer passes its fused occupancy-compacted renderer here
        # (trainer.render_image_fast: ONE device dispatch per frame vs
        # render_full_image's host-chunked loop).
        self.render_image_fn = render_image_fn
        self.intrinsic = np.asarray(intrinsic, dtype=np.float64)
        self.W, self.H = wh
        self.chunk_rays = chunk_rays
        self.train_state_info = train_state_info or {}
        self.scene_graph = scene_graph or {}
        self.control = control
        self._lock = threading.Lock()

    def set_render_fn(self, render_chunk_fn):
        with self._lock:
            self.render_chunk_fn = render_chunk_fn

    def render_pose(self, c2w, res=128, mode="rgb", tier=None, crop=None,
                    split=None, split_frac=0.5):
        """c2w (4, 4) -> (h, w, 3) uint8 at the closest ladder resolution.

        ``mode`` selects the render output like the reference app's
        render-type dropdown (ns_viewer/server/viewer_utils.py:205-657):
        'rgb', 'depth' (turbo-colormapped, robust-normalized), or 'mask'
        (accumulated opacity, grayscale). ``tier`` selects a named render
        program from render_tier_fns (settle-to-exact); None falls back to
        render_image_fn / the chunked renderer. ``crop`` is an optional
        world AABB (xmin, ymin, zmin, xmax, ymax, zmax) — the reference
        viewer's crop box: marching is clamped to the box per-ray
        (fg_model crop_bounds), misses composite to background. ``split``
        names a second output mode composited right of the ``split_frac``
        divider (reference split toggles) — one render, two colorizations.
        """
        res = min(self.RES_LADDER, key=lambda r: abs(r - res))
        scale = res / max(self.W, self.H)
        w, h = max(int(self.W * scale), 16), max(int(self.H * scale), 16)

        from ..evaluation.eval_func import render_full_image
        from ..render.camera import PerspectiveCamera

        intr = self.intrinsic.copy()
        intr[0, 0] *= scale
        intr[1, 1] *= scale
        intr[0, 2] = w / 2.0
        intr[1, 2] = h / 2.0
        cam = PerspectiveCamera(intr, np.asarray(c2w), w, h)
        ro, rd, _, rr = cam.get_rays(wh_order=False)
        sample = {"rays_o": np.asarray(ro), "rays_d": np.asarray(rd), "rays_r": np.asarray(rr),
                  "H": h, "W": w}
        if crop is not None:
            sample["crop_bounds"] = _ray_aabb_bounds(
                sample["rays_o"], sample["rays_d"], np.asarray(crop, np.float32))
        with self._lock:
            fn = self.render_tier_fns.get(tier)
            if fn is not None:
                imgs = fn(sample)
            elif self.render_image_fn is not None:
                imgs = self.render_image_fn(sample)
            else:
                imgs = render_full_image(self.render_chunk_fn, sample, self.chunk_rays)
        frame = colorize_output(imgs, mode)
        if split and split != mode:
            other = colorize_output(imgs, split)
            cut = int(np.clip(float(split_frac), 0.0, 1.0) * frame.shape[1])
            frame = frame.copy()
            frame[:, cut:] = other[:, cut:]
            frame[:, max(cut - 1, 0):cut + 1] = 255  # divider line
        return frame

    def render_jpeg_b64(self, c2w, res=128, quality=80, mode="rgb", tier=None,
                        crop=None, split=None, split_frac=0.5):
        import cv2

        frame = self.render_pose(c2w, res, mode, tier=tier, crop=crop,
                                 split=split, split_frac=split_frac)
        ok, buf = cv2.imencode(".jpg", frame[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), quality])
        assert ok
        return base64.b64encode(buf.tobytes()).decode()

    def add_geometry(self, name, pts, colors=None):
        """Register extracted geometry (mesh verts / point cloud) for the
        client scene overlay (reference ns_viewer scene tree)."""
        geo = self.scene_graph.setdefault("geometry", {})
        geo[name] = _pack_points(pts, colors)

    def save_camera_path(self, c2ws, filename="viewer_camera_path.json"):
        """Write a client-authored camera path as the nerfstudio-style json
        the Inferencer's custom render mode consumes (reference
        viewer_utils.py:323-334 _check_camera_path_payload; our
        Inferencer.read_json_cam). Returns the written path."""
        filename = os.path.basename(filename) or "viewer_camera_path.json"
        path = os.path.join(self.save_dir, filename)
        payload = {"camera_path": [
            {"camera_to_world": np.asarray(m, dtype=np.float64).reshape(16).tolist()}
            for m in c2ws
        ]}
        os.makedirs(self.save_dir, exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f)
        return path

    def export_commands(self, path_file=None):
        """CLI command strings for mesh/pointcloud extraction and video
        render from the current run (reference app ExportPanel: the panel
        emits copy-paste commands rather than running the export in-app)."""
        cfg = self.export_info.get("configs", "<configs.yaml>")
        ckpt = self.export_info.get("checkpoint", "<checkpoints/latest.ckpt>")
        cmds = {
            "mesh+pointcloud": "python inference.py --configs {} --resume {} "
                               "--inference.volume.n_grid 256".format(cfg, ckpt),
            "video": "python inference.py --configs {} --resume {} "
                     "--inference.render.type circle --inference.render.n_cam 30".format(cfg, ckpt),
        }
        if path_file:
            cmds["video_custom_path"] = (
                "python inference.py --configs {} --resume {} "
                "--inference.render.type custom --inference.render.custom_path {}".format(cfg, ckpt, path_file))
        return cmds


def make_app(state):
    import tornado.web
    import tornado.websocket

    client_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "client.html")

    class IndexHandler(tornado.web.RequestHandler):
        def get(self):
            with open(client_path) as f:
                self.write(f.read())

    class WSHandler(tornado.websocket.WebSocketHandler):
        def check_origin(self, origin):
            return True

        def on_message(self, message):
            try:
                msg = json.loads(message)
                kind = msg.get("type", "render")
                if kind == "scene":
                    self.write_message(json.dumps({"type": "scene", "scene": state.scene_graph}))
                    return
                if kind == "control":
                    action = msg.get("action")
                    if state.control is not None:
                        if action == "pause":
                            state.control.pause()
                        elif action == "resume":
                            state.control.resume()
                    self.write_message(json.dumps({
                        "type": "control",
                        "paused": bool(state.control is not None and state.control.paused),
                    }))
                    return
                if kind == "save_path":
                    c2ws = [np.asarray(m, dtype=np.float64).reshape(4, 4)
                            for m in msg["camera_path"]]
                    path = state.save_camera_path(c2ws, msg.get("filename", "viewer_camera_path.json"))
                    self.write_message(json.dumps({
                        "type": "saved_path", "path": path, "n_frames": len(c2ws),
                        "commands": state.export_commands(path_file=path),
                    }))
                    return
                if kind == "export":
                    self.write_message(json.dumps(
                        {"type": "export", "commands": state.export_commands()}))
                    return
                c2w = np.asarray(msg["c2w"], dtype=np.float64).reshape(4, 4)
                res = int(msg.get("res", 128))
                mode = str(msg.get("mode", "rgb"))
                tier = msg.get("tier")
                if tier is not None and tier not in state.render_tier_fns:
                    tier = None
                crop = msg.get("crop")
                if crop is not None:
                    crop = [float(v) for v in crop]
                    if len(crop) != 6 or not all(np.isfinite(crop)):
                        crop = None
                split = msg.get("split") or None
                split_frac = float(msg.get("split_frac", 0.5))
                t0 = time.perf_counter()
                jpeg = state.render_jpeg_b64(c2w, res, mode=mode, tier=tier,
                                             crop=crop, split=split, split_frac=split_frac)
                self.write_message(json.dumps({
                    "type": "frame",
                    "jpeg": jpeg,
                    "res": res,
                    "mode": mode,
                    "tier": tier or "fast",
                    "tier_quality": state.tier_quality.get(tier or "fast"),
                    "render_ms": round((time.perf_counter() - t0) * 1000, 1),
                    "info": state.train_state_info,
                    "paused": bool(state.control is not None and state.control.paused),
                }))
            except Exception as e:  # surface render errors to the client
                self.write_message(json.dumps({"type": "error", "msg": str(e)}))

    return tornado.web.Application([(r"/", IndexHandler), (r"/ws", WSHandler)])


def run_viewer(state, port=7007, in_thread=False):
    """Serve the viewer. ``in_thread`` runs the IO loop on a daemon thread
    (for use inside the trainer)."""
    import asyncio

    import tornado.ioloop

    def serve():
        asyncio.set_event_loop(asyncio.new_event_loop())
        app = make_app(state)
        app.listen(port)
        print("viewer: http://localhost:{}".format(port))
        tornado.ioloop.IOLoop.current().start()

    if in_thread:
        t = threading.Thread(target=serve, daemon=True)
        t.start()
        return t
    serve()
