"""Viewer tests: ViewerState renders poses through a fake renderer; the
tornado websocket bridge serves frames end-to-end."""

import asyncio
import json
import threading
import time

import numpy as np
import pytest

from arcnerf_tpu.geometry.poses import look_at
from arcnerf_tpu.viewer import ViewerState, run_viewer


def fake_render_chunk(feed):
    """Deterministic fake renderer: rgb encodes ray direction."""
    rays_d = np.asarray(feed["rays_d"])  # (1, chunk, 3)
    rgb = (rays_d + 1.0) / 2.0
    depth = 1.0 + np.asarray(rays_d[..., 0])  # gradient so depth colormap varies
    mask = (np.asarray(rays_d[..., 2]) > 0.99).astype(np.float32)
    return {"rgb": rgb, "depth": depth, "mask": mask}


def make_state():
    intrinsic = np.array([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])
    return ViewerState(fake_render_chunk, intrinsic, (128, 128), chunk_rays=2048)


def test_render_pose():
    state = make_state()
    c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
    frame = state.render_pose(c2w, res=128)
    assert frame.shape == (128, 128, 3) and frame.dtype == np.uint8
    # central pixel's direction ~ (0,0,1) -> rgb ~ (127, 127, 255)
    c = frame[64, 64]
    assert abs(int(c[0]) - 127) < 12 and int(c[2]) > 240

    jpeg = state.render_jpeg_b64(c2w, res=64)
    assert len(jpeg) > 100


def test_render_modes():
    """rgb/depth/mask render-mode selection (VERDICT r2 item 6; reference
    viewer render-type handling ns_viewer/server/viewer_utils.py:205-657)."""
    state = make_state()
    c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
    rgb = state.render_pose(c2w, res=64, mode="rgb")
    depth = state.render_pose(c2w, res=64, mode="depth")
    mask = state.render_pose(c2w, res=64, mode="mask")
    assert rgb.shape == depth.shape == mask.shape and depth.dtype == np.uint8
    # depth colormap output differs from rgb; mask is grayscale
    assert not np.array_equal(rgb, depth)
    assert np.array_equal(mask[..., 0], mask[..., 1]) and np.array_equal(mask[..., 1], mask[..., 2])
    assert mask.max() == 255 and mask.min() == 0  # fake mask has both classes
    # unknown channel falls back to rgb
    assert np.array_equal(state.render_pose(c2w, res=64, mode="normal"), rgb)


def test_render_image_fn_fast_path():
    """A whole-frame render_image_fn (the trainer's fused fast path) must
    take precedence over the chunked renderer and feed the same colorize
    pipeline."""
    calls = {}

    def fake_render_image(sample):
        h, w = sample["H"], sample["W"]
        calls["shape"] = (h, w)
        rays_d = np.asarray(sample["rays_d"]).reshape(h, w, 3)
        return {"rgb": (rays_d + 1.0) / 2.0,
                "depth": 1.0 + rays_d[..., 0],
                "mask": (rays_d[..., 2] > 0.99).astype(np.float32)}

    intrinsic = np.array([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])

    def boom(feed):  # the chunked path must NOT be used
        raise AssertionError("chunked renderer called despite render_image_fn")

    state = ViewerState(boom, intrinsic, (128, 128), chunk_rays=2048,
                        render_image_fn=fake_render_image)
    c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
    frame = state.render_pose(c2w, res=128)
    assert frame.shape == (128, 128, 3) and frame.dtype == np.uint8
    assert calls["shape"] == (128, 128)
    c = frame[64, 64]
    assert abs(int(c[0]) - 127) < 12 and int(c[2]) > 240


def test_websocket_roundtrip():
    websockets = pytest.importorskip("websockets")
    state = make_state()
    port = 17971
    run_viewer(state, port=port, in_thread=True)
    time.sleep(1.0)

    async def roundtrip():
        import websockets

        async with websockets.connect("ws://localhost:{}/ws".format(port)) as ws:
            c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
            await ws.send(json.dumps({"c2w": c2w.tolist(), "res": 64}))
            reply = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            return reply

    reply = asyncio.run(roundtrip())
    assert reply["type"] == "frame"
    assert len(reply["jpeg"]) > 100
    assert reply["render_ms"] >= 0


def test_scene_graph_and_control():
    """Scene-graph JSON (cameras + thumbnails + bounds) and pause/resume
    control round trip over the websocket (VERDICT r1 item 8; reference
    ns_viewer init_scene:280 + training-control)."""
    websockets = pytest.importorskip("websockets")
    from arcnerf_tpu.datasets.synthetic_dataset import Synthetic
    from arcnerf_tpu.utils.cfgs import dict_to_obj
    from arcnerf_tpu.viewer.server import TrainControl, build_scene_graph

    ds = Synthetic(dict_to_obj({"n_imgs": 5, "wh": [32, 32], "cam_radius": 2.5,
                                "white_bkg": True}), None, "train")
    graph = build_scene_graph(ds, bounds={"sphere_radius": 1.5}, max_thumbs=4)
    assert len(graph["cameras"]) == 4
    assert all(c["thumb"] for c in graph["cameras"])
    assert np.asarray(graph["cameras"][0]["c2w"]).shape == (4, 4)
    assert graph["bounds"]["sphere_radius"] == 1.5
    assert graph["wh"] == [32, 32]

    control = TrainControl()
    state = make_state()
    state.scene_graph = graph
    state.control = control
    port = 17973
    run_viewer(state, port=port, in_thread=True)
    time.sleep(1.0)

    async def roundtrip():
        import websockets

        async with websockets.connect("ws://localhost:{}/ws".format(port)) as ws:
            await ws.send(json.dumps({"type": "scene"}))
            scene = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            await ws.send(json.dumps({"type": "control", "action": "pause"}))
            paused = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            await ws.send(json.dumps({"type": "control", "action": "resume"}))
            resumed = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            return scene, paused, resumed

    scene, paused_msg, resumed_msg = asyncio.run(roundtrip())
    assert scene["type"] == "scene" and len(scene["scene"]["cameras"]) == 4
    assert paused_msg == {"type": "control", "paused": True}
    assert resumed_msg == {"type": "control", "paused": False}
    assert not control.paused  # resumed: trainer would proceed


def test_train_control_gates_trainer():
    from arcnerf_tpu.viewer.server import TrainControl

    control = TrainControl()
    seen = []

    def fake_train():
        for step in range(3):
            control.wait_if_paused(poll=0.01)
            seen.append(step)

    control.pause()
    t = threading.Thread(target=fake_train)
    t.start()
    time.sleep(0.15)
    assert seen == []  # paused before the first step
    control.resume()
    t.join(timeout=5)
    assert seen == [0, 1, 2]


def test_save_camera_path_and_export(tmp_path):
    """Camera-path save (nerfstudio-style json the Inferencer's custom mode
    reads back) + export-command panel round trip over the websocket
    (reference app CameraPanel/ExportPanel; viewer_utils.py:323-334)."""
    websockets = pytest.importorskip("websockets")
    from arcnerf_tpu.evaluation.infer_func import Inferencer

    state = make_state()
    state.save_dir = str(tmp_path)
    state.export_info = {"configs": "cfg.yaml", "checkpoint": "ck.ckpt"}
    port = 17975
    run_viewer(state, port=port, in_thread=True)
    time.sleep(1.0)

    mats = [look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3)).tolist(),
            look_at(np.array([2.5, 0.0, 0.0]), np.zeros(3)).tolist()]

    async def roundtrip():
        import websockets

        async with websockets.connect("ws://localhost:{}/ws".format(port)) as ws:
            await ws.send(json.dumps({"type": "save_path", "camera_path": mats,
                                      "filename": "p.json"}))
            saved = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            await ws.send(json.dumps({"type": "export"}))
            export = json.loads(await asyncio.wait_for(ws.recv(), timeout=30))
            return saved, export

    saved, export = asyncio.run(roundtrip())
    assert saved["type"] == "saved_path" and saved["n_frames"] == 2
    # the saved json is directly consumable by the inference custom path
    c2ws = Inferencer.read_json_cam(saved["path"])
    np.testing.assert_allclose(c2ws, np.asarray(mats), atol=1e-12)
    assert "video_custom_path" in saved["commands"]
    assert saved["path"] in saved["commands"]["video_custom_path"]
    assert export["type"] == "export"
    assert "cfg.yaml" in export["commands"]["video"]
    assert "ck.ckpt" in export["commands"]["mesh+pointcloud"]


def test_camera_path_roundtrip_inferencer(tmp_path):
    """Path-editor -> nerfstudio json -> Inferencer.read_json_cam round
    trip (VERDICT r3 item 9): the file the viewer writes must parse back
    into the exact c2w matrices through the inference custom-path reader."""
    from arcnerf_tpu.evaluation.infer_func import Inferencer

    state = make_state()
    state.save_dir = str(tmp_path)
    c2ws = [np.asarray(look_at(np.array([np.cos(a), 0.3, np.sin(a)]) * 3.0,
                               np.zeros(3)), dtype=np.float64)
            for a in (0.0, 1.2, 2.4)]
    path = state.save_camera_path(c2ws, "path.json")
    back = Inferencer.read_json_cam(path)
    assert back.shape == (3, 4, 4)
    np.testing.assert_allclose(back, np.stack(c2ws), atol=1e-12)


def test_render_tiers_and_quality_badge():
    """Named render tiers (settle-to-exact): the tier fn is selected per
    request, unknown tiers fall back, and tier_quality rides the state."""
    calls = []

    def _frame(sample):
        h, w = int(sample["H"]), int(sample["W"])
        out = fake_render_chunk({"rays_d": sample["rays_d"][None]})
        return {k: np.asarray(v).reshape((h, w) + v.shape[2:]) for k, v in out.items()}

    def tier_exact(sample):
        calls.append("exact")
        return _frame(sample)

    def tier_fast(sample):
        calls.append("fast")
        return _frame(sample)

    intrinsic = np.array([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])
    state = ViewerState(
        fake_render_chunk, intrinsic, (128, 128), chunk_rays=2048,
        render_tier_fns={"fast": tier_fast, "exact": tier_exact},
        tier_quality={"exact": {"kind": "transmittance-continuation", "eps": 1e-3}})
    c2w = look_at(np.array([0.0, 0.0, 3.0]), np.zeros(3))
    f1 = state.render_pose(c2w, res=64, tier="fast")
    f2 = state.render_pose(c2w, res=64, tier="exact")
    assert calls == ["fast", "exact"]
    assert f1.shape == f2.shape
    assert state.tier_quality["exact"]["eps"] == 1e-3
    # unknown tier (None) falls back to the chunked renderer, no crash
    f3 = state.render_pose(c2w, res=64, tier=None)
    assert f3.shape == f1.shape


def test_scene_graph_points_and_geometry():
    """Dataset point clouds and extracted geometry land in the scene graph
    (reference ns_viewer scene tree shows dataset/extracted geometry)."""
    from arcnerf_tpu.viewer.server import _pack_points

    state = make_state()
    pts = np.random.default_rng(0).uniform(-1, 1, size=(10000, 3)).astype(np.float32)
    colors = np.random.default_rng(1).uniform(0, 1, size=(10000, 3)).astype(np.float32)
    state.add_geometry("extracted_mesh", pts, colors)
    geo = state.scene_graph["geometry"]["extracted_mesh"]
    assert len(geo["xyz"]) <= 4096 and len(geo["xyz"]) == len(geo["rgb"])

    packed = _pack_points(pts[:5])
    assert len(packed["xyz"]) == 5 and "rgb" not in packed


def test_split_view_composites_two_modes():
    """Split toggle (reference ns_viewer split view): left of the divider
    is `mode`, right is `split`, one render for both."""
    state = make_state()
    c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
    rgb = state.render_pose(c2w, res=64, mode="rgb")
    depth = state.render_pose(c2w, res=64, mode="depth")
    half = state.render_pose(c2w, res=64, mode="rgb", split="depth", split_frac=0.5)
    w = half.shape[1]
    cut = w // 2
    assert np.array_equal(half[:, :cut - 1], rgb[:, :cut - 1])
    assert np.array_equal(half[:, cut + 1:], depth[:, cut + 1:])
    assert (half[:, cut] == 255).all()  # divider line
    # split == mode or empty: no compositing
    assert np.array_equal(state.render_pose(c2w, res=64, mode="rgb", split="rgb"), rgb)


def test_crop_bounds_reach_renderer():
    """Crop box: the server computes per-ray AABB entry/exit and injects
    crop_bounds into the feed (fg_model clamps the march to it)."""
    from arcnerf_tpu.viewer.server import _ray_aabb_bounds

    seen = {}

    def spy_render(feed):
        if "crop_bounds" in feed:
            seen["crop"] = np.asarray(feed["crop_bounds"]).copy()
        rays_d = np.asarray(feed["rays_d"])
        return {"rgb": (rays_d + 1.0) / 2.0}

    intrinsic = np.array([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])
    state = ViewerState(spy_render, intrinsic, (128, 128), chunk_rays=1 << 20)
    c2w = look_at(np.array([0.0, 0.0, -2.5]), np.zeros(3))
    state.render_pose(c2w, res=64, crop=[-0.5, -0.5, -0.5, 0.5, 0.5, 0.5])
    assert "crop" in seen and seen["crop"].shape[-1] == 2
    # the central ray (pointing at the box center) must hit: t1 > t0
    cb = seen["crop"].reshape(-1, 2)
    mid = cb[(64 * 64) // 2 + 32]  # central REAL ray (chunk pads past 64x64)
    assert mid[1] > mid[0] > 0

    # geometry: a ray straight at the box from z=-2.5 enters at 2.0, exits 3.0
    ro = np.array([[0.0, 0.0, -2.5]], np.float32)
    rd = np.array([[0.0, 0.0, 1.0]], np.float32)
    b = _ray_aabb_bounds(ro, rd, np.array([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5], np.float32))
    np.testing.assert_allclose(b, [[2.0, 3.0]], atol=1e-5)
    # a ray pointing away misses: t1 <= t0
    b2 = _ray_aabb_bounds(ro, -rd, np.array([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5], np.float32))
    assert b2[0, 1] <= b2[0, 0]


def test_fg_model_crop_clamps_near_far():
    """fg_model.get_near_far_from_rays honors feed crop_bounds: the march
    segment clamps to the crop window and misses join mask_rays."""
    import jax.numpy as jnp

    from arcnerf_tpu.models import build_model
    from arcnerf_tpu.utils.cfgs import dict_to_obj

    cfgs = dict_to_obj({"model": {
        "type": "NeRF",
        "rays": {"n_sample": 8, "n_importance": 0, "bounding_radius": 3.0,
                 "near": None, "far": None},
        "chunk_rays": 1024, "chunk_pts": 4096,
        "geometry": {"W": 8, "D": 1, "skips": [], "input_ch": 3,
                     "encoder": {"type": "FreqEmbedder", "n_freqs": 2}},
        "radiance": {"mode": "vf", "W": 8, "D": 1,
                     "encoder": {"view": {"type": "FreqEmbedder", "n_freqs": 2}}},
    }})
    model = build_model(cfgs)
    fg = model.fg_model if hasattr(model, "fg_model") else model
    ro = jnp.array([[0.0, 0.0, -2.5], [0.0, 0.0, -2.5]])
    rd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    feed = {"rays_o": ro, "rays_d": rd,
            "crop_bounds": jnp.array([[2.0, 3.0], [2.0, 3.0]])}
    near, far, mask = fg.get_near_far_from_rays(feed)
    # ray 0: sphere gives [~0, ~5.5]; crop clamps to [2, 3]
    np.testing.assert_allclose(np.asarray(near[0]), [2.0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(far[0]), [3.0], atol=1e-4)
    assert mask is not None and bool(mask[0])
    # ray 1 points away from the box: crop miss -> masked out, far >= near
    assert not bool(mask[1])
    assert float(far[1, 0]) >= float(near[1, 0])
