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
    return {"rgb": rgb, "depth": np.ones(rays_d.shape[:2], dtype=np.float32)}


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
