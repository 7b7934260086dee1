"""Inferencer + eval-loop unit tests against a fake renderer (fast, no
model): camera paths, video writing, volume extraction plumbing, custom
json path reading, eval metrics/outputs."""

import json
import os

import numpy as np

import jax.numpy as jnp

from arcnerf_tpu.evaluation.eval_func import render_full_image, run_eval
from arcnerf_tpu.evaluation.infer_func import Inferencer
from arcnerf_tpu.utils.cfgs import dict_to_obj


def fake_render_chunk(feed):
    rays_d = np.asarray(feed["rays_d"])
    rgb = (rays_d + 1.0) / 2.0
    return {"rgb": jnp.asarray(rgb), "depth": jnp.ones(rays_d.shape[:2]),
            "mask": jnp.ones(rays_d.shape[:2])}


def fake_forward_pts(pts):
    """Density: solid sphere radius 0.5."""
    return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 100.0, 0.0)


def fake_forward_pts_dir(pts, dirs):
    return fake_forward_pts(pts), jnp.ones((pts.shape[0], 3)) * 0.5


INTR = np.array([[60.0, 0, 32.0], [0, 60.0, 32.0], [0, 0, 1]])


def test_inferencer_full(tmp_path):
    cfgs = dict_to_obj({
        "render": {"type": ["circle"], "n_cam": [4], "radius": 2.5, "fps": 5},
        "volume": {"n_grid": 32, "side": 2.0, "level": 50.0, "grad_dir": "descent",
                   "chunk_pts": 4096},
    })
    inf = Inferencer(cfgs, INTR, (64, 64))
    out = inf.run_infer(fake_render_chunk, fake_forward_pts, fake_forward_pts_dir, str(tmp_path),
                        chunk_rays=2048)
    assert os.path.exists(out["video"][0])
    assert os.path.exists(out["volume"]["mesh"]) and os.path.exists(out["volume"]["pc"])

    from arcnerf_tpu.geometry.mesh import load_meshes

    verts, faces, colors = load_meshes(out["volume"]["mesh"])
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.05)  # the iso sphere
    np.testing.assert_allclose(colors.astype(float) / 255.0, 0.5, atol=0.01)


def test_custom_json_path(tmp_path):
    mats = [np.eye(4).tolist() for _ in range(3)]
    p1 = tmp_path / "ns.json"
    p1.write_text(json.dumps({"camera_path": [{"camera_to_world": np.ravel(m).tolist()} for m in mats]}))
    out = Inferencer.read_json_cam(str(p1))
    assert out.shape == (3, 4, 4)

    p2 = tmp_path / "plain.json"
    p2.write_text(json.dumps({"c2ws": mats}))
    assert Inferencer.read_json_cam(str(p2)).shape == (3, 4, 4)

    cfgs = dict_to_obj({"render": {"type": ["custom"], "custom_path": str(p1), "fps": 5}})
    inf = Inferencer(cfgs, INTR, (32, 32))
    assert len(inf.render_data[0]["cams"]) == 3


class FakeDataset:
    W = H = 48

    def __init__(self, n=2):
        self.n = n
        from arcnerf_tpu.geometry.poses import generate_cam_pose_on_sphere
        from arcnerf_tpu.render.camera import PerspectiveCamera

        c2ws = generate_cam_pose_on_sphere("circle", 2.5, n)
        self.cams = [PerspectiveCamera(INTR, c2ws[i], 48, 48) for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        ro, rd, _, rr = self.cams[i].get_rays(wh_order=False)
        rays_d = np.asarray(rd)
        gt = ((rays_d + 1.0) / 2.0).astype(np.float32)  # matches fake renderer
        return {"img": gt, "rays_o": np.asarray(ro), "rays_d": rays_d, "rays_r": np.asarray(rr),
                "H": 48, "W": 48}


def test_run_eval(tmp_path):
    summary, results = run_eval(fake_render_chunk, FakeDataset(), out_dir=str(tmp_path), chunk_rays=1024)
    assert summary["psnr"] > 50  # renderer == gt
    assert summary["ssim"] > 0.99
    assert os.path.exists(tmp_path / "eval_log.txt")
    assert os.path.exists(tmp_path / "eval_000.png")


def test_bkg_color_composite():
    """bkg_color fed to render_full_image reaches the model feed."""
    seen = {}

    def spy_chunk(feed):
        seen["bkg"] = np.asarray(feed.get("bkg_color")) if "bkg_color" in feed else None
        return fake_render_chunk(feed)

    ds = FakeDataset(1)
    render_full_image(spy_chunk, ds[0], chunk_rays=1024, bkg_color=[1.0, 1.0, 1.0])
    assert seen["bkg"] is not None and np.allclose(seen["bkg"], 1.0)
