"""Dataset + visual layer tests: synthetic dataset geometry consistency,
transforms, loss/metric factories, visual panels, colmap lib round trips."""

import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from arcnerf_tpu.datasets.synthetic_dataset import Synthetic, trace_sphere_scene
from arcnerf_tpu.datasets.transforms import (
    BlendBkgColor,
    Compose,
    SampleRays,
    ShuffleRays,
    TransferRGBSpace,
    linear_to_srgb,
    srgb_to_linear,
)
from arcnerf_tpu.losses import build_loss
from arcnerf_tpu.metrics import build_metric, psnr, ssim
from arcnerf_tpu.utils.cfgs import dict_to_obj


def make_dataset(mode="train", n_imgs=3, wh=(32, 32)):
    cfgs = dict_to_obj({"n_imgs": n_imgs, "wh": list(wh), "cam_radius": 2.5, "white_bkg": True})
    return Synthetic(cfgs, None, mode)


class TestSyntheticDataset:

    def test_shapes_and_keys(self):
        ds = make_dataset()
        assert len(ds) == 3
        sample = ds[0]
        n = 32 * 32
        assert sample["img"].shape == (n, 3)
        assert sample["mask"].shape == (n,)
        assert sample["rays_o"].shape == (n, 3)
        assert sample["rays_d"].shape == (n, 3)
        assert sample["rays_r"].shape == (n, 1)
        assert sample["H"] == 32 and sample["W"] == 32

    def test_rays_hit_scene(self):
        """Tracing the dataset's own rays must reproduce its images."""
        ds = make_dataset()
        sample = ds[0]
        rgb, _, mask = trace_sphere_scene(sample["rays_o"], sample["rays_d"])
        np.testing.assert_allclose(rgb, sample["img"], atol=1e-5)
        assert 0.05 < mask.mean() < 0.9  # object visible but not filling frame

    def test_mode_split_differs(self):
        tr = make_dataset("train")
        ev = make_dataset("eval")
        assert not np.allclose(tr.cameras[0].get_pose(as_jnp=False), ev.cameras[0].get_pose(as_jnp=False))


class TestTransforms:

    def _sample(self, n=64):
        rng = np.random.default_rng(0)
        return {
            "img": rng.random((n, 3)).astype(np.float32),
            "mask": (rng.random(n) > 0.5).astype(np.float32),
            "rays_o": rng.random((n, 3)).astype(np.float32),
            "rays_d": rng.random((n, 3)).astype(np.float32),
            "rays_r": rng.random((n, 1)).astype(np.float32),
        }

    def test_sample_and_shuffle(self):
        s = self._sample()
        out = SampleRays(16, seed=0)(dict(s))
        assert out["img"].shape == (16, 3) and out["rays_o"].shape == (16, 3)
        sh = ShuffleRays(seed=0)(self._sample())
        assert sh["img"].shape == (64, 3)

    def test_rgb_space_roundtrip(self):
        x = np.linspace(0.01, 0.99, 50)
        np.testing.assert_allclose(srgb_to_linear(linear_to_srgb(x)), x, atol=1e-5)

    def test_blend_bkg(self):
        s = self._sample()
        out = BlendBkgColor((1.0, 1.0, 1.0))(dict(s))
        bkg_rows = s["mask"] == 0
        np.testing.assert_allclose(out["img"][bkg_rows], 1.0, atol=1e-6)


def test_loss_factory():
    cfgs = dict_to_obj({
        "loss": {
            "ImgLoss": {"weight": 1.0, "loss_type": "MSE"},
            "MaskLoss": {"weight": 0.5, "loss_type": "BCE"},
            "EikonalLoss": {"weight": 0.1},
        }
    })
    loss = build_loss(cfgs)
    inputs = {
        "img": jnp.ones((1, 8, 3)) * 0.5,
        "mask": jnp.ones((1, 8)),
    }
    output = {
        "rgb_coarse": jnp.ones((1, 8, 3)) * 0.4,
        "mask_coarse": jnp.ones((1, 8)) * 0.9,
        "normal_pts": jnp.ones((1, 8, 3)),
    }
    out = loss(inputs, output)
    assert "sum" in out and np.isfinite(float(out["sum"]))
    assert abs(float(out["ImgLoss"]) - 0.01) < 1e-6
    # eikonal of norm sqrt(3) vector: (sqrt(3)-1)^2
    assert abs(float(out["EikonalLoss"]) - (np.sqrt(3) - 1) ** 2) < 1e-5


def test_metric_factory_and_ssim():
    cfgs = dict_to_obj({"metric": {"PSNR": {}, "SSIM": {}}})
    metric = build_metric(cfgs)
    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    inputs = {"img": jnp.asarray(img.reshape(-1, 3)), "H": 16, "W": 16}
    output = {"rgb": jnp.asarray(img.reshape(-1, 3))}
    out = metric(inputs, output)
    assert float(out["PSNR"]) > 80  # identical images
    assert float(out["SSIM"]) > 0.99

    # psnr of known mse
    a = jnp.zeros((4, 4, 3))
    b = jnp.full((4, 4, 3), 0.1)
    assert abs(float(psnr(a, b)) - 20.0) < 1e-3


def test_visual_panels():
    from arcnerf_tpu.visual import draw_2d_components, draw_3d_components
    from arcnerf_tpu.visual.render_img import render_progress_imgs

    h = w = 16
    inputs = {"img": np.random.default_rng(0).random((h, w, 3)).astype(np.float32), "H": h, "W": w}
    output = {
        "rgb": np.random.default_rng(1).random((h, w, 3)).astype(np.float32),
        "depth": np.random.default_rng(2).random((h, w)).astype(np.float32),
        "mask": np.ones((h, w), dtype=np.float32),
    }
    panel = render_progress_imgs(inputs, output)
    assert panel["imgs"][0].shape == (h, w * 5, 3)  # gt, pred, err, depth, mask
    assert panel["imgs"][0].dtype == np.uint8

    img2d = draw_2d_components(lines=[[[0, 1, 2], [1, 2, 3]]], legends=["x"])
    assert img2d.ndim == 3

    with tempfile.TemporaryDirectory() as d:
        from arcnerf_tpu.geometry.poses import generate_cam_pose_on_sphere

        c2ws = generate_cam_pose_on_sphere("circle", 2.0, 6)
        path = os.path.join(d, "scene.png")
        html_path = os.path.join(d, "scene.html")
        from arcnerf_tpu.geometry.mesh import extract_mesh

        g = np.linspace(-1.1, 1.1, 16)
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        mv, mf = extract_mesh(np.sqrt(x**2 + y**2 + z**2) - 0.8, 0.0,
                              (g[1] - g[0],) * 3, (-1.1,) * 3)
        draw_3d_components(
            c2ws=c2ws,
            points=np.random.default_rng(0).random((50, 3)),
            rays=(np.zeros((3, 3)), np.eye(3)),
            sphere_radius=1.0,
            meshes=[{"verts": mv, "faces": mf}],
            title="t",
            save_path=path,
            save_html=html_path,
        )
        assert os.path.exists(path)
        # interactive html export (reference plotly parity): standalone WebGL
        # page embedding the scene json with togglable groups
        html = open(html_path).read()
        assert "webgl" in html and "SCENE" in html
        for name in ("cameras (6)", "points (50)", "rays (3)", "bounding sphere", "mesh 0"):
            assert name in html, name
        import json as _json

        scene_json = html.split("const SCENE = ", 1)[1].split(";\n", 1)[0]
        scene = _json.loads(scene_json)
        assert {g["type"] for g in scene["groups"]} == {"points", "lines", "mesh"}
        mesh_group = [g for g in scene["groups"] if g["type"] == "mesh"][0]
        assert len(mesh_group["faces"]) == mf.size


def test_colmap_qvec_roundtrip():
    from arcnerf_tpu.colmap.colmap_lib import qvec2rotmat, rotmat2qvec

    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    q2 = rotmat2qvec(R.astype(np.float32))
    np.testing.assert_allclose(np.abs(q2), np.abs(q), atol=1e-4)
