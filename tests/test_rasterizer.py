"""Software rasterizer tests: render a sphere mesh, check silhouette
coverage, depth ordering and color shading."""

import numpy as np

from arcnerf_tpu.geometry.mesh import extract_mesh
from arcnerf_tpu.geometry.poses import look_at
from arcnerf_tpu.render.rasterizer import rasterize_mesh, render_mesh_images
from arcnerf_tpu.geometry.poses import invert_poses


def sphere_mesh(n=32, radius=1.0):
    ext = 1.3
    axes = [np.linspace(-ext, ext, n)] * 3
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    sdf = np.linalg.norm(grid, axis=-1) - radius
    return extract_mesh(sdf, 0.0, (2 * ext / (n - 1),) * 3, (-ext,) * 3)


def setup_cam(w=64, h=64):
    intrinsic = np.eye(3)
    intrinsic[0, 0] = intrinsic[1, 1] = 1.2 * w
    intrinsic[0, 2], intrinsic[1, 2] = w / 2, h / 2
    c2w = look_at(np.array([0.0, 0.0, -3.0]), np.zeros(3))
    return intrinsic, c2w, (w, h)


def test_silhouette():
    verts, faces = sphere_mesh()
    intrinsic, c2w, wh = setup_cam()
    w2c = invert_poses(c2w[None])[0]
    sil = rasterize_mesh(verts, faces, intrinsic, w2c, wh, mode="silhouette")
    # sphere silhouette: projected radius = f * tan(asin(r/d))
    cover = (sil[..., 0] > 0).sum()
    f = 1.2 * 64
    expected = np.pi * (f * np.tan(np.arcsin(1.0 / 3.0))) ** 2
    assert abs(cover - expected) / expected < 0.1
    # center covered, corner not
    assert sil[32, 32, 0] == 1.0 and sil[2, 2, 0] == 0.0


def test_color_and_depth():
    verts, faces = sphere_mesh()
    intrinsic, c2w, wh = setup_cam()
    w2c = invert_poses(c2w[None])[0]
    col = rasterize_mesh(verts, faces, intrinsic, w2c, wh, mode="color")
    assert col.max() > 0.3  # lit
    dep = rasterize_mesh(verts, faces, intrinsic, w2c, wh, mode="depth")
    # sphere nearest point at image center -> lowest normalized depth there
    assert dep[32, 32, 0] < 0.2


def test_vertex_colors_and_multi_view():
    verts, faces = sphere_mesh(n=24)
    intrinsic, c2w, wh = setup_cam(48, 48)
    colors = np.tile(np.array([[1.0, 0.0, 0.0]], dtype=np.float32), (verts.shape[0], 1))
    out = render_mesh_images(verts, faces, intrinsic, [c2w, c2w], wh, colors, modes=("color", "silhouette"))
    assert len(out["color"]) == 2
    img = out["color"][0]
    mask = out["silhouette"][0][..., 0] > 0
    assert np.allclose(img[mask][:, 0], 1.0, atol=1e-5)  # red
    assert np.allclose(img[mask][:, 1], 0.0, atol=1e-5)
