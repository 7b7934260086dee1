"""3D scene component plotting (cameras, rays, points, sphere, volume,
meshes) via matplotlib 3d (plotly unavailable in this environment — gated).

Capability parity with /root/reference/arcnerf/visual/plot_3d.py:385
(draw_3d_components) + camera_model.py (camera frustum polygons).
"""

import numpy as np


def _camera_frustum(c2w, intrinsic=None, size=0.3):
    """c2w (4, 4) -> 5 frustum corner points (apex + 4 image corners)."""
    if intrinsic is not None:
        fx = intrinsic[0, 0]
        w2 = intrinsic[0, 2]
        h2 = intrinsic[1, 2]
        x = size * w2 / fx
        y = size * h2 / fx
    else:
        x = y = size * 0.5
    corners_cam = np.array(
        [[0, 0, 0], [-x, -y, size], [x, -y, size], [x, y, size], [-x, y, size]]
    )
    corners = corners_cam @ c2w[:3, :3].T + c2w[:3, 3]
    return corners


def draw_3d_components(
    c2ws=None,
    intrinsic=None,
    cam_colors=None,
    points=None,
    point_colors=None,
    point_size=2.0,
    rays=None,
    ray_colors=None,
    sphere_radius=None,
    sphere_origin=(0, 0, 0),
    lines=None,
    meshes=None,
    volume=None,
    title="scene",
    save_path=None,
    save_html=None,
    show=False,
):
    """Plot any combination of scene components into one 3d figure.

    c2ws (N, 4, 4); points (P, 3); rays tuple (rays_o (R, 3), rays_d (R, 3))
    with rays_d length = drawn length; lines list of (2, 3)/(K, 3) polylines;
    meshes list of dicts {'verts', 'faces'}; volume dict {'bound_lines':
    [...]}. Saves a png when save_path given; ``save_html`` additionally
    writes a standalone interactive WebGL page (reference plotly-html
    parity, visual/plot_3d.py:385-561). Returns the figure.
    """
    if save_html:
        _write_html(save_html, c2ws, intrinsic, cam_colors, points, point_colors, point_size,
                    rays, ray_colors, sphere_radius, sphere_origin, lines, meshes, volume, title)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.set_title(title)

    if c2ws is not None:
        c2ws = np.asarray(c2ws)
        for i in range(c2ws.shape[0]):
            corners = _camera_frustum(c2ws[i], intrinsic)
            color = cam_colors[i] if cam_colors is not None else "tab:blue"
            for j in range(1, 5):
                seg = np.stack([corners[0], corners[j]])
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=color, linewidth=0.7)
            loop = corners[[1, 2, 3, 4, 1]]
            ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color=color, linewidth=0.7)

    if points is not None:
        points = np.asarray(points)
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=point_size,
                   c=point_colors if point_colors is not None else "tab:gray")

    if rays is not None:
        rays_o, rays_d = np.asarray(rays[0]), np.asarray(rays[1])
        for i in range(rays_o.shape[0]):
            seg = np.stack([rays_o[i], rays_o[i] + rays_d[i]])
            color = ray_colors[i] if ray_colors is not None else "tab:red"
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color=color, linewidth=0.5)

    if sphere_radius is not None:
        from ..geometry.sphere import get_sphere_surface

        x, y, z = get_sphere_surface(sphere_radius, sphere_origin, n_pts=30)
        ax.plot_wireframe(x, y, z, color="tab:green", linewidth=0.2, alpha=0.4)

    if lines is not None:
        for seg in lines:
            seg = np.asarray(seg)
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="tab:purple", linewidth=0.5)

    if meshes is not None:
        for mesh in meshes:
            verts, faces = np.asarray(mesh["verts"]), np.asarray(mesh["faces"])
            ax.plot_trisurf(
                verts[:, 0], verts[:, 1], verts[:, 2], triangles=faces, alpha=0.4, linewidth=0.0
            )

    if volume is not None and "bound_lines" in volume:
        for seg in volume["bound_lines"]:
            seg = np.asarray(seg)
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="tab:orange", linewidth=0.8)

    # equal-ish aspect
    ax.set_box_aspect((1, 1, 1))
    if save_path:
        fig.savefig(save_path, dpi=120)
    if not show:
        plt.close(fig)
    return fig


def _write_html(path, c2ws, intrinsic, cam_colors, points, point_colors, point_size,
                rays, ray_colors, sphere_radius, sphere_origin, lines, meshes, volume, title):
    """Assemble the same components into the standalone WebGL page."""
    from .html_3d import HtmlScene

    scene = HtmlScene(title=title)
    if c2ws is not None:
        c2ws = np.asarray(c2ws)
        segs, cols = [], []
        for i in range(c2ws.shape[0]):
            corners = _camera_frustum(c2ws[i], intrinsic)
            color = (cam_colors[i] if cam_colors is not None and not isinstance(cam_colors[i], str)
                     else (0.25, 0.5, 0.95))
            for j in range(1, 5):
                segs.append(np.stack([corners[0], corners[j]]))
            loop = corners[[1, 2, 3, 4, 1]]
            for j in range(4):
                segs.append(loop[j:j + 2])
            cols.extend([color] * 16)  # 8 segments x 2 verts
        scene.add_lines("cameras ({})".format(c2ws.shape[0]), np.asarray(segs), np.asarray(cols))
    if points is not None:
        pc = point_colors if point_colors is not None and not isinstance(point_colors, str) else None
        scene.add_points("points ({})".format(np.asarray(points).shape[0]), points, pc,
                         point_size=max(2.0, point_size))
    if rays is not None:
        rays_o, rays_d = np.asarray(rays[0]), np.asarray(rays[1])
        segs = np.stack([rays_o, rays_o + rays_d], axis=1)
        cols = None
        if ray_colors is not None and not isinstance(np.asarray(ray_colors).reshape(-1)[0], str):
            cols = np.repeat(np.asarray(ray_colors, dtype=np.float64).reshape(-1, 3), 2, axis=0)
        scene.add_lines("rays ({})".format(rays_o.shape[0]), segs,
                        cols if cols is not None else (0.9, 0.35, 0.3))
    if sphere_radius is not None:
        from ..geometry.sphere import get_sphere_surface

        x, y, z = get_sphere_surface(sphere_radius, sphere_origin, n_pts=24)
        wires = []
        for i in range(0, x.shape[0], 3):
            wires.append(np.stack([x[i], y[i], z[i]], axis=-1))
        for j in range(0, x.shape[1], 3):
            wires.append(np.stack([x[:, j], y[:, j], z[:, j]], axis=-1))
        scene.add_lines("bounding sphere", wires, (0.3, 0.75, 0.4))
    if lines is not None:
        scene.add_lines("lines", [np.asarray(s) for s in lines], (0.7, 0.5, 0.9))
    if meshes is not None:
        for mi, mesh in enumerate(meshes):
            scene.add_mesh("mesh {}".format(mi), mesh["verts"], mesh["faces"],
                           mesh.get("vert_colors"))
    if volume is not None and "bound_lines" in volume:
        scene.add_lines("volume", [np.asarray(s) for s in volume["bound_lines"]], (0.95, 0.6, 0.2))
    scene.write(path)
