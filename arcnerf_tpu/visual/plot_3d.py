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
    show=False,
):
    """Plot any combination of scene components into one 3d figure.

    c2ws (N, 4, 4); points (P, 3); rays tuple (rays_o (R, 3), rays_d (R, 3))
    with rays_d length = drawn length; lines list of (2, 3)/(K, 3) polylines;
    meshes list of dicts {'verts', 'faces'}; volume dict {'bound_lines':
    [...]}. Saves a png when save_path given; returns the figure.
    """
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
