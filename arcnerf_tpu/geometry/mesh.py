"""Mesh extraction + processing.

Capability parity with /root/reference/arcnerf/geometry/mesh.py
(extract_mesh:12 via skimage marching_cubes, simplify_mesh:149 via pyfqmr,
normals/face centers, render_mesh_images:174). Neither skimage nor pyfqmr
ships in this environment, so:

- ``extract_mesh`` defaults to **marching cubes** with a programmatically
  generated case table (mc_table.py; native C++ fast path in
  native/mc_extract.cpp, vectorized numpy fallback) for face-count parity
  with the reference's skimage extraction; ``method='mt'`` selects the
  original vectorized **marching tetrahedra** (6 tets per cube, denser
  triangulation). Both watertight, orientation fixed against the field
  gradient.
- ``simplify_mesh`` defaults to **quadric-error-metric** edge contraction
  (native/qem_simplify.cpp, pyfqmr-class quality) with vertex-clustering
  decimation as the no-toolchain fallback.
- PLY/OBJ writers are self-contained.
"""

import numpy as np

# cube corner offsets, binary (x, y, z) order: corner k = (k&1, (k>>1)&1, (k>>2)&1)
_CUBE_CORNERS = np.array([[k & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], dtype=np.int32)

# six tetrahedra filling a cube, all sharing the 0-6 diagonal
_CUBE_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    dtype=np.int32,
)


def _tet_case_table():
    """case (4-bit inside mask) -> list of triangles, each triangle a list of
    3 (inside_vertex, outside_vertex) edge pairs."""
    table = {}
    for mask in range(16):
        inside = [i for i in range(4) if mask & (1 << i)]
        outside = [i for i in range(4) if not (mask & (1 << i))]
        tris = []
        if len(inside) == 1:
            i = inside[0]
            o0, o1, o2 = outside
            tris = [[(i, o0), (i, o1), (i, o2)]]
        elif len(inside) == 3:
            o = outside[0]
            i0, i1, i2 = inside
            tris = [[(i0, o), (i1, o), (i2, o)]]
        elif len(inside) == 2:
            i0, i1 = inside
            o0, o1 = outside
            e0, e1, e2, e3 = (i0, o0), (i0, o1), (i1, o1), (i1, o0)
            tris = [[e0, e1, e2], [e0, e2, e3]]
        table[mask] = tris
    return table


_TET_CASES = _tet_case_table()


def extract_mesh(volume, level=0.0, spacing=(1.0, 1.0, 1.0), origin=(0.0, 0.0, 0.0), grad_dir="ascent",
                 chunk_z=64, method="mc"):
    """Extract the ``level`` iso-surface of a scalar field.

    Args:
        volume: (Nx, Ny, Nz) numpy scalar field (e.g. sdf or -density).
        level: iso value.
        spacing: voxel size per axis.
        origin: world position of grid point (0, 0, 0).
        grad_dir: 'ascent' (inside < level, sdf-like) or 'descent'
            (inside > level, density-like) — mirrors reference conventions.
        chunk_z: process this many z-slabs at a time (memory bound).
        method: 'mc' marching cubes (reference skimage parity, default) or
            'mt' marching tetrahedra (~2x denser triangulation).

    Returns:
        verts (V, 3) float32 world coords, faces (F, 3) int64 — oriented so
        normals point from inside to outside.
    """
    volume = np.asarray(volume, dtype=np.float64)
    if grad_dir == "descent":
        volume = -volume
        level = -level
    nx, ny, nz = volume.shape
    spacing = np.asarray(spacing, dtype=np.float64)
    origin = np.asarray(origin, dtype=np.float64)

    if method == "mc":
        return _extract_mc(volume, level, spacing, origin, chunk_z)

    # native C++ fast path (same algorithm; returns grid-coord triangles)
    from ..native import marching_tets_native

    native_tris = marching_tets_native(volume, level)
    if native_tris is not None:
        if native_tris.shape[0] == 0:
            return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
        tris = native_tris.astype(np.float64) * spacing[None, None, :] + origin[None, None, :]
        return _weld_and_orient(tris, volume, spacing, origin)

    all_tris = []

    for z0 in range(0, nz - 1, chunk_z):
        z1 = min(z0 + chunk_z, nz - 1)
        # cube base indices in this slab
        bx, by, bz = np.meshgrid(
            np.arange(nx - 1), np.arange(ny - 1), np.arange(z0, z1), indexing="ij"
        )
        base = np.stack([bx, by, bz], axis=-1).reshape(-1, 3)  # (C, 3)

        # corner values (C, 8)
        cidx = base[:, None, :] + _CUBE_CORNERS[None]  # (C, 8, 3)
        vals = volume[cidx[..., 0], cidx[..., 1], cidx[..., 2]]  # (C, 8)

        # skip cubes with no crossing
        has_cross = (vals.min(1) < level) & (vals.max(1) >= level)
        if not has_cross.any():
            continue
        base, cidx, vals = base[has_cross], cidx[has_cross], vals[has_cross]
        corner_pos = cidx.astype(np.float64) * spacing + origin  # (C, 8, 3)

        for tet in _CUBE_TETS:
            tvals = vals[:, tet]  # (C, 4)
            tpos = corner_pos[:, tet]  # (C, 4, 3)
            inside = tvals < level  # (C, 4)
            case = (inside * (1 << np.arange(4))).sum(1)  # (C,)

            for mask_val, tris in _TET_CASES.items():
                if not tris:
                    continue
                sel = case == mask_val
                if not sel.any():
                    continue
                sv, sp = tvals[sel], tpos[sel]
                for tri in tris:
                    pts = []
                    for (vi, vo) in tri:
                        a, b = sv[:, vi], sv[:, vo]
                        t = (level - a) / np.where(np.abs(b - a) < 1e-12, 1e-12, b - a)
                        t = np.clip(t, 0.0, 1.0)[:, None]
                        pts.append(sp[:, vi] * (1 - t) + sp[:, vo] * t)
                    all_tris.append(np.stack(pts, axis=1))  # (S, 3, 3)

    if not all_tris:
        return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)

    tris = np.concatenate(all_tris, axis=0)  # (T, 3, 3)
    return _weld_and_orient(tris, volume, spacing, origin)


def _extract_mc(volume, level, spacing, origin, chunk_z):
    """Marching cubes with the generated case table: native C++ when the
    toolchain is present, vectorized numpy otherwise."""
    from .mc_table import EDGE_CORNERS, TRI_COUNTS, TRI_TABLE
    from ..native import marching_cubes_native

    native_tris = marching_cubes_native(volume, level, TRI_COUNTS, TRI_TABLE, EDGE_CORNERS)
    if native_tris is not None:
        if native_tris.shape[0] == 0:
            return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
        tris = native_tris.astype(np.float64) * spacing[None, None, :] + origin[None, None, :]
        return _weld_and_orient(tris, volume, spacing, origin)

    nx, ny, nz = volume.shape
    all_tris = []
    for z0 in range(0, nz - 1, chunk_z):
        z1 = min(z0 + chunk_z, nz - 1)
        bx, by, bz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), np.arange(z0, z1), indexing="ij")
        base = np.stack([bx, by, bz], axis=-1).reshape(-1, 3)
        cidx = base[:, None, :] + _CUBE_CORNERS[None]  # (C, 8, 3)
        vals = volume[cidx[..., 0], cidx[..., 1], cidx[..., 2]]  # (C, 8)
        inside = vals < level
        case = (inside * (1 << np.arange(8))).sum(1)
        active = (case > 0) & (case < 255)
        if not active.any():
            continue
        case, vals, cidx = case[active], vals[active], cidx[active]
        corner_pos = cidx.astype(np.float64) * spacing + origin  # (C, 8, 3)

        for mask_val in np.unique(case):
            n_t = int(TRI_COUNTS[mask_val])
            if n_t == 0:
                continue
            sel = case == mask_val
            sv, sp = vals[sel], corner_pos[sel]
            for t in range(n_t):
                pts = []
                for j in range(3):
                    e = int(TRI_TABLE[mask_val, t, j])
                    a, b = EDGE_CORNERS[e]
                    va, vb = sv[:, a], sv[:, b]
                    s = (level - va) / np.where(np.abs(vb - va) < 1e-12, 1e-12, vb - va)
                    s = np.clip(s, 0.0, 1.0)[:, None]
                    pts.append(sp[:, a] * (1 - s) + sp[:, b] * s)
                all_tris.append(np.stack(pts, axis=1))

    if not all_tris:
        return np.zeros((0, 3), dtype=np.float32), np.zeros((0, 3), dtype=np.int64)
    tris = np.concatenate(all_tris, axis=0)
    return _weld_and_orient(tris, volume, spacing, origin)


def _weld_and_orient(tris, volume, spacing, origin):
    """Shared postprocess: weld vertices, drop degenerates, orient faces
    against the field gradient (outward = increasing value)."""
    flat = tris.reshape(-1, 3)
    key = np.round(flat / (spacing.min() * 1e-4)).astype(np.int64)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    verts = np.zeros((uniq.shape[0], 3))
    np.add.at(verts, inv, flat)
    counts = np.bincount(inv, minlength=uniq.shape[0])[:, None]
    verts = verts / counts
    faces = inv.reshape(-1, 3)

    good = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & (faces[:, 0] != faces[:, 2])
    faces = faces[good]

    centers = verts[faces].mean(1)
    grad = _field_gradient(volume, centers, spacing, origin)
    normals = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]], verts[faces[:, 2]] - verts[faces[:, 0]])
    flip = (normals * grad).sum(1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    return verts.astype(np.float32), faces.astype(np.int64)


def _field_gradient(volume, pts, spacing, origin):
    """Central-difference gradient of the grid field at world points."""
    idx = (pts - origin) / spacing
    idx = np.clip(idx, 1, np.asarray(volume.shape) - 2).astype(np.int64)
    gx = (volume[idx[:, 0] + 1, idx[:, 1], idx[:, 2]] - volume[idx[:, 0] - 1, idx[:, 1], idx[:, 2]]) / (2 * spacing[0])
    gy = (volume[idx[:, 0], idx[:, 1] + 1, idx[:, 2]] - volume[idx[:, 0], idx[:, 1] - 1, idx[:, 2]]) / (2 * spacing[1])
    gz = (volume[idx[:, 0], idx[:, 1], idx[:, 2] + 1] - volume[idx[:, 0], idx[:, 1], idx[:, 2] - 1]) / (2 * spacing[2])
    return np.stack([gx, gy, gz], axis=-1)


def get_verts_by_faces(verts, faces):
    """(V, 3), (F, 3) -> (F, 3, 3) per-face vertex positions."""
    return verts[faces]


def get_face_centers(verts, faces):
    return verts[faces].mean(1)


def get_normals(verts, faces):
    """Per-vertex area-weighted normals + per-face normals."""
    tri = verts[faces]
    face_n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vert_n = np.zeros_like(verts)
    for i in range(3):
        np.add.at(vert_n, faces[:, i], face_n)
    face_n = face_n / (np.linalg.norm(face_n, axis=-1, keepdims=True) + 1e-12)
    vert_n = vert_n / (np.linalg.norm(vert_n, axis=-1, keepdims=True) + 1e-12)
    return vert_n, face_n


def simplify_mesh(verts, faces, max_faces=None, voxel_size=None, method="qem"):
    """Simplify to a face budget. ``method='qem'`` (default) runs the native
    quadric-error-metric edge contraction (pyfqmr-class quality, reference
    mesh.py:149); vertex clustering is the fallback and the explicit
    ``voxel_size`` mode."""
    if max_faces is not None and faces.shape[0] <= max_faces:
        return verts, faces

    if method == "qem" and max_faces is not None and voxel_size is None:
        from ..native import qem_simplify_native

        out = qem_simplify_native(verts, faces, max_faces)
        if out is not None:
            return out

    def cluster(vsize):
        key = np.floor(verts / vsize).astype(np.int64)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        new_verts = np.zeros((uniq.shape[0], 3))
        np.add.at(new_verts, inv, verts)
        counts = np.bincount(inv, minlength=uniq.shape[0])[:, None]
        new_verts /= counts
        new_faces = inv[faces]
        good = (
            (new_faces[:, 0] != new_faces[:, 1])
            & (new_faces[:, 1] != new_faces[:, 2])
            & (new_faces[:, 0] != new_faces[:, 2])
        )
        return new_verts.astype(np.float32), new_faces[good]

    if voxel_size is not None:
        return cluster(voxel_size)

    extent = float((verts.max(0) - verts.min(0)).max() + 1e-8)
    lo, hi = extent / 1024.0, extent / 2.0
    best = (verts, faces)
    for _ in range(12):
        mid = (lo * hi) ** 0.5
        v, f = cluster(mid)
        if f.shape[0] > max_faces:
            lo = mid
        else:
            best = (v, f)
            hi = mid
    return best


def save_meshes(path, verts, faces, vert_colors=None):
    """ascii PLY with optional per-vertex uchar colors."""
    v, f = verts.shape[0], faces.shape[0]
    has_color = vert_colors is not None
    if has_color:
        vert_colors = np.asarray(vert_colors)
        if vert_colors.dtype != np.uint8:
            vert_colors = (np.clip(vert_colors, 0, 1) * 255).astype(np.uint8)
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\nelement vertex {}\n".format(v))
        fh.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            fh.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fh.write("element face {}\nproperty list uchar int vertex_indices\nend_header\n".format(f))
        for i in range(v):
            row = "{:.6f} {:.6f} {:.6f}".format(*verts[i])
            if has_color:
                row += " {} {} {}".format(*vert_colors[i])
            fh.write(row + "\n")
        for i in range(f):
            fh.write("3 {} {} {}\n".format(*faces[i]))


def load_meshes(path):
    """Read ascii PLY (verts + faces [+ colors])."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    n_v = n_f = 0
    props = []
    i = 0
    while not lines[i].startswith("end_header"):
        if lines[i].startswith("element vertex"):
            n_v = int(lines[i].split()[-1])
        elif lines[i].startswith("element face"):
            n_f = int(lines[i].split()[-1])
        elif lines[i].startswith("property") and "list" not in lines[i]:
            props.append(lines[i].split()[-1])
        i += 1
    i += 1
    vdata = np.array([[float(x) for x in lines[i + j].split()] for j in range(n_v)])
    verts = vdata[:, :3].astype(np.float32)
    colors = vdata[:, 3:6].astype(np.uint8) if "red" in props else None
    faces = np.array([[int(x) for x in lines[i + n_v + j].split()[1:4]] for j in range(n_f)], dtype=np.int64)
    return verts, faces, colors
