"""Marching-tetrahedra mesh extraction tests: extract a sphere sdf, check
geometry quality (radius, watertight-ish area, orientation)."""

import numpy as np

from arcnerf_tpu.geometry.mesh import (
    extract_mesh,
    get_face_centers,
    get_normals,
    load_meshes,
    save_meshes,
    simplify_mesh,
)


def make_sphere_sdf(n=48, extent=1.5, radius=1.0):
    axes = [np.linspace(-extent, extent, n)] * 3
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    sdf = np.linalg.norm(grid, axis=-1) - radius
    spacing = (2 * extent / (n - 1),) * 3
    origin = (-extent, -extent, -extent)
    return sdf, spacing, origin


def test_sphere_extraction():
    sdf, spacing, origin = make_sphere_sdf()
    verts, faces = extract_mesh(sdf, 0.0, spacing, origin)
    assert verts.shape[0] > 500 and faces.shape[0] > 1000
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.02)
    assert r.std() < 0.02

    # surface area close to 4*pi
    tri = verts[faces]
    area = 0.5 * np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi, rtol=0.05)

    # normals point outward (along +r for a sphere sdf)
    _, face_n = get_normals(verts, faces)
    centers = get_face_centers(verts, faces)
    out_frac = np.mean(np.sum(face_n * centers, axis=-1) > 0)
    assert out_frac > 0.99


def test_density_convention():
    """grad_dir='descent': inside has larger value (density fields)."""
    sdf, spacing, origin = make_sphere_sdf()
    density = 10.0 * (0.5 - sdf)  # inside > 5, outside < 5
    verts, faces = extract_mesh(density, 5.0, spacing, origin, grad_dir="descent")
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)
    # orientation still outward
    _, face_n = get_normals(verts, faces)
    centers = get_face_centers(verts, faces)
    assert np.mean(np.sum(face_n * centers, axis=-1) > 0) > 0.99


def test_simplify():
    sdf, spacing, origin = make_sphere_sdf()
    verts, faces = extract_mesh(sdf, 0.0, spacing, origin)
    v2, f2 = simplify_mesh(verts, faces, max_faces=faces.shape[0] // 4)
    assert f2.shape[0] <= faces.shape[0] // 4
    r = np.linalg.norm(v2, axis=-1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)


def test_ply_roundtrip(tmp_path):
    sdf, spacing, origin = make_sphere_sdf(n=24)
    verts, faces = extract_mesh(sdf, 0.0, spacing, origin)
    colors = np.random.default_rng(0).random((verts.shape[0], 3)).astype(np.float32)
    path = str(tmp_path / "m.ply")
    save_meshes(path, verts, faces, colors)
    v, f, c = load_meshes(path)
    assert v.shape == verts.shape and f.shape == faces.shape and c.shape == colors.shape
    np.testing.assert_allclose(v, verts, atol=1e-4)
    np.testing.assert_array_equal(f, faces)


def test_native_extractor_parity():
    """C++ marching tets vs python path: same surface, same face count;
    native mesh must be a closed manifold (V = F/2 + 2)."""
    import arcnerf_tpu.native as nat

    if not nat.native_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    sdf, spacing, origin = make_sphere_sdf(n=40)
    v_nat, f_nat = extract_mesh(sdf, 0.0, spacing, origin)

    lib, tried = nat._LIB, nat._TRIED
    nat._LIB, nat._TRIED = None, True  # force python path
    try:
        v_py, f_py = extract_mesh(sdf, 0.0, spacing, origin)
    finally:
        nat._LIB, nat._TRIED = lib, tried

    assert f_nat.shape[0] == f_py.shape[0]
    r_nat = np.linalg.norm(v_nat, axis=-1)
    r_py = np.linalg.norm(v_py, axis=-1)
    np.testing.assert_allclose(r_nat.mean(), r_py.mean(), atol=1e-3)
    # Euler characteristic of a closed manifold triangulation
    assert v_nat.shape[0] == f_nat.shape[0] // 2 + 2


def test_marching_cubes_extraction():
    """MC (generated case table) on the analytic sphere: accurate, watertight,
    outward-oriented, ~1/3 the triangles of marching tets; native and numpy
    paths agree on the face count."""
    sdf, spacing, origin = make_sphere_sdf(n=40)
    v_mc, f_mc = extract_mesh(sdf, 0.0, spacing, origin, method="mc")
    v_mt, f_mt = extract_mesh(sdf, 0.0, spacing, origin, method="mt")
    assert f_mc.shape[0] < 0.5 * f_mt.shape[0]  # marching-cubes density

    r = np.linalg.norm(v_mc, axis=-1)
    np.testing.assert_allclose(r.mean(), 1.0, atol=0.01)

    # watertight: every edge shared by exactly two faces
    e = np.sort(np.concatenate([f_mc[:, [0, 1]], f_mc[:, [1, 2]], f_mc[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert set(np.unique(counts)) == {2}

    # outward orientation
    tri = v_mc[f_mc]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert ((nrm * tri.mean(1)).sum(1) > 0).all()

    # numpy fallback produces the same triangulation
    import arcnerf_tpu.native as nat

    if nat.native_available():
        lib, tried = nat._LIB, nat._TRIED
        nat._LIB, nat._TRIED = None, True
        try:
            v_py, f_py = extract_mesh(sdf, 0.0, spacing, origin, method="mc")
        finally:
            nat._LIB, nat._TRIED = lib, tried
        assert f_py.shape[0] == f_mc.shape[0]
        np.testing.assert_allclose(np.linalg.norm(v_py, axis=-1).mean(), r.mean(), atol=1e-3)


def test_qem_simplify():
    """QEM edge contraction hits the exact face budget with error no worse
    than 2x vertex clustering (VERDICT r1 item 7 acceptance)."""
    import arcnerf_tpu.native as nat

    if not nat.native_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    sdf, spacing, origin = make_sphere_sdf(n=48)
    verts, faces = extract_mesh(sdf, 0.0, spacing, origin, method="mc")

    target = 500
    v_q, f_q = simplify_mesh(verts, faces, max_faces=target)
    assert f_q.shape[0] <= target
    assert f_q.shape[0] > 0.8 * target  # contracts TO the budget, not past it
    err_q = np.abs(np.linalg.norm(v_q, axis=-1) - 1.0).max()

    v_c, f_c = simplify_mesh(verts, faces, max_faces=target, method="cluster")
    err_c = np.abs(np.linalg.norm(v_c, axis=-1) - 1.0).max()
    assert err_q <= 2.0 * err_c + 1e-3, (err_q, err_c)

    # faces remain valid triangles over the compacted vertex set
    assert f_q.min() >= 0 and f_q.max() < v_q.shape[0]
    assert (f_q[:, 0] != f_q[:, 1]).all() and (f_q[:, 1] != f_q[:, 2]).all()
