"""COLMAP subprocess driver.

Capability parity with /root/reference/arcnerf/colmap/colmap_wrapper.py:7
(run_colmap: feature_extractor -> matcher -> mapper; run_colmap_dense:
image_undistorter -> patch_match_stereo -> stereo_fusion -> meshers).
Degrades with a clear error when the colmap binary is absent.
"""

import os
import shutil
import subprocess


def colmap_available():
    return shutil.which("colmap") is not None


def _run(args, log_path=None):
    if not colmap_available():
        raise RuntimeError("colmap binary not found on PATH — install COLMAP to run pose estimation")
    if log_path:
        with open(log_path, "a") as logf:
            subprocess.run(args, check=True, stdout=logf, stderr=subprocess.STDOUT)
    else:
        subprocess.run(args, check=True)


def run_colmap(scene_dir, match_type="sequential_matcher", use_gpu=False, log=True):
    """Sparse reconstruction: images/ -> sparse/0 model + database.db."""
    assert match_type in ("sequential_matcher", "exhaustive_matcher")
    img_dir = os.path.join(scene_dir, "images")
    db_path = os.path.join(scene_dir, "database.db")
    sparse_dir = os.path.join(scene_dir, "sparse")
    os.makedirs(sparse_dir, exist_ok=True)
    log_path = os.path.join(scene_dir, "colmap_output.txt") if log else None

    _run(
        [
            "colmap", "feature_extractor",
            "--database_path", db_path,
            "--image_path", img_dir,
            "--ImageReader.single_camera", "1",
            "--SiftExtraction.use_gpu", "1" if use_gpu else "0",
        ],
        log_path,
    )
    _run(
        [
            "colmap", match_type,
            "--database_path", db_path,
            "--SiftMatching.use_gpu", "1" if use_gpu else "0",
        ],
        log_path,
    )
    _run(
        [
            "colmap", "mapper",
            "--database_path", db_path,
            "--image_path", img_dir,
            "--output_path", sparse_dir,
        ],
        log_path,
    )
    return os.path.join(sparse_dir, "0")


def run_colmap_dense(scene_dir, log=True):
    """Dense reconstruction: undistort -> stereo -> fusion -> poisson mesh."""
    img_dir = os.path.join(scene_dir, "images")
    sparse_model = os.path.join(scene_dir, "sparse", "0")
    dense_dir = os.path.join(scene_dir, "dense")
    os.makedirs(dense_dir, exist_ok=True)
    log_path = os.path.join(scene_dir, "colmap_output.txt") if log else None

    _run(["colmap", "image_undistorter", "--image_path", img_dir, "--input_path", sparse_model,
          "--output_path", dense_dir, "--output_type", "COLMAP"], log_path)
    _run(["colmap", "patch_match_stereo", "--workspace_path", dense_dir], log_path)
    _run(["colmap", "stereo_fusion", "--workspace_path", dense_dir,
          "--output_path", os.path.join(dense_dir, "fused.ply")], log_path)
    _run(["colmap", "poisson_mesher", "--input_path", os.path.join(dense_dir, "fused.ply"),
          "--output_path", os.path.join(dense_dir, "meshed-poisson.ply")], log_path)
    return dense_dir
