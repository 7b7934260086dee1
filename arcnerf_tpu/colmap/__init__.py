"""COLMAP pose-estimation tooling (reference arcnerf/colmap/)."""

from .colmap_func import estimate_poses  # noqa: F401
from .colmap_wrapper import run_colmap  # noqa: F401
