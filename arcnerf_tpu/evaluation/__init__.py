"""Evaluation + inference layer (reference arcnerf/eval/)."""

from .eval_func import run_eval  # noqa: F401
from .infer_func import Inferencer  # noqa: F401
