"""Trainer layer: functional train state, jitted step, pipeline, EMA."""

from .trainer import ArcNerfTrainer  # noqa: F401
