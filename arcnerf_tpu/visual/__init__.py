"""Visualization layer (reference arcnerf/visual/ + common/visual/)."""

from .render_img import render_progress_imgs, write_progress_imgs  # noqa: F401
from .plot_2d import draw_2d_components  # noqa: F401
from .plot_3d import draw_3d_components  # noqa: F401
