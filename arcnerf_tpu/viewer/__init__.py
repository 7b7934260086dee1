"""Interactive web viewer (reference ns_viewer/, nerfstudio-derived).

A tornado websocket bridge streams rendered frames to a self-contained
HTML/JS orbit client — no JS build step, no zmq relay: the browser sends
camera poses, the server renders through the jitted model at adaptive
resolution and replies with JPEG frames.
"""

from .server import ViewerState, run_viewer  # noqa: F401
