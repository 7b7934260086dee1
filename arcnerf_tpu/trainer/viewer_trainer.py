"""Trainer with the interactive viewer attached.

Capability parity with /root/reference/arcnerf/trainer/
arcnerf_trainer_with_nsviewer.py:16-99: the viewer runs alongside training
and renders with the CURRENT parameters whenever the browser asks.
"""

from ..utils.cfgs import get_value_from_cfgs_field
from ..viewer import ViewerState, run_viewer
from .trainer import ArcNerfTrainer


class ArcNerfViewerTrainer(ArcNerfTrainer):

    def __init__(self, cfgs):
        super().__init__(cfgs)
        port = int(get_value_from_cfgs_field(cfgs, "viewer_port", 7007))
        src = self.data.get("val") or self.data["train"]
        self.viewer_state = ViewerState(
            self._viewer_render_fn, src.get_intrinsic(), (src.W, src.H),
            train_state_info={"step": 0},
        )
        run_viewer(self.viewer_state, port, in_thread=True)

    def _viewer_render_fn(self, feed):
        # always render with the live params
        return self._render_chunk(self.state["params"], self.state["bound_state"], feed)

    def train(self):
        # refresh the step counter the viewer reports
        orig = self.viewer_state.train_state_info
        try:
            return super().train()
        finally:
            orig["step"] = int(self.state["step"])
