"""Trainer with the interactive viewer attached.

Capability parity with /root/reference/arcnerf/trainer/
arcnerf_trainer_with_nsviewer.py:16-99 + ns_viewer/server/viewer_utils.py
(init_scene:280 dataset cameras/thumbnails, update_scene:357 per-step
progress, training pause/resume control): the viewer runs alongside
training, renders with the CURRENT parameters whenever the browser asks,
overlays the dataset cameras, and can pause/resume the train loop.
"""

from ..utils.cfgs import get_value_from_cfgs_field, valid_key_in_cfgs
from ..viewer import ViewerState, run_viewer
from ..viewer.server import TrainControl, build_scene_graph
from .trainer import ArcNerfTrainer


class ArcNerfViewerTrainer(ArcNerfTrainer):

    def __init__(self, cfgs):
        super().__init__(cfgs)
        port = int(get_value_from_cfgs_field(cfgs, "viewer_port", 7007))
        src = self.data.get("val") or self.data["train"]
        bounds = self._scene_bounds()
        self.viewer_control = TrainControl()
        import os

        # one render cfg serves both tiers (no re-jit between them): the
        # per-ray cap is the moving-tier approximation AND the window
        # length of the settle tier (window mode engages only when
        # cap_offset is fed, so the plain fast render stays plain-cap)
        self._viewer_cap = 8
        self._viewer_eps = 1e-3
        if valid_key_in_cfgs(cfgs.model, "obj_bound"):
            self.set_render_cap(self._viewer_cap, window=True)

        self.viewer_state = ViewerState(
            self._viewer_render_fn, src.get_intrinsic(), (src.W, src.H),
            train_state_info={"step": 0},
            scene_graph=build_scene_graph(src, bounds=bounds),
            control=self.viewer_control,
            render_image_fn=self._viewer_render_image,
            render_tier_fns={
                "fast": self._viewer_render_image,
                "exact": self._viewer_render_exact,
            },
            tier_quality={
                "fast": {"kind": "first-{} samples/ray approximation".format(self._viewer_cap)},
                "exact": {"kind": "transmittance-continuation",
                          "eps": self._viewer_eps,
                          "note": "per-pixel error bounded by eps"},
            },
            save_dir=self.expr_dir,
            export_info={
                "configs": os.path.join(self.expr_dir, "cfgs.yaml"),
                "checkpoint": os.path.join(self.ckpt_dir, "latest.ckpt"),
            },
        )
        run_viewer(self.viewer_state, port, in_thread=True)

    def _scene_bounds(self):
        """Bounding sphere/volume description for the client overlay."""
        model = self.cfgs.model
        bounds = {}
        if valid_key_in_cfgs(model, "obj_bound"):
            ob = model.obj_bound
            if valid_key_in_cfgs(ob, "volume"):
                bounds["volume_side"] = float(get_value_from_cfgs_field(ob.volume, "side", 2.0) or 2.0)
            if valid_key_in_cfgs(ob, "sphere"):
                bounds["sphere_radius"] = float(get_value_from_cfgs_field(ob.sphere, "radius", 1.5))
        r = get_value_from_cfgs_field(model.rays, "bounding_radius", None) if valid_key_in_cfgs(model, "rays") \
            else None
        if r is not None and "sphere_radius" not in bounds:
            bounds["sphere_radius"] = float(r)
        return bounds

    def _viewer_render_fn(self, feed):
        # always render with the live params
        return self._render_chunk(self.state["params"], self.state["bound_state"], feed)

    def _viewer_render_image(self, sample):
        """Whole-frame viewer render through the fused occupancy-compacted
        fast path (one device dispatch per frame). The viewer's resolution
        ladder keeps shapes static, so each ladder step compiles once."""
        n = sample["rays_o"].shape[0]
        chunk = min(8192, max(self.mesh.devices.size, n))
        imgs, _ = self.render_image_fast(sample, chunk_rays=chunk, hit_frac=0.6)
        return imgs

    def _viewer_render_exact(self, sample):
        """Settle tier: transmittance-continuation render — exact up to the
        eps transmittance cutoff (render_image_windowed), same cfg (cap =
        window length) as the moving tier so no retrace on tier switch."""
        try:
            n_sample = int(self.model.fg_model.get_ray_cfgs("n_sample"))
        except Exception:
            n_sample = 128
        n_pass = max(1, -(-n_sample // self._viewer_cap))
        n = sample["rays_o"].shape[0]
        chunk = min(8192, max(self.mesh.devices.size, n))
        imgs, _ = self.render_image_windowed(
            sample, n_pass=n_pass, alive_frac=0.5, chunk_rays=chunk,
            hit_frac=0.6, eps=self._viewer_eps)
        return imgs

    def epoch_hook(self, epoch, stats):
        """Per-stride: publish progress to the viewer and honour pause
        (reference update_scene:357 + training-control)."""
        info = self.viewer_state.train_state_info
        info["step"] = int(epoch)
        try:
            info["loss"] = round(float(stats.get("loss", 0.0)), 5)
            info["psnr"] = round(float(stats.get("psnr", 0.0)), 2)
        except Exception:
            pass
        self.viewer_control.wait_if_paused()

    def train(self):
        orig = self.viewer_state.train_state_info
        try:
            return super().train()
        finally:
            orig["step"] = int(self.state["step"])
