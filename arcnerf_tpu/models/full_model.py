"""FullModel: foreground + optional background composition.

Capability parity with /root/reference/arcnerf/models/full_model.py
(forward:415-457, prepare_flatten_inputs:350-401, blend_bkg_rgb:310-330,
blend_bkg_sigma:220-276, blend_two_stage_*:142-308, clean/detach progress
:95-140, surface_render:477-524, optimize:526-531).

TPU notes: the model itself is fully jittable on a flat (B*N,) ray batch;
memory chunking happens in the caller (trainer/eval render loop) rather
than inside forward, keeping one static graph. Sigma-blend mutations use
jnp.where.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.cfgs import get_value_from_cfgs_field


class FullModel(nn.Module):

    cfgs: Any = None
    fg_model: Any = None
    bkg_model: Any = None

    @property
    def has_bkg(self):
        return self.bkg_model is not None

    @property
    def bkg_blend(self):
        if not self.has_bkg:
            return None
        return get_value_from_cfgs_field(self.cfgs.model.background, "bkg_blend", "rgb")

    @property
    def fg_only(self):
        if not self.has_bkg:
            return False
        return get_value_from_cfgs_field(self.cfgs.model.background, "fg_only", False)

    def sigma_reverse(self):
        return self.fg_model.sigma_reverse()

    def get_chunk_rays(self):
        return get_value_from_cfgs_field(self.cfgs.model, "chunk_rays", 32768)

    def get_chunk_pts(self):
        return get_value_from_cfgs_field(self.cfgs.model, "chunk_pts", 1 << 20)

    # ------------------------------------------------------- progress utils
    @staticmethod
    def clean_two_stage_progress(output):
        """Keep a single set of progress_* keys (prefer fine)."""
        progress_keys = [k for k in output if k.startswith("progress_")]
        if not progress_keys:
            return output
        if any(not k.endswith("_coarse") and not k.endswith("_fine") for k in progress_keys):
            for k in [k for k in progress_keys if k.endswith("_coarse") or k.endswith("_fine")]:
                output.pop(k)
        elif any(k.endswith("_fine") for k in progress_keys):
            for k in [k for k in progress_keys if k.endswith("_coarse")]:
                output.pop(k)
            for k in [k for k in progress_keys if k.endswith("_fine")]:
                output[k[: -len("_fine")]] = output.pop(k)
        else:
            for k in [k for k in progress_keys if k.endswith("_coarse")]:
                output[k[: -len("_coarse")]] = output.pop(k)
        return output

    @staticmethod
    def clean_progress(output):
        for k in [k for k in output if k.startswith("progress_")]:
            output.pop(k)
        return output

    @staticmethod
    def detach_progress(output):
        for k in output:
            if k.startswith("progress_") and isinstance(output[k], jnp.ndarray):
                output[k] = jax.lax.stop_gradient(output[k])
        return output

    # -------------------------------------------------------------- blending
    def blend_bkg_rgb(self, fg_output, bkg_output):
        """rgb blend: out = fg_rgb + T_fg(last) * bkg_rgb; depth likewise;
        mask stays foreground-only."""
        two_stage = any(k.endswith("_coarse") or k.endswith("_fine") for k in fg_output)

        def bkg_val(name, stage):
            if "{}_fine".format(name) in bkg_output:
                return bkg_output["{}_fine".format(name)]
            if "{}_coarse".format(name) in bkg_output:
                return bkg_output["{}_coarse".format(name)]
            return bkg_output[name]

        if two_stage:
            lamb = fg_output["progress_trans_shift_coarse"][:, -1]
            fg_output["rgb_coarse"] = fg_output["rgb_coarse"] + lamb[:, None] * bkg_val("rgb", "coarse")
            fg_output["depth_coarse"] = fg_output["depth_coarse"] + lamb * bkg_val("depth", "coarse")
            if "rgb_fine" in fg_output:
                lamb_f = fg_output["progress_trans_shift_fine"][:, -1]
                fg_output["rgb_fine"] = fg_output["rgb_fine"] + lamb_f[:, None] * bkg_val("rgb", "fine")
                fg_output["depth_fine"] = fg_output["depth_fine"] + lamb_f * bkg_val("depth", "fine")
            return self.clean_two_stage_progress(fg_output)

        lamb = fg_output["progress_trans_shift"][:, -1]
        fg_output["rgb"] = fg_output["rgb"] + lamb[:, None] * bkg_val("rgb", None)
        fg_output["depth"] = fg_output["depth"] + lamb * bkg_val("depth", None)
        return fg_output

    def blend_bkg_sigma(self, fg_output, bkg_output, inference_only=False, get_progress=False,
                        bkg_color=None):
        """sigma blend: concat fg/bkg (sigma, radiance, zvals) and re-run
        ray marching jointly. Invalid fg samples (beyond first bkg zval) are
        zeroed with jnp.where. ``bkg_color`` (a fed per-ray background,
        random-bkg training protocol) must composite HERE — the fg model's
        own composited marching output is discarded by the joint re-march
        (r2: multivol under random-bkg learned mean-gray because the fed
        color never reached the joint march)."""
        fg_two_stage = any(k.endswith("_coarse") or k.endswith("_fine") for k in fg_output)

        def pick(output, name, stage_key):
            for suffix in ([stage_key] if stage_key else []) + ["_fine", "_coarse", ""]:
                k = "progress_{}{}".format(name, suffix)
                if k in output:
                    return output[k]
            raise KeyError(name)

        def run_blend(fg_key, out_key_suffix):
            zvals_fg = pick(fg_output, "zvals", fg_key)
            sigma_fg = pick(fg_output, "sigma", fg_key)
            radiance_fg = pick(fg_output, "radiance", fg_key)
            zvals_bkg = pick(bkg_output, "zvals", None)
            sigma_bkg = pick(bkg_output, "sigma", None)
            radiance_bkg = pick(bkg_output, "radiance", None)

            invalid = (zvals_fg[:, -1] > zvals_bkg[:, 0])[:, None]
            sigma_fg = jnp.where(invalid, 0.0, sigma_fg)
            zvals_fg = jnp.where(invalid, 0.0, zvals_fg)
            radiance_fg = jnp.where(invalid[..., None], 0.0, radiance_fg)

            sigma_all = jnp.concatenate([sigma_fg, sigma_bkg], 1)
            radiance_all = jnp.concatenate([radiance_fg, radiance_bkg], 1)
            zvals_all = jnp.concatenate([zvals_fg, zvals_bkg], 1)

            # the reference forces fg add_inf_z=True in sigma mode
            # (full_model.py:36): the joint march ends with an inf tail so
            # the last background shell still contributes
            out_all = self.fg_model.ray_marching_wrap(
                sigma_all, radiance_all, zvals_all, add_inf_z=True, inference_only=inference_only,
                bkg_color=bkg_color,
            )
            out_all = self.fg_model.output_get_progress(out_all, get_progress, sigma_fg.shape[1])

            final = {}
            for k, v in out_all.items():
                kk = k + out_key_suffix
                if k == "mask" and kk in fg_output:
                    final[kk] = fg_output[kk]
                else:
                    final[kk] = v
            return final

        if fg_two_stage:
            blend = run_blend("_coarse", "_coarse")
            if "progress_sigma_fine" in fg_output:
                blend.update(run_blend("_fine", "_fine"))
            return self.clean_two_stage_progress(blend)
        return run_blend(None, "")

    def blend_output(self, fg_output, bkg_output=None, inference_only=False, get_progress=False,
                     bkg_color=None):
        if bkg_output is None:
            final = self.clean_two_stage_progress(fg_output)
        elif self.bkg_blend == "rgb":
            final = self.blend_bkg_rgb(fg_output, bkg_output)
        elif self.bkg_blend == "sigma":
            final = self.blend_bkg_sigma(fg_output, bkg_output, inference_only, get_progress, bkg_color)
        else:
            raise NotImplementedError("invalid bkg_blend {}".format(self.bkg_blend))
        if not get_progress:
            final = self.clean_progress(final)
        return final

    # --------------------------------------------------------------- forward
    @staticmethod
    def prepare_flatten_inputs(inputs):
        """(B, N, ...) -> (BN, ...) for every ray tensor."""
        flat = {}
        batch_size, n_rays = inputs["rays_o"].shape[:2]
        for k, v in inputs.items():
            if v is None:
                continue
            if isinstance(v, jnp.ndarray) and v.ndim >= 2 and v.shape[:2] == (batch_size, n_rays):
                flat[k] = v.reshape((batch_size * n_rays,) + v.shape[2:])
            else:
                flat[k] = v
        return flat, batch_size, n_rays

    @staticmethod
    def reshape_output(output, batch_size, n_rays):
        for k, v in output.items():
            if isinstance(v, jnp.ndarray) and v.ndim >= 1 and v.shape[0] == batch_size * n_rays:
                output[k] = v.reshape((batch_size, n_rays) + v.shape[1:])
        return output

    def __call__(self, inputs, inference_only=False, get_progress=False, cur_epoch=0, total_epoch=300000,
                 bound_state=None):
        flat_inputs, batch_size, n_rays = self.prepare_flatten_inputs(inputs)

        bound_state = bound_state or {}
        # under rgb blend the BKG MODEL is the background: a per-ray
        # bkg_color input must not ALSO be composited by the fg marching
        # (T*color + T*bkg_rgb double-counts; caught by the synthetic_nerfpp
        # golden run — eval rgb reached 1.49)
        if self.has_bkg and not self.fg_only and self.bkg_blend == "rgb":
            flat_inputs.pop("bkg_color", None)
        # sigma-blend needs all fg samples kept for joint re-marching
        get_progress_fg = True if self.has_bkg else get_progress
        fg_output = self.fg_model(
            flat_inputs, inference_only, get_progress_fg, cur_epoch, total_epoch,
            bound_state=bound_state.get("fg", bound_state),
        )

        bkg_output = None
        if self.has_bkg and not self.fg_only:
            bkg_output = self.bkg_model(
                flat_inputs, inference_only, True, cur_epoch, total_epoch,
                bound_state=bound_state.get("bkg", {}),
            )

        output = self.blend_output(fg_output, bkg_output, inference_only, get_progress,
                                   bkg_color=flat_inputs.get("bkg_color", None))
        output = self.detach_progress(output)
        return self.reshape_output(output, batch_size, n_rays)

    def surface_render(
        self, inputs, bound_state=None, method="sphere_tracing", n_step=128, n_iter=100, threshold=0.01,
        level=0.0, grad_dir="ascent"
    ):
        flat_inputs, batch_size, n_rays = self.prepare_flatten_inputs(inputs)
        bound_state = bound_state or {}
        output = self.fg_model.surface_render(
            flat_inputs, bound_state.get("fg", bound_state), method, n_step, n_iter, threshold, level, grad_dir
        )
        return self.reshape_output(output, batch_size, n_rays)

    # --------------------------------------------------------- direct queries
    def forward_pts_dir(self, pts, view_dir=None):
        return self.fg_model.forward_pts_dir(pts, view_dir)

    def forward_pts(self, pts):
        return self.fg_model.forward_pts(pts)

    def get_est_opacity(self, dt, pts):
        return self.fg_model.get_est_opacity(dt, pts)

    # ------------------------------------------------------------- obj bound
    def init_bound_state(self):
        state = {"fg": self.fg_model.init_bound_state() if hasattr(self.fg_model, "init_bound_state") else {}}
        if self.has_bkg and hasattr(self.bkg_model, "init_bound_state"):
            state["bkg"] = self.bkg_model.init_bound_state()
        return state
