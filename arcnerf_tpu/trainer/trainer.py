"""ArcNerfTrainer: the NeRF training loop, TPU-native.

Capability parity with /root/reference/common/trainer/basic_trainer.py:22 +
/root/reference/arcnerf/trainer/arcnerf_trainer.py:31:
- dirs/logger/monitor/seed setup, config backup + job.sh replication,
- concat ALL rays of ALL train images once (concat_train_batch:188) into
  device arrays; Pipeline schedules per-step ray batches (precrop,
  full/random, dynamic batch size, random bkg color),
- one optimizer step per "epoch" (arcnerf_trainer.py:496 convention),
- obj-bound occupancy optimize every epoch_optim steps
  (model.optimize path, full_model.py:526),
- EMA, grad clipping, lr schedule, periodic valid/eval/checkpoint,
  KeyboardInterrupt latest-save, time-based latest-save, resume.

TPU-first architecture: TrainState is a pure pytree {params, opt_state,
bound_state, ema, step}; train_step is one jitted function; the ray batch
is sharded over a 1-axis device mesh ('data') so XLA all-reduces gradients
over ICI; occupancy updates are separate jitted pure functions called on
the epoch_optim cadence; evaluation renders images through a jitted chunk
renderer.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..datasets import get_dataset, get_model_feed_in
from ..datasets.transforms import get_transforms
from ..losses import build_loss
from ..metrics import AverageDictCounter, build_metric, psnr
from ..models import build_model
from ..parallel.mesh import (
    get_mesh, get_mesh_2d, init_distributed, shard_batch, shard_batch_in_jit, shard_params,
    shard_stacked_batch,
)
from ..utils.cfgs import dump_configs, get_value_from_cfgs_field, valid_key_in_cfgs
from ..utils.logger import Logger, Monitor, is_master
from ..utils.model_io import load_model, save_model
from .ema import ema_init, ema_update
from .optimizer import build_optimizer
from .pipeline import Pipeline


def _bilinear_upsample(img, h, w, off, scale):
    """Upsample a (hs, ws, ...) subgrid — full-res pixel (off + i*scale)
    maps to subgrid pixel i — back to (h, w, ...), bilinear, edge-clamped.
    Host-side numpy: frames are already on the host for compositing, and
    the interp is ~ms at 800x800."""
    img = np.asarray(img)
    hs, ws = img.shape[:2]
    ys = (np.arange(h, dtype=np.float64) - off) / scale
    xs = (np.arange(w, dtype=np.float64) - off) / scale
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, hs - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, ws - 1)
    y1 = np.minimum(y0 + 1, hs - 1)
    x1 = np.minimum(x0 + 1, ws - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    extra = img.ndim - 2
    wy = wy.reshape(wy.shape + (1,) * extra)
    wx = wx.reshape(wx.shape + (1,) * extra)
    top = img[y0][:, x0] * (1.0 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1.0 - wx) + img[y1][:, x1] * wx
    return (top * (1.0 - wy) + bot * wy).astype(img.dtype)


class ArcNerfTrainer:

    def __init__(self, cfgs):
        self.cfgs = cfgs
        init_distributed(cfgs)

        # dirs + logging
        expr_dir = get_value_from_cfgs_field(cfgs.dir, "expr_dir", None) if hasattr(cfgs, "dir") else None
        name = get_value_from_cfgs_field(cfgs, "name", "expr")
        self.expr_dir = expr_dir or os.path.join("experiments", name)
        self.ckpt_dir = os.path.join(self.expr_dir, "checkpoints")
        self.progress_dir = os.path.join(self.expr_dir, "progress")
        if is_master():
            os.makedirs(self.ckpt_dir, exist_ok=True)
            os.makedirs(self.progress_dir, exist_ok=True)
            dump_configs(cfgs, os.path.join(self.expr_dir, "cfgs.yaml"))
        self.logger = Logger(os.path.join(self.expr_dir, "train.log"))
        self.monitor = Monitor(os.path.join(self.expr_dir, "tb"))

        seed = get_value_from_cfgs_field(cfgs.dist, "random_seed", None) if hasattr(cfgs, "dist") else None
        self.seed = int(seed) if seed is not None else 0
        # rbg PRNG: ~4x cheaper than the default threefry on TPU for the
        # per-step perturb/noise draws (284 -> 69 ms for a (32k, 128)
        # uniform, scripts/probe_hotpath2.py); sampling jitter needs no
        # cryptographic stream. Override with dist.rng_impl: threefry.
        rng_impl = get_value_from_cfgs_field(cfgs.dist, "rng_impl", "rbg") if hasattr(cfgs, "dist") else "rbg"
        jax.config.update("jax_default_prng_impl", str(rng_impl))
        self.key = jax.random.PRNGKey(self.seed)

        # mesh: data-parallel over all local devices; optional tensor-parallel
        # minor axis (dist.model_parallel > 1) shards the hashgrid table +
        # its adam moments level-wise across model-group devices (ZeRO-style
        # memory scale-out for hashmap_size >= 22, see parallel.mesh.param_shardings)
        mp = int(get_value_from_cfgs_field(cfgs.dist, "model_parallel", 1)) if hasattr(cfgs, "dist") else 1
        if mp > 1:
            self.mesh = get_mesh_2d(mp)
            self.logger.add_log(
                "Mesh: {} devices as (data={}, model={})".format(
                    self.mesh.devices.size, self.mesh.devices.shape[0], mp))
        else:
            self.mesh = get_mesh()
            self.logger.add_log("Mesh: {} devices on axis 'data'".format(self.mesh.devices.size))
        # keep ray batches divisible by the mesh so they always shard
        # (non-divisible batches would silently replicate)
        n_rays_cfg = int(get_value_from_cfgs_field(cfgs, "n_rays", 4096))
        size = self.mesh.devices.size
        if n_rays_cfg % size:
            cfgs.n_rays = ((n_rays_cfg + size - 1) // size) * size
            self.logger.add_log("n_rays {} -> {} (rounded up to mesh multiple)".format(n_rays_cfg, cfgs.n_rays))

        # model/loss/metric
        self.model = build_model(cfgs, self.logger)
        # compatibility markers saved with every checkpoint and asserted on
        # load: the hashgrid hash layout (quad/pair/ngp) decides how table
        # entries are addressed — loading across variants is silent noise
        from ..models.base_modules.encoding import hash_variant_from_cfgs

        self._ckpt_meta = {}
        hv = hash_variant_from_cfgs(cfgs.model)
        if hv is not None:
            self._ckpt_meta["hash_variant"] = hv
        self.loss_factory = build_loss(cfgs, self.logger)
        self.metric_factory = build_metric(cfgs, self.logger) if valid_key_in_cfgs(cfgs, "metric") else None

        # data
        self.data = self.prepare_data()

        # training params
        self.total_epoch = int(get_value_from_cfgs_field(cfgs.progress, "epoch", 100000))
        self.n_rays = int(get_value_from_cfgs_field(cfgs, "n_rays", 4096))

        # state init
        self.tx, self.lr_schedule = build_optimizer(cfgs.optim)
        self.ema_decay = get_value_from_cfgs_field(cfgs.optim, "ema_decay", None)
        self.state = self.init_state()
        self.start_epoch = 0

        # SIREN sphere pretraining (model.init_setting parity,
        # basic_trainer.py:60-63 + linear_network_module.py:200)
        geo_cfg = get_value_from_cfgs_field(cfgs.model, "geometry", None)
        if get_value_from_cfgs_field(geo_cfg, "use_siren", False) and get_value_from_cfgs_field(
            geo_cfg, "geometric_init", False
        ):
            from .pretrain import pretrain_siren_sphere

            self.logger.add_log("pretraining SIREN geo net to sphere sdf")
            new_vars = pretrain_siren_sphere(
                self.model,
                {"params": self.state["params"]},
                radius_init=get_value_from_cfgs_field(geo_cfg, "radius_init", 1.0),
                logger=self.logger,
            )
            self.state["params"] = new_vars["params"]

        # resume
        resume = get_value_from_cfgs_field(cfgs, "resume", None)
        if resume and resume != "None" and os.path.exists(str(resume)):
            start_cfg = int(get_value_from_cfgs_field(cfgs.progress, "start_epoch", -1))
            self.state, step = load_model(str(resume), self.state, restore_optimizer=start_cfg < 0,
                                          logger=self.logger, expected_meta=self._ckpt_meta)
            self.start_epoch = step if start_cfg < 0 else 0

        # occupancy optimize cadence
        fg_bound = self.model.fg_model.get_obj_bound()
        self.epoch_optim = fg_bound.get_optim_cfgs("epoch_optim")
        self.epoch_optim_warmup = fg_bound.get_optim_cfgs("epoch_optim_warmup")
        self.n_coarse = None
        try:
            self.n_coarse = self.model.fg_model.get_n_coarse_sample()
        except Exception:
            self.n_coarse = 128
        self.log_max_allowance = self.model.fg_model.get_render_cfgs("max_allowance")
        if self.log_max_allowance and self.log_max_allowance > 0:
            import math

            self.log_max_allowance = int(math.log2(self.log_max_allowance))
        else:
            self.log_max_allowance = None  # no point budget (-1) -> disable
        self._warned_budget_overflow = False

        # fold the occupancy update into the jitted train step (one dispatch
        # per step); scan_steps > 1 additionally runs whole strides of steps
        # on-device under lax.scan (one dispatch per stride)
        self._fold_optimize = bool(self.epoch_optim) and bool(
            jax.tree_util.tree_leaves(self.state["bound_state"])
        )
        self.scan_steps = max(1, int(get_value_from_cfgs_field(cfgs.progress, "scan_steps", 1)))

        # on-device ray sampling: keep the WHOLE train-ray pool resident on
        # the chip and sample each step's batch inside the jitted step. The
        # host-fed path pays per-stride numpy batch assembly + a ~20 MB
        # host->device transfer; on the tunneled bench TPU that was ~700
        # ms/step of the 1082 ms bench step (device compute: 362 ms).
        # Covers mode=random (+precrop, +bkg_color) — every shipped recipe;
        # mode=full keeps the host permutation-walk path. Disable with
        # --progress.device_sampling 0. (Reference samples from a
        # pre-concatenated GPU-resident tensor too: pipeline.py:131.)
        self._device_pool = None
        self._precrop_idx_dev = None
        use_dev_sampling = bool(get_value_from_cfgs_field(cfgs.progress, "device_sampling", True))
        if use_dev_sampling and self.pipeline.data is not None and self.pipeline.sample_mode == "random":
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(self.mesh, PartitionSpec())
            self._device_pool = {
                k: jax.device_put(v, repl) for k, v in self.pipeline.data.items()
            }
            if self.pipeline.precrop_idx is not None:
                self._precrop_idx_dev = jax.device_put(
                    np.asarray(self.pipeline.precrop_idx, dtype=np.int32), repl)
            self.logger.add_log(
                "On-device ray sampling: pool of {} rays resident on the mesh".format(
                    self.pipeline.n_total_rays))

        # jitted functions (per-batch-shape cache handled by jax)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._scan_steps_fn = jax.jit(self._scan_steps_impl, donate_argnums=(0,))
        self._train_step_sampled = jax.jit(
            self._train_step_sampled_impl, donate_argnums=(0,), static_argnums=(4,))
        self._scan_sampled_fn = jax.jit(
            self._scan_sampled_impl, donate_argnums=(0,), static_argnums=(4,))
        self._render_chunk = jax.jit(self._render_chunk_impl)
        self._render_scan = jax.jit(self._render_scan_impl)
        self._hit_prepass = jax.jit(self._hit_prepass_impl, static_argnums=(3,))
        self._count_prepass = jax.jit(self._count_prepass_impl)
        self._fast_fused = jax.jit(self._fast_fused_impl, static_argnums=(4, 5, 6))
        self._windowed_fused = jax.jit(
            self._windowed_fused_impl, static_argnums=(5, 6, 7, 8, 9, 10))
        self._optimize_warmup = jax.jit(lambda p, b, k: self._optimize_impl(p, b, k, True))
        self._optimize_regular = jax.jit(lambda p, b, k: self._optimize_impl(p, b, k, False))

        self._last_save_time = time.time()

    def set_render_cap(self, cap, n_sample=None, window=False):
        """Set the inference per-ray sample cap (obj_bound.eval_max_pts_per_ray)
        — and optionally an inference-only coarse-ladder size
        (obj_bound.eval_n_sample, fewer fix-step samples per ray) — then
        re-jit the render paths so the new values actually re-trace.

        Both are read at TRACE time (Python ints baked into the jitted
        graph), so mutating the config alone keeps serving the old compiled
        executable from jit's cache — the viewer's adaptive-quality ladder
        and eval_render_cap.py both go through here. cap=None disables
        capping (full sample count); n_sample=None keeps the training
        ladder."""
        obj_bound = get_value_from_cfgs_field(self.cfgs.model, "obj_bound", None)
        if obj_bound is None:
            return
        setattr(obj_bound, "eval_max_pts_per_ray", cap)
        setattr(obj_bound, "eval_n_sample", n_sample)
        # window=True turns the cap into a rank WINDOW (traced offset) and
        # makes the sampler return the pre-cap march mask — the
        # transmittance-continuation renderer's contract
        setattr(obj_bound, "eval_cap_window", bool(window))
        # the bound cache keys on the obj_bound cfg repr, so the next
        # get_obj_bound() builds a bound carrying the new cap
        self._render_chunk = jax.jit(self._render_chunk_impl)
        self._render_scan = jax.jit(self._render_scan_impl)
        self._fast_fused = jax.jit(self._fast_fused_impl, static_argnums=(4, 5, 6))
        self._windowed_fused = jax.jit(
            self._windowed_fused_impl, static_argnums=(5, 6, 7, 8, 9, 10))
        # the fused fast path traces the prepass ladder too (eval_n_sample)
        self._hit_prepass = jax.jit(self._hit_prepass_impl, static_argnums=(3,))
        self._count_prepass = jax.jit(self._count_prepass_impl)

    # ----------------------------------------------------------------- data
    def prepare_data(self):
        data = {}
        transforms = get_transforms(self.cfgs.dataset.train) if valid_key_in_cfgs(self.cfgs, "dataset") else None
        data_dir = get_value_from_cfgs_field(self.cfgs.dir, "data_dir", "data") if hasattr(self.cfgs, "dir") else "data"
        train_set = get_dataset(self.cfgs.dataset, data_dir, "train", transforms, self.logger)
        data["train"] = train_set

        # pipeline over all concatenated rays
        sched = get_value_from_cfgs_field(self.cfgs.dataset.train, "scheduler", None)
        self.pipeline = Pipeline(sched, int(get_value_from_cfgs_field(self.cfgs, "n_rays", 4096)),
                                 train_set.get_wh() if hasattr(train_set, "get_wh") else (train_set.W, train_set.H),
                                 seed=0)
        samples = [train_set[i] for i in range(len(train_set))]
        self.pipeline.process_train_data(samples)
        self.logger.add_log("Train pool: {} rays".format(self.pipeline.n_total_rays))

        for mode in ("val", "eval"):
            if valid_key_in_cfgs(self.cfgs.dataset, mode):
                try:
                    data[mode] = get_dataset(self.cfgs.dataset, data_dir, mode, None, self.logger)
                except Exception as e:  # dataset missing on disk is non-fatal
                    self.logger.warn("could not load {} dataset: {}".format(mode, e))
        return data

    # ---------------------------------------------------------------- state
    def init_state(self):
        bound_state = self.model.init_bound_state()
        sample = self.pipeline.get_train_batch(0)
        feed_in, _ = get_model_feed_in(sample)
        # init runs eagerly (unfused) — use a tiny ray batch; param shapes
        # do not depend on batch size
        tiny = {k: v[:, :2] for k, v in feed_in.items()}
        variables = jax.jit(
            lambda rngs, feed: self.model.init(rngs, feed, inference_only=True, bound_state=bound_state)
        )({"params": jax.random.PRNGKey(self.seed), "sampling": jax.random.PRNGKey(self.seed + 1)}, tiny)
        params = variables["params"]
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        self.logger.add_log("Model params: {:.2f}M".format(n_params / 1e6))
        # low-precision storage (e.g. bf16 hashgrid table) -> f32 master
        self._needs_f32_master = any(
            hasattr(p, "dtype") and p.dtype != jnp.float32
            for p in jax.tree_util.tree_leaves(params)
        )
        if self._needs_f32_master:
            from .optimizer import with_f32_master

            self.tx = with_f32_master(self.tx)
            self.logger.add_log("non-f32 params detected: optimizer runs on f32 master weights")
        state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "bound_state": bound_state,
            "step": jnp.zeros((), dtype=jnp.int32),
        }
        if self.ema_decay:
            state["ema"] = ema_init(params)
        # tables (params + their adam moments + ema shadows, matched by leaf
        # path) shard over a 'model' axis when present; the rest replicates
        state = shard_params(state, self.mesh)
        return state

    # ------------------------------------------------------------ train step
    def _train_step_impl(self, state, feed_in, key, cur_epoch):
        bound_state = state["bound_state"]
        if self._fold_optimize:
            key, opt_key = jax.random.split(key)
            # occupancy update folded into the step under lax.cond: one
            # dispatch per step instead of an extra one every epoch_optim
            # steps (reference runs model.optimize as a separate pass each
            # epoch, arcnerf_trainer.py:501; on TPU the extra dispatch is a
            # pure tunnel/latency tax). The branch only executes when taken.
            cur_epoch_i = jnp.asarray(cur_epoch, jnp.int32)
            do_opt = (cur_epoch_i > 0) & (cur_epoch_i % self.epoch_optim == 0)

            def run_opt(bs):
                if self.epoch_optim_warmup is not None:
                    return jax.lax.cond(
                        cur_epoch_i < self.epoch_optim_warmup,
                        lambda b: self._optimize_impl(state["params"], b, opt_key, True),
                        lambda b: self._optimize_impl(state["params"], b, opt_key, False),
                        bs,
                    )
                return self._optimize_impl(state["params"], bs, opt_key, False)

            bound_state = jax.lax.cond(do_opt, run_opt, lambda b: b, bound_state)
            bound_state = jax.lax.stop_gradient(bound_state)

        def loss_fn(params):
            out = self.model.apply(
                {"params": params},
                feed_in,
                inference_only=False,
                get_progress=False,
                cur_epoch=cur_epoch,
                bound_state=bound_state,
                rngs={"sampling": key},
            )
            loss_dict = self.loss_factory(feed_in, out)
            return loss_dict["sum"], (loss_dict, out)

        (loss, (loss_dict, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, opt_state = self.tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)

        new_state = dict(state)
        new_state["params"] = params
        new_state["opt_state"] = opt_state
        new_state["bound_state"] = bound_state
        new_state["step"] = state["step"] + 1
        if "ema" in state:
            new_state["ema"] = ema_update(state["ema"], params, new_state["step"], self.ema_decay)

        stats = {"loss": loss}
        for k, v in loss_dict.items():
            if k not in ("names", "sum"):
                stats["loss/{}".format(k)] = v
        # train psnr on whichever rgb key exists
        for k in ("rgb_fine", "rgb", "rgb_coarse"):
            if k in out and out[k] is not None:
                stats["psnr"] = psnr(out[k], feed_in["img"])
                break
        if "n_valid_pts" in out:
            stats["n_valid_pts"] = out["n_valid_pts"]
        if "params" in out:
            for k, v in out["params"].items():
                stats["param/{}".format(k)] = v
        return new_state, stats

    # -------------------------------------------------------- occupancy step
    def _optimize_impl(self, params, bound_state, key, warmup):
        cur_epoch = 0 if warmup else 10**9  # only feeds the warmup branch

        new_state = dict(bound_state)
        fg_bound = self.model.fg_model.get_obj_bound()
        if bound_state.get("fg"):
            def fg_opacity(dt, pts):
                return self.model.apply({"params": params}, dt, pts, method="get_est_opacity")

            k1, key = jax.random.split(key)
            new_state["fg"] = fg_bound.optimize(
                bound_state["fg"], cur_epoch, self.n_coarse, fg_opacity, k1
            )
        if bound_state.get("bkg") and hasattr(self.model.bkg_model, "optimize_state"):
            def bkg_opacity(dt, pts):
                return self.model.apply(
                    {"params": params}, dt, pts,
                    method=lambda m, d, p: m.bkg_model.get_est_opacity(d, p),
                )

            k2, key = jax.random.split(key)
            new_state["bkg"] = self.model.bkg_model.optimize_state(
                bound_state["bkg"], cur_epoch, bkg_opacity, k2
            )
        return new_state

    def _scan_steps_impl(self, state, feed_stack, keys, epoch0):
        """Run keys.shape[0] consecutive train steps on-device under
        lax.scan: one dispatch (and one compile) per stride instead of per
        step. feed_stack leaves are (T, ...) stacks of per-step batches."""
        n = keys.shape[0]

        def body(st, xs):
            feed, key, t = xs
            new_st, stats = self._train_step_impl(st, feed, key, epoch0 + t)
            return new_st, stats

        state, stats_seq = jax.lax.scan(body, state, (feed_stack, keys, jnp.arange(n)))
        return state, stats_seq

    # ------------------------------------------------- on-device sampling
    def _sample_feed_impl(self, pool, key, cur_epoch, n_rays):
        """Sample one ray batch from the device-resident pool, inside jit.

        Mirrors Pipeline.get_train_batch semantics for mode=random:
        with-replacement uniform draw, precrop subset for the first
        precrop_max_epoch steps, random/fixed bkg-color composite. Returns
        a (1, n_rays, ...) feed dict sharded over the data axis."""
        k_u, k_p, k_bkg = jax.random.split(key, 3)
        total = pool["rays_o"].shape[0]
        u = jax.random.randint(k_u, (n_rays,), 0, total)
        if self._precrop_idx_dev is not None and self.pipeline.precrop_max_epoch > 0:
            pre = self._precrop_idx_dev
            up = jnp.take(pre, jax.random.randint(k_p, (n_rays,), 0, pre.shape[0]))
            u = jnp.where(jnp.asarray(cur_epoch, jnp.int32) < self.pipeline.precrop_max_epoch, up, u)
        feed = {k: jnp.take(v, u, axis=0)[None] for k, v in pool.items()}

        mode = self.pipeline.bkg_color_mode
        if mode is not None and "mask" in feed:
            if mode == "random":
                color = jax.random.uniform(k_bkg, (1, n_rays, 3), dtype=jnp.float32)
            else:
                color = jnp.broadcast_to(
                    jnp.asarray(mode, dtype=jnp.float32)[None, None], (1, n_rays, 3))
            mask = feed["mask"][..., None]
            feed["img"] = feed["img"] * mask + color * (1.0 - mask)
            feed["bkg_color"] = color
        return shard_batch_in_jit(feed, self.mesh)

    def _train_step_sampled_impl(self, state, pool, key, cur_epoch, n_rays):
        k_sample, k_step = jax.random.split(key)
        feed = self._sample_feed_impl(pool, k_sample, cur_epoch, n_rays)
        return self._train_step_impl(state, feed, k_step, cur_epoch)

    def _scan_sampled_impl(self, state, pool, keys, epoch0, n_rays):
        """Stride of train steps with per-step on-device batch sampling:
        ONE dispatch carrying only PRNG keys — no host batch data at all."""
        n = keys.shape[0]

        def body(st, xs):
            key, t = xs
            new_st, stats = self._train_step_sampled_impl(st, pool, key, epoch0 + t, n_rays)
            return new_st, stats

        state, stats_seq = jax.lax.scan(body, state, (keys, jnp.arange(n)))
        return state, stats_seq

    def _stride_for(self, epoch, cadences, clip_warmup=-1):
        """How many steps can run as one on-device stride without crossing a
        host-side event boundary (logging/val/save/...). Events always land
        exactly on stride ends."""
        stride = min(self.scan_steps, self.total_epoch - epoch)
        for c in cadences:
            if c is not None and c > 0:
                stride = min(stride, c - (epoch % c))
        if clip_warmup > 0 and epoch < clip_warmup:
            stride = min(stride, clip_warmup - epoch)
        return max(1, stride)

    def epoch_hook(self, epoch, stats):
        """Called after every train stride; the viewer trainer overrides it
        for live progress + pause/resume control (reference
        arcnerf_trainer_with_nsviewer.py per-step viewer hooks)."""

    def train_steps(self, epoch, stride):
        """Run ``stride`` consecutive optimizer steps starting at ``epoch``;
        stride > 1 runs them as ONE device dispatch via lax.scan. Returns the
        stats of the last step."""
        if self._device_pool is not None:
            n_rays = min(self.pipeline.n_rays, self.pipeline.n_total_rays)
            size = self.mesh.devices.size
            n_rays = max(size, (n_rays // size) * size)
            self.key, sub = jax.random.split(self.key)
            if stride <= 1:
                self.state, stats = self._train_step_sampled(
                    self.state, self._device_pool, sub, epoch, n_rays)
                if "n_valid_pts" in stats and self.log_max_allowance:
                    self.pipeline.record_valid_pts(stats["n_valid_pts"], self.n_coarse, n_rays=n_rays)
                return stats
            keys = jax.random.split(sub, stride)
            self.state, stats_seq = self._scan_sampled_fn(
                self.state, self._device_pool, keys, epoch, n_rays)
            stats = {k: v[-1] for k, v in stats_seq.items()}
            if "n_valid_pts" in stats_seq and self.log_max_allowance:
                for t in range(stride):
                    self.pipeline.record_valid_pts(stats_seq["n_valid_pts"][t], self.n_coarse, n_rays=n_rays)
            return stats

        if stride <= 1:
            batch = self.pipeline.get_train_batch(epoch)
            feed_in, _ = get_model_feed_in(batch)
            feed_in = shard_batch(feed_in, self.mesh)
            self.key, sub = jax.random.split(self.key)
            self.state, stats = self._train_step(self.state, feed_in, sub, epoch)
            if "n_valid_pts" in stats and self.log_max_allowance:
                # keep as device array; host sync happens only at the
                # dynamic-bs update cadence inside the pipeline
                self.pipeline.record_valid_pts(stats["n_valid_pts"], self.n_coarse)
            return stats

        feeds = []
        for t in range(stride):
            batch = self.pipeline.get_train_batch(epoch + t)
            fi, _ = get_model_feed_in(batch)
            feeds.append(fi)
        feed_stack = {k: np.stack([np.asarray(f[k]) for f in feeds]) for k in feeds[0]}
        feed_stack = shard_stacked_batch(feed_stack, self.mesh)
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, stride)
        self.state, stats_seq = self._scan_steps_fn(self.state, feed_stack, keys, epoch)
        stats = {k: v[-1] for k, v in stats_seq.items()}
        if "n_valid_pts" in stats_seq and self.log_max_allowance:
            for t in range(stride):
                self.pipeline.record_valid_pts(stats_seq["n_valid_pts"][t], self.n_coarse)
        return stats

    def run_optimize(self, cur_epoch):
        if self._fold_optimize:
            return  # folded into the jitted train step
        if not self.epoch_optim or cur_epoch <= 0 or cur_epoch % self.epoch_optim != 0:
            return
        has_state = bool(jax.tree_util.tree_leaves(self.state["bound_state"]))
        if not has_state:
            return
        self.key, sub = jax.random.split(self.key)
        warmup = self.epoch_optim_warmup is not None and cur_epoch < self.epoch_optim_warmup
        fn = self._optimize_warmup if warmup else self._optimize_regular
        self.state["bound_state"] = fn(self.state["params"], self.state["bound_state"], sub)

    # -------------------------------------------------------------- renderer
    def _render_chunk_impl(self, params, bound_state, feed_in):
        return self.model.apply(
            {"params": params}, feed_in, inference_only=True, bound_state=bound_state
        )

    def _render_scan_impl(self, params, bound_state, feed_stack):
        """Full-image render as ONE device dispatch: lax.scan over the
        (T, 1, chunk, ...) ray-chunk stack instead of T sequential host
        round trips (the r2 eval path paid ~27 ms dispatch + sync per
        chunk — 40 chunks per 800x800 image). Only per-ray outputs are
        stacked; per-point progress tensors never leave the device."""

        def body(carry, feed):
            out = self.model.apply(
                {"params": params}, feed, inference_only=True, bound_state=bound_state
            )
            keep = {
                k: v for k, v in out.items()
                if hasattr(v, "ndim") and v.ndim >= 2 and v.shape[:2] == (1, feed["rays_o"].shape[1])
            }
            return carry, keep

        _, outs = jax.lax.scan(body, 0, feed_stack)
        return outs

    def eval_params(self):
        """Params used for rendering: debiased EMA shadow when configured
        (reference applies the EMA in-place each step; here the raw params
        stay pristine and eval picks the shadow)."""
        if self.ema_decay and "ema" in self.state:
            from .ema import ema_debiased

            return ema_debiased(self.state["ema"], self.state["step"], self.ema_decay)
        return self.state["params"]

    def eval_bkg_color(self, mode="val"):
        """Background color to composite at eval render time — mirrors the
        TRAINING-time background protocol.

        Only when the train pipeline composites a bkg_color onto gt and
        feeds it to the model (scheduler.bkg_color, e.g. the NGP random-bkg
        recipe) must eval supply the gt background explicitly. A model
        trained WITHOUT a fed background owns its background however it
        learned it (white_bkg marching, or the add_inf_z tail shell
        absorbing the scene background) — compositing the dataset color on
        top of that double-adds the background: measured volsdf train-view
        PSNR 19.0 -> 1.7 when white was wrongly composited (r2). Models with
        an rgb-blend background MODEL likewise own their background."""
        if getattr(self.model, "has_bkg", False) and getattr(self.model, "bkg_blend", "rgb") == "rgb" \
                and not getattr(self.model, "fg_only", False):
            return None
        pipeline = getattr(self, "pipeline", None)
        if pipeline is None or getattr(pipeline, "bkg_color_mode", None) is None:
            return None
        ds_cfgs = get_value_from_cfgs_field(self.cfgs.dataset, mode, None) if valid_key_in_cfgs(
            self.cfgs, "dataset") else None
        if ds_cfgs is None:
            return None
        aug = get_value_from_cfgs_field(ds_cfgs, "augmentation", None)
        blend = get_value_from_cfgs_field(aug, "blend_bkg_color", None)
        if blend is not None:
            return np.asarray(blend, dtype=np.float32)
        if get_value_from_cfgs_field(ds_cfgs, "white_bkg", False):
            return np.ones(3, dtype=np.float32)
        return None

    def _render_rays_stacked(self, sample, n, chunk_rays, bkg_color=None):
        """Scan-render ``n`` rays from ``sample`` in one device dispatch;
        returns dict of flat (n, ...) arrays (padding chopped)."""
        n_chunks = (n + chunk_rays - 1) // chunk_rays
        total = n_chunks * chunk_rays
        stack = {}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
            if k in sample and sample[k] is not None:
                arr = np.asarray(sample[k])
                if arr.shape[0] < total:  # pad tail chunk for static shape
                    arr = np.concatenate([arr, np.repeat(arr[-1:], total - arr.shape[0], axis=0)], axis=0)
                stack[k] = arr.reshape((n_chunks, 1, chunk_rays) + arr.shape[1:])
        if bkg_color is not None:
            stack["bkg_color"] = np.broadcast_to(
                np.asarray(bkg_color, dtype=np.float32), (n_chunks, 1, chunk_rays, 3)
            ).copy()
        stack = shard_stacked_batch(stack, self.mesh)  # rays shard on axis 2
        outs = self._render_scan(self.eval_params(), self.state["bound_state"], stack)
        return {k: np.asarray(v).reshape((total,) + v.shape[3:])[:n] for k, v in outs.items()}

    def _chunk_for_mesh(self, chunk_rays):
        """Keep the (padded) chunk divisible by the mesh so full-image eval
        shards at ANY resolution instead of silently replicating, and cap
        chunk*cap at the static point budget: a chunk whose capped-valid
        points exceed the budget CLIPS silently — prefix compaction takes
        the first-budget valid points in ray order, so TAIL rays of dense
        chunks lose all their samples (measured: full 800x800 render at
        32k chunks x cap 16 had chunks at 274,918 capped-valid vs the
        2^18 budget — 21.8k blanked rays, 29.6 dB vs the clip-free
        render; scripts/probe_chunk_diff2 section of docs/benchmark.md)."""
        if chunk_rays is None:
            chunk_rays = min(int(self.model.get_chunk_rays()), 16384)
        cap = self.model.fg_model.get_obj_bound().get_optim_cfgs().get("eval_max_pts_per_ray")
        pt_budget = self.model.fg_model.get_render_cfgs("max_allowance")
        if cap and isinstance(pt_budget, int) and pt_budget > 0:
            chunk_rays = min(chunk_rays, pt_budget // int(cap))
        n_dev = self.mesh.devices.size
        return max(n_dev, (chunk_rays // n_dev) * n_dev)

    def render_image(self, sample, chunk_rays=None, bkg_color=None):
        """Render a full image in ONE scan-batched device dispatch
        (chunk_rays rays per scan step); returns dict of (H, W, ...)."""
        chunk_rays = self._chunk_for_mesh(chunk_rays)
        h, w = int(sample["H"]), int(sample["W"])
        n = sample["rays_o"].shape[0]
        flat = self._render_rays_stacked(sample, n, chunk_rays, bkg_color=bkg_color)
        return {k: v.reshape((h, w) + v.shape[1:]) for k, v in flat.items()}

    # ------------------------------------------------- interactive render
    def _hit_prepass_impl(self, bound_state, rays_o, rays_d, n_probe):
        """Per-ray can-hit test: AABB/sphere intersect + an occupancy probe
        along [near, far]. Measured on the bench scene at 800x800, p50 of
        rays have ZERO valid samples (scripts/probe_render.py) — skipping
        them halves the full sampler's work before any quality tradeoff.

        ``n_probe <= 0`` probes at the sampler's OWN fix-step ladder
        (n_sample samples, diag/n_sample step), which makes the test
        EXACT: hit == "the full sampler would find >= 1 valid sample", so
        the compacted render is pixel-identical for no-bkg models. A
        positive n_probe uses a coarser linspace probe (cheaper, but a
        ray can slip between probe samples — measured 24.7 dB vs the
        full render on the bench scene; use the exact mode)."""
        from ..models.base_modules.obj_bound import _occ_mask_soa
        from ..render.ray_helper import get_zvals_from_near_far_fix_step

        bound = self.model.fg_model.get_obj_bound()
        fg_state = bound_state.get("fg", bound_state)
        near, far, hit = bound.get_near_far_from_rays(
            fg_state, {"rays_o": rays_o, "rays_d": rays_d})
        near = near if near.ndim == 2 else near[:, None]
        far = far if far.ndim == 2 else far[:, None]
        # probe occupancy ONLY when the real sampler culls by it on the
        # fix-step ladder (ray_sample_acc + ray_sample_fix_step) — for any
        # other sampler the bitfield is not part of the render contract
        # and culling by it would blank rays the full render shades
        use_occ = (
            "bitfield" in fg_state and hasattr(bound, "volume")
            and bound.get_optim_cfgs("epoch_optim") is not None
            and bound.get_optim_cfgs("ray_sample_acc")
            and bound.get_optim_cfgs("ray_sample_fix_step")
        )
        if use_occ:
            if n_probe <= 0:  # exact: the sampler's fix-step ladder
                ns_eval = bound.get_optim_cfgs().get("eval_n_sample")
                n_pts = int(ns_eval) if ns_eval else int(self.model.fg_model.get_ray_cfgs("n_sample"))
                fix_t = bound.volume.get_diag_len() / n_pts
                zvals, mask = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts)
            else:
                t = jnp.linspace(0.0, 1.0, n_probe, dtype=jnp.float32)[None, :]
                zvals = near + (far - near) * t  # (B, n_probe)
                mask = jnp.ones_like(zvals, dtype=bool)
            occ = mask & _occ_mask_soa(bound.volume, fg_state["bitfield"], rays_o, rays_d, zvals)
            occ_hit = jnp.any(occ, axis=1)
            hit = occ_hit if hit is None else (hit & occ_hit)
        return hit

    def _count_prepass_impl(self, bound_state, rays_o, rays_d):
        """Per-ray VALID-SAMPLE count on the sampler's own fix-step ladder
        (the exact-mode hit prepass extended to a count). Sizes the
        windowed render's pass ladder: a ray is alive entering pass p only
        if its first p windows came back full, i.e. count >= p*cap — so
        per-pass budgets of #(count >= p*cap) rays can NEVER clip an alive
        ray, and passes whose bound is zero are dropped statically (the
        16-pass geometric ladder paid ~15 one-chunk floor passes on
        settled scenes where p99 of rays finish in 1-2 windows).
        Returns None when the bound has no occupancy contract."""
        from ..models.base_modules.obj_bound import _occ_mask_soa
        from ..render.ray_helper import get_zvals_from_near_far_fix_step

        bound = self.model.fg_model.get_obj_bound()
        fg_state = bound_state.get("fg", bound_state)
        use_occ = (
            "bitfield" in fg_state and hasattr(bound, "volume")
            and bound.get_optim_cfgs("epoch_optim") is not None
            and bound.get_optim_cfgs("ray_sample_acc")
            and bound.get_optim_cfgs("ray_sample_fix_step")
        )
        if not use_occ:
            return None
        near, far, hit = bound.get_near_far_from_rays(
            fg_state, {"rays_o": rays_o, "rays_d": rays_d})
        near = near if near.ndim == 2 else near[:, None]
        far = far if far.ndim == 2 else far[:, None]
        ns_eval = bound.get_optim_cfgs().get("eval_n_sample")
        n_pts = int(ns_eval) if ns_eval else int(self.model.fg_model.get_ray_cfgs("n_sample"))
        fix_t = bound.volume.get_diag_len() / n_pts
        zvals, mask = get_zvals_from_near_far_fix_step(near, far, fix_t, n_pts)
        occ = mask & _occ_mask_soa(bound.volume, fg_state["bitfield"], rays_o, rays_d, zvals)
        counts = jnp.sum(occ.astype(jnp.int32), axis=1)
        if hit is not None:
            counts = jnp.where(hit, counts, 0)
        return counts

    def _fast_fused_impl(self, params, bound_state, feed, miss_rgb, n_probe, n_chunks, chunk):
        """One-dispatch fast render: prepass -> ray budget select -> scan
        render -> scatter into the flat image, all on device. The host
        path pays two tunnel dispatches (prepass, scan) plus nonzero/pad/
        composite over every ray per frame; fused, a frame is ONE jitted
        call whose host work is reshaping the result."""
        rays_o, rays_d = feed["rays_o"], feed["rays_d"]
        n = rays_o.shape[0]
        hit = self._hit_prepass_impl(bound_state, rays_o, rays_d, n_probe)
        if hit is None:
            hit = jnp.ones((n,), bool)
        budget = n_chunks * chunk
        # first-`budget` hit rays by ray order: rank element-scatter (same
        # form as fg_model._compact_sel, over rays instead of samples)
        g = jnp.cumsum(hit.astype(jnp.int32)) - 1
        g = jnp.where(hit, jnp.clip(g, 0, budget), budget)
        sel = jnp.zeros((budget + 1,), jnp.int32).at[g].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget]
        n_hit = jnp.sum(hit.astype(jnp.int32))
        sel_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(n_hit, budget)

        stack = {
            k: jnp.take(v, sel, axis=0).reshape((n_chunks, 1, chunk) + v.shape[1:])
            for k, v in feed.items()
        }
        outs = self._render_scan_impl(params, bound_state, stack)

        sel_safe = jnp.where(sel_valid, sel, n)  # invalid rows -> pad slot
        imgs = {}
        for k, v in outs.items():
            flat = v.reshape((budget,) + v.shape[3:])
            if k == "rgb":
                init = jnp.broadcast_to(miss_rgb, (n + 1, 3)).astype(flat.dtype)
            else:
                init = jnp.zeros((n + 1,) + flat.shape[1:], flat.dtype)
            imgs[k] = init.at[sel_safe].set(flat)[:n]
        return imgs, n_hit

    def render_image_fast(self, sample, chunk_rays=None, bkg_color=None, hit_frac=0.5, n_probe=0,
                          fused=None):
        """Interactive-mode full-image render: the occupancy pre-pass
        compacts the rays that can hit anything into a FIXED budget of
        ``hit_frac * n`` rays (static chunk count -> no per-frame
        retrace), only those run the full sampler (at the inference
        per-ray cap, set_render_cap), and missed rays composite the
        background directly. Pair with set_render_cap(4..8) for the
        speed/quality ladder; quality vs render_image is measured in
        bench.py (psnr_fast_vs_full). Returns (imgs dict, stats dict).

        Reference analogue: the CUDA renderer compacts alive rays each
        marching round (ns_viewer adaptive rendering / instant-ngp ray
        compaction); one static pre-pass is the TPU-shaped version."""
        # a model-owned background (learned bkg model) must be rendered on
        # every ray — compacting misses would leave black holes where the
        # full render paints bkg radiance; fall back to the exact path
        if getattr(self.model, "has_bkg", False):
            imgs = self.render_image(sample, chunk_rays=chunk_rays, bkg_color=bkg_color)
            return imgs, {"hit_frac": 1.0, "budget_rays": sample["rays_o"].shape[0],
                          "clipped_rays": 0, "fallback": "has_bkg"}
        chunk_rays = self._chunk_for_mesh(chunk_rays)  # incl. budget/cap clamp
        h, w = int(sample["H"]), int(sample["W"])
        n = sample["rays_o"].shape[0]

        # fused single-dispatch path: default on a single device (the
        # sharded eval path shards ray chunks across the mesh; the fused
        # select is a global cumsum, so multi-device keeps the host path)
        if fused is None:
            fused = self.mesh.devices.size == 1
        if fused:
            budget = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
            n_chunks = budget // chunk_rays
            feed = {}
            for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
                if k in sample and sample[k] is not None:
                    feed[k] = jnp.asarray(np.asarray(sample[k]))
            if bkg_color is not None:
                feed["bkg_color"] = jnp.broadcast_to(
                    jnp.asarray(bkg_color, dtype=jnp.float32), (n, 3))
            if bkg_color is not None:
                miss = np.asarray(bkg_color, dtype=np.float32)
            elif self.model.fg_model.get_ray_cfgs("white_bkg"):
                miss = np.ones(3, dtype=np.float32)
            else:
                miss = np.zeros(3, dtype=np.float32)
            flat, n_hit = self._fast_fused(
                self.eval_params(), self.state["bound_state"], feed,
                jnp.asarray(miss), n_probe, n_chunks, chunk_rays)
            n_hit = int(n_hit)
            imgs = {k: np.asarray(v).reshape((h, w) + v.shape[1:]) for k, v in flat.items()}
            stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget,
                     "clipped_rays": max(0, n_hit - budget)}
            return imgs, stats

        rays_o = jnp.asarray(np.asarray(sample["rays_o"]))
        rays_d = jnp.asarray(np.asarray(sample["rays_d"]))
        hit = self._hit_prepass(self.state["bound_state"], rays_o, rays_d, n_probe)
        hit = np.ones(n, dtype=bool) if hit is None else np.asarray(hit)

        budget = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
        idx = np.nonzero(hit)[0]
        n_hit, n_clip = len(idx), max(0, len(idx) - budget)
        idx = idx[:budget]
        if len(idx) < budget:  # pad with the last hit ray (or ray 0)
            fill = idx[-1] if len(idx) else 0
            idx = np.concatenate([idx, np.full(budget - len(idx), fill, dtype=idx.dtype)])

        sub = {k: np.asarray(sample[k])[idx] for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time")
               if k in sample and sample[k] is not None}
        flat_sub = self._render_rays_stacked(sub, budget, chunk_rays, bkg_color=bkg_color)

        valid_n = min(n_hit, budget)
        imgs = {}
        for k, v in flat_sub.items():
            full = np.zeros((n,) + v.shape[1:], dtype=v.dtype)
            if k == "rgb":
                if bkg_color is not None:
                    full[:] = np.asarray(bkg_color, dtype=v.dtype)
                elif self.model.fg_model.get_ray_cfgs("white_bkg"):
                    full[:] = 1.0  # match render_image's white fill on empty rays
            full[idx[:valid_n]] = v[:valid_n]
            imgs[k] = full.reshape((h, w) + v.shape[1:])
        stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget, "clipped_rays": n_clip}
        return imgs, stats

    def render_image_interactive(self, sample, scale=2, chunk_rays=None, bkg_color=None,
                                 hit_frac=0.5, n_probe=0):
        """Adaptive-resolution interactive render: shade a stride-``scale``
        subgrid of the image's rays through the compacted fast path
        (occupancy pre-pass + per-ray sample cap, render_image_fast), then
        bilinear-upsample every per-ray output back to the full frame.

        Resolution is the honest interactive lever on this workload: the
        eval path's cost scales with shaded slots = hit_rays * cap, so at
        a fixed cap a half-res frame costs ~4x less than any per-sample
        knob can recover at full res (measured: cap 4 / ns 64 / 64k-chunk
        sweeps all land within 1.1x of the cap-4 bench tier —
        scripts/probe_render_surgery.py). This mirrors the reference
        viewer's interaction-time adaptive rendering
        (ns_viewer/server/viewer_utils.py:657): low-res while moving,
        full-res on settle. Pair with set_render_cap(cap, n_sample=...)
        for the quality ladder; returns (imgs dict at FULL (H, W), stats).
        """
        h, w = int(sample["H"]), int(sample["W"])
        scale = max(1, int(scale))
        if scale == 1:
            return self.render_image_fast(sample, chunk_rays=chunk_rays,
                                          bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe)
        off = scale // 2  # subgrid pixel centers sit mid-stride
        hs, ws = len(range(off, h, scale)), len(range(off, w, scale))
        sub = {"H": hs, "W": ws}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time", "img", "mask"):
            if k in sample and sample[k] is not None:
                arr = np.asarray(sample[k])
                grid = arr.reshape((h, w) + arr.shape[1:])
                sub[k] = grid[off::scale, off::scale].reshape((hs * ws,) + arr.shape[1:])
        imgs_s, stats = self.render_image_fast(sub, chunk_rays=chunk_rays,
                                               bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe)
        imgs = {k: _bilinear_upsample(v, h, w, off, scale) for k, v in imgs_s.items()}
        stats = dict(stats, scale=scale, shaded_rays=hs * ws)
        return imgs, stats

    # ------------------------------------- transmittance-continuation render
    def _windowed_fused_impl(self, params, bound_state, feed, miss_rgb, hit_bkg,
                             n_probe, n_chunks1, n_chunks_passes, chunk, cap, eps):
        """One-dispatch transmittance-continuation render — the TPU-shaped
        equivalent of the reference CUDA renderer's alive-ray compaction
        rounds (instant-ngp marches rays in rounds, dropping rays whose
        transmittance passed the cutoff; ns_viewer's adaptive renderer
        rides the same kernel).

        Pass 0 shades every hit ray's first ``cap`` valid samples (the
        window). Rays whose residual transmittance T still exceeds ``eps``
        are rank-compacted into a smaller budget and shaded for the NEXT
        window of ``cap`` valid samples (cap_offset = pass * cap), their
        contribution weighted by carried T. Because windows march with the
        PRE-cap occupancy mask's deltas (fg_model mask_march), per-sample
        alphas are bit-identical to the full render's, and the T-weighted
        sum telescopes: the composition is exact for every ray that
        finishes within the pass ladder (T <= eps bounds the rest).

        ``n_chunks_passes`` is a static tuple of per-pass chunk counts —
        alive rays DRAIN geometrically as transmittance saturates, so
        later passes ride shrinking budgets instead of paying pass-1's
        ray count every round (the reference CUDA renderer's alive-ray
        compaction shrinks the launch the same way each round).
        """
        rays_o, rays_d = feed["rays_o"], feed["rays_d"]
        n = rays_o.shape[0]
        hit = self._hit_prepass_impl(bound_state, rays_o, rays_d, n_probe)
        if hit is None:
            hit = jnp.ones((n,), bool)
        budget1 = n_chunks1 * chunk
        g = jnp.cumsum(hit.astype(jnp.int32)) - 1
        g = jnp.where(hit, jnp.clip(g, 0, budget1), budget1)
        sel = jnp.zeros((budget1 + 1,), jnp.int32).at[g].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:budget1]
        n_hit = jnp.sum(hit.astype(jnp.int32))
        sel_valid = jnp.arange(budget1, dtype=jnp.int32) < jnp.minimum(n_hit, budget1)

        feed1 = {k: jnp.take(v, sel, axis=0) for k, v in feed.items()}

        def run_pass(feed_p, offset, n_chunks_p, chunk_p):
            stack = {k: v.reshape((n_chunks_p, 1, chunk_p) + v.shape[1:]) for k, v in feed_p.items()}
            stack["cap_offset"] = jnp.full((n_chunks_p,), offset, jnp.int32)
            outs = self._render_scan_impl(params, bound_state, stack)
            return {k: v.reshape((n_chunks_p * chunk_p,) + v.shape[3:]) for k, v in outs.items()}

        def pass_shape(spec):
            # spec: chunk count (rides the main chunk) or (n_chunks, chunk) —
            # the counted ladder hands later passes SMALLER chunks so a
            # 2k-alive tail pass stops paying a full 32k-ray chunk floor
            return spec if isinstance(spec, tuple) else (spec, chunk)

        out1 = run_pass(feed1, 0, n_chunks1, chunk)
        rgb, depth, mask = out1["rgb"], out1["depth"], out1["mask"]
        T = jnp.clip(1.0 - mask, 0.0, 1.0)
        T = jnp.where(sel_valid, T, 0.0)  # padded rows are dead
        # a ray can have more samples only if its window came back FULL —
        # escaping rays never saturate T and must not hold pass budgets
        may_more = out1.get("n_win_pts", jnp.full((budget1,), cap)) >= cap

        clipped = jnp.zeros((), jnp.int32)
        alive_counts = []
        for p, spec in enumerate(n_chunks_passes, start=1):
            n_chunks2, chunk2 = pass_shape(spec)
            budget2 = n_chunks2 * chunk2
            alive = (T > eps) & may_more
            n_alive = jnp.sum(alive.astype(jnp.int32))
            alive_counts.append(n_alive)
            clipped = clipped + jnp.maximum(n_alive - budget2, 0)
            rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
            # an alive ray whose rank exceeds this pass's budget cannot be
            # shaded this round — RETIRE it (consistent truncation: partial
            # integral so far + T*bkg) instead of leaving it alive to render
            # window p+1 with window p missing; clipped_alive still reports
            # the quality event to the caller
            may_more = may_more & ~(alive & (rank >= budget2))
            g2 = jnp.where(alive, jnp.clip(rank, 0, budget2), budget2)
            sel2 = jnp.zeros((budget2 + 1,), jnp.int32).at[g2].set(
                jnp.arange(budget1, dtype=jnp.int32), mode="drop")[:budget2]
            valid2 = jnp.arange(budget2, dtype=jnp.int32) < jnp.minimum(n_alive, budget2)
            feed2 = {k: jnp.take(v, sel2, axis=0) for k, v in feed1.items()}
            out2 = run_pass(feed2, p * cap, n_chunks2, chunk2)
            w2 = jnp.where(valid2, jnp.take(T, sel2), 0.0)
            sel2_safe = jnp.where(valid2, sel2, budget1)

            def _acc(acc, contrib, wgt):
                pad = jnp.zeros((1,) + acc.shape[1:], acc.dtype)
                wb = wgt.reshape((-1,) + (1,) * (acc.ndim - 1))
                return jnp.concatenate([acc, pad]).at[sel2_safe].add(wb * contrib)[:budget1]

            rgb = _acc(rgb, out2["rgb"], w2)
            depth = _acc(depth, out2["depth"], w2)
            mask = _acc(mask, out2["mask"], w2)
            t_next = w2 * jnp.clip(1.0 - out2["mask"], 0.0, 1.0)
            T = jnp.concatenate([T, jnp.zeros((1,), T.dtype)]).at[sel2_safe].set(t_next)[:budget1]
            if "n_win_pts" in out2:
                full2 = (out2["n_win_pts"] >= cap) & valid2
                may_more = jnp.concatenate(
                    [may_more, jnp.zeros((1,), bool)]).at[sel2_safe].set(full2)[:budget1] & may_more

        if hit_bkg is not None:
            # the full render composites rgb += T_end * bkg inside marching;
            # windowed passes run bkg-free and composite once here
            rgb = rgb + T[:, None] * hit_bkg

        sel_safe = jnp.where(sel_valid, sel, n)
        # miss fills match render_image's update_values_for_invalid_rays:
        # bkg color for rgb, the model's depth_far for depth, 0 for mask
        miss_depth = jnp.asarray(
            float(self.model.fg_model.get_render_cfgs()["depth_far"]), jnp.float32)
        if "n_win_pts" in out1:
            # a prepass-HIT ray with zero valid samples in its first window
            # must fill like the exact renderer's invalid rays (depth_far +
            # miss color), not keep the zero-fill partial integral
            empty = out1["n_win_pts"] <= 0
            depth = jnp.where(empty, miss_depth, depth)
            if hit_bkg is None:  # else T=1 already composited the bkg above
                rgb = jnp.where(empty[:, None], miss_rgb[None].astype(rgb.dtype), rgb)
        imgs = {}
        for k, flat in (("rgb", rgb), ("depth", depth), ("mask", mask)):
            if k == "rgb":
                init = jnp.broadcast_to(miss_rgb, (n + 1, 3)).astype(flat.dtype)
            elif k == "depth":
                init = jnp.full((n + 1,), miss_depth, flat.dtype)
            else:
                init = jnp.zeros((n + 1,) + flat.shape[1:], flat.dtype)
            imgs[k] = init.at[sel_safe].set(flat)[:n]
        alive_arr = (jnp.stack(alive_counts) if alive_counts
                     else jnp.zeros((0,), jnp.int32))
        return (imgs, n_hit, jnp.sum(((T > eps) & may_more).astype(jnp.int32)),
                clipped, alive_arr)

    def render_image_windowed(self, sample, n_pass=3, alive_frac=0.5, chunk_rays=None,
                              bkg_color=None, hit_frac=0.5, n_probe=0, scale=1, eps=1e-3,
                              adaptive_budget=True, refine_frac=0.0, pass_budget_rays=None,
                              budget_rays=None):
        """Full-image transmittance-continuation render (see
        _windowed_fused_impl). Requires set_render_cap(cap, window=True)
        first — the cap becomes the per-pass window length. ``scale`` > 1
        shades a stride-``scale`` pixel subgrid and bilinear-upsamples
        (render_image_interactive's adaptive-resolution lever) — the
        subgrid samples themselves stay eps-exact.

        ``adaptive_budget`` sizes the pass-1 ray budget from a real hit
        COUNT (one cheap prepass dispatch, bucketed to power-of-2 chunk
        counts so at most log2 shapes ever compile) instead of the blind
        ``hit_frac`` guess — a dense view can exceed hit_frac*n hit rays,
        and clipped hit rays render as background (the silent 25 dB
        cliff measured in scripts/probe_upsample_bound.py).

        ``refine_frac`` > 0 (with scale > 1) re-renders the top
        refine_frac fraction of NON-subgrid pixels ranked by upsampled
        luminance gradient through the same eps-exact windowed path and
        scatters them into the frame — edges are where bilinear
        upsampling errs (measured +1.4 dB at scale 2 refining 20%).
        Returns (imgs, stats)."""
        if getattr(self.model, "has_bkg", False) or self.model.fg_model.get_ray_cfgs("white_bkg"):
            # model-owned backgrounds composite inside marching per pass —
            # that breaks the T-weighted composition; use the exact path
            imgs = self.render_image(sample, chunk_rays=chunk_rays, bkg_color=bkg_color)
            return imgs, {"fallback": "bkg-owning model"}
        bound = self.model.fg_model.get_obj_bound()
        assert bound.get_optim_cfgs().get("eval_cap_window"), \
            "call set_render_cap(cap, window=True) before render_image_windowed"
        cap = int(bound.get_optim_cfgs("eval_max_pts_per_ray"))

        h, w = int(sample["H"]), int(sample["W"])
        scale = max(1, int(scale))
        if scale > 1:
            off = scale // 2
            hs, ws = len(range(off, h, scale)), len(range(off, w, scale))
            sub = {"H": hs, "W": ws}
            arrs = {}
            for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
                if k in sample and sample[k] is not None:
                    arr = np.asarray(sample[k])
                    arrs[k] = arr
                    grid = arr.reshape((h, w) + arr.shape[1:])
                    sub[k] = grid[off::scale, off::scale].reshape((hs * ws,) + arr.shape[1:])
            imgs_s, stats = self.render_image_windowed(
                sub, n_pass=n_pass, alive_frac=alive_frac, chunk_rays=chunk_rays,
                bkg_color=bkg_color, hit_frac=hit_frac, n_probe=n_probe, eps=eps,
                adaptive_budget=adaptive_budget, pass_budget_rays=pass_budget_rays,
                budget_rays=budget_rays)
            imgs = {k: _bilinear_upsample(v, h, w, off, scale) for k, v in imgs_s.items()}
            stats = dict(stats, scale=scale, shaded_rays=hs * ws)
            if refine_frac > 0.0:
                ridx = self._refine_pixel_select(imgs["rgb"], h, w, off, scale, refine_frac)
                if ridx.size:
                    rsub = {"H": 1, "W": int(ridx.size)}
                    for k, arr in arrs.items():
                        rsub[k] = arr[ridx]
                    rimgs, rstats = self.render_image_windowed(
                        rsub, n_pass=n_pass, alive_frac=alive_frac, chunk_rays=chunk_rays,
                        bkg_color=bkg_color, hit_frac=1.0, n_probe=n_probe, eps=eps,
                        adaptive_budget=adaptive_budget)
                    for k in imgs:
                        if k in rimgs:
                            flat_img = imgs[k].reshape((h * w,) + imgs[k].shape[2:])
                            flat_img[ridx] = rimgs[k].reshape((ridx.size,) + imgs[k].shape[2:])
                            imgs[k] = flat_img.reshape(imgs[k].shape)
                    stats = dict(stats, refined_rays=int(ridx.size),
                                 refine_hit_frac=rstats.get("hit_frac"))
            return imgs, stats

        chunk_rays = self._chunk_for_mesh(chunk_rays)
        n = sample["rays_o"].shape[0]

        feed = {}
        for k in ("rays_o", "rays_d", "rays_r", "bounds", "crop_bounds", "exp_time"):
            if k in sample and sample[k] is not None:
                feed[k] = jnp.asarray(np.asarray(sample[k]))

        n_chunks_max = int(-(-n // chunk_rays))

        def _pow2_chunks(count):
            need = max(1, int(-(-count // chunk_rays)))
            c = 1
            while c < need:
                c *= 2
            return min(c, n_chunks_max)

        def _ray_budget_specs(budgets):
            """Ray budgets -> static (n_chunks, chunk) pass specs, pow2-
            bucketed with a 4096-ray chunk floor (bounded compile set)."""
            min_chunk = min(4096, chunk_rays)
            specs = []
            for b in budgets:
                if b <= 0:
                    break
                budget_p = min_chunk
                while budget_p < b:
                    budget_p *= 2
                budget_p = min(budget_p, n_chunks_max * chunk_rays)
                chunk_p = min(chunk_rays, budget_p)
                specs.append((budget_p // chunk_p, chunk_p))
            return tuple(specs)

        n_chunks_passes = None
        if pass_budget_rays is not None:
            # CALIBRATED ladder: the caller rides a previous frame's
            # measured per-pass alive counts (stats["alive_per_pass"],
            # temporal coherence — the reference viewer adapts its render
            # settings across frames the same way). Exactness is still
            # guarded per frame: clipped_alive / hit_clipped > 0 in the
            # returned stats flag a budget the scene outgrew. budget_rays
            # (stats["budget_rays"] of the calibration frame) skips the
            # per-frame hit-count prepass dispatch entirely.
            if budget_rays is not None:
                n_chunks1 = max(1, min(n_chunks_max,
                                       int(-(-budget_rays // chunk_rays))))
            else:
                hit = self._hit_prepass(
                    self.state["bound_state"], feed["rays_o"], feed["rays_d"], n_probe)
                n_chunks1 = n_chunks_max if hit is None else _pow2_chunks(
                    int(jnp.sum(hit.astype(jnp.int32))))
            n_chunks_passes = _ray_budget_specs(pass_budget_rays)
        elif adaptive_budget:
            # COUNTED pass ladder: per-ray valid-sample counts from one
            # cheap prepass dispatch. A ray is alive entering pass p only
            # if all p prior windows were full (count >= p*cap), so
            # budgets of #(count >= p*cap) never clip and passes whose
            # bound is 0 vanish — the geometric alive_frac ladder paid
            # ~(n_pass-1) one-chunk floor passes on settled scenes and
            # CLIPPED alive rays when a pass outgrew its guess (the 32.8
            # dB windowed-s1 ceiling in BENCH r4's first cut).
            counts = self._count_prepass(
                self.state["bound_state"], feed["rays_o"], feed["rays_d"])
            if counts is None:
                n_chunks1 = n_chunks_max
            else:
                counts = np.asarray(counts)
                n_chunks1 = _pow2_chunks(int((counts > 0).sum()))
                # later passes ride pow2 ray budgets with their OWN chunk
                # size — a 2k-alive tail pass must not pay a full
                # main-chunk floor (measured s3: 5 floor passes of 32k rays
                # behind a 29k-hit frame, scripts/probe_windowed_tiers.py)
                n_chunks_passes = _ray_budget_specs(
                    [int((counts >= p * cap).sum()) for p in range(1, n_pass)])
        else:
            budget1 = max(chunk_rays, int(-(-(n * hit_frac) // chunk_rays)) * chunk_rays)
            n_chunks1 = budget1 // chunk_rays
        budget1 = n_chunks1 * chunk_rays
        if n_chunks_passes is None:
            # fallback: alive rays drain geometrically
            n_chunks_passes = tuple(
                max(1, int(-(-(n_chunks1 * (alive_frac ** p)) // 1)))
                for p in range(1, n_pass))

        # NOTE: bkg_color deliberately NOT fed to the model (see impl)
        if bkg_color is not None:
            miss = np.asarray(bkg_color, dtype=np.float32)
        else:
            miss = np.zeros(3, dtype=np.float32)
        hit_bkg = jnp.asarray(miss) if np.any(miss != 0.0) else None

        flat, n_hit, n_alive_end, clipped, alive_arr = self._windowed_fused(
            self.eval_params(), self.state["bound_state"], feed, jnp.asarray(miss),
            hit_bkg, n_probe, n_chunks1, n_chunks_passes, chunk_rays, cap, float(eps))
        imgs = {k: np.asarray(v).reshape((h, w) + v.shape[1:]) for k, v in flat.items()}
        n_hit = int(n_hit)
        stats = {"hit_frac": n_hit / max(n, 1), "budget_rays": budget1,
                 "hit_clipped": max(0, n_hit - budget1),
                 "pass_budget_rays": tuple(
                     (s[0] * s[1]) if isinstance(s, tuple) else s * chunk_rays
                     for s in n_chunks_passes),
                 "alive_per_pass": tuple(int(a) for a in np.asarray(alive_arr)),
                 "n_pass": n_pass, "cap": cap,
                 "alive_at_end": int(n_alive_end), "clipped_alive": int(clipped)}
        return imgs, stats

    @staticmethod
    def _refine_pixel_select(rgb, h, w, off, scale, refine_frac):
        """Top-``refine_frac`` NON-subgrid pixel indices ranked by the
        upsampled frame's luminance gradient — the pixels bilinear
        interpolation got most wrong. -> flat (k,) int64 indices."""
        lum = np.asarray(rgb, dtype=np.float32)
        if lum.ndim == 3:
            lum = lum @ np.asarray([0.299, 0.587, 0.114], np.float32)
        gy = np.abs(np.diff(lum, axis=0, prepend=lum[:1]))
        gx = np.abs(np.diff(lum, axis=1, prepend=lum[:, :1]))
        score = (gy + gx).reshape(-1)
        onsub = np.zeros((h, w), bool)
        onsub[off::scale, off::scale] = True
        score[onsub.reshape(-1)] = -1.0
        k = int(refine_frac * h * w)
        if k <= 0:
            return np.zeros((0,), np.int64)
        # always exactly k indices: the refine render's shapes stay
        # frame-stable (no recompiles); a subgrid pixel sneaking in when
        # fewer than k edges exist just re-renders an exact pixel
        return np.argpartition(score, -k)[-k:]

    # ------------------------------------------------------------- main loop
    def train(self):
        self.logger.add_log("Start training: {} epochs (1 step/epoch)".format(self.total_epoch))
        epoch_loss = int(get_value_from_cfgs_field(self.cfgs.progress, "epoch_loss", 100))
        epoch_val = int(get_value_from_cfgs_field(self.cfgs.progress, "epoch_val", -1))
        epoch_eval = int(get_value_from_cfgs_field(self.cfgs.progress, "epoch_eval", -1))
        epoch_save = int(get_value_from_cfgs_field(self.cfgs.progress, "epoch_save_checkpoint", 100000))
        save_time = float(get_value_from_cfgs_field(self.cfgs.progress, "save_time", 1800))

        # grad-clip warmup switch (reference basic_trainer.py:254 +
        # optim.clip_warmup/clip_gradients_warmup): rebuild the optimizer
        # with the post-warmup clip once; adam slots carry over (clip is
        # stateless) so no state surgery is needed.
        clip_warmup = int(get_value_from_cfgs_field(self.cfgs.optim, "clip_warmup", -1))
        debug_mode = (
            get_value_from_cfgs_field(self.cfgs.debug, "debug_mode", False)
            if valid_key_in_cfgs(self.cfgs, "debug") else False
        )

        epoch_infer = int(get_value_from_cfgs_field(self.cfgs.progress, "epoch_infer", -1))
        t_start = time.time()
        t_window = time.time()
        epoch = self.start_epoch
        try:
            while epoch < self.total_epoch:
                if clip_warmup > 0 and epoch == clip_warmup:
                    import copy

                    new_optim = copy.deepcopy(self.cfgs.optim)
                    new_optim.clip_gradients = get_value_from_cfgs_field(
                        self.cfgs.optim, "clip_gradients_warmup", 0.0
                    )
                    self.tx, _ = build_optimizer(new_optim)
                    if getattr(self, "_needs_f32_master", False):
                        from .optimizer import with_f32_master

                        self.tx = with_f32_master(self.tx)
                    self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
                    self._scan_steps_fn = jax.jit(self._scan_steps_impl, donate_argnums=(0,))
                    # the on-device-sampling path (the default for
                    # mode=random) trains through these jits — they must be
                    # rebuilt too or the stale warmup clip keeps serving
                    self._train_step_sampled = jax.jit(
                        self._train_step_sampled_impl, donate_argnums=(0,), static_argnums=(4,))
                    self._scan_sampled_fn = jax.jit(
                        self._scan_sampled_impl, donate_argnums=(0,), static_argnums=(4,))
                    self.logger.add_log("switched grad clip to {} at epoch {}".format(
                        new_optim.clip_gradients, epoch))

                self.run_optimize(epoch)

                if self.log_max_allowance:
                    self.pipeline.update_dynamic_bs(epoch, self.log_max_allowance)

                stride = self._stride_for(
                    epoch, (epoch_loss, epoch_val, epoch_eval, epoch_save, epoch_infer,
                            self.pipeline.dynamic_update_epoch if self.log_max_allowance else None,
                            None if self._fold_optimize else self.epoch_optim),
                    clip_warmup,
                )
                stats = self.train_steps(epoch, stride)
                epoch += stride
                self.epoch_hook(epoch, stats)

                if epoch % epoch_loss == 0:
                    jax.block_until_ready(stats["loss"])
                    # over-budget valid points are silently dropped by the
                    # static compaction — surface it once (host read is fine
                    # here: we are already at the sync cadence)
                    if (not self._warned_budget_overflow and self.log_max_allowance
                            and "n_valid_pts" in stats):
                        n_valid = int(stats["n_valid_pts"])
                        budget = 1 << self.log_max_allowance
                        if n_valid > budget:
                            self.logger.add_log(
                                "valid pts {} > compaction budget 2^{}={}; over-budget points are "
                                "dropped — raise model.obj_bound.log_max_allowance or reduce rays/"
                                "samples".format(n_valid, self.log_max_allowance, budget),
                                level="warning",
                            )
                            self._warned_budget_overflow = True
                    # occupancy ratio diagnostics (reference occ-ratio logging)
                    fg_bs = self.state["bound_state"].get("fg") or {}
                    if "bitfield" in fg_bs:
                        occ_ratio = float(jnp.mean(fg_bs["bitfield"].astype(jnp.float32)))
                        self.monitor.add_scalar("train/occ_ratio", occ_ratio, epoch)
                    dt = time.time() - t_window
                    t_window = time.time()
                    loss_val = float(stats["loss"])
                    if debug_mode and loss_val != loss_val:  # NaN guard
                        if is_master():
                            save_model(self.ckpt_dir, self.state, epoch, self.logger, keep_name="nan_abort", meta=self._ckpt_meta)
                        raise FloatingPointError("NaN loss at epoch {} — state saved".format(epoch))
                    msg = "epoch {:6d} | loss {:.5f} | psnr {:.2f} | {:.3f} s/iter | rays {}".format(
                        epoch, loss_val, float(stats.get("psnr", 0.0)),
                        dt / epoch_loss, self.pipeline.n_rays)
                    self.logger.add_log(msg)
                    for k, v in stats.items():
                        self.monitor.add_scalar("train/{}".format(k), float(v), epoch)
                    self.monitor.add_scalar("train/lr", float(self.lr_schedule(epoch))
                                            if callable(self.lr_schedule) else self.lr_schedule, epoch)

                if epoch_val > 0 and epoch % epoch_val == 0 and "val" in self.data:
                    self.valid_epoch(epoch)
                if epoch_eval > 0 and epoch % epoch_eval == 0 and "eval" in self.data:
                    self.eval_epoch(epoch)
                if epoch_infer > 0 and epoch % epoch_infer == 0:
                    self.infer_epoch(epoch)
                if is_master() and epoch_save > 0 and epoch % epoch_save == 0:
                    save_model(self.ckpt_dir, self.state, epoch, self.logger, meta=self._ckpt_meta)
                if is_master() and time.time() - self._last_save_time > save_time:
                    save_model(self.ckpt_dir, self.state, epoch, self.logger, keep_name="latest", meta=self._ckpt_meta)
                    self._last_save_time = time.time()
        except KeyboardInterrupt:
            if is_master():
                save_model(self.ckpt_dir, self.state, epoch, self.logger, keep_name="latest", meta=self._ckpt_meta)
            self.logger.add_log("Interrupted; saved latest at epoch {}".format(epoch))
            raise

        if is_master():
            save_model(self.ckpt_dir, self.state, self.total_epoch, self.logger, keep_name="final", meta=self._ckpt_meta)
        self.logger.add_log("Training done in {:.1f} min".format((time.time() - t_start) / 60.0))
        return self.state

    # ----------------------------------------------------------- evaluation
    def valid_epoch(self, epoch, mode="val"):
        dataset = self.data[mode]
        counter = AverageDictCounter()
        max_samples = int(get_value_from_cfgs_field(self.cfgs.progress, "max_samples_val", 1))
        bkg_color = self.eval_bkg_color(mode)
        for i in range(min(len(dataset), max_samples)):
            sample = dataset[i]
            imgs = self.render_image(sample, bkg_color=bkg_color)
            gt = sample["img"].reshape(imgs["rgb"].shape)
            gt_j, pred_j = jnp.asarray(gt), jnp.asarray(imgs["rgb"])
            # full configured metric dict at val epochs (SSIM etc.), like the
            # reference's eval_func.py:34-53 — not just a hand-computed PSNR
            vals = {"psnr": float(psnr(pred_j, gt_j))}
            if self.metric_factory is not None:
                m_in = {"img": gt_j, "H": gt.shape[0], "W": gt.shape[1]}
                if sample.get("mask") is not None:
                    m_in["mask"] = jnp.asarray(sample["mask"]).reshape(gt.shape[:2])
                try:
                    m_out = self.metric_factory(m_in, {"rgb": pred_j})
                    vals.update({k: float(v) for k, v in m_out.items() if k != "names"})
                except Exception as e:  # e.g. MaskPSNR configured but no mask
                    self.logger.warn("val metric failed: {}".format(e))
            counter(vals)
            if is_master():
                self._write_progress_img(imgs, gt, "{}_ep{}_{}".format(mode, epoch, i))
        summary = counter.get_avg_summary()
        self.logger.add_log("[{}] epoch {} | {}".format(mode, epoch, counter.get_metric_info()))
        for k, v in summary.items():
            self.monitor.add_scalar("{}/{}".format(mode, k), v, epoch)

        # optional per-ray sigma/alpha/weights curves (debug.get_progress,
        # reference save_progress + render_img.get_sample_ray_imgs)
        if (valid_key_in_cfgs(self.cfgs, "debug")
                and get_value_from_cfgs_field(self.cfgs.debug, "get_progress", False) and is_master()):
            try:
                sample = dataset[0]
                n = min(256, sample["rays_o"].shape[0])
                feed = {k: jnp.asarray(sample[k][:n])[None]
                        for k in ("rays_o", "rays_d", "rays_r") if k in sample}
                out = self.model.apply(
                    {"params": self.state["params"]}, feed, inference_only=False, get_progress=True,
                    bound_state=self.state["bound_state"], rngs={"sampling": jax.random.PRNGKey(0)},
                )
                out = {k: np.asarray(v[0]) if hasattr(v, "ndim") and v.ndim >= 2 else v
                       for k, v in out.items()}
                from ..visual.render_img import get_sample_ray_imgs

                figs = get_sample_ray_imgs(out, n_rays=2)
                if figs is not None:
                    for i, fig in enumerate(figs[0]):
                        self.monitor.add_img("{}_ray_curve_{}".format(mode, i), fig, epoch)
            except Exception as e:
                self.logger.warn("ray-curve progress failed: {}".format(e))
        return summary

    def eval_epoch(self, epoch):
        return self.valid_epoch(epoch, mode="eval")

    def infer_epoch(self, epoch):
        """Novel-view video + extraction via Inferencer (reference
        arcnerf_trainer.py:408-424). Needs cfgs.inference."""
        if not valid_key_in_cfgs(self.cfgs, "inference"):
            return None
        from ..evaluation import Inferencer

        src = self.data.get("val") or self.data.get("eval") or self.data["train"]
        inferencer = Inferencer(
            self.cfgs.inference, src.get_intrinsic(), (src.W, src.H), self.logger
        )
        out_dir = os.path.join(self.expr_dir, "infer_ep{}".format(epoch))
        params, bound_state = self.state["params"], self.state["bound_state"]
        render_chunk = lambda feed: self._render_chunk(params, bound_state, feed)  # noqa: E731
        forward_pts = jax.jit(lambda pts: self.model.apply({"params": params}, pts, method="forward_pts"))
        forward_pts_dir = jax.jit(
            lambda pts, dirs: self.model.apply({"params": params}, pts, dirs, method="forward_pts_dir")
        )
        return inferencer.run_infer(render_chunk, forward_pts, forward_pts_dir, out_dir)

    def _write_progress_img(self, imgs, gt, name):
        try:
            from ..visual.render_img import render_progress_imgs

            h, w = gt.shape[:2]
            panel = render_progress_imgs({"img": gt, "H": h, "W": w}, imgs)
            import cv2

            img = panel["imgs"][0]
            cv2.imwrite(os.path.join(self.progress_dir, name + ".png"), img[..., ::-1])
            self.monitor.add_img(name, img, 0)
        except Exception as e:
            self.logger.warn("progress img write failed: {}".format(e))
