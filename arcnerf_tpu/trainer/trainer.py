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
from ..render.engine import RenderEngine
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
        # every render tier (full/fast/interactive/windowed) lives in the
        # RenderEngine; it renders the LIVE state via the state_fn closure
        self.engine = RenderEngine(
            self.model, self.mesh, cfgs,
            lambda: (self.eval_params(), self.state["bound_state"]))
        self._optimize_warmup = jax.jit(lambda p, b, k: self._optimize_impl(p, b, k, True))
        self._optimize_regular = jax.jit(lambda p, b, k: self._optimize_impl(p, b, k, False))

        self._last_save_time = time.time()

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
    def _train_step_impl(self, state, feed_in, key, cur_epoch, fold_cond=True):
        bound_state = state["bound_state"]
        if self._fold_optimize and fold_cond:
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

    def _stride_opt_prologue(self, state, keys, epoch0, n):
        """Occupancy update HOISTED out of the scanned stride body.

        The folded in-body lax.cond re-copied the whole bound_state through
        the conditional on EVERY scanned step even though it fires at most
        once per stride (xprof r5: conditional.11/13 = 9.9 ms/step at the
        64^3 bench grid, ~4% of the step). The prologue runs the update
        ONCE per stride when any step in [epoch0, epoch0+n) lands on the
        epoch_optim cadence; the body then treats bound_state as constant.

        Timing note: when a cadence boundary falls MID-stride (epoch_optim
        not a multiple of scan_steps — no shipped recipe does this), the
        update runs at stride start instead of the boundary step, a <= n-1
        step shift of a slow EMA update; the warmup/regular choice uses the
        boundary step's epoch, not epoch0."""
        if not self._fold_optimize:
            return state
        epoch0_i = jnp.asarray(epoch0, jnp.int32)
        ts = epoch0_i + jnp.arange(n, dtype=jnp.int32)
        hits = (ts > 0) & (ts % self.epoch_optim == 0)
        do_opt = jnp.any(hits)
        fire_epoch = epoch0_i + jnp.argmax(hits)  # boundary step (if any)
        opt_key = jax.random.fold_in(keys[0], 7)

        def run_opt(bs):
            if self.epoch_optim_warmup is not None:
                return jax.lax.cond(
                    fire_epoch < self.epoch_optim_warmup,
                    lambda b: self._optimize_impl(state["params"], b, opt_key, True),
                    lambda b: self._optimize_impl(state["params"], b, opt_key, False),
                    bs,
                )
            return self._optimize_impl(state["params"], bs, opt_key, False)

        new_bs = jax.lax.cond(do_opt, run_opt, lambda b: b, state["bound_state"])
        out = dict(state)
        out["bound_state"] = jax.lax.stop_gradient(new_bs)
        return out

    def _scan_steps_impl(self, state, feed_stack, keys, epoch0):
        """Run keys.shape[0] consecutive train steps on-device under
        lax.scan: one dispatch (and one compile) per stride instead of per
        step. feed_stack leaves are (T, ...) stacks of per-step batches."""
        n = keys.shape[0]
        state = self._stride_opt_prologue(state, keys, epoch0, n)

        def body(st, xs):
            feed, key, t = xs
            new_st, stats = self._train_step_impl(st, feed, key, epoch0 + t, fold_cond=False)
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

    def _train_step_sampled_impl(self, state, pool, key, cur_epoch, n_rays, fold_cond=True):
        k_sample, k_step = jax.random.split(key)
        feed = self._sample_feed_impl(pool, k_sample, cur_epoch, n_rays)
        return self._train_step_impl(state, feed, k_step, cur_epoch, fold_cond=fold_cond)

    def _scan_sampled_impl(self, state, pool, keys, epoch0, n_rays):
        """Stride of train steps with per-step on-device batch sampling:
        ONE dispatch carrying only PRNG keys — no host batch data at all."""
        n = keys.shape[0]
        state = self._stride_opt_prologue(state, keys, epoch0, n)

        def body(st, xs):
            key, t = xs
            new_st, stats = self._train_step_sampled_impl(
                st, pool, key, epoch0 + t, n_rays, fold_cond=False)
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

    # ---------------- rendering: delegated to the RenderEngine ----------
    # (render/engine.py owns every render tier and its jitted
    # executables; the trainer keeps train/eval orchestration only —
    # VERDICT r4 item 6, reference layering arcnerf/eval/infer_func.py:31)
    def set_render_cap(self, cap, n_sample=None, window=False):
        return self.engine.set_render_cap(cap, n_sample=n_sample, window=window)

    def render_image(self, sample, chunk_rays=None, bkg_color=None):
        return self.engine.render_image(sample, chunk_rays=chunk_rays, bkg_color=bkg_color)

    def render_image_fast(self, sample, **kwargs):
        return self.engine.render_image_fast(sample, **kwargs)

    def render_image_interactive(self, sample, **kwargs):
        return self.engine.render_image_interactive(sample, **kwargs)

    def render_image_windowed(self, sample, **kwargs):
        return self.engine.render_image_windowed(sample, **kwargs)

    @property
    def _render_chunk(self):
        """Jitted (params, bound_state, feed) -> outputs renderer (the
        viewer trainer and infer_epoch drive it with explicit params)."""
        return self.engine._render_chunk

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
