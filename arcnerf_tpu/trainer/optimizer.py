"""Optimizer + LR schedule factories on optax.

Capability parity with /root/reference/common/trainer/optimizer.py:6 and
lr_scheduler.py:9: adam/sgd/rmsprop (+adamw via weight_decay), schedulers
MultiStepLR / ExponentialLR / PolyLR / CosineAnnealingLR / WarmUpCosineLR,
gradient clipping with warmup switch (optim.clip_gradients /
clip_gradients_warmup, basic_trainer.py:254).
"""

import jax
import jax.numpy as jnp
import optax

from ..utils.cfgs import get_value_from_cfgs_field


def with_f32_master(tx):
    """Mixed-precision wrapper: run ``tx`` on f32 master weights when params
    are stored in a lower precision (e.g. the bf16 hashgrid table).

    Grads are upcast to f32, the inner optimizer (adam moments included)
    operates purely on the f32 master copy, and the emitted update moves
    each param to cast(master). This keeps NGP's lr=1e-2/eps=1e-15 regime
    stable with a bf16 table: the table sees one bf16 rounding per step
    while the trajectory itself integrates in f32."""

    def init_fn(params):
        master = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params)
        return (tx.init(master), master)

    def update_fn(updates, state, params=None):
        inner_state, master = state
        grads32 = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), updates)
        inner_updates, inner_state = tx.update(grads32, inner_state, master)
        master = optax.apply_updates(master, inner_updates)
        out = jax.tree_util.tree_map(lambda m, p: m.astype(p.dtype) - p, master, params)
        return out, (inner_state, master)

    return optax.GradientTransformation(init_fn, update_fn)


def build_lr_schedule(optim_cfgs):
    """cfgs.optim -> optax schedule fn step -> lr."""
    base_lr = float(get_value_from_cfgs_field(optim_cfgs, "lr", 5e-4))
    sched_cfgs = get_value_from_cfgs_field(optim_cfgs, "lr_scheduler", None)
    if sched_cfgs is None:
        return base_lr

    stype = get_value_from_cfgs_field(sched_cfgs, "type", "ExponentialLR")
    gamma = float(get_value_from_cfgs_field(sched_cfgs, "lr_gamma", 0.1))
    steps = get_value_from_cfgs_field(sched_cfgs, "lr_steps", [200000])

    if stype == "ExponentialLR":
        # decay by gamma every lr_steps[0] steps, continuous exponent
        return optax.exponential_decay(base_lr, int(steps[0]), gamma)
    if stype == "MultiStepLR":
        boundaries = {int(s): gamma for s in steps}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if stype == "PolyLR":
        power = float(get_value_from_cfgs_field(sched_cfgs, "power", 1.0))
        return optax.polynomial_schedule(base_lr, base_lr * gamma, power, int(steps[-1]))
    if stype == "CosineAnnealingLR":
        tmax = int(get_value_from_cfgs_field(sched_cfgs, "tmax", 20))
        eta_min = float(get_value_from_cfgs_field(sched_cfgs, "ema_min", 1e-3))
        return optax.cosine_decay_schedule(base_lr, tmax, alpha=eta_min / base_lr)
    if stype == "WarmUpCosineLR":
        total = int(steps[-1]) if steps else 300000
        min_factor = float(get_value_from_cfgs_field(sched_cfgs, "min_factor", 0.1))
        warmup = int(get_value_from_cfgs_field(sched_cfgs, "warmup", total // 100))
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, total, end_value=base_lr * min_factor
        )
    raise NotImplementedError("lr scheduler {} not supported".format(stype))


def build_optimizer(optim_cfgs):
    """cfgs.optim -> (optax optimizer, schedule)."""
    schedule = build_lr_schedule(optim_cfgs)
    otype = get_value_from_cfgs_field(optim_cfgs, "optim_type", "adam").lower()
    eps = float(get_value_from_cfgs_field(optim_cfgs, "eps", 1e-8))
    weight_decay = float(get_value_from_cfgs_field(optim_cfgs, "weight_decay", 0.0))

    if otype == "adam":
        if weight_decay > 0:
            tx = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
        else:
            tx = optax.adam(schedule, eps=eps)
    elif otype == "sgd":
        momentum = float(get_value_from_cfgs_field(optim_cfgs, "momentum", 0.9))
        tx = optax.sgd(schedule, momentum=momentum)
    elif otype == "rmsprop":
        tx = optax.rmsprop(schedule, eps=eps)
    else:
        raise NotImplementedError("optimizer {} not supported".format(otype))

    clip = float(get_value_from_cfgs_field(optim_cfgs, "clip_gradients", 0.0))
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule
