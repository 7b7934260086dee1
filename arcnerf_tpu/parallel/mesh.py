"""Device mesh + data-parallel sharding.

TPU-native replacement for the reference's distributed stack
(common/trainer/basic_trainer.py:73-111 init_process_group(nccl|mpi),
DistributedSampler, DDP grad all-reduce): a 1-axis ``data`` mesh over all
devices; ray batches sharded on the batch dim; parameters replicated; the
gradient all-reduce is inserted by XLA (GSPMD) over ICI when the jitted
step consumes sharded batches with replicated params — no explicit
collectives needed. Multi-host pods: call ``jax.distributed.initialize``
before building the mesh; XLA routes DCN transparently.
"""

import warnings

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_REPLICATE_WARNED = set()


def init_distributed(cfgs=None):
    """Initialize multi-process jax if env indicates a multi-host run
    (replaces MASTER_ADDR/SLURM rendezvous logic, basic_trainer.py:73-87)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def get_mesh(n_devices=None, axis_name="data"):
    """1-D data mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_2d(n_model=1, n_devices=None, axis_names=("data", "model")):
    """2-D (data, model) mesh: ``n_model`` tensor-parallel devices on the
    minor axis (adjacent devices -> ICI neighbors on a TPU slice), the rest
    data-parallel. ``n_model=1`` degenerates to the 1-D data mesh with a
    trailing singleton model axis, so trainer code can treat both uniformly."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % n_model != 0:
        raise ValueError("n_model={} must divide device count {}".format(n_model, n))
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, axis_names)


def param_shardings(params, mesh, model_axis="model"):
    """NamedSharding pytree for a model's params on a 2-D (data, model) mesh.

    Tensor-parallel rule: multi-resolution hashgrid / dense-grid tables — the
    dominant parameter memory (an (L, T, F) NGP table at hashmap_size 19 is
    64 MB f32; >=22 outgrows one chip's comfortable HBM share together with
    its adam moments) — shard on the LEVEL axis over ``model_axis``. Each
    model-group device then owns L/mp complete per-level tables; GSPMD
    inserts the table gather / grad collectives over ICI as the lookup
    needs them, while the params and optimizer state stay RESIDENT sharded —
    the weight update (the memory-bound consumer of table + moments) runs on
    L/mp levels per device. MLP params (<1 MB total) replicate. Apply the
    SAME tree to the adam moments so optimizer state memory shards too
    (ZeRO-style).

    Reference analogue: none — the CUDA reference replicates the table per
    GPU (DDP); this is the TPU-native scale-out path (roadmap "Scale-out").
    """
    mp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(model_axis, 1)

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_table = any(n in ("embeddings", "grid") for n in names)
        if mp > 1 and is_table and hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] % mp == 0 and leaf.shape[0] >= mp:
            return NamedSharding(mesh, P(model_axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh, model_axis="model"):
    """Place params (or a matching pytree, e.g. adam moments) per
    :func:`param_shardings`."""
    shardings = param_shardings(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch, mesh, axis_name="data"):
    """Place a batch dict across the mesh: shard on the leading axis when it
    divides the device count, else on axis 1 — trainer ray batches are
    (1, n_rays, ...) so the rays shard and GSPMD propagates the layout
    through the model's (B, N) -> (B*N) flatten. Unshardable leaves
    replicate (with a one-time warning per shape — pad ray batches with
    pad_ray_batch to keep them sharded)."""
    size = mesh.devices.size

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] >= size and x.shape[0] % size == 0:
                return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
            if x.ndim >= 2 and x.shape[1] >= size and x.shape[1] % size == 0:
                return jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
            if size > 1 and x.size >= size and x.shape not in _REPLICATE_WARNED:
                _REPLICATE_WARNED.add(x.shape)
                warnings.warn(
                    "shard_batch: leaf of shape {} not divisible by {} devices; "
                    "replicating (pad with pad_ray_batch to shard)".format(x.shape, size))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def shard_batch_in_jit(batch, mesh, axis_name="data"):
    """In-trace analogue of :func:`shard_batch`: annotate an on-device
    sampled ray batch with the data-parallel layout via
    ``with_sharding_constraint`` (device_put is host-side; inside a jitted
    sampler the layout must be a constraint so GSPMD splits the gather's
    output across the mesh instead of replicating it)."""
    size = mesh.devices.size

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            if x.shape[0] >= size and x.shape[0] % size == 0:
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis_name)))
            if x.ndim >= 2 and x.shape[1] >= size and x.shape[1] % size == 0:
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, axis_name)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def pad_ray_batch(batch, multiple, axis=1):
    """Pad every (.., n_rays, ..) leaf along ``axis`` up to the next multiple
    of ``multiple`` by repeating the last ray, so shard_batch always shards
    regardless of resolution (full-image eval at odd H*W). Returns
    (padded_batch, n_valid) — slice outputs back to n_valid rays."""
    n = None

    def pad(x):
        nonlocal n
        if not hasattr(x, "ndim") or x.ndim <= axis:
            return x
        cur = x.shape[axis]
        n = cur if n is None else n
        rem = (-cur) % multiple
        if rem == 0:
            return x
        take = jax.numpy.take(x, jax.numpy.full((rem,), cur - 1), axis=axis) if hasattr(x, "devices") \
            else np.take(x, np.full((rem,), cur - 1), axis=axis)
        cat = jax.numpy.concatenate if hasattr(x, "devices") else np.concatenate
        return cat([x, take], axis=axis)

    out = jax.tree_util.tree_map(pad, batch)
    return out, n


def shard_stacked_batch(batch, mesh, axis_name="data"):
    """Shard a (T, 1, n_rays, ...) stack of per-step ray batches on the ray
    axis (axis 2). The leading axis is scan time — it must NOT shard."""
    size = mesh.devices.size

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 3 and x.shape[2] >= size and x.shape[2] % size == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, None, axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh):
    """Replicate a pytree (params/opt state) on every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
