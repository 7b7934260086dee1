"""Worker for the 2-process multi-host smoke test (test_parallel.py).

Each process owns 2 virtual CPU devices; jax.distributed.initialize wires
the 2 processes into one 4-device global mesh (the reference exercises the
analogous path via torch.distributed.launch + init_process_group,
/root/reference/common/trainer/basic_trainer.py:73-111, scripts/gpu.sh).
Runs one data-parallel gradient step on deterministic data and writes the
gradient to an .npy for the parent to compare against single-process.

Invoked as: python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npy>
"""

import os
import sys

coordinator, num_procs, proc_id, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

assert jax.process_count() == num_procs, jax.process_count()
n_global = len(jax.devices())
assert n_global == 2 * num_procs, n_global

mesh = Mesh(np.asarray(jax.devices()), ("data",))

# deterministic global batch, each process materializes only its local rows
N, D_IN, D_OUT = 64, 3, 4
rng = np.random.default_rng(0)
x_full = rng.normal(size=(N, D_IN)).astype(np.float32)
y_full = rng.normal(size=(N, D_OUT)).astype(np.float32)
w = jnp.asarray(rng.normal(size=(D_IN, D_OUT)).astype(np.float32))

data_sharding = NamedSharding(mesh, P("data"))
rows_per_proc = N // num_procs
lo = proc_id * rows_per_proc
x = jax.make_array_from_process_local_data(data_sharding, x_full[lo:lo + rows_per_proc])
y = jax.make_array_from_process_local_data(data_sharding, y_full[lo:lo + rows_per_proc])

w_rep = jax.device_put(w, NamedSharding(mesh, P()))


def loss(w, x, y):
    return jnp.mean((x @ w - y) ** 2)


g = jax.jit(jax.grad(loss))(w_rep, x, y)  # GSPMD all-reduce across processes
np.save(out_path, np.asarray(g))
print("proc {} done, {} global devices".format(proc_id, n_global))
