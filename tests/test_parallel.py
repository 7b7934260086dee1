"""Data-parallel sharding tests on the virtual 8-device CPU mesh: batch
sharding, gradient consistency vs single-device, and the full dry-run
training step from __graft_entry__."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arcnerf_tpu.parallel.mesh import get_mesh, replicate, shard_batch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_mesh_and_shard_batch():
    assert len(jax.devices()) == 8
    mesh = get_mesh()
    assert mesh.devices.size == 8

    batch = {
        "rays_o": jnp.ones((1, 64, 3)),
        "img": jnp.ones((1, 64, 3)),
        "scalar": jnp.ones(()),
    }
    sharded = shard_batch(batch, mesh)
    # trainer batches are (1, n_rays, ...): leading dim can't shard, the
    # ray axis must — each device holds (1, 8, 3)
    assert sharded["rays_o"].shape == (1, 64, 3)
    ray_shards = {s.data.shape for s in sharded["rays_o"].addressable_shards}
    assert ray_shards == {(1, 8, 3)}
    # scalars replicate
    assert {s.data.shape for s in sharded["scalar"].addressable_shards} == {()}

    flat = {"rays": jnp.ones((64, 3))}
    sharded_flat = shard_batch(flat, mesh)
    shard_shapes = {s.data.shape for s in sharded_flat["rays"].addressable_shards}
    assert shard_shapes == {(8, 3)}  # 64 rays / 8 devices

    # odd ray counts that divide neither axis stay replicated, with a warning
    with pytest.warns(UserWarning, match="not divisible"):
        odd = shard_batch({"rays_o": jnp.ones((1, 63, 3))}, mesh)
    assert {s.data.shape for s in odd["rays_o"].addressable_shards} == {(1, 63, 3)}


def test_pad_ray_batch_shards_odd_resolution():
    """Full-image eval at odd resolutions: pad rays to the mesh multiple so
    every leaf shards 8-way (VERDICT r1 item 10)."""
    from arcnerf_tpu.parallel.mesh import pad_ray_batch

    mesh = get_mesh()
    batch = {"rays_o": jnp.ones((1, 63, 3)), "rays_d": jnp.ones((1, 63, 3))}
    padded, n_valid = pad_ray_batch(batch, mesh.devices.size)
    assert n_valid == 63
    assert padded["rays_o"].shape == (1, 64, 3)
    # padding repeats the last ray -> harmless duplicate work
    np.testing.assert_array_equal(np.asarray(padded["rays_o"][0, -1]), np.asarray(batch["rays_o"][0, -1]))
    sharded = shard_batch(padded, mesh)
    assert {s.data.shape for s in sharded["rays_o"].addressable_shards} == {(1, 8, 3)}


def test_sharded_grad_matches_single_device():
    """psum-free API: jit over sharded inputs + replicated params must give
    identical gradients to unsharded execution (GSPMD inserts the
    all-reduce)."""
    mesh = get_mesh()
    w = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32))
    y = jnp.asarray(np.random.default_rng(2).normal(size=(64, 4)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)

    w_r = replicate(w, mesh)
    data = shard_batch({"x": x, "y": y}, mesh)
    g_sharded = jax.jit(jax.grad(loss))(w_r, data["x"], data["y"])
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-5)


def test_dryrun_multichip_8():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_param_shardings_shard_table_on_model_axis():
    """(data, model) mesh: hashgrid 'embeddings' tables shard level-wise on
    the model axis; everything else (MLP kernels, scalars) replicates. The
    same path rule covers mirrored trees (adam moments, ema shadows)."""
    from arcnerf_tpu.parallel.mesh import get_mesh_2d, param_shardings

    mesh = get_mesh_2d(2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}

    params = {
        "geo_net": {
            "encoder": {"embeddings": jnp.zeros((16, 1024, 2))},
            "layer_0": {"kernel": jnp.zeros((35, 64)), "bias": jnp.zeros((64,))},
        },
        "count": jnp.zeros(()),
    }
    sh = param_shardings(params, mesh)
    placed = jax.tree_util.tree_map(jax.device_put, params, sh)
    emb = placed["geo_net"]["encoder"]["embeddings"]
    # 16 levels / 2 model devices -> 8 levels per shard, replicated over data
    assert {s.data.shape for s in emb.addressable_shards} == {(8, 1024, 2)}
    kern = placed["geo_net"]["layer_0"]["kernel"]
    assert {s.data.shape for s in kern.addressable_shards} == {(35, 64)}


def test_dp_tp_grad_parity_hashgrid():
    """A hashgrid-encoder loss gives identical grads under (data=4, model=2)
    table sharding as on a single device. Grad out_shardings pin the
    level-sharded layout, so the weight update (the memory-bound consumer of
    table + adam moments) runs on the sharded residents."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from arcnerf_tpu.models.base_modules import build_encoder
    from arcnerf_tpu.parallel.mesh import get_mesh_2d, param_shardings
    from arcnerf_tpu.utils.cfgs import dict_to_obj

    enc = build_encoder(dict_to_obj({
        "type": "HashGridEmbedder", "input_dim": 3, "n_levels": 8,
        "n_feat_per_entry": 2, "hashmap_size": 10, "base_res": 4,
        "max_res": 64, "side": 2.0, "include_input": False,
    }))
    xyz = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), xyz)["params"]

    def loss(p, x):
        return jnp.mean(enc.apply({"params": p}, x) ** 2)

    g_single = jax.grad(loss)(params, xyz)

    mesh = get_mesh_2d(2)
    shardings = param_shardings(params, mesh)
    p_sh = jax.tree_util.tree_map(jax.device_put, params, shardings)
    x_sh = jax.device_put(xyz, NamedSharding(mesh, P("data")))
    with mesh:
        g_tp = jax.jit(jax.grad(loss), out_shardings=shardings)(p_sh, x_sh)
        jax.block_until_ready(g_tp)
    emb = g_tp["embeddings"]
    assert {s.data.shape[0] for s in emb.addressable_shards} == {4}  # 8 levels / 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        g_single, g_tp)


@pytest.mark.slow
def test_trainer_model_parallel_smoke():
    """dist.model_parallel=2: the trainer builds a (data=4, model=2) mesh,
    the NGP hashgrid table (and its adam moments) land level-sharded, and a
    few training steps run with finite falling loss."""
    import tempfile

    from arcnerf_tpu.trainer import ArcNerfTrainer
    from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist

    cfg_path = os.path.join(os.path.dirname(__file__), "..", "configs", "expr", "synthetic_ngp.yaml")
    cfgs = load_configs(cfg_path)
    with tempfile.TemporaryDirectory() as d:
        update_configs_by_dotlist(cfgs, [
            "--name", "mp_test",
            "--dir.expr_dir", os.path.join(d, "expr"),
            "--progress.epoch", "8",
            "--progress.epoch_loss", "4",
            "--progress.epoch_val", "-1",
            "--progress.epoch_save_checkpoint", "1000",
            "--dataset.train.n_imgs", "3",
            "--dataset.train.wh", "[32,32]",
            "--model.rays.n_sample", "32",
            "--model.obj_bound.volume.n_grid", "32",
            "--model.obj_bound.epoch_optim_warmup", "32",
            "--model.geometry.encoder.hashmap_size", "12",
            "--model.geometry.encoder.n_levels", "4",
            "--model.geometry.encoder.max_res", "64",
            "--n_rays", "256",
            "--dist.model_parallel", "2",
        ])
        trainer = ArcNerfTrainer(cfgs)
        assert dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape)) == {"data": 4, "model": 2}

        def find_table(tree):
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
                names = [getattr(p, "key", "") for p in path]
                if "embeddings" in names:
                    return leaf
            raise AssertionError("no hashgrid table found")

        table = find_table(trainer.state["params"])
        assert {s.data.shape[0] for s in table.addressable_shards} == {2}  # 4 levels / 2
        mu_table = find_table(trainer.state["opt_state"])
        assert {s.data.shape[0] for s in mu_table.addressable_shards} == {2}

        first = float(trainer.train_steps(0, 1)["loss"])
        trainer.train()
        last = float(trainer.train_steps(8, 1)["loss"])
        assert np.isfinite(last) and last < first, "loss should fall: {} -> {}".format(first, last)


@pytest.mark.slow  # spawns two jax.distributed processes (~55 s); nightly tier
def test_two_process_multihost_grad_parity():
    """Real jax.distributed path running the REAL tiny-NGP train step (the
    same program __graft_entry__.dryrun_multichip compiles): spawn 2
    localhost processes (2 virtual CPU devices each) forming a global
    4-device mesh, ray batch sharded across processes, grads all-reduced by
    GSPMD — assert [loss, grad_l2] matches the same program run
    single-process (VERDICT r2 item 7; reference analogue:
    torch.distributed.launch, scripts/gpu.sh)."""
    import socket
    import subprocess
    import tempfile

    with socket.socket() as s:  # pick a free rendezvous port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = "127.0.0.1:{}".format(port)

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    with tempfile.TemporaryDirectory() as td:
        outs = [os.path.join(td, "g{}.npy".format(i)) for i in range(2)]
        ref_out = os.path.join(td, "ref.npy")
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [
            subprocess.Popen(
                [sys.executable, worker, coordinator, "2", str(i), outs[i]],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)
        ]
        logs = [p.communicate(timeout=600)[0].decode() for p in procs]
        for p, log in zip(procs, logs):
            assert p.returncode == 0, log[-2000:]

        # single-process run of the SAME program (1 process, 4 devices)
        ref = subprocess.run(
            [sys.executable, worker, coordinator, "1", "0", ref_out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=600)
        assert ref.returncode == 0, ref.stdout.decode()[-2000:]

        loss_ref, gl2_ref = np.load(ref_out)
        assert np.isfinite(loss_ref) and gl2_ref > 0
        for path in outs:
            loss_i, gl2_i = np.load(path)
            np.testing.assert_allclose(loss_i, loss_ref, rtol=1e-4)
            np.testing.assert_allclose(gl2_i, gl2_ref, rtol=1e-3)


def test_weak_scaling_per_device_cost():
    """Weak scaling on the virtual mesh (VERDICT r3 item 8): the 8-device
    step at 8x the ray batch must compile to a per-device program whose
    compute cost matches the 1-device step at 1x batch within 15% — i.e.
    scaling adds collectives, not redundant per-device work. Wall-clock
    can't be asserted on a virtual mesh (8 'devices' share one core), so
    the assertion rides XLA's own cost analysis of the compiled program.
    Also executes one step on both meshes to pin numerics stay finite."""
    from arcnerf_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(0)
    # hashgrid-shaped toy step: embedding gather + MLP + MSE + adam-ish
    # update — the same op mix as the real train step, small enough to
    # compile twice in CI time
    table = jnp.asarray(rng.normal(size=(8, 2048, 2)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 0.1)
    params = {"table": table, "w1": w1, "w2": w2}

    def loss_fn(p, idx, target):
        feats = jnp.take(p["table"].reshape(-1, 2), idx.reshape(-1), axis=0)
        h = feats.reshape(idx.shape[0], -1)  # (B, 8*2)
        h = jax.nn.relu(h @ p["w1"])
        return jnp.mean((h @ p["w2"] - target) ** 2)

    def step(p, idx, target):
        g = jax.grad(loss_fn)(p, idx, target)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, g), loss_fn(p, idx, target)

    def build(n_dev, batch):
        mesh = get_mesh(n_dev)
        idx = jnp.asarray(rng.integers(0, 8 * 2048, size=(batch, 8)), jnp.int32)
        tgt = jnp.asarray(rng.normal(size=(batch, 3)).astype(np.float32))
        data = shard_batch({"idx": idx, "tgt": tgt}, mesh)
        p = replicate(params, mesh)
        fn = jax.jit(step)
        compiled = fn.lower(p, data["idx"], data["tgt"]).compile()
        (new_p, loss) = compiled(p, data["idx"], data["tgt"])
        assert np.isfinite(float(loss))
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0)), n_dev

    flops_1, _ = build(1, 4096)
    flops_8, _ = build(8, 8 * 4096)
    # cost_analysis reports the PER-DEVICE SPMD program cost (verified:
    # 1-dev at B and 8-dev at 8B report identical flops for a pure-DP
    # matmul), so the weak-scaling assertion compares them directly
    assert flops_8 <= flops_1 * 1.15, \
        "per-device step cost grew {:.2f}x under 8-way sharding".format(flops_8 / flops_1)
    assert flops_8 >= flops_1 * 0.5, "8-device program suspiciously cheap (sharding broken?)"
