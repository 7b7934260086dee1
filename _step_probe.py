# Measure true NGP step time without per-step host reads
import time, os, sys
import jax
from arcnerf_tpu.utils.cfgs import load_configs, update_configs_by_dotlist
cfgs = load_configs("configs/expr/synthetic_ngp.yaml")
update_configs_by_dotlist(cfgs, [
    "--name", "bench_dbg2", "--progress.epoch", "50", "--progress.epoch_loss", "1000000",
    "--progress.epoch_val", "-1", "--progress.epoch_save_checkpoint", "1000000",
    "--n_rays", "4096", "--dataset.train.n_imgs", "8", "--dataset.train.wh", "[128,128]",
    "--model.rays.n_sample", "512",
])
from arcnerf_tpu.trainer import ArcNerfTrainer
trainer = ArcNerfTrainer(cfgs)
from arcnerf_tpu.datasets import get_model_feed_in
from arcnerf_tpu.parallel.mesh import shard_batch

def run_n(n, start):
    for epoch in range(start, start+n):
        trainer.run_optimize(epoch)
        batch = trainer.pipeline.get_train_batch(epoch)
        feed_in, _ = get_model_feed_in(batch)
        feed_in = shard_batch(feed_in, trainer.mesh)
        trainer.key, sub = jax.random.split(trainer.key)
        trainer.state, stats = trainer._train_step(trainer.state, feed_in, sub, epoch)
    jax.block_until_ready(stats["loss"])
    return stats

t0=time.time(); stats = run_n(1, 0); print("compile+first step", time.time()-t0, flush=True)
t0=time.time(); stats = run_n(20, 1); dt=(time.time()-t0)/20
print("steady step", dt, "s =>", 4096/dt, "rays/s", flush=True)
t0=time.time(); f=float(stats["loss"]); print("loss read", time.time()-t0, "loss", f, flush=True)
# also with occupancy optimize at warmup cadence
t0=time.time(); trainer.run_optimize(16); jax.block_until_ready(jax.tree_util.tree_leaves(trainer.state["bound_state"])[0]); print("warmup optimize", time.time()-t0, flush=True)
