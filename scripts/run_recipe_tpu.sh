#!/bin/sh
# Long recipe-shape NGP run (VERDICT r2 item 5 follow-up): the bench's
# recipe section can only afford a few hundred warmup steps, which times
# the still-dense occupancy regime (46-51 valid samples/ray -> a ~310-min
# projection that is really a warmup artifact). This run trains the
# recipe shapes (800x800 views, n_sample 1024, n_grid 128 volume,
# hashmap 2^19) for thousands of steps so docs/benchmark.md can report
# the MEASURED valid-point decay + sustained step rate instead.
#
# Usage: sh scripts/run_recipe_tpu.sh [epochs] [expr_dir]

EPOCHS=${1:-3000}
EXPR=${2:-experiments/ngp_recipe_tpu}
MAX_TRIES=${MAX_TRIES:-3}
cd "$(dirname "$0")/.."

i=0
while [ $i -lt $MAX_TRIES ]; do
    RESUME=None
    if [ -f "$EXPR/checkpoints/latest.ckpt" ]; then
        RESUME="$EXPR/checkpoints/latest.ckpt"
    fi
    echo "=== attempt $((i + 1))/$MAX_TRIES (resume: $RESUME) ==="
    python train.py --configs configs/expr/synthetic_ngp.yaml \
        --name ngp_recipe_tpu --dir.expr_dir "$EXPR" \
        --resume "$RESUME" \
        --progress.epoch "$EPOCHS" \
        --progress.epoch_loss 96 \
        --progress.epoch_val -1 \
        --progress.epoch_save_checkpoint 100000 \
        --progress.save_time 600 \
        --progress.scan_steps 16 \
        --n_rays 4096 \
        --dataset.train.n_imgs 8 \
        --dataset.train.wh "[800,800]" \
        --dataset.val.n_imgs 1 \
        --dataset.val.wh "[128,128]" \
        --model.rays.n_sample 1024 \
        --model.obj_bound.volume.n_grid 128 \
        --model.obj_bound.epoch_optim_warmup 256 \
        --dataset.train.scheduler.dynamic_batch_size.update_epoch 1000000
    rc=$?
    if [ $rc -eq 0 ]; then
        echo "=== training completed (rc=0) ==="
        exit 0
    fi
    echo "=== attempt failed rc=$rc; retrying after backoff ==="
    sleep $((30 * (i + 1)))
    i=$((i + 1))
done
echo "=== giving up after $MAX_TRIES attempts ==="
exit 1
