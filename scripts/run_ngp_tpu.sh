#!/bin/sh
# Full-length NGP training on the tunnel TPU (VERDICT r2 item 3).
#
# r2's attempt died in the remote stride compile (tpu_compile_helper
# SIGKILL/SIGILL after ~20 min, 8 aborted starts, 0 epochs). Mitigations:
#  - pinned ray bucket (dynamic_batch_size off): exactly one step compile
#    and one scan-stride compile for the whole run
#  - time-based latest.ckpt saves (progress.save_time) + automatic retry
#    with --resume on nonzero exit, up to $MAX_TRIES
#
# Usage: sh scripts/run_ngp_tpu.sh [epochs] [expr_dir]

EPOCHS=${1:-5000}
EXPR=${2:-experiments/ngp_tpu_r3}
MAX_TRIES=${MAX_TRIES:-4}
cd "$(dirname "$0")/.."

i=0
while [ $i -lt $MAX_TRIES ]; do
    RESUME=None
    if [ -f "$EXPR/checkpoints/latest.ckpt" ]; then
        RESUME="$EXPR/checkpoints/latest.ckpt"
    fi
    echo "=== attempt $((i + 1))/$MAX_TRIES (resume: $RESUME) ==="
    python train.py --configs configs/expr/synthetic_ngp.yaml \
        --name ngp_tpu_r3 --dir.expr_dir "$EXPR" \
        --resume "$RESUME" \
        --progress.epoch "$EPOCHS" \
        --progress.epoch_loss 160 \
        --progress.epoch_val 2496 \
        --progress.epoch_save_checkpoint 2496 \
        --progress.save_time 600 \
        --progress.scan_steps 16 \
        --n_rays 32768 \
        --dataset.train.n_imgs 24 \
        --dataset.train.wh "[128,128]" \
        --dataset.val.wh "[800,800]" \
        --dataset.val.n_imgs 1 \
        --model.rays.n_sample 128 \
        --model.obj_bound.volume.n_grid 64 \
        --model.obj_bound.epoch_optim_warmup 32 \
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
