#!/bin/sh
# Quality gate for the one-hot-matmul coarse-level encoder backward
# (ARCNERF_MM_BWD / _MM_BWD_MAX_R in encoding.py). The matmul runs the
# TPU's default bf16 passes, rounding each coarse-level gradient term to
# bf16 before the f32 accumulation (max rel err ~2e-3 vs the exact
# scatter — scripts/gate_mm_bwd.py). Train the golden-ngp recipe twice
# (identical seeds/config, only the flag differs) and compare eval PSNR;
# keep the default ON only if the delta is within run noise (~0.3 dB).
#
# Usage: sh scripts/gate_mm_bwd.sh   (minutes on the TPU)

cd "$(dirname "$0")/.."
for MM in 0 2048; do
    EXPR=/tmp/gate_mm_bwd_$MM
    rm -rf "$EXPR"
    echo "=== ARCNERF_MM_BWD=$MM ==="
    ARCNERF_MM_BWD=$MM python train.py --configs configs/expr/synthetic_ngp.yaml \
        --name gate_mm_$MM --dir.expr_dir "$EXPR" \
        --progress.epoch 600 --progress.epoch_loss 200 \
        --progress.epoch_val 600 --progress.epoch_save_checkpoint 1000000 \
        --progress.max_samples_val 4 \
        --dataset.train.n_imgs 10 --dataset.train.wh "[80,80]" \
        --dataset.val.n_imgs 4 --dataset.val.wh "[80,80]" \
        --model.geometry.encoder.hashmap_size 15 \
        --model.geometry.encoder.n_levels 8 \
        --model.obj_bound.volume.n_grid 32 \
        --model.rays.n_sample 64 \
        --n_rays 4096 \
        --dataset.train.scheduler.dynamic_batch_size.update_epoch 1000000 \
        2>&1 | grep -E "epoch |\[val\]" | tail -5
done
