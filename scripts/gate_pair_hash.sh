#!/bin/sh
# Quality gate for HashGridEmbedder.pair_hash (z-additive hash on hashed
# levels -> all levels pair-coalesced, ~2x fewer gather indices).
#
# Trains the golden-ngp recipe twice (identical seeds/config, only
# pair_hash differs) and prints both eval PSNRs. Enable pair_hash by
# default only if the delta is within run-to-run noise (~0.3 dB).
#
# Runs anywhere; on the TPU it is ~minutes. Usage: sh scripts/gate_pair_hash.sh

cd "$(dirname "$0")/.."
for PH in False True; do
    EXPR=/tmp/gate_pair_hash_$PH
    rm -rf "$EXPR"
    echo "=== pair_hash=$PH ==="
    python train.py --configs configs/expr/synthetic_ngp.yaml \
        --name gate_ph_$PH --dir.expr_dir "$EXPR" \
        --progress.epoch 600 --progress.epoch_loss 200 \
        --progress.epoch_val 600 --progress.epoch_save_checkpoint 1000000 \
        --progress.max_samples_val 4 \
        --dataset.train.n_imgs 10 --dataset.train.wh "[80,80]" \
        --dataset.val.n_imgs 4 --dataset.val.wh "[80,80]" \
        --model.geometry.encoder.hashmap_size 15 \
        --model.geometry.encoder.n_levels 8 \
        --model.geometry.encoder.pair_hash "$PH" \
        --model.obj_bound.volume.n_grid 32 \
        --model.rays.n_sample 64 \
        --n_rays 4096 \
        --dataset.train.scheduler.dynamic_batch_size.update_epoch 1000000 \
        2>&1 | grep -E "epoch |\[val\]" | tail -5
done
