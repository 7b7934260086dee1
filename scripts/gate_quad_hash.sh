#!/bin/sh
# Quality gate for HashGridEmbedder.quad_hash (y/z-additive hash on hashed
# levels -> (y, z) corner QUADS share one overlapped row, 2 gather indices
# per point instead of pair's 4; backward scatter index count halves).
#
# Trains the golden-ngp recipe twice (identical seeds/config, only
# quad_hash differs; pair_hash stays on for the non-quad comparison) and
# prints both eval PSNRs. Enable quad_hash by default only if the delta
# is within run-to-run noise (~0.3 dB) — the quad hash trades hash
# uniformity (z AND y additive) for gather coalescing, same protocol as
# scripts/gate_pair_hash.sh.
#
# Runs anywhere; on the TPU it is ~minutes. Usage: sh scripts/gate_quad_hash.sh

cd "$(dirname "$0")/.."
for QH in False True; do
    EXPR=/tmp/gate_quad_hash_$QH
    rm -rf "$EXPR"
    echo "=== quad_hash=$QH ==="
    python train.py --configs configs/expr/synthetic_ngp.yaml \
        --name gate_qh_$QH --dir.expr_dir "$EXPR" \
        --progress.epoch 600 --progress.epoch_loss 200 \
        --progress.epoch_val 600 --progress.epoch_save_checkpoint 1000000 \
        --progress.max_samples_val 4 \
        --dataset.train.n_imgs 10 --dataset.train.wh "[80,80]" \
        --dataset.val.n_imgs 4 --dataset.val.wh "[80,80]" \
        --model.geometry.encoder.hashmap_size 15 \
        --model.geometry.encoder.n_levels 8 \
        --model.geometry.encoder.quad_hash "$QH" \
        --model.obj_bound.volume.n_grid 32 \
        --model.rays.n_sample 64 \
        --n_rays 4096 \
        --dataset.train.scheduler.dynamic_batch_size.update_epoch 1000000 \
        2>&1 | grep -E "epoch |\[val\]" | tail -5
done
