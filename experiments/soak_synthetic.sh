#!/usr/bin/env bash
# End-to-end soak of the published 3-stage recipe + SCST stage 4 on
# synthetic-learnable data (no ActivityNet assets needed).  This is the
# runner used for the TPU soaks recorded in docs/BENCH_NOTES.md
# (reference recipe: experiments/train_SST.sh -> train_ECHR.sh ->
# finetune.sh; stage 4 exercises the reference's declared-but-broken
# SCST path, train.py:241-245,303-308).
#
# Usage: experiments/soak_synthetic.sh [TAG] [SCST_EPOCHS]
set -e
cd "$(dirname "$0")/.."
TAG=${1:-SOAK3}
SCST_EPOCHS=${2:-9}
# The scripts' reference cadence (save_checkpoint_every 2000) never fires
# on the 64-video synthetic split (an epoch is 64 iterations) — gate every
# 100 iterations instead so best-checkpoint tracking is live.
SYN="--synthetic 1 --synthetic_learnable 1 \
     --save_checkpoint_every 100 --losses_log_every 100"

echo "=== stage 1: TAP pretrain (${TAG}_SST) ==="
time experiments/train_SST.sh "${TAG}_SST" $SYN

echo "=== stage 2: CG on GT proposals (${TAG}_EC) ==="
time experiments/train_ECHR.sh "${TAG}_SST" "${TAG}_EC" $SYN --min_epoch_when_save 2

echo "=== stage 3: joint finetune (${TAG}_JT) ==="
time experiments/finetune.sh "${TAG}_EC" "${TAG}_JT" $SYN --min_epoch_when_save 2

echo "=== stage 4: SCST (${TAG}_RL, ${SCST_EPOCHS} epochs) ==="
time python -m echr_tpu.cli.train \
  --training_mode cotrain --tap_epoch 0 --cg_epoch 0 --tapcg_epoch "${SCST_EPOCHS}" \
  --caption_model three_stream --CG_num_layers 3 \
  --other_feature lda --lda_dim 100 \
  --id "${TAG}_RL" \
  --CG_input_feats_type '' --CG_init_feats_type '' \
  --video_context_type VL --event_context_type ER3 --clip_context_type CC \
  --lr 5e-6 --min_epoch_when_save 0 --save_all \
  --fast_eval_cg 1 --video_dim 500 --K 256 \
  --pretrain tap_cg --pretrain_path "save/${TAG}_JT/model-best.ckpt" \
  --self_critical_after 0 \
  --losses_log_every 2000 --save_checkpoint_every 10000 \
  $SYN
