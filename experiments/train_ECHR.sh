#!/usr/bin/env bash
# Stage 2 — caption generator on GT proposals, warm-started from stage-1 TAP
# (reference: experiments/train_ECHR.sh).
set -e
SST_Name=${1:-SST}
EC_Name=${2:-EC_C3D}

python -m echr_tpu.cli.train \
  --training_mode pre_cg --tap_epoch 0 --cg_epoch 30 --tapcg_epoch 0 \
  --caption_model three_stream --CG_num_layers 3 \
  --other_feature lda --lda_dim 100 \
  --id "${EC_Name}" \
  --CG_input_feats_type '' --CG_init_feats_type '' \
  --video_context_type VL --event_context_type ER3 --clip_context_type CC \
  --learning_rate_decay_start 8 --learning_rate_decay_every 3 \
  --learning_rate_decay_rate 0.5 --min_epoch_when_save 8 --save_all \
  --fast_eval_cg 1 --video_dim 500 --K 256 \
  --pretrain tap --pretrain_path "save/${SST_Name}/model-best.ckpt" \
  --losses_log_every 2000 --save_checkpoint_every 10000 \
  "${@:3}"
