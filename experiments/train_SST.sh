#!/usr/bin/env bash
# Stage 1 — TAP pretraining (reference: experiments/train_SST.sh).
set -e
SST_Name=${1:-SST}

python -m echr_tpu.cli.train \
  --training_mode pre_tap --tap_epoch 5 --cg_epoch 0 --tapcg_epoch 0 \
  --caption_model show_attend_tell --CG_num_layers 3 \
  --other_feature lda --lda_dim 100 \
  --id "${SST_Name}" \
  --CG_input_feats_type '' --CG_init_feats_type '' \
  --video_context_type VL --event_context_type ER3 --clip_context_type CC \
  --learning_rate_decay_start 10 --learning_rate_decay_every 5 \
  --learning_rate_decay_rate 0.5 --min_epoch_when_save 0 --save_all \
  --fast_eval_cg 1 --video_dim 500 --K 256 \
  --losses_log_every 2000 --save_checkpoint_every 2000 \
  "${@:2}"
