#!/usr/bin/env bash
# Stage 3 — joint finetune with model proposals, warm-started from stage 2
# (reference: experiments/finetune.sh).
set -e
EC_Name=${1:-EC_C3D}
JT_Name=${2:-SST_EC_C3D}

python -m echr_tpu.cli.train \
  --training_mode cotrain --tap_epoch 0 --cg_epoch 0 --tapcg_epoch 10 \
  --caption_model three_stream --CG_num_layers 3 \
  --other_feature lda --lda_dim 100 \
  --id "${JT_Name}" \
  --CG_input_feats_type '' --CG_init_feats_type '' \
  --video_context_type VL --event_context_type ER3 --clip_context_type CC \
  --lr 1e-6 --learning_rate_decay_start 8 --learning_rate_decay_every 3 \
  --learning_rate_decay_rate 0.5 --min_epoch_when_save 8 --save_all \
  --fast_eval_cg 1 --video_dim 500 --K 256 \
  --pretrain tap_cg --pretrain_path "save/${EC_Name}/model-best.ckpt" \
  --losses_log_every 2000 --save_checkpoint_every 10000 \
  "${@:3}"
