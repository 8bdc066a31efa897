#!/usr/bin/env bash
# HA-module fine-tuning launch (the reference run.sh operating point:
# res 512, bs 1/device, lr 2.5e-4, wd 0.01, save every 100 steps,
# HA dims 2560/8/8/64, cross_attention fusion).
#
# On a TPU pod, run this once per host; jax.distributed picks up the
# topology from the environment (no accelerate/NCCL launcher needed).

python -m imagharmony_tpu.cli train \
  --pretrained_model_name_or_path "${SDXL_DIR:?set SDXL_DIR to the SDXL checkpoint dir}" \
  --image_encoder_path "${IMAGE_ENCODER_DIR:?set IMAGE_ENCODER_DIR}" \
  --data_json_file "${DATA_JSON:?set DATA_JSON}" \
  --data_root_path "${DATA_ROOT:-}" \
  --output_dir "${OUTPUT_DIR:-runs/harmony}" \
  --resolution 512 \
  --train_batch_size "${BATCH_SIZE:-1}" \
  --learning_rate 2.5e-4 \
  --weight_decay 0.01 \
  --num_train_epochs 2100 \
  --save_steps 100 \
  --composed_inter_dim 2560 \
  --composed_cross_heads 8 \
  --composed_reshape_blocks 8 \
  --composed_cross_value_dim 64 \
  --fusion_method cross_attention \
  --mixed_precision bf16 \
  --resume
