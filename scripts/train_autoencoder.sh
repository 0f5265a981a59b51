#!/bin/bash
# Train a first-stage autoencoder with the reference recipe
# (models/first_stage_models/*/config.yaml hyperparams: base_lr 4.5e-6,
# Adam(0.5, 0.9), LPIPS + PatchGAN from disc_start).
python -m diff_pruning_tpu.cli.autoencoder_train \
  --preset "${1:-vq-f4}" \
  --dataset "${2:-data/images}" \
  --output_dir "${3:-run/first_stage}" \
  --resolution 256 --train_batch_size 12 \
  --disc_start 50001 --disc_weight 0.75 \
  --lpips "${LPIPS_NPZ:-random}"
