#!/bin/bash
# 50k-image DDIM sampling for FID (reference: scripts/sample_ddpm_cifar10_pretrained.sh;
# the 8-GPU torchrun variant collapses into one SPMD program over the TPU mesh)
python -m diff_pruning_tpu.cli.ddpm_sample \
  --model_path "${1:-run/finetuned/ddpm_cifar10_pruned}" \
  --output_dir "${2:-run/samples/ddpm_cifar10}" \
  --batch_size 128 --total_samples 50000 \
  --ddim_steps 100 --skip_type quad --style ddim_exp --use_ema --dtype bfloat16
