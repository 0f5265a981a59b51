#!/bin/bash
# Diff-Pruning a pretrained DDPM CIFAR-10 (reference: scripts/prune_ddpm_cifar10.sh)
# model_path: converted checkpoint dir (tools/convert_checkpoints.py diffusers|ddim)
python -m diff_pruning_tpu.cli.ddpm_prune \
  --dataset cifar10 \
  --model_path "${1:-run/cifar10_base}" \
  --save_path "${2:-run/pruned/ddpm_cifar10_pruned}" \
  --pruning_ratio 0.3 --batch_size 128 \
  --pruner diff-pruning --thr "${3:-0.05}"
