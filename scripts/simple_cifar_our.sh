#!/bin/bash
# One-shot paper pipeline (reference: ddpm_exp/scripts/simple_cifar_our.sh):
# prune at ratio 0.3 with threshold $1, then 100k-step finetune.
python -m diff_pruning_tpu.cli.prune_finetune \
  --model_path "${2:-run/cifar10_base}" --dataset cifar10 \
  --output_dir "run/cifar10_T${1:-0.05}" \
  --pruning_ratio 0.3 --thr "${1:-0.05}"
