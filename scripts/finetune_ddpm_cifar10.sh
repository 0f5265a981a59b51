#!/bin/bash
# Post-pruning finetune (reference: scripts/finetune_ddpm_cifar10.sh —
# bs128, 100k iters, lr 2e-4, EMA 0.9999, dropout 0.1)
python -m diff_pruning_tpu.cli.ddpm_train \
  --dataset cifar10 \
  --model_path "${1:-run/pruned/ddpm_cifar10_pruned}" \
  --output_dir "${2:-run/finetuned/ddpm_cifar10_pruned}" \
  --train_batch_size 128 --num_iters 100000 \
  --learning_rate 2e-4 --dropout 0.1 --mixed_precision bf16
