#!/bin/bash
# LSUN-256 pipeline from an lmdb database (reference:
# ddpm_exp/configs/{church,bedroom}.yml + prune/finetune scripts).
# Build an lmdb from any image folder with tools/make_lsun_lmdb.py, or point
# directly at an original LSUN *_lmdb directory (pure-Python reader — the
# lmdb C library is not required).
LMDB="${1:-data/lsun/church_outdoor_train_lmdb}"
BASE="${2:-run/lsun256_base}"
python -m diff_pruning_tpu.cli.ddpm_prune \
  --dataset "lsun:${LMDB}" \
  --model_path "${BASE}" \
  --save_path "${3:-run/pruned/ddpm_lsun256}" \
  --pruning_ratio 0.3 --batch_size 16 \
  --pruner diff-pruning --thr "${4:-0.01}"
python -m diff_pruning_tpu.cli.ddpm_train \
  --dataset "lsun:${LMDB}" \
  --model_path "${3:-run/pruned/ddpm_lsun256}" \
  --output_dir "${5:-run/finetuned/ddpm_lsun256}" \
  --train_batch_size 16 --num_iters 500000 \
  --learning_rate 2e-5 --dropout 0.0 --mixed_precision bf16
