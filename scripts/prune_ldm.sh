#!/bin/bash
# Prune the class-conditional ImageNet LDM (reference: ldm_exp/run.sh)
python -m diff_pruning_tpu.cli.ldm_prune \
  --model_path "${1:-run/cin256_v2}" \
  --save_path "${2:-run/pruned/ldm_cin256}" \
  --sparsity 0.3 --pruner diff-pruning --thr 0.1
