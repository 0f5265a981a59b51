#!/bin/bash
# Latent-diffusion inpainting (reference: scripts/inpaint.py)
python -m diff_pruning_tpu.cli.inpaint \
  --indir "${1:-data/inpainting_examples}" \
  --outdir "${2:-outputs/inpainting}" \
  --model_path "${3:-run/inpainting_big}" --steps 50
