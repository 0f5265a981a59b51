#!/bin/bash
# Retrieval-augmented sampling (reference: scripts/knn2img.py defaults)
# 1) build the searcher database from CLIP image embeddings:
#    python -m diff_pruning_tpu.cli.train_searcher --images <folder> \
#        --clip_path run/rdm/clip -t run/searchers/mydb
python -m diff_pruning_tpu.cli.knn2img \
  --prompt "${1:-a painting of a virus monster playing guitar}" \
  --model_path "${2:-run/rdm}" \
  --database "${3:-run/searchers/mydb}" \
  --bpe "${BPE:-data/bpe_simple_vocab_16e6.txt.gz}" \
  --outdir outputs/knn2img --use_neighbors --knn 10 \
  --ddim_steps 50 --scale 5.0 --n_samples 2
