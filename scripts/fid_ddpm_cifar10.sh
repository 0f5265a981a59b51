#!/bin/bash
# FID vs CIFAR-10 train statistics (reference: fid_score.py usage in README.md:52-56)
python -m diff_pruning_tpu.cli.fid_score "${1:-run/samples/ddpm_cifar10}" "${2:-cifar10}"
