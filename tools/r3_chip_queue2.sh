#!/bin/bash
# Round-3 on-chip queue, part 2: measure the fusion-friendly GroupNorm
# rewrite (models/layers.py) against the part-1 baselines, all scales.
# Run AFTER r3_chip_queue.sh completes; same one-experiment-at-a-time rule.
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=run/r3_queue
mkdir -p $OUT

. "$(cd "$(dirname "$0")" && pwd)/queue_lib.sh"

# new-GN apples-to-apples vs part-1's 1.125 imgs/s LSUN-256 baseline
phase newgn_256 python tools/attack_256.py baseline 8 100
# regression guard at the smaller resolutions (docs/PERF.md scale table:
# CIFAR 95.4, CelebA-64 21.1 imgs/s with the old GN)
phase newgn_32 env ATTACK_RES=32 python tools/attack_256.py baseline 128 100
phase newgn_64 env ATTACK_RES=64 python tools/attack_256.py baseline 128 100
# train-step guard: finetune chunk throughput (bench.py prints it in sub)
phase newgn_bench python bench.py

# DPM-Solver++(2M) serving benchmark: DDIM-100 vs DPM-25/20 throughput +
# dense-reference ODE accuracy proxy (tools/dpm_timing.py docstring)
phase dpm_timing python tools/dpm_timing.py 128 3

# Full serving stack: cost-aware prune x DPM-20, sync + pipelined
# protocols (tools/serving_stack_bench.py docstring)
phase serving_stack python tools/serving_stack_bench.py 0.3 128 3
