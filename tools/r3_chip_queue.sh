#!/bin/bash
# Round-3 on-chip experiment queue — STRICTLY one experiment at a time
# (CLAUDE.md: concurrent measurements on the single chip fabricate deltas).
# Run AFTER tools/fullrun.py completes. Each phase appends a JSON line to
# run/r3_queue/<name>.log so results survive session interruptions.
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=run/r3_queue
mkdir -p $OUT

. "$(cd "$(dirname "$0")" && pwd)/queue_lib.sh"

# 1) 256^2 wall: roofline proof, profiler attribution, in-model ablation,
#    mitigations (docs/PERF.md model-scale table, VERDICT r2 item 4)
phase attack_roofline python tools/attack_256.py roofline 8 100
phase attack_trace    python tools/attack_256.py trace 8 100
phase attack_ablate   python tools/attack_256.py ablate 8 100
phase attack_mitigate python tools/attack_256.py mitigate 8 100
phase attack_vmem     env LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
                      python tools/attack_256.py baseline 8 100

# 2) bandwidth-aware sparsity allocation vs MACs/importance-only at equal
#    params (VERDICT r2 item 5)
phase cost_aware python tools/cost_aware_bench.py 0.3 128

# 3) prune the 400M cin256-v2 LDM on-chip end-to-end (VERDICT r2 item 3)
phase ldm400_prune python -m diff_pruning_tpu.cli.ldm_prune \
  --save_path run/r3_queue/ldm400_pruned --sparsity 0.3 --pruner diff-pruning \
  --thr 0.1 --batch_size 6 --ddim_steps 20 --round_to 2 --max_steps 1000

# 3b) pruned vs base cin256-v2 sampling throughput, bs6 20-step CFG: the
#     EXACT programs the prune run itself compiled (sweep sampler = base
#     bs6/20, vis sampler = pruned bs6/20) — cache-warm, so no fresh
#     remote compile. Per-UNet-eval time normalizes against the 250-step
#     0.84 imgs/s baseline row. (A first attempt at bs8/250 sat >75 min in
#     what looked like a slow compile but was the TPU tunnel dying.)
phase ldm400_time_pruned python tools/ldm400_pruned_timing.py \
  run/r3_queue/ldm400_pruned 6 20
phase ldm400_time_base python tools/ldm400_pruned_timing.py cin256-v2 6 20

# 4) final bench refresh
phase bench python bench.py
