#!/bin/bash
# Round-5 on-chip experiment queue — STRICTLY one experiment at a time
# (CLAUDE.md: concurrent measurements on the single chip fabricate deltas;
# the single host CPU core makes even a concurrent pytest poison timings).
# Covers VERDICT r4 next #1 (LDM pixel pipeline), #2 (cost-aware quality),
# #3 (256-sq train attack), #4 (pruned saturation attribution), and #9
# (save-cadence). Logs tee under run/r5_queue/ AND each tool's own
# docs/logs/r5/ tee (the evidence-retention rule).
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=run/r5_queue
mkdir -p $OUT docs/logs/r5

. "$(cd "$(dirname "$0")" && pwd)/queue_lib.sh"

# 1) FLAGSHIP: the CompVis LDM workflow end-to-end in PIXEL space with a
#    scratch-trained vq-f4 first stage (VERDICT #1). Internally resumable.
phase pixelrun timeout 14400 python tools/pixelrun.py --out run/pixelrun

# 2) cost-aware pruning quality at equal params (VERDICT #2) — reuses the
#    r4 scratch-trained 35.75M base + its 50k procedural set
phase cost_quality timeout 14400 python tools/cost_quality.py \
  --base run/fullrun_r4 --out run/cost_quality

# 3) the 256-sq train step attack (VERDICT #3)
phase attack256_train timeout 7200 python tools/attack_train.py \
  attack256_train
phase attack256_mitigate timeout 7200 python tools/attack_train.py \
  attack256_mitigate
phase attack256_vmem timeout 3600 env \
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  python tools/attack_train.py attack256_baseline

# 4) pruned-model saturation attribution (VERDICT #4): the attack_256
#    protocol ON the 30%-pruned CIFAR and CelebA-64 programs
phase pruned32_roofline timeout 3600 env ATTACK_RES=32 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py roofline 128
phase pruned32_ablate timeout 5400 env ATTACK_RES=32 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py ablate 128
phase base32_roofline timeout 3600 env ATTACK_RES=32 \
  python tools/attack_256.py roofline 128
phase pruned64_roofline timeout 3600 env ATTACK_RES=64 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py roofline 128
phase pruned64_ablate timeout 5400 env ATTACK_RES=64 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py ablate 128
phase base64_roofline timeout 3600 env ATTACK_RES=64 \
  python tools/attack_256.py roofline 128

# 5) 203M finetune save-cadence leg (VERDICT #9): rebuild the workspace
#    (CPU init), magnitude-prune to the 203M shape (no sweep needed — the
#    save cost depends on the snapshot size, not the allocation), then one
#    finetune leg at the reference's 1000-step cadence
phase ws python tools/make_cin256_workspace.py run/r5_queue/cin256_ws 8 32
phase ldm400_prune_mag timeout 7200 python -m diff_pruning_tpu.cli.ldm_prune \
  --model_path run/r5_queue/cin256_ws/model \
  --save_path run/r5_queue/ldm400_pruned --sparsity 0.3 --pruner magnitude \
  --round_to 2 --skip_vis
phase ldm400_cadence1000 timeout 7200 python tools/ldm400_finetune.py \
  run/r5_queue/ldm400_pruned run/r5_queue/cin256_ws/data \
  run/r5_queue/ldm400_ft1000 --num_iters 2200 --save_every 1000

# 6) headline bench for the round record
phase bench timeout 7200 python bench.py

echo "[queue] r5 queue complete"
