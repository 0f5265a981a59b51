#!/bin/bash
# Round-5 pass 3: the remainder of the r5 queue, reordered by VERDICT r4
# priority. Pass 1 ran pixelrun first but would have hit cost_quality
# (which needs the restart-wiped run/fullrun_r4) before rebuilding it, and
# parked the rebuild (pass 2) after everything else — so the #2-priority
# quality measurement risked running out of round. This pass chains, after
# the in-flight pixelrun process exits:
#   fullrun_base -> cost_quality (VERDICT #2)
#   attack256_*               (VERDICT #3)
#   pruned/base rooflines     (VERDICT #4)
#   ldm400 save-cadence leg   (VERDICT #9)
#   bench                     (round record)
# .done markers in run/r5_queue are shared with pass 1, so completed
# phases are skipped. STRICTLY one experiment at a time (CLAUDE.md).
#
# Usage: bash tools/r5_chip_queue_pass3.sh [pid-to-wait-for]
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=run/r5_queue
mkdir -p $OUT docs/logs/r5

. "$(cd "$(dirname "$0")" && pwd)/queue_lib.sh"

# wait for pass 1's in-flight pixelrun (one experiment at a time)
if [ -n "$1" ]; then
  echo "[queue] waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

# re-invoke pixelrun: internally resumable, so this is a no-op fast-path
# when the in-flight run completed, and a resume if it timed out
phase pixelrun timeout 14400 python tools/pixelrun.py --out run/pixelrun

# VERDICT #2: rebuild the wiped r4 fullrun base, then the two-arm
# cost-aware quality comparison
phase fullrun_base timeout 14400 python tools/fullrun.py \
  --out run/fullrun_r4 --stop_after basesample_fid
phase cost_quality2 timeout 14400 python tools/cost_quality.py \
  --base run/fullrun_r4 --out run/cost_quality

# VERDICT #3: the 256-sq train step attack
phase attack256_train timeout 7200 python tools/attack_train.py \
  attack256_train
phase attack256_mitigate timeout 7200 python tools/attack_train.py \
  attack256_mitigate
phase attack256_vmem timeout 3600 env \
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  python tools/attack_train.py attack256_baseline

# VERDICT #4: pruned-model saturation attribution
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

# VERDICT #9: 203M finetune at the reference's 1000-step save cadence
phase ws python tools/make_cin256_workspace.py run/r5_queue/cin256_ws 8 32
phase ldm400_prune_mag timeout 7200 python -m diff_pruning_tpu.cli.ldm_prune \
  --model_path run/r5_queue/cin256_ws/model \
  --save_path run/r5_queue/ldm400_pruned --sparsity 0.3 --pruner magnitude \
  --round_to 2 --skip_vis
phase ldm400_cadence1000 timeout 7200 python tools/ldm400_finetune.py \
  run/r5_queue/ldm400_pruned run/r5_queue/cin256_ws/data \
  run/r5_queue/ldm400_ft1000 --num_iters 2200 --save_every 1000

# headline bench for the round record
phase bench timeout 7200 python bench.py

echo "[queue] r5 pass-3 complete"
