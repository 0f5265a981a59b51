#!/bin/bash
# Round-5 pass 5 (final): the endgame queue, reordered for the wall clock
# actually left. Pass 4 put the slim fullrun + cost_quality first, but with
# <80 min to the round deadline those multi-hour resumable phases cannot
# reach a .done — they would eat the whole window and leave NOTHING newly
# documented. This pass runs the SHORT completable measurements first:
#
#   pixelrun                resume/no-op (VERDICT #1 — eval tail)
#   pruned/base rooflines   32² then 64² (VERDICT #4: measured attribution
#                           of the pruned-speedup saturation — the
#                           cost_analysis bytes-vs-flops verdict is the key
#                           number; each phase is one compile + 3 reps)
#   pruned ablations        32² then 64² (per-op sink attribution)
#   attack256 train legs    (VERDICT #3, if the clock allows)
#   fullrun/cost_quality    dead last — only if a miracle of time remains
#
# Logs tee into docs/logs/r5/queue/ at creation time; .done markers shared
# with earlier passes in run/r5_queue. One experiment at a time. No new
# phase starts after DEADLINE so the driver's end-of-round bench.py gets an
# uncontended chip.
#
# Usage: bash tools/r5_chip_queue_pass5.sh [pid-to-wait-for] [deadline-epoch]
set -o pipefail
cd "$(dirname "$0")/.."
OUT=run/r5_queue
LOGDIR=docs/logs/r5/queue
mkdir -p $OUT $LOGDIR
DEADLINE=${2:-$(( $(date +%s) + 4200 ))}

tmo() {
  local want=$1 left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 60 ] && left=60
  [ "$want" -lt "$left" ] && echo "$want" || echo "$left"
}

phase() {  # phase <name> <wanted-timeout-secs> <cmd...>
  local name=$1 want=$2; shift 2
  if [ -f $OUT/$name.done ]; then echo "[queue] $name: done, skip"; return; fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[queue] $name: past deadline, NOT starting (chip left free)"
    return
  fi
  echo "[queue] $name: $*"
  echo "==== $(date '+%F %T') $*" >> $LOGDIR/$name.log
  if timeout "$(tmo "$want")" "$@" 2>&1 | tee -a $LOGDIR/$name.log; then
    touch $OUT/$name.done
  else
    echo "[queue] $name FAILED rc=$? (left without .done for retry)"
  fi
}

if [ -n "$1" ]; then
  echo "[queue] waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

phase pixelrun 14400 python tools/pixelrun.py --out run/pixelrun

# VERDICT #4: pruned-model saturation attribution, shortest first
phase pruned32_roofline 1800 env ATTACK_RES=32 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py roofline 128
phase base32_roofline 1800 env ATTACK_RES=32 \
  python tools/attack_256.py roofline 128
phase pruned64_roofline 1800 env ATTACK_RES=64 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py roofline 128
phase base64_roofline 1800 env ATTACK_RES=64 \
  python tools/attack_256.py roofline 128
phase pruned32_ablate 3600 env ATTACK_RES=32 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py ablate 128
phase pruned64_ablate 3600 env ATTACK_RES=64 ATTACK_PRUNED=0.3 \
  python tools/attack_256.py ablate 128

# VERDICT #3: the 256² train-step attack
phase attack256_train 7200 python tools/attack_train.py attack256_train
phase attack256_mitigate 7200 python tools/attack_train.py attack256_mitigate
phase attack256_vmem 3600 env \
  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
  python tools/attack_train.py attack256_baseline

# VERDICT #9: 203M finetune at 1000-step save cadence
phase ws 3600 python tools/make_cin256_workspace.py run/r5_queue/cin256_ws 8 32
phase ldm400_prune_mag 7200 python -m diff_pruning_tpu.cli.ldm_prune \
  --model_path run/r5_queue/cin256_ws/model \
  --save_path run/r5_queue/ldm400_pruned --sparsity 0.3 --pruner magnitude \
  --round_to 2 --skip_vis
phase ldm400_cadence1000 7200 python tools/ldm400_finetune.py \
  run/r5_queue/ldm400_pruned run/r5_queue/cin256_ws/data \
  run/r5_queue/ldm400_ft1000 --num_iters 2200 --save_every 1000

# VERDICT #2 quality arms: resumable multi-hour work, dead last
phase fullrun_base_slim 7200 python tools/fullrun.py \
  --out run/fullrun_r5cq --base_steps 8000 --data_n 20000 \
  --total_samples 4096 --stop_after basesample_fid_noeval
phase cost_quality 10800 python tools/cost_quality.py \
  --base run/fullrun_r5cq --out run/cost_quality \
  --ft_steps 5000 --fid_n 4096 --ssim_n 1024

echo "[queue] r5 pass-5 complete"
