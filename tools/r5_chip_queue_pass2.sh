#!/bin/bash
# Round-5 pass 2: the cost-aware QUALITY comparison (VERDICT r4 next #2).
# Pass 1's cost_quality phase failed fast because its input — the round-4
# fullrun base (run/fullrun_r4: 30k-step scratch CIFAR base + 50k seed-0
# FID set + 1024 seed-42 grid) — lived under gitignored run/ and did not
# survive the machine restart. Rebuild it with the fullrun orchestrator's
# base-only mode (the same recipe that produced it in round 4), then run
# the two-arm prune/finetune/sample/eval comparison.
# STRICTLY one experiment at a time (CLAUDE.md).
set -eo pipefail
cd "$(dirname "$0")/.."
OUT=run/r5_queue
mkdir -p $OUT docs/logs/r5

. "$(cd "$(dirname "$0")" && pwd)/queue_lib.sh"

phase fullrun_base timeout 14400 python tools/fullrun.py \
  --out run/fullrun_r4 --stop_after basesample_fid
phase cost_quality2 timeout 14400 python tools/cost_quality.py \
  --base run/fullrun_r4 --out run/cost_quality

echo "[queue] r5 pass-2 complete"
