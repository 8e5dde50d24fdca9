#!/bin/bash
# Round-3 chip queue: runs AFTER bench.py finishes (chip is process-
# exclusive — never run concurrently with another TPU process).
#
#   bash experiments/round3_chip_queue.sh [outdir]
#
# Order: hardware A/B probes that decide kernel defaults, then the render
# breakdown that directs renderer tuning, then train-to-quality artifacts
# (wall-clock vs the StreetSurf RTX3090 anchor).

set -u
OUT=${1:-/tmp/round3_chip}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($*)" | tee -a "$OUT/summary.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -30 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
}

run 01_breakdown   3600 python experiments/render_breakdown.py 8192 32768
run 02_train_nerf  3600 python examples/train_nerf_synthetic.py \
    --brick --iters 2000 --rays 4096 --out "$OUT/nerf_run"
run 03_train_neus  5400 python examples/train_neus_object.py \
    --w4 --iters 2000 --rays 2048 --out "$OUT/neus_run"
run 04_mxu_gather  3000 python experiments/mxu_gather_probe.py 1024
run 05_mosaic      1500 python experiments/mosaic_feature_probe.py

echo "ALL DONE — update docs/DESIGN.md §3, README perf tables, PERF doc."
