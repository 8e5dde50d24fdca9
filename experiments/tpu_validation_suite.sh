#!/bin/bash
# TPU-return validation suite: run everything that accumulated during the
# tunnel outage, in dependency order, with logs. One chip, one process at
# a time (the chip lock serializes anyway — do NOT parallelize).
#
#   bash experiments/tpu_validation_suite.sh [outdir]
#
# Order rationale:
#  1. quick device sanity (fail fast if the tunnel is still dead)
#  2. Mosaic capability probes — gate interpretation of everything later
#     (bf16 bitcast compile, fat vreg loads, bf16 onehot rate)
#  3. MXU gather A/B (decides _MXU_DENSE / _MXU_MAX_ROWS defaults)
#  4. v3 backward/nablas timing (pending since the round-2 outage)
#  5. bench.py (headline + all detail lines incl. w4 / permuto4 / renders)
#  6. render + train benches at larger shapes
# Each step is timeboxed; a step failing does not stop the rest.

set -u
OUT=${1:-/tmp/tpu_validation}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($*)" | tee -a "$OUT/summary.log"
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  tail -25 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
}

run 00_devices    120  python -c "import jax; print(jax.devices())"
run 01_mosaic     1500 python experiments/mosaic_feature_probe.py
run 02_mxu_gather 3000 python experiments/mxu_gather_probe.py 1024
run 03_bwd_v3     2400 python experiments/kernel_v3_bwd_probe.py 1024
run 04_bench      3000 python bench.py
run 05_render_w4  1800 python experiments/bench_render.py --brick --w4 --mode march_occ_compressed
run 06_train_neus 1800 python experiments/bench_render.py --brick --train --neus
run 07_train_w4   1800 python experiments/bench_render.py --brick --train --neus_w4

echo "ALL DONE — logs in $OUT; update docs/DESIGN.md §3, README perf"
echo "tables, and memory/round1-status.md with the numbers."
