#!/bin/bash
# Poll the axon TPU tunnel until it answers, logging each attempt.
# Usage: bash experiments/tpu_probe_loop.sh [logfile]
# Each probe is timeboxed so a hung backend init never holds the chip lock.
LOG=${1:-/tmp/tpu_probe.log}
while true; do
  ts=$(date -u +%H:%M:%S)
  out=$(timeout 240 python -c "import jax; d=jax.devices(); print('ALIVE', d)" 2>&1 | grep -o 'ALIVE.*' | tail -1)
  echo "$ts ${out:-probe dead/hung}" >> "$LOG"
  case "$out" in
    ALIVE*) echo "$ts TPU BACK" >> "$LOG"; exit 0;;
  esac
  sleep 420
done
