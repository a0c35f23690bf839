#!/bin/bash
# Round-4 hardware measurement sweep (VERDICT r3 items 3-5): put numbers
# on the paths round 3 built.  Serial (the TPU tunnel serializes poorly),
# each stage under `timeout` so a pathological Mosaic compile cannot
# wedge the sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/probe_r4.log}
echo "=== round-4 probe sweep $(date) ===" >> "$LOG"

canary() {
  timeout 420 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((512, 512))
f = jax.jit(lambda a: (a @ a).sum())
print('canary ok', f(x), f'{time.time()-t0:.0f}s', flush=True)
" >> "$LOG" 2>&1
}

for i in $(seq 1 12); do
  if canary; then break; fi
  echo "canary attempt $i failed/hung; sleeping 600s" >> "$LOG"
  sleep 600
done

run() {  # run <timeout_s> <label> <cmd...>
  local t=$1 label=$2; shift 2
  echo "--- $label ($(date +%H:%M)) ---" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $label exit=$? ---" >> "$LOG"
}

# 1. Fused implicit (IGCN) train vs XLA module + the --train_sweep path
run 3600 "igcn train fused+sweep" python scripts/probe_igcn_train.py 10 --sweep=4
# 2. Video family: fused Pallas eval + the new fused train path
run 3600 "video pallas eval+train" python scripts/probe_video.py 20 --impl=pallas
# 3. bf16 FAST tier: headline-workload throughput (accuracy ΔP1 in 4.)
run 2400 "bench bf16 tier" env BENCH_PRECISION=bf16 python bench.py
# 4. Precision table incl. the bf16 tier ΔP1
run 2400 "precision probe" python scripts/probe_precision.py
echo "=== sweep done $(date) ===" >> "$LOG"
