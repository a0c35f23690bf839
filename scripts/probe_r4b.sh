#!/bin/bash
# Round-4 probe sweep, part 2: HBM-traffic levers for the fused train
# paths (remat / in-kernel-PRNG dropout) + video eval tile sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/probe_r4b.log}
echo "=== round-4b probe sweep $(date) ===" >> "$LOG"

run() {
  local t=$1 label=$2; shift 2
  echo "--- $label ($(date +%H:%M)) ---" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $label exit=$? ---" >> "$LOG"
}

# IGCN fused train: 10.6 ms/solver-iter at b=512 is stash-HBM-bound
# (~117 MB/iter saved across the differentiable scan).  remat trades the
# cross-sweep stash storage for a fwd-kernel replay; prng removes the
# explicit-mask traffic on top.
run 2400 "igcn remat"        python scripts/probe_igcn_train.py 10 --pallas-only --remat
run 2400 "igcn prng(+remat)" python scripts/probe_igcn_train.py 10 --pallas-only --dropout=prng --remat
# Video fused train: the explicit probs mask is ~68 MB/layer/step.
run 2400 "video train prng"  python scripts/probe_video.py 20 --impl=pallas --train-only --dropout=prng
# Video fused eval: block_b sweep (1-layer kernels compile fine grouped,
# unlike the 5-layer frame eval kernel).
run 2400 "video eval bb256"  python scripts/probe_video.py 20 --impl=pallas --eval-only --blockb=256
echo "=== sweep 2 done $(date) ===" >> "$LOG"
