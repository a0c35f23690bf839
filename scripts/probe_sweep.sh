#!/bin/bash
# Sequential hardware probe sweep. Waits for the remote-compile service to
# recover (canary compile), then runs the pending probes one at a time
# (never concurrently — the TPU tunnel serializes poorly). Each stage is
# under `timeout` so a pathological compile cannot wedge the sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/probe_sweep.log}
echo "=== probe sweep $(date) ===" >> "$LOG"

canary() {
  timeout 420 python -c "
import time, jax, jax.numpy as jnp
t0=time.time()
x = jnp.ones((512, 512))
f = jax.jit(lambda a: (a @ a).sum())
print('canary ok', f(x), f'{time.time()-t0:.0f}s', flush=True)
" >> "$LOG" 2>&1
}

# Wait (up to ~3 h) for the service to answer a trivial compile quickly.
for i in $(seq 1 18); do
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

run 1200 "eval g=1 control"        python scripts/probe_blockb.py 25 --blocks=128 --group=1
run 1500 "eval g=4"                python scripts/probe_blockb.py 25 --blocks=128 --group=4
run 1800 "eval g=17 vmem=100"      python scripts/probe_blockb.py 25 --blocks=128 --group=17 --vmem=100
run 1800 "eval b=256 vmem=100"     python scripts/probe_blockb.py 25 --blocks=256 --group=1 --vmem=100
run 1800 "igcn fused vs module"    python scripts/probe_igcn.py 20
run 1800 "train sweep tiles 64/32 vmem=100" python scripts/probe_train_kernel.py 10 --bf=64 --bb=32 --grp=17 --vmem=100 --sweep=8
echo "=== sweep done $(date) ===" >> "$LOG"
