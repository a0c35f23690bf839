#!/bin/bash
# End-of-round exec-cache prewarm ritual (README "Executable disk cache
# policy"): run AFTER the final compute-path code change so
# .jax_cache_exec/ holds entries valid for HEAD's fingerprint — the next
# process (e.g. the driver's bench) then deserializes in ~0.2 s instead
# of paying the 300 s remote Mosaic compile.
#
#   scripts/prewarm.sh            # parity pallas entry (the headline)
#   scripts/prewarm.sh --all      # + XLA fallback entry (watchdog path)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="${PYTHONPATH:-/root/repo:/root/.axon_site}"

echo "== prewarm: pallas parity entry =="
timeout 1800 python -u bench.py || exit 1
if [ "${1:-}" = "--all" ]; then
  echo "== prewarm: XLA fallback entry =="
  BENCH_IMPL=xla timeout 1200 python -u bench.py || exit 1
fi
echo "== cache state =="
ls -la .jax_cache_exec/ 2>/dev/null | tail -5
