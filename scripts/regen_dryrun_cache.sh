#!/usr/bin/env bash
# Regenerate the COMMITTED dryrun compile cache (.cache/jax-dryrun).
#
# Why it exists: the driver runs `dryrun_multichip(8)` under an external
# timeout; cold GSPMD compiles of the full program set take ~9 min on this
# machine (the MULTICHIP_r03 rc:124 incident), so the cache is committed and
# must be regenerated whenever the compute path changes.  The dryrun tail
# and tests/test_dryrun_cache.py both assert misses == 0, so a stale cache
# fails loudly — this script is the one-command fix.
#
# Usage: scripts/regen_dryrun_cache.sh            # from anywhere
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== wiping .cache/jax-dryrun and recompiling cold (budget ~10 min) =="
rm -rf .cache/jax-dryrun
JAX_PLATFORMS=cpu python __graft_entry__.py dryrun 8

echo "== warm verification run (must report 0 misses) =="
out=$(JAX_PLATFORMS=cpu python __graft_entry__.py dryrun 8 2>&1 | tail -3)
echo "$out"
echo "$out" | grep -q " 0 misses" || {
    echo "ERROR: warm dryrun still compiled — cache is not deterministic?" >&2
    exit 1
}

git add -A .cache/jax-dryrun
echo "== staged; commit with: git commit -m 'Regenerate dryrun compile cache' =="
