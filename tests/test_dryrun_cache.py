"""Staleness guard for the COMMITTED dryrun compile cache (VERDICT r4).

The driver's `dryrun_multichip(8)` run stays inside its external timeout
only because .cache/jax-dryrun is committed pre-warmed (cold compiles take
~9 min — the MULTICHIP_r03 rc:124 incident).  Nothing used to *check* that
the committed cache still covers HEAD's program set; this test does: it
runs the dryrun exactly the way the driver does (subprocess, forced-CPU
env) and asserts the tail reports ZERO cache misses.  A compute-path edit
without `scripts/regen_dryrun_cache.sh` fails here, in-repo, instead of as
a driver timeout.

Marked `slow`: a warm dryrun is ~2 min of cache loads + tiny-shape
executions.  NOTE a run with misses WRITES those entries into the cache
dir (that is how regen works), so on failure the tree holds the fix —
`git add .cache/jax-dryrun` (or run the regen script) and commit.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_committed_dryrun_cache_serves_head_with_zero_misses():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # the driver's skip-the-probe signal
    # drop pytest's in-process jax config: the subprocess must see exactly
    # what the driver's bare invocation sees
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "dryrun", "8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    tail = "\n".join(proc.stdout.splitlines()[-4:])
    assert proc.returncode == 0, (
        f"dryrun failed rc={proc.returncode}\n"
        f"stdout tail:\n{tail}\nstderr tail:\n{proc.stderr[-2000:]}")
    assert "all parity checks passed" in proc.stdout
    stats = [l for l in proc.stdout.splitlines()
             if l.startswith("compile cache:")]
    assert stats, f"no cache-stats tail in dryrun output:\n{tail}"
    assert " 0 misses" in stats[0], (
        "committed .cache/jax-dryrun is STALE for HEAD's compute path — "
        f"the dryrun compiled fresh programs ({stats[0]}).  The just-run "
        "dryrun wrote the missing entries; run scripts/regen_dryrun_cache.sh "
        "(or `git add .cache/jax-dryrun`) and commit.")
