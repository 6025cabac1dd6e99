"""Run the driver-sweep replica (tools/driver_replica.py) as a test.

A SUBPROCESS is essential: the conftest session's JVM/context would leak
engine confs into any session built in-process, defeating the purpose —
reproducing the driver's VANILLA session (ANSI on, 200 partitions).

Default scope is the first-50 sweep window at sf0.01 — the exact set and
scale the external driver records in CORRECTNESS_r{N}.json.  Set
SPARK_GRAFT_REPLICA_ALL=1 for all 93.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import REPO_ROOT, SF_ORACLE


def test_driver_sweep_window_green_on_vanilla_session():
    limit = "0" if os.environ.get("SPARK_GRAFT_REPLICA_ALL") else "50"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "tools", "driver_replica.py"),
            "--sf-dir",
            SF_ORACLE,
            "--limit",
            limit,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO_ROOT,
    )
    lines = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, f"no output; stderr tail: {proc.stderr[-2000:]}"
    summary = lines[-1]
    bad = [ln for ln in lines[:-1] if not ln.get("ok")]
    assert proc.returncode == 0 and not summary.get("failed"), (
        f"driver replica red: {bad[:5]} (of {len(bad)}); "
        f"stderr tail: {proc.stderr[-1000:]}"
    )
