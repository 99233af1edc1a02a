"""Opt-in full-registry mirror of the round driver's correctness gate
(r6 verdict item 8): ``pytest -m mirror`` runs every registry key at
sf0.001 against its DuckDB oracle with the driver's own
order-insensitive value hash — one command, green/red in the test
count. Excluded from the default run via ``addopts`` in pytest.ini
(the sweep costs ~3-4 min on top of the suite).

The sweep shells out to ``scripts/driver_sim.py`` rather than reusing
the session fixtures on purpose: the round driver builds a VANILLA
SparkSession and imports ``__spark_entry__`` from the repo root in a
fresh process, and round 1 failed on exactly the gap between that and
the configured test session (nanosAsLong) — the mirror must reproduce
the driver's conditions, not the suite's.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.mirror
def test_full_registry_mirror_sf0001():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_sim.py"),
         "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    tail = proc.stdout.strip().splitlines()
    summary = next(
        (json.loads(ln) for ln in reversed(tail) if ln.startswith("{")), None
    )
    assert proc.returncode == 0, (
        f"driver_sim rc={proc.returncode}\nsummary={summary}\n"
        f"last lines:\n" + "\n".join(tail[-15:]) + "\nstderr tail:\n"
        + proc.stderr[-1500:]
    )
    assert summary and summary["failures"] == [], summary
