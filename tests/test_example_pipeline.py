"""The examples/curation_pipeline.py walkthrough stays runnable — it is
the user-facing composition of the whole pillar, so a silent break in
any step's API surfaces here."""

from __future__ import annotations

import pytest

# r12 fast-tier split: this module is SLOW-tier (long fuzz loops /
# integration matrices); run `-m ""` for the full suite.
pytestmark = pytest.mark.slow
import os
import subprocess
import sys


def test_example_pipeline_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "curation_pipeline.py"),
            "/root/testdata/sf0.001",
            "/tmp/ftss_demo_test",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "raw docs:        500" in out.stdout
    assert "export shards:   8" in out.stdout
    # deterministic: the manifest exists and re-reading verifies
    import json

    mf = json.load(
        open("/tmp/ftss_demo_test/train_shards/_manifest.json")
    )
    assert sum(s["n_rows"] for s in mf["shards"].values()) > 0


def test_timeseries_example_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "examples", "timeseries_analytics.py"),
            "/root/testdata/sf0.001",
            "/tmp/ftss_ts_demo_test",
        ],
        capture_output=True,
        text=True,
        timeout=540,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "sessions:" in out.stdout and "rollup cells:" in out.stdout
