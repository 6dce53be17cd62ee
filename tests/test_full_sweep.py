"""Driver-coverage insurance: the per-round driver gate checks ~50 of
the catalog's queries; this wraps the FULL oracle sweep
(`tools/check_correctness.py`, the same harness) as a pytest target so a
regression can't hide in the driver-unchecked queries between rounds.

Opt-in (several minutes at sf0.01):

    MOONSHOT_SWEEP=1 python -m pytest -m sweep -q
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.sweep
@pytest.mark.skipif(not os.environ.get("MOONSHOT_SWEEP"),
                    reason="full-catalog sweep: set MOONSHOT_SWEEP=1")
def test_full_catalog_oracle_sweep():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SWEEP",
                            "/root/testdata/sf0.01")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"),
         sf_dir],
        capture_output=True, text=True, timeout=3600)
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"full sweep failed (exit {proc.returncode}):\n{tail}\n{proc.stderr[-2000:]}")
