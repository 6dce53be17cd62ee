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


def test_latest_sweep_artifact_covers_registry():
    """The newest local sweep JSON must contain EVERY registered query —
    the round-7 judge found two queries that landed after the final
    sweep refresh and were absent from the round's own artifacts.  This
    pin makes a lagging sweep a visible failure: re-run
    tools/check_correctness.py --json after the last catalog commit."""
    import glob
    import json

    import __spark_entry__ as entry_mod

    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_local_*.json")),
                   key=os.path.getmtime)
    assert files, "no local sweep artifact found — run the sweep"
    newest = files[-1]
    with open(newest) as f:
        sweep = json.load(f)
    swept = set(sweep["queries"])
    registered = set(entry_mod.queries())
    missing = sorted(registered - swept)
    assert not missing, (
        f"{newest} lags the registry by {len(missing)} queries "
        f"(e.g. {missing[:5]}); refresh the sweep after the last "
        "catalog commit")
