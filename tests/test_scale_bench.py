"""Scale-invariance gate: the heaviest catalog queries must keep their
plan shape and their throughput floor when the data is replicated.

The expensive end-to-end sweep is opt-in (like the full oracle sweep):

    MOONSHOT_SCALE=1 python -m pytest -m scale -q

It replicates the tables 1x/10x with distinct keys (tools/scale_bench)
and fails on any CartesianProduct/BNLJ appearing at the larger scale,
growth in single-partition funnels, or a >20% rows/s drop on a
linear-output query.  The pure plan-string audits below are always-on.
"""
import os

import pytest

from moonshot_spark.plans.audit import (
    plan_shape, shape_regressions, single_partition_funnels,
)

PLAN = """AdaptiveSparkPlan isFinalPlan=true
+- == Final Plan ==
   *(4) Sort [rank ASC NULLS FIRST], true, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=42]
      +- *(3) Project [a, b]
         +- *(3) BroadcastHashJoin [k], [k], Inner, BuildRight
            :- Exchange hashpartitioning(k, 32)
            :  +- Window [sum(v) windowspecdefinition(k, ...)], [k]
            :     +- *(1) ColumnarToRow
            :        +- FileScan parquet [k,v]
            +- BroadcastExchange HashedRelationBroadcastMode
               +- *(2) FileScan parquet [k]
"""


def test_single_partition_funnel_detection():
    offs = single_partition_funnels(PLAN)
    assert offs and offs[0].startswith("Sort"), offs
    # the hash-partitioned Window is NOT a funnel
    assert not any("Window" in o for o in offs), offs


def test_period_boundary_frame_is_exempt():
    """The ``__period`` boundary frame of global_ffill_with_lag is one
    row per month by construction — its single-partition Sort/Window is
    auto-exempt; the same shape on any other key still flags."""
    exempt = PLAN.replace("Sort [rank ASC NULLS FIRST]",
                          "Sort [__period ASC NULLS FIRST]")
    assert single_partition_funnels(exempt) == []
    # shape signature follows the same exemption
    assert plan_shape(exempt)["SinglePartitionFunnels"] == 0
    assert plan_shape(PLAN)["SinglePartitionFunnels"] == 1


def test_plan_shape_counts():
    shape = plan_shape(PLAN)
    assert shape["BroadcastHashJoin"] == 1
    assert shape["CartesianProduct"] == 0
    assert shape["ExchangeSinglePartition"] == 1
    assert shape["SinglePartitionFunnels"] == 1
    # BroadcastExchange is its own (informational) key; "Exchange" counts
    # shuffle exchanges only — the scale-dangerous kind
    assert shape["Exchange"] == 2
    assert shape["BroadcastExchange"] == 1


def test_shape_regressions_flags_dangerous_directions_only():
    small = plan_shape(PLAN)
    large = dict(small)
    large["SortMergeJoin"] = 1
    large["BroadcastHashJoin"] = 0   # AQE flip: legal
    assert shape_regressions(small, large) == []
    large["CartesianProduct"] = 1
    large["SinglePartitionFunnels"] = 2
    issues = shape_regressions(small, large)
    assert any("CartesianProduct" in i for i in issues), issues
    assert any("SinglePartitionFunnels" in i for i in issues), issues


@pytest.mark.scale
@pytest.mark.skipif(not os.environ.get("MOONSHOT_SCALE"),
                    reason="replicated scale bench: set MOONSHOT_SCALE=1")
def test_heavy_queries_scale_invariant():
    from tools.scale_bench import HEAVY_QUERIES, run

    base = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")
    scales = [int(s) for s in os.environ.get(
        "MOONSHOT_SCALE_FACTORS", "1,10").split(",")]
    payload = run(base, scales, list(HEAVY_QUERIES))
    assert not payload["violations"], payload["violations"]


@pytest.mark.scale
@pytest.mark.skipif(not os.environ.get("MOONSHOT_SCALE"),
                    reason="replicated scale bench: set MOONSHOT_SCALE=1")
def test_heavy_queries_survive_hot_key_skew():
    """--skew invariants (VERDICT r9 item 2): one hot key holding ~20%
    of rows must not change plan shape, must not slow any input-driven
    query past 3x its uniform time at the same scale, and must not
    funnel >50% of a heavy stage into one task."""
    from tools.scale_bench import SKEW_QUERIES, run_skew

    base = os.environ.get("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.01")
    scales = [int(s) for s in os.environ.get(
        "MOONSHOT_SCALE_FACTORS", "1,10").split(",")]
    payload = run_skew(base, scales, SKEW_QUERIES)
    assert not payload["violations"], payload["violations"]


def test_merge_preserves_legacy_skew_violations(tmp_path, monkeypatch):
    """ADVICE r13: merging a partial skew run into a SCALE.json whose
    rows predate the 'shape_regs'/'tri_orientation' fields must NOT
    silently retract previously recorded violations for (query, octave)
    cells that were never re-run; re-run cells recompute cleanly."""
    import json

    import tools.scale_bench as sb

    legacy = {
        "base": "b", "scales": [10], "results": {},
        "violations": {},
        "skew": {
            "base": "b", "scales": [10], "hot_fraction": "~20%",
            # legacy row: no shape_regs key at all
            "results": {"q_old": {"10": {"slowdown": 1.0}}},
            "violations": {
                "q_old": ["skew-shape@10x: cartesian appeared"]},
        },
    }
    scale_json = tmp_path / "SCALE.json"
    scale_json.write_text(json.dumps(legacy))
    monkeypatch.setattr(sb, "REPO", str(tmp_path))

    new_skew = {"base": "b", "scales": [50], "hot_fraction": "~20%",
                "results": {"q_new": {"50": {"slowdown": 1.2,
                                             "shape_regs": []}}}}
    merged = sb._merge_payloads(None, new_skew)
    viols = merged["skew"]["violations"]
    # the legacy violation survives, marked as carried
    assert any("cartesian appeared" in v for v in viols.get("q_old", []))
    assert any("carried" in v for v in viols.get("q_old", []))
    # the re-run clean row stays clean
    assert "q_new" not in viols

    # and a RE-RUN of the legacy cell (now with shape fields) retracts it
    rerun = {"base": "b", "scales": [10], "hot_fraction": "~20%",
             "results": {"q_old": {"10": {"slowdown": 1.0,
                                          "shape_regs": []}}}}
    scale_json.write_text(json.dumps(merged))
    merged2 = sb._merge_payloads(None, rerun)
    assert "q_old" not in merged2["skew"]["violations"]
