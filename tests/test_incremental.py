"""Incremental panel maintenance: split the tick stream arbitrarily, merge
the partial rollups, and the result must equal the full recomputation."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.sources.incremental import aggregate_ticks, merge_panels
from moonshot_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").cache()


def panel_dict(df):
    return {(r["sid"], r["date"]):
            (r["open"], r["close"], r["high"], r["low"], r["volume"])
            for r in df.collect()}


def test_merge_equals_full_recompute(events):
    full = panel_dict(aggregate_ticks(events))
    # arbitrary split: interleaved event ids (worst case — every day's data
    # straddles both batches)
    part1 = aggregate_ticks(events.where(F.col("event_id") % 2 == 0))
    part2 = aggregate_ticks(events.where(F.col("event_id") % 2 == 1))
    merged = panel_dict(merge_panels(part1, part2))
    assert merged == full


def test_merge_disjoint_dates_passthrough(events):
    """Keys touched by only one side pass through unchanged."""
    early = aggregate_ticks(events.where(F.dayofmonth("ts") <= 10))
    late = aggregate_ticks(events.where(F.dayofmonth("ts") > 10))
    merged = panel_dict(merge_panels(early, late))
    full = panel_dict(aggregate_ticks(events))
    assert merged == full


def test_merge_is_associative(events):
    a = aggregate_ticks(events.where(F.col("event_id") % 3 == 0))
    b = aggregate_ticks(events.where(F.col("event_id") % 3 == 1))
    c = aggregate_ticks(events.where(F.col("event_id") % 3 == 2))
    left = panel_dict(merge_panels(merge_panels(a, b), c))
    right = panel_dict(merge_panels(a, merge_panels(b, c)))
    assert left == right
