"""Bucketed panel storage: per-sid window ops must run without an Exchange."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.functions.window import shift, sid_window
from moonshot_spark.sources.bucketing import read_bucketed_panel, write_bucketed_panel
from moonshot_spark.sources.parquet import events_to_panel


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    panel = events_to_panel(spark, "/root/testdata/sf0.001")
    write_bucketed_panel(panel, "panel_bucketed", num_buckets=4)
    yield read_bucketed_panel(spark, "panel_bucketed")
    spark.sql("DROP TABLE IF EXISTS panel_bucketed")


def test_bucketed_window_has_no_exchange(bucketed):
    df = bucketed.withColumn("prev", shift("close", 1, sid_window()))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_has_no_exchange(bucketed):
    df = bucketed.groupBy("sid").agg(F.sum("volume").alias("v"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_values_match_plain(spark, bucketed):
    plain = events_to_panel(spark, "/root/testdata/sf0.001")
    a = {(r["sid"], str(r["date"])): r["close"] for r in bucketed.collect()}
    b = {(r["sid"], str(r["date"])): r["close"] for r in plain.collect()}
    assert a == b
