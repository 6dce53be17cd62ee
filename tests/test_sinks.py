"""Results/orders sink tests: partitioned writes + partition-pruned reads."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.sources.sinks import read_results, write_orders, write_results


def test_results_roundtrip_partition_pruning(spark, tmp_path):
    rows = [("Return", "A", "2024-01-01", 0.01), ("Weight", "A", "2024-01-01", 0.5),
            ("Return", "B", "2024-01-01", -0.02), ("Signal", "B", "2024-01-01", 1.0)]
    results = spark.createDataFrame(
        rows, "field string, sid string, date string, value double") \
        .withColumn("date", F.col("date").cast("date"))
    path = str(tmp_path / "results")
    write_results(results, path)

    back = read_results(spark, path, fields=["Return"])
    assert back.count() == 2
    assert {r["field"] for r in back.collect()} == {"Return"}
    # partition pruning visible in the plan: only the Return partition read
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "field=Return" in plan or "PartitionFilters" in plan, plan


def test_orders_append_by_trade_date(spark, tmp_path):
    orders = spark.createDataFrame(
        [("A", "U1", "BUY", "x", 10)],
        "sid string, account string, action string, order_ref string, "
        "total_quantity long")
    path = str(tmp_path / "orders")
    write_orders(orders, path, trade_date="2024-06-01")
    write_orders(orders, path, trade_date="2024-06-02")
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert {str(r["trade_date"]) for r in back.collect()} == \
        {"2024-06-01", "2024-06-02"}


def test_results_roundtrip_all_formats(spark, tmp_path):
    from moonshot_spark.sources.sinks import (
        RESULT_FORMATS, read_results_as, write_results_as)

    df = spark.createDataFrame(
        [("Return", "A", 0.01), ("Return", "B", -0.02),
         ("Weight", "A", 0.5)],
        "field string, sid string, value double")
    for fmt in RESULT_FORMATS:
        p = str(tmp_path / fmt)
        write_results_as(df, p, fmt=fmt)
        back = read_results_as(spark, p, fmt=fmt, fields=["Return"])
        rows = {(r["sid"], round(r["value"], 6)) for r in back.collect()}
        assert rows == {("A", 0.01), ("B", -0.02)}, fmt
