"""global_ffill_with_lag (functions/window.py) == the naive
single-partition-window ffill/lag, bit-for-bit, across month boundaries,
leading nulls, all-null months, and intraday (date, time) grains.

The helper is the scale-safe D17 benchmark path (VERDICT r11 item 6):
month-partitioned ffill + boundary-carry broadcast — these tests pin
that the decomposition is invisible in the output.
"""
import datetime as dt
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _naive(df, order_cols):
    w = Window.partitionBy(F.lit(1)).orderBy(*order_cols)
    filled = F.last("close", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("__f", filled)
    return df.withColumn("__p", F.lag("__f", 1).over(w))


def _collect(df, order_cols, fcol, pcol):
    rows = df.orderBy(*order_cols).collect()
    return [(r[fcol], r[pcol]) for r in rows]


def _make_daily(seed, n_days, p_null):
    rng = random.Random(seed)
    d = dt.date(2023, 10, 15)
    rows = []
    for _ in range(n_days):
        d = d + dt.timedelta(days=rng.choice([1, 2, 3]))  # strictly increasing
        v = None if rng.random() < p_null else round(rng.uniform(10, 99), 2)
        rows.append((d, v))
    return rows


@pytest.mark.parametrize("seed,p_null", [(1, 0.3), (2, 0.95), (3, 0.0)])
def test_daily_matches_naive(spark, seed, p_null):
    from moonshot_spark.functions.window import global_ffill_with_lag

    rows = _make_daily(seed, 120, p_null)   # spans several months
    df = spark.createDataFrame(rows, "date date, close double")
    got = global_ffill_with_lag(df, "close", ["date"], "__f", "__p")
    want = _naive(df, ["date"])
    assert _collect(got, ["date"], "__f", "__p") == \
        _collect(want, ["date"], "__f", "__p")


def test_all_null_month_carries_through(spark):
    """A whole month of nulls must carry the previous month's last value
    into the month after it (the boundary-carry must skip empty-valued
    months, not reset)."""
    from moonshot_spark.functions.window import global_ffill_with_lag

    rows = [(dt.date(2023, 1, 31), 5.0)] + \
        [(dt.date(2023, 2, d), None) for d in (1, 15, 28)] + \
        [(dt.date(2023, 3, 1), None), (dt.date(2023, 3, 2), 7.0)]
    df = spark.createDataFrame(rows, "date date, close double")
    got = global_ffill_with_lag(df, "close", ["date"], "__f", "__p")
    want = _naive(df, ["date"])
    assert _collect(got, ["date"], "__f", "__p") == \
        _collect(want, ["date"], "__f", "__p")
    # and concretely: March 1 ffills to 5.0 across the all-null February
    mar1 = {r["date"]: r["__f"] for r in got.collect()}[dt.date(2023, 3, 1)]
    assert mar1 == 5.0


def test_intraday_grain_matches_naive(spark):
    from moonshot_spark.functions.window import global_ffill_with_lag

    rng = random.Random(7)
    rows = []
    d = dt.date(2024, 1, 25)
    for _ in range(90):
        d = d + dt.timedelta(days=rng.choice([1, 2]))  # one day per step
        for t in ("09:30:00", "12:00:00", "15:30:00"):
            v = None if rng.random() < 0.4 else float(rng.randint(1, 9))
            rows.append((d, t, v))
    df = spark.createDataFrame(rows, "date date, time string, close double")
    got = global_ffill_with_lag(df, "close", ["date", "time"], "__f", "__p")
    want = _naive(df, ["date", "time"])
    assert _collect(got, ["date", "time"], "__f", "__p") == \
        _collect(want, ["date", "time"], "__f", "__p")


def test_no_row_level_single_partition_window(spark):
    """The row-level plan must not contain an unpartitioned/lit-key
    window over the data — only the bounded per-month boundary frame may
    single-partition."""
    from moonshot_spark.functions.window import global_ffill_with_lag

    rows = _make_daily(11, 200, 0.2)
    df = spark.createDataFrame(rows, "date date, close double")
    got = global_ffill_with_lag(df, "close", ["date"], "__f", "__p")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the row-level ffill/lag windows are month-partitioned...
    assert "windowspecdefinition(__period" in plan
    # ...and at most ONE window uses a constant partition key — the
    # cumulative carry over the per-month boundary frame (bounded by the
    # number of months, never row-scale)
    lit_windows = sum(1 for frag in plan.split("windowspecdefinition(")[1:]
                      if frag.split(",")[0].strip().isdigit())
    assert lit_windows <= 1, plan


def test_single_evaluation_reused_exchange(spark):
    """r13: the helper repartitions its input by __period ONCE and both
    consumers (boundary aggregate, main window) hang off that exchange —
    at runtime AQE must materialize the second consumer as a
    ReusedExchange, i.e. the input lineage is computed exactly once.  A
    refactor that breaks the shared-exchange property silently doubles
    the cost of every expensive spine join feeding the helper (the
    pre-r13 behavior)."""
    from moonshot_spark.functions.window import global_ffill_with_lag

    rows = _make_daily(13, 300, 0.25)
    df = spark.createDataFrame(rows, "date date, close double")
    # non-trivial upstream lineage (an aggregate), as at the call sites
    df = df.groupBy("date").agg(F.max("close").alias("close"))
    got = global_ffill_with_lag(df, "close", ["date"], "__f", "__p")
    got.collect()   # AQE reuse materializes only at execution
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
