"""Lookback pruning tests (D24, reference base.py:1050-1086,1146-1181)."""

import datetime

from moonshot_spark import Moonshot
from moonshot_spark.plans.lookback import get_lookback_window, lookback_start_date


def test_default_lookback():
    class S(Moonshot):
        pass

    assert get_lookback_window(S()) == 252


def test_max_of_window_attrs():
    class S(Moonshot):
        SHORT_WINDOW = 50
        LONG_WINDOW = 300

    assert get_lookback_window(S()) == 300


def test_interval_padding():
    class S(Moonshot):
        MAVG_WINDOW = 100
        REBALANCE_INTERVAL = "Q"

    assert get_lookback_window(S()) == 100 + 92


def test_lookback_start_date():
    start = lookback_start_date("2024-06-01", 252)
    # 252 trading days ≈ 365 calendar + 10 buffer
    assert start == datetime.date(2024, 6, 1) - datetime.timedelta(days=375)
    assert lookback_start_date("2024-06-01", 10) \
        == datetime.date(2024, 6, 1) - datetime.timedelta(days=25)


def test_compaction_plan_bins_small_files(spark, tmp_path):
    """20 one-row-ish files must pack into ~total/target bins with the
    next-fit invariant: every bin except possibly the last holds at
    least target_rows once closed."""
    from moonshot_spark.plans.compaction import compaction_plan

    src = str(tmp_path / "small")
    spark.range(100).repartition(20).write.parquet(src)
    plan = compaction_plan(spark, src, target_rows=25).toPandas()
    assert len(plan) == 20
    assert plan.n_rows.sum() == 100
    assert plan.bin.min() == 0 and plan.bin.max() <= 4
    # bins are contiguous in file order
    ordered = plan.sort_values("file").bin.tolist()
    assert ordered == sorted(ordered)


def test_compact_parquet_rewrites_to_fewer_files(spark, tmp_path):
    from moonshot_spark.plans.compaction import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.range(1000).repartition(50).write.parquet(src)
    n = compact_parquet(spark, src, dst, target_rows=500)
    assert n == 2
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    import glob
    assert len(glob.glob(dst + "/part-*")) == 2
