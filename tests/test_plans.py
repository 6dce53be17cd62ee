"""Lookback pruning tests (D24, reference base.py:1050-1086,1146-1181)."""

import datetime
import os

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

    # Q ≈ 66 business days per quarter (reference base.py:1068-1086
    # counts bdays in one period)
    assert get_lookback_window(S()) == 100 + 66


def test_explicit_lookback_window_wins():
    """Reference base.py:1060-1061: LOOKBACK_WINDOW set → returned as-is,
    no *_WINDOW derivation and no interval padding."""
    class S(Moonshot):
        LOOKBACK_WINDOW = 10
        MAVG_WINDOW = 300
        REBALANCE_INTERVAL = "Q"

    assert get_lookback_window(S()) == 10

    class Z(Moonshot):
        LOOKBACK_WINDOW = 0
        MAVG_WINDOW = 300

    assert get_lookback_window(Z()) == 0


def test_lookback_start_date():
    # 235 trading days / 365 calendar days + 10-day buffer
    start = lookback_start_date("2024-06-01", 252)
    expected = datetime.date(2024, 6, 1) - datetime.timedelta(
        days=392 + 10)  # ceil(252*365/235)=392
    assert start == expected


def test_lookback_start_dates_match_reference_pins():
    """The exact start dates the reference's _tests/test_prices.py pins
    (test_set_lookback_window, test_derive_lookback_window_from_window_params,
    test_zero_lookback_window, test_under_one_week_lookback_window,
    test_derive_lookback_window_from_window_and_interval_params)."""
    # default 252 (reference test_prices.py:148)
    class Default(Moonshot):
        pass

    assert str(lookback_start_date(
        "2018-05-01", get_lookback_window(Default()))) == "2017-03-25"

    # explicit LOOKBACK_WINDOW = 350 (reference test_prices.py:260)
    class Explicit(Moonshot):
        LOOKBACK_WINDOW = 350

    assert str(lookback_start_date(
        "2018-05-01", get_lookback_window(Explicit()))) == "2016-10-24"

    # derived max(*_WINDOW) = 100, non-int ignored (reference :364)
    class Derived(Moonshot):
        SOME_WINDOW = 100
        SOME_OTHER_WINDOW = 5
        SOME_NONINT_WINDOW = "foo"

    assert str(lookback_start_date(
        "2018-05-01", get_lookback_window(Derived()))) == "2017-11-16"

    # zero window: no buffer at all (reference :565)
    class Zero(Moonshot):
        LOOKBACK_WINDOW = 0

    assert str(lookback_start_date(
        "2018-05-01", get_lookback_window(Zero()))) == "2018-05-01"

    # under one week: 2-day buffer (reference :663)
    class Short(Moonshot):
        LOOKBACK_WINDOW = 2

    assert str(lookback_start_date(
        "2018-05-01", get_lookback_window(Short()))) == "2018-04-25"

    # window + interval (reference :467 accepts 2017-08-04..07)
    class WindowInterval(Moonshot):
        SOME_WINDOW = 100
        REBALANCE_INTERVAL = "Q"

    got = str(lookback_start_date(
        "2018-05-01", get_lookback_window(WindowInterval())))
    assert got in ("2017-08-04", "2017-08-05", "2017-08-06", "2017-08-07")


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


def test_session_pins_initial_heap(spark, monkeypatch):
    """r13: G1 heap commit/uncommit churn (tiny default -Xms vs burst
    usage) produced multi-second kernel-time stalls inside timed windows
    — the r12 bench-drift root cause (PERF.md r13).  The session factory
    must pin -Xms to the configured driver memory so the heap never
    shrinks/regrows.  Asserts on BEHAVIOR (the computed option string
    and the live session's conf), not on source text (ADVICE r13: the
    old getsource assert could pass on a comment alone)."""
    from moonshot_spark.session import driver_java_options

    # the live session was built through get_spark -> the conf must
    # carry the pin (extraJavaOptions is set at JVM launch; reading it
    # back from the running session proves the .config() call exists)
    opts = spark.conf.get("spark.driver.extraJavaOptions")
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    assert f"-Xms{mem}" in opts

    # user-supplied driver options are preserved, not clobbered
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseG1GC")
    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "8g")
    combined = driver_java_options()
    assert "-XX:+UseG1GC" in combined and "-Xms8g" in combined
    # pre-touch rides the env knob
    monkeypatch.setenv("SPARK_GRAFT_PRETOUCH", "1")
    assert "-XX:+AlwaysPreTouch" in driver_java_options()

    # ADVICE r14: a user-specified -Xms must WIN (HotSpot takes the last
    # occurrence, so the pin must not be appended after it) — same for
    # an explicit AlwaysPreTouch toggle
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_JAVA_OPTS",
                       "-Xms2g -XX:-AlwaysPreTouch")
    combined = driver_java_options()
    assert "-Xms2g" in combined
    assert "-Xms8g" not in combined
    assert "-XX:+AlwaysPreTouch" not in combined
