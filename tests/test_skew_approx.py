"""Skew utilities + approximate aggregate bounds + hypothesis property test."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.functions.skew import salted_agg, salted_join, with_salt


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i % 7)) for i in range(9000)]
    rows += [(f"k{i}", float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "key string, value double")


def test_salted_agg_matches_plain(spark, skewed):
    plain = {r["key"]: (r["s"], r["n"], r["mx"]) for r in
             skewed.groupBy("key").agg(
                 F.sum("value").alias("s"), F.count("*").alias("n"),
                 F.max("value").alias("mx")).collect()}
    salted = {r["key"]: (r["s"], r["n"], r["mx"]) for r in
              salted_agg(skewed, ["key"],
                         {"s": F.sum("value"), "n": F.count("*"),
                          "mx": (F.max("value"), "max")}).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert salted[k][2] == plain[k][2]
        assert salted[k][0] == pytest.approx(plain[k][0])


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, attr string")
    plain = skewed.join(dim, "key").groupBy("key", "attr").count()
    salted = salted_join(skewed, dim, "key").groupBy("key", "attr").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_with_salt_spreads_hot_key(skewed):
    salts = (with_salt(skewed, 16).where(F.col("key") == "hot")
             .select("__salt").distinct().count())
    assert salts > 4   # hot key spread over many reducers


def test_approx_distinct_within_bounds(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = ev.agg(F.approx_count_distinct("user_id").alias("a"),
                 F.countDistinct("user_id").alias("e")).collect()[0]
    assert abs(got["a"] - got["e"]) / got["e"] < 0.1


def test_hypothesis_rolling_mean_matches_pandas(spark):
    """Property test: rolling_mean(min_periods) matches pandas on random
    series with random null patterns."""
    import math

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moonshot_spark.functions.window import rolling_mean, sid_window

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.one_of(st.none(),
                              st.floats(-1e6, 1e6, allow_nan=False)),
                    min_size=1, max_size=30),
           st.integers(1, 6))
    def check(values, n):
        pdf = pd.DataFrame({
            "sid": "A",
            "date": pd.date_range("2024-01-01", periods=len(values)).date,
            "value": values})
        sdf = spark.createDataFrame(pdf)
        got = (sdf.withColumn("out", rolling_mean("value", n, sid_window()))
               .orderBy("date").collect())
        expected = pd.Series(values, dtype="float64").rolling(n).mean()
        for r, e in zip(got, expected, strict=True):
            if pd.isna(e):
                assert r["out"] is None or math.isnan(r["out"])
            else:
                assert r["out"] == pytest.approx(e, rel=1e-9)

    check()


def test_salted_agg_rejects_bad_combiner(skewed):
    with pytest.raises(ValueError, match="unsupported combiner"):
        salted_agg(skewed, ["key"], {"a": (F.avg("value"), "avg")})
