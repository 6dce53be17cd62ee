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


def test_hypothesis_asof_join_matches_merge_asof(spark):
    """Property: asof_join == pandas merge_asof for random frames across
    direction x tolerance x exact-match settings."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moonshot_spark.operators.asof import asof_join

    @settings(max_examples=8, deadline=None)
    @given(
        lts=st.lists(st.integers(0, 200), min_size=1, max_size=12,
                     unique=True),
        rts=st.lists(st.integers(0, 200), min_size=1, max_size=8,
                     unique=True),
        direction=st.sampled_from(["backward", "forward"]),
        tol=st.sampled_from([None, 10, 50]),
        exact=st.booleans(),
    )
    def check(lts, rts, direction, tol, exact):
        left = spark.createDataFrame([("k", t, float(t)) for t in lts],
                                     "k string, t long, lv double")
        right = spark.createDataFrame([("k", t, float(t) * 10) for t in rts],
                                      "k string, t long, rv double")
        got = {r["t"]: r["rv"]
               for r in asof_join(left, right, on="t", by="k",
                                  value_cols=["rv"], direction=direction,
                                  tolerance=tol,
                                  allow_exact_matches=exact).collect()}
        lpdf = pd.DataFrame({"k": "k", "t": sorted(lts)})
        lpdf["lv"] = lpdf["t"].astype(float)
        rpdf = pd.DataFrame({"k": "k", "t": sorted(rts)})
        rpdf["rv"] = rpdf["t"].astype(float) * 10
        expect = pd.merge_asof(lpdf, rpdf, on="t", by="k",
                               direction=direction, tolerance=tol,
                               allow_exact_matches=exact)
        for _, row in expect.iterrows():
            g = got[row["t"]]
            if pd.isna(row["rv"]):
                assert g is None, (direction, tol, exact, row["t"])
            else:
                assert g == row["rv"], (direction, tol, exact, row["t"])

    check()


def test_hypothesis_pack_bins_partition_property(spark):
    """Property: sequence packing partitions every doc's tokens exactly
    once per lang — bin token sums equal the corpus token count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from moonshot_spark.datapipe.packing import pack_stats

    @settings(max_examples=6, deadline=None)
    @given(docs=st.lists(
        st.tuples(st.sampled_from(["en", "de"]),
                  st.integers(1, 60)),
        min_size=1, max_size=25))
    def check(docs):
        rows = [(i, lang, " ".join(f"t{j}" for j in range(n)))
                for i, (lang, n) in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        stats = pack_stats(df, budget=16)
        got = {r["lang"]: r["total"] for r in
               stats.groupBy("lang").agg(
                   F.sum("n_tokens").alias("total")).collect()}
        expect = {}
        for lang, n in docs:
            expect[lang] = expect.get(lang, 0) + n
        assert got == expect

    check()
