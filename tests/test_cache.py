"""Cache tests (reference _tests/test_cache.py patterns: hit, miss,
kwargs-key sensitivity, staleness invalidation)."""

import os
import time

import pytest

from moonshot_spark.sources.cache import Cache


@pytest.fixture()
def cache(tmp_path):
    return Cache(str(tmp_path / "cache"))


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")


def test_miss_then_hit(spark, cache, df):
    kwargs = {"start_date": "2024-01-01", "sids": ["A", "B"]}
    assert cache.get(spark, "prices", kwargs) is None
    cache.set("prices", kwargs, df)
    got = cache.get(spark, "prices", kwargs)
    assert got is not None
    assert sorted(r["id"] for r in got.collect()) == [1, 2]


def test_kwargs_change_is_miss(spark, cache, df):
    cache.set("prices", {"a": 1}, df)
    assert cache.get(spark, "prices", {"a": 2}) is None
    assert cache.get(spark, "other", {"a": 1}) is None


def test_staleness_invalidation(spark, cache, df, tmp_path):
    src = tmp_path / "source.parquet"
    src.write_text("v1")
    kwargs = {"q": 1}
    cache.set("prices", kwargs, df)
    assert cache.get(spark, "prices", kwargs, unless_modified=[str(src)]) is not None
    time.sleep(0.05)
    os.utime(src, (time.time() + 10, time.time() + 10))
    assert cache.get(spark, "prices", kwargs, unless_modified=[str(src)]) is None


def test_clear_by_prefix(spark, cache, df):
    cache.set("prices", {"a": 1}, df)
    cache.set("master", {"a": 1}, df)
    cache.clear("prices")
    assert cache.get(spark, "prices", {"a": 1}) is None
    assert cache.get(spark, "master", {"a": 1}) is not None
