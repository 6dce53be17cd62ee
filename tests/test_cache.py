"""Cache tests (reference _tests/test_cache.py patterns: hit, miss,
kwargs-key sensitivity, staleness invalidation)."""

import os
import time

import pytest
from pyspark.sql import functions as F

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


def test_concurrent_writers_serialize(spark, tmp_path):
    """Two threads set()ing the same key concurrently must serialize via
    the lock file (reference _cache.py:147-151 FileLock): after both
    finish, the entry is a complete, readable write from one of them and
    the lock file is released."""
    import threading

    from moonshot_spark.sources.cache import Cache

    cache = Cache(cache_dir=str(tmp_path / "cc"))
    kwargs = {"q": "same-key"}
    dfs = [spark.range(0, 100).withColumn("writer", F.lit(i))
           for i in range(2)]
    errors = []

    def write(i):
        try:
            cache.set("race", kwargs, dfs[i])
        except Exception as e:  # surfaced below
            errors.append(e)

    threads = [threading.Thread(target=write, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    got = cache.get(spark, "race", kwargs)
    assert got is not None
    rows = got.collect()
    assert len(rows) == 100
    # a complete write from exactly one writer, not an interleaving
    assert len({r["writer"] for r in rows}) == 1
    # lock released and no temp debris
    leftovers = [n for n in os.listdir(tmp_path / "cc")
                 if ".lock" in n or ".tmp-" in n]
    assert leftovers == []


def test_lock_stale_takeover(tmp_path):
    """An abandoned lock (crashed writer) is taken over after
    stale_after; a live one within timeout raises TimeoutError."""
    from moonshot_spark.sources.cache import _FileLock

    lock_path = str(tmp_path / "x.lock")
    # abandoned: pretend it was created long ago
    open(lock_path, "w").write("999")
    old = time.time() - 1000
    os.utime(lock_path, (old, old))
    with _FileLock(lock_path, timeout=1.0, stale_after=300.0):
        pass  # took over the stale lock
    assert not os.path.exists(lock_path)

    # live lock: held now, short timeout -> TimeoutError
    open(lock_path, "w").write("1")
    import pytest as _pt
    with _pt.raises(TimeoutError):
        with _FileLock(lock_path, timeout=0.3, stale_after=300.0):
            pass
