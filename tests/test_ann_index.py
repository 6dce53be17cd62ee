"""Persisted IVF index (datapipe/ann_index.py): partition-pruned probing
must equal the in-memory ivf_topk bit for bit, appends must equal
rebuilds, and the pruning must be REAL (fewer files scanned, partition
filter in the plan)."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.datapipe.ann_index import (
    append_to_ivf_index, probe_ivf_index, write_ivf_index,
)
from moonshot_spark.datapipe.similarity import (
    ivf_topk, train_ivf_centroids,
)
from moonshot_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def cents(emb):
    return train_ivf_centroids(emb, n_cells=8)


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_probe_matches_in_memory_ivf_topk(spark, emb, cents, tmp_path):
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = probe_ivf_index(spark, path, q, cents, nprobe=3, k=5)
    want = ivf_topk(emb, q, cents, nprobe=3, k=5)
    assert rows(got) == rows(want) and got.count() > 0


def test_append_equals_rebuild(spark, emb, cents, tmp_path):
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    a = emb.where(F.col("vec_id") % 2 == 0)
    b = emb.where(F.col("vec_id") % 2 == 1)
    write_ivf_index(a, cents, inc)
    append_to_ivf_index(b, cents, inc)
    write_ivf_index(emb, cents, full)
    assert rows(spark.read.parquet(inc)) == rows(spark.read.parquet(full))
    # and probing the incrementally-built index equals the in-memory path
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = probe_ivf_index(spark, inc, q, cents, nprobe=2, k=3)
    want = ivf_topk(emb, q, cents, nprobe=2, k=3)
    assert rows(got) == rows(want)


def test_probe_prunes_partitions_on_disk(spark, emb, cents, tmp_path):
    """The scale contract: a probe must NOT read the whole index.  One
    query with nprobe=2 may touch at most 2 of the 8 cell directories,
    and the executed plan must carry the __cell partition filter."""
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    all_files = set(spark.read.parquet(path).inputFiles())
    n_cells_on_disk = len({f.split("__cell=")[1].split("/")[0]
                           for f in all_files})
    assert n_cells_on_disk >= 3   # fixture sanity: pruning is observable

    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding")
    probed = probe_ivf_index(spark, path, q, cents, nprobe=2, k=5)
    probed.count()
    # the index FileScan must carry "__cell IN (<=nprobe values)" as a
    # PARTITION filter (directory-level pruning, not a row filter):
    # inputFiles() reports the unpruned listing, so the plan is the truth
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan_filters = [line.split("PartitionFilters:")[1]
                    for line in plan.split("\n")
                    if "FileScan" in line and "__cell" in line
                    and "PartitionFilters:" in line]
    assert scan_filters, plan[:2000]
    import re
    m = re.search(r"__cell#\d+ IN \(([^)]*)\)", scan_filters[0])
    assert m, scan_filters[0][:300]
    assert len(m.group(1).split(",")) <= 2, m.group(0)
