"""Structured Streaming queries reconciled to batch oracles.

Split from the original single-module catalog; bodies unchanged."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonshot_spark.functions.crosssec import xs_rank, xs_sum, xs_zscore
from moonshot_spark.functions.window import (
    days_since_prev, diff, ffill, pct_change, shift,
)
from moonshot_spark.queries._base import (
    PANEL_SQL, ORACLES, QUERIES, register,
)
from moonshot_spark.sources.parquet import events_to_panel, load_table




# --------------------------------------------------------------------- #
# Structured Streaming: tick stream → OHLCV panel (oracle-checked)      #
# --------------------------------------------------------------------- #

_STREAM_QUERY_SEQ = [0]

_UNLOAD_WARNED = [False]


def _stage_stream_source(path: str) -> str:
    """Stage a parquet table behind a directory of symlinks for the file
    stream source (which watches a directory of arriving files).

    Driver testdata ships each table as a single ``<t>.parquet`` FILE;
    replicated/Spark-written tables are DIRECTORIES of part files.  Link
    whichever shape we got — one link per part file for a directory (the
    10x correctness decade), one link for a plain file.  Same rows
    either way, so driver-SF results are unchanged."""
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_events_")
    src = os.path.abspath(path)
    if os.path.isdir(src):
        parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        for i, f in enumerate(parts):
            os.symlink(os.path.join(src, f),
                       os.path.join(stage, f"part-{i}.parquet"))
    else:
        os.symlink(src, os.path.join(stage, "part-0.parquet"))
    return stage


def _unload_state_stores(spark: SparkSession) -> None:
    """Unload every loaded state-store provider and stop the maintenance
    task (it restarts lazily on the next streaming query start).

    The contract queries run a fresh availableNow stream per invocation
    against a throwaway checkpoint dir.  Without this, each invocation
    leaks its ``spark.sql.shuffle.partitions`` HDFSBackedStateStoreProvider
    instances in the local-mode JVM: their loaded state maps stay pinned
    in the heap and the shared maintenance thread keeps visiting the
    already-rmtree'd checkpoint dirs.  Over a long bench session (the
    243-query driver run constructs each streaming query 3x) that is
    exactly the accumulating state suspected behind the r13
    streaming-family in-run inflation (streaming_dollar_bars 3.57 s
    in-suite vs 1.82 s solo; VERDICT r13 item 2).  Safe here because the
    engine never runs two streams concurrently — contract queries run
    their stream to completion inside the builder.

    CLUSTER-MODE SEMANTICS (VERDICT r14 item 2): this Py4J call reaches
    the StateStore object of the JVM the *driver* runs in.  In
    ``local[*]`` that is the ONLY JVM, so it unloads every provider the
    stream loaded — the complete fix.  On a real cluster, providers
    live in *executor* JVMs, where Spark's own maintenance task already
    unloads providers not referenced by an active query after
    ``spark.sql.streaming.stateStore.maintenanceInterval`` (60 s
    default) — executor-side cleanup is time-bounded by design and
    needs no driver hook; this call is then a harmless no-op on the
    driver's (provider-free) StateStore.  So: complete in local mode,
    redundant-but-safe on a cluster — never the load-bearing mechanism
    there."""
    try:
        (spark._jvm.org.apache.spark.sql.execution.streaming
         .state.StateStore.stop())
    except Exception as exc:  # pragma: no cover - version-drift guard
        # hygiene only — never fail the query; but a renamed/moved JVM
        # class must be OBSERVABLE (ADVICE r14), else the state-store
        # leak silently returns with no signal
        if not _UNLOAD_WARNED[0]:
            _UNLOAD_WARNED[0] = True
            import warnings
            warnings.warn(
                "StateStore.stop() unreachable via Py4J "
                f"({type(exc).__name__}: {exc}); streaming state-store "
                "providers will accumulate in this JVM until session "
                "stop", RuntimeWarning, stacklevel=2)


@register("streaming_ohlcv_panel", f"""
WITH panel AS ({PANEL_SQL})
SELECT sid, date, open, close, high, low, volume FROM panel
""")
def streaming_ohlcv_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OHLCV rollup as an actual Structured Streaming job: file
    source → stateful min_by/max_by aggregation → memory sink, run to
    completion with trigger(availableNow).  The final state must equal
    the batch rollup bit-for-bit (same PANEL_SQL oracle as panel_ohlcv) —
    proving the incremental state-store aggregation implements A2
    first/last-of-day semantics, not just approximating them.  In
    production the source is Kafka and the trigger continuous; the plan
    is identical."""
    import os

    path = os.path.join(sf_dir, "events.parquet")
    sch = spark.read.parquet(path).schema       # ts: long ns OR timestamp[us]
    stage = _stage_stream_source(path)
    stream = spark.readStream.schema(sch).parquet(stage)
    if sch["ts"].dataType.simpleString() != "bigint":
        # µs-timestamp schema: normalize to epoch-ns long so the rollup
        # below is source-schema-agnostic (NTZ→TZ cast exact, tz=UTC)
        stream = stream.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    # a prior invocation's memory-sink table holds a full panel copy in
    # driver memory — drop it (its DataFrame was consumed by then)
    prev = f"__streaming_ohlcv_{_STREAM_QUERY_SEQ[0]}"
    if _STREAM_QUERY_SEQ[0] and spark.catalog.tableExists(prev):
        spark.catalog.dropTempView(prev)
    panel = (stream
             .withColumn("sid", F.col("user_id").cast("string"))
             .withColumn("date", F.to_date(F.timestamp_micros(
                 F.expr("ts div 1000"))))
             .groupBy("sid", "date")
             .agg(F.min_by("value", "ts").alias("open"),
                  F.max_by("value", "ts").alias("close"),
                  F.max("value").alias("high"),
                  F.min("value").alias("low"),
                  F.count("*").cast("double").alias("volume")))
    _STREAM_QUERY_SEQ[0] += 1
    name = f"__streaming_ohlcv_{_STREAM_QUERY_SEQ[0]}"
    q = (panel.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    # the staged symlink dir is fully consumed once the stream terminates
    import shutil
    shutil.rmtree(stage, ignore_errors=True)
    # the memory-sink table is fully materialized; drop the stream's
    # state-store providers before returning (see _unload_state_stores)
    _unload_state_stores(spark)
    return spark.table(name)


# --------------------------------------------------------------------- #
# streaming dollar bars run to completion, reconciled with batch SQL    #
# --------------------------------------------------------------------- #

@register("streaming_dollar_bars", """
WITH ticks AS (
    SELECT CAST(user_id AS VARCHAR) AS sid, ts, value,
           CAST(value AS DECIMAL(18,3)) AS dv
    FROM events
),
cum AS (
    SELECT sid, ts, value,
           coalesce(sum(dv) OVER (PARTITION BY sid ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING),
                    CAST(0 AS DECIMAL(38,3))) AS cum_before
    FROM ticks
),
barred AS (
    SELECT sid, ts, value,
           CAST(floor(cum_before / 5000) AS BIGINT) AS bar_id
    FROM cum
)
SELECT sid, bar_id,
       CAST(count(*) AS BIGINT) AS n_ticks,
       max(value) AS high, min(value) AS low,
       arg_max(value, ts) AS last
FROM barred GROUP BY sid, bar_id
""")
def streaming_dollar_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful streaming dollar-bar operator
    (streaming/stateful.py::stream_dollar_bars) run to completion over
    the tick table and reconciled against the batch SQL: emissions carry
    cumulative per-bar stats, so max_by(emission, batch_id) per
    (sid, bar) must equal the batch bars bit-for-bit — the
    integer-thousandths state matches the oracle's DECIMAL(18,3)
    cumulative exactly.  This is the replayability contract a live
    market-data pipeline needs: restart the stream anywhere and the bars
    converge to the batch answer."""
    import os
    import shutil
    import tempfile

    from moonshot_spark.streaming.stateful import stream_dollar_bars

    path = os.path.join(sf_dir, "events.parquet")
    sch = spark.read.parquet(path).schema
    stage = _stage_stream_source(path)
    out_dir = tempfile.mkdtemp(prefix="stream_dbars_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_dbars_ckpt_")

    stream = spark.readStream.schema(sch).parquet(stage)
    if sch["ts"].dataType.simpleString() == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    ticks = stream.select(F.col("user_id").cast("string").alias("sid"),
                          "ts", "value")

    def write_batch(bdf, batch_id):
        (bdf.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    q = (stream_dollar_bars(ticks, bar_value=5000.0).writeStream
         .foreachBatch(write_batch).outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # unload providers BEFORE deleting their checkpoint root, so the
    # maintenance thread never visits a vanished dir (see
    # _unload_state_stores)
    _unload_state_stores(spark)
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    updates = spark.read.parquet(out_dir)
    final = (updates.groupBy("sid", "bar_id")
             .agg(F.max_by(F.struct("n_ticks", "high", "low", "last"),
                           "batch_id").alias("s"))
             .select("sid", "bar_id", F.col("s.n_ticks").alias("n_ticks"),
                     F.col("s.high").alias("high"),
                     F.col("s.low").alias("low"),
                     F.col("s.last").alias("last")))
    return final
