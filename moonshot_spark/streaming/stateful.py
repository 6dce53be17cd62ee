"""Custom stateful streaming operator via applyInPandasWithState.

A running **position tracker**: consumes an order stream (sid, account,
action, quantity) and maintains net position state per (sid, account),
emitting the updated position on every change.  This is the stateful
primitive the reference's live-trading loop lacks (it re-reads positions
from the broker each run, base.py:1760-1772) — here position state lives in
the Spark state store with exactly-once updates.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

POSITION_STATE_SCHEMA = StructType([StructField("net_quantity", LongType())])

POSITION_OUTPUT_SCHEMA = StructType([
    StructField("sid", StringType()),
    StructField("account", StringType()),
    StructField("net_quantity", LongType()),
    StructField("n_fills", LongType()),
])


def track_positions(order_stream: DataFrame) -> DataFrame:
    """Stateful running positions per (sid, account).

    Input stream columns: sid, account, action ('BUY'/'SELL'),
    total_quantity.  Output: one row per group per trigger with the updated
    net position and fills-in-batch count.
    """
    def update(key, pdfs, state: GroupState):
        sid, account = key
        net = state.get[0] if state.exists else 0
        n = 0
        for pdf in pdfs:
            signed = pdf.apply(
                lambda r: r["total_quantity"]
                if r["action"] == "BUY" else -r["total_quantity"], axis=1)
            net += int(signed.sum())
            n += len(pdf)
        state.update((net,))
        import pandas as pd
        yield pd.DataFrame([{"sid": sid, "account": account,
                             "net_quantity": net, "n_fills": n}])

    return (order_stream
            .groupBy("sid", "account")
            .applyInPandasWithState(
                update,
                outputStructType=POSITION_OUTPUT_SCHEMA,
                stateStructType=POSITION_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


ANOMALY_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s1", DoubleType()),
    StructField("s2", DoubleType()),
])

ANOMALY_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("zscore", DoubleType()),
    StructField("n_seen", LongType()),
])


def detect_anomalies(events: DataFrame, z_threshold: float = 3.0,
                     min_history: int = 10) -> DataFrame:
    """Streaming per-key anomaly detector: flags events whose value is
    more than ``z_threshold`` running standard deviations from the key's
    running mean, using Welford-style (n, Σx, Σx²) state — O(1) state per
    key regardless of stream length, the canonical
    ``applyInPandasWithState`` pattern for "score each event against
    history".

    Scoring uses the state as of BEFORE each batch (events inside one
    batch share a baseline — deterministic for batch-equivalence tests);
    keys with fewer than ``min_history`` prior events emit nothing.
    Output: the anomalous events only, with their z-score.
    """
    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        n, s1, s2 = state.get if state.exists else (0, 0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            vals = pdf["value"].to_numpy(dtype="float64")
            if n >= min_history:
                mean = s1 / n
                var = max((s2 - s1 * s1 / n) / (n - 1), 0.0)
                std = float(np.sqrt(var))
                if std > 0:
                    z = (vals - mean) / std
                    mask = np.abs(z) > z_threshold
                    if mask.any():
                        hit = pdf.loc[mask, ["user_id", "ts", "value"]].copy()
                        hit["zscore"] = z[mask]
                        hit["n_seen"] = n
                        out.append(hit)
            n += len(vals)
            s1 += float(vals.sum())
            s2 += float((vals * vals).sum())
        state.update((n, s1, s2))
        if out:
            yield pd.concat(out)

    return (events
            .select("user_id", "ts", F.col("value").cast("double"))
            .groupBy("user_id")
            .applyInPandasWithState(
                update,
                outputStructType=ANOMALY_OUTPUT_SCHEMA,
                stateStructType=ANOMALY_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


_MILLI = Decimal("0.001")


def value_millis(vals) -> "list[int]":
    """Integer thousandths of each double via the SAME decimal path as
    Spark's CAST(double AS DECIMAL(18,3)): shortest decimal repr
    (Double.toString == Python repr), then scale-3 HALF_UP
    (away-from-zero).  np.rint(v*1000) is NOT equivalent — it rounds the
    binary product half-to-even, which disagrees near .0005 boundaries
    (ADVICE r5); this helper is the bit-exactness contract between
    stream_dollar_bars and the batch dollar_bars query."""
    return [int(Decimal(repr(float(v)))
                .quantize(_MILLI, rounding=ROUND_HALF_UP).scaleb(3))
            for v in vals]

DOLLAR_BAR_STATE_SCHEMA = StructType([
    StructField("cum_millis", LongType()),   # traded value in thousandths
    StructField("open_bar", LongType()),     # bar id currently open
    StructField("open_n", LongType()),       # its ticks so far
    StructField("open_high", DoubleType()),
    StructField("open_low", DoubleType()),
    StructField("open_last", DoubleType()),
])

DOLLAR_BAR_OUTPUT_SCHEMA = StructType([
    StructField("sid", StringType()),
    StructField("bar_id", LongType()),
    StructField("n_ticks", LongType()),
    StructField("high", DoubleType()),
    StructField("low", DoubleType()),
    StructField("last", DoubleType()),
])


def stream_dollar_bars(tick_stream: DataFrame,
                       bar_value: float = 5000.0) -> DataFrame:
    """Streaming dollar bars: the stateful counterpart of the batch
    ``dollar_bars`` query.  Per sid, the cumulative traded value carries
    across micro-batches in the state store (held as an integer count of
    value-thousandths — the same exactness discipline as the batch
    DECIMAL(18,3) column, so batch and stream agree bit-for-bit on bar
    assignment), the open bar's partial aggregates ride the state too,
    and each trigger emits CUMULATIVE stats for every bar it touched —
    so the last emission per (sid, bar) equals the batch result exactly.
    Ticks must arrive in event order within a sid (upstream
    watermark+sort or per-key ordered source), the usual contract for
    cumulative state.

    Input stream columns: sid, ts, value.  Output: per (sid, bar)
    updates with tick count and high/low/last.
    """
    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (sid,) = key
        if state.exists:
            cum, open_bar, open_n, open_hi, open_lo, open_last = state.get
        else:
            cum, open_bar, open_n = 0, -1, 0
            open_hi, open_lo, open_last = float("-inf"), float("inf"), None
        import numpy as np

        # emissions carry CUMULATIVE per-bar stats: a bar is only ever
        # touched while open, so the LAST emission for a (sid, bar) is
        # its exact final state — reconcilable with the batch query.
        # Vectorized: integer cumsum of value-thousandths assigns bar
        # ids for the whole batch at once (bit-identical to the per-tick
        # loop — int64 addition is associative).
        bars: dict[int, dict] = {}
        unit = int(Decimal(repr(bar_value))
                   .quantize(_MILLI, rounding=ROUND_HALF_UP).scaleb(3))
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            if not len(pdf):
                continue
            vals = pdf["value"].to_numpy(dtype=np.float64)
            millis = np.array(value_millis(vals), dtype=np.int64)
            cum_before = cum + np.concatenate(
                ([0], np.cumsum(millis[:-1])))
            ids = cum_before // unit
            cum = int(cum_before[-1] + millis[-1])
            for bar_id in np.unique(ids):
                sel = ids == bar_id
                bv = vals[sel]
                n, hi, lo, last = (int(sel.sum()), float(bv.max()),
                                   float(bv.min()), float(bv[-1]))
                if int(bar_id) == open_bar:
                    n += open_n
                    hi = max(hi, open_hi)
                    lo = min(lo, open_lo)
                open_bar, open_n = int(bar_id), n
                open_hi, open_lo, open_last = hi, lo, last
                bars[int(bar_id)] = {"n_ticks": n, "high": hi,
                                     "low": lo, "last": last}
        state.update((cum, open_bar, open_n, open_hi, open_lo, open_last))
        if bars:
            yield pd.DataFrame([
                {"sid": sid, "bar_id": k, "n_ticks": b["n_ticks"],
                 "high": b["high"], "low": b["low"], "last": b["last"]}
                for k, b in sorted(bars.items())])

    return (tick_stream
            .groupBy("sid")
            .applyInPandasWithState(
                update,
                outputStructType=DOLLAR_BAR_OUTPUT_SCHEMA,
                stateStructType=DOLLAR_BAR_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
