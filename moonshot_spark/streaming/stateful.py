"""Custom stateful streaming operator via applyInPandasWithState.

A running **position tracker**: consumes an order stream (sid, account,
action, quantity) and maintains net position state per (sid, account),
emitting the updated position on every change.  This is the stateful
primitive the reference's live-trading loop lacks (it re-reads positions
from the broker each run, base.py:1760-1772) — here position state lives in
the Spark state store with exactly-once updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
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
