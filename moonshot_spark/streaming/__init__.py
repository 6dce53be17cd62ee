from moonshot_spark.streaming.pipeline import (
    read_event_stream,
    stream_events_to_panel,
    stream_sessionize,
    stream_trade_orders,
)

__all__ = ["read_event_stream", "stream_events_to_panel", "stream_sessionize",
           "stream_trade_orders"]
