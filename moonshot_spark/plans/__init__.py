from moonshot_spark.plans.lookback import get_lookback_window, lookback_start_date

__all__ = ["get_lookback_window", "lookback_start_date"]
