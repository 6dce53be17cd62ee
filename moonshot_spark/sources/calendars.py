"""Exchange-calendar status source (S8 — reference base.py:739-762).

The reference resolves the live signal date through
``quantrocket.master.list_calendar_statuses``: if the exchange is closed,
signals come from the date the exchange was last open (``since``); if open,
from "today" in the exchange's timezone.  Spark-native, the calendar is a
tiny spine table — one row per exchange:

    (exchange string, status string, since timestamp/string, timezone string)

``make_calendar_service`` turns that table (or a plain dict for tests/
static configs) into the callable seam ``Moonshot.calendar_service``
expects.  The table is driver-collected per lookup — it is bounded by the
number of exchanges in the world, never by data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CalendarError(ValueError):
    pass


def make_calendar_service(calendars):
    """Build a ``calendar_service`` callable: exchange → status dict.

    ``calendars`` is either a Spark DataFrame with columns
    (exchange, status, since, timezone) or a dict of
    ``{exchange: {"status": ..., "since": ..., "timezone": ...}}``.
    Returns a callable suitable for ``Moonshot.calendar_service``.
    """
    if isinstance(calendars, dict):
        def service(exchange: str) -> dict:
            try:
                return calendars[exchange]
            except KeyError:
                raise CalendarError(
                    f"no calendar status for exchange {exchange!r}")
        return service

    if isinstance(calendars, DataFrame):
        def service(exchange: str) -> dict:
            rows = (calendars.where(F.col("exchange") == exchange)
                    .select("status", "since", "timezone").collect())
            if not rows:
                raise CalendarError(
                    f"no calendar status for exchange {exchange!r}")
            return rows[0].asDict()
        return service

    raise TypeError(
        "calendars must be a DataFrame or dict, got "
        f"{type(calendars).__name__}")
