"""Gap-based sessionization — the classic event-stream op, JVM-only.

A new session starts when a user's inter-event gap exceeds
``gap_seconds``. Two window passes over ONE shuffle (both windows share
the (user, time) partitioning+ordering, so Catalyst plans a single
exchange + sort): lag() finds the gap, a running sum of the new-session
flags numbers the sessions. Deterministic under the (ts, id) tie-break.

At scale this is the batch twin of Structured Streaming's
``session_window`` aggregation; the batch form is what training-data
pipelines run over historical event logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds ``session_id`` (1-based per user, in time order)."""
    order = [F.col(ts_col), F.col(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    # NTZ timestamps cast via TIMESTAMP (direct NTZ->long is rejected);
    # the session-tz offset cancels in the difference
    as_secs = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_session = F.when(
        prev_ts.isNull()
        | ((as_secs(F.col(ts_col)) - as_secs(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_id", F.sum(new_session).over(running)
    )
