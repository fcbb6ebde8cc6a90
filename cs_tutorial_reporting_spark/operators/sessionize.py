"""[EXT] Event sessionization — batch variant.

Classic gap-based sessionization as two windows (no UDF, no state):
lag(ts) per user → new-session flag on gap > timeout → running sum of
flags = session index → session_id = (user_id, session index).

At 100 TB both windows share one hash partitioning on user_id — Spark
executes them in a single shuffle + sort per partition. The streaming
twin (``streaming.sessions``) uses session_window with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign ``session_seq`` (1-based per user) to every event row."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_ms = int(gap_minutes * 60 * 1000)
    ms = F.unix_millis(F.col(ts_col))
    new_session = F.when(
        ms - F.lag(ms).over(w) > gap_ms, 1
    ).otherwise(0)  # first event: lag is NULL → otherwise(0) starts session 1
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One row per session: start/end (ms), event count, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    ms = F.unix_millis(F.col(ts_col))
    return s.groupBy(user_col, "session_seq").agg(
        F.min(ms).alias("session_start_ms"),
        F.max(ms).alias("session_end_ms"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
