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


def grouped_ols_slope(
    events: "DataFrame",
    key_col: str = "user_id",
    ts_col: str = "ts",
    y_col: str = "value",
    min_points: int = 5,
) -> "DataFrame":
    """Per-key OLS trend slope (y vs time-in-days) via grouped-map
    ``applyInPandas`` — the Arrow batch path for per-group model fitting
    that SQL aggregates can't express in general (here the linear case
    IS SQL-expressible via regr_slope, which makes this operator
    oracle-checkable while standing in for arbitrary per-group fits).

    Two-pass centered formula in float64: slope = Σ(x-x̄)(y-ȳ)/Σ(x-x̄)².
    At 100 TB: one hash shuffle on the key; each group's fit is
    in-memory vectorized NumPy; state is O(group), not O(total).
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[ts_col].astype("int64") / 86400e9  # datetime64[ns] → days
        y = pdf[y_col].astype("float64")
        xc = x - x.mean()
        sxx = float((xc * xc).sum())
        slope = float((xc * (y - y.mean())).sum()) / sxx if sxx > 0 else None
        return pd.DataFrame(
            {"key": [pdf[key_col].iloc[0]], "slope": [slope], "n": [len(pdf)]}
        )

    out_schema = f"key bigint, slope double, n bigint"
    return (
        events.select(key_col, ts_col, y_col)
        .groupBy(key_col)
        .applyInPandas(fit, out_schema)
        .filter(F.col("n") >= min_points)
        .withColumnRenamed("key", key_col)
    )
