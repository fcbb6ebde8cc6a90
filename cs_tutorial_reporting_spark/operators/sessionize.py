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

    r14 (guide §4.2): the grouped map runs over HASH BUCKETS of the
    key, not single keys — one key per call meant one Python dispatch
    plus a 1-row pandas frame per key (the per-group overhead was ~5x
    the math; A/B best 5.04 → 1.01 s at sf0.1). Each bucket's batch is
    reduced per key with vectorized NumPy (stable key sort +
    ``np.add.reduceat`` segment sums — same two-pass centered float64
    formula, per-group summation order is the batch arrival order
    either way; the oracle contract is round(slope, 4), tri-SF
    verified). Keys are complete within a bucket (hash partitioning).
    At 100 TB: one hash shuffle on the bucket key; per-task state is
    O(bucket) and the bucket count scales with the shuffle-partition
    setting, so batches stay bounded.
    """
    import numpy as np
    import pandas as pd

    # enough buckets that each shuffle partition sees a few Arrow
    # batches, scale-adaptive via the session's shuffle parallelism
    buckets = max(
        64, int(events.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )

    def fit_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf[key_col].to_numpy()
        order = np.argsort(key, kind="stable")
        key = key[order]
        x = (pdf[ts_col].astype("int64").to_numpy() / 86400e9)[order]
        y = pdf[y_col].astype("float64").to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        counts = np.diff(np.r_[starts, len(key)])
        xm = np.add.reduceat(x, starts) / counts
        ym = np.add.reduceat(y, starts) / counts
        xc = x - np.repeat(xm, counts)
        yc = y - np.repeat(ym, counts)
        sxx = np.add.reduceat(xc * xc, starts)
        sxy = np.add.reduceat(xc * yc, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            # NaN (sxx == 0) crosses the Arrow boundary as NULL, same
            # as the old per-key path's None
            slope = np.where(sxx > 0, sxy / sxx, np.nan)
        return pd.DataFrame(
            {"key": key[starts], "slope": slope, "n": counts.astype("int64")}
        )

    out_schema = "key bigint, slope double, n bigint"
    return (
        events.select(key_col, ts_col, y_col)
        .groupBy(F.pmod(F.xxhash64(key_col), F.lit(buckets)).alias("__b"))
        .applyInPandas(lambda _k, pdf: fit_bucket(pdf), out_schema)
        .filter(F.col("n") >= min_points)
        .withColumnRenamed("key", key_col)
    )
