"""[EXT] Time-series regularization: hourly gap-fill with linear
interpolation — turning an irregular event stream into the dense,
evenly-spaced series every downstream forecaster/anomaly-detector
assumes.

Shape: one groupBy to the (key, hour) grain, a per-key hour GRID via
``sequence`` + ``explode`` (bounded by the key's observed time span —
never a cross join against a global calendar), a left join of
observations onto the grid, and two window passes (carry the previous
/ next observed point) to interpolate interior gaps. Grid endpoints are
observed by construction (min/max per key), so every missing hour has
both neighbors.

Cross-engine exactness: hourly values snap to FIXED-POINT (×10⁴
bigint) before interpolation; the interpolated value is
``floor(prev + (next-prev)·frac + ½)`` where ``frac`` is a ratio of
hour indices — a single deterministic IEEE expression both engines
evaluate identically — and all downstream sums are plain BIGINT
arithmetic, so the result hash-matches a SQL oracle with no
accumulation-order caveat.

At 100 TB: the grid explode multiplies each key by its span (bounded,
known), shuffles only on the key, and both window passes share the one
(key, hour) sort — no global materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hourly_gapfill_interpolate(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Dense per-key hourly series: observed hours carry the fixed-point
    mean of their values; missing interior hours are linearly
    interpolated between the neighboring observed hours.

    Returns (key, hour, value_fp, is_observed) — ``value_fp`` is the
    ×10⁴ fixed-point bigint value.
    """
    k = F.col(key_col)
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    hourly = (
        events.groupBy(k.alias("__k"), hour)
        .agg(
            F.floor(F.avg(val_col) * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("__v")
        )
    )
    spans = hourly.groupBy("__k").agg(
        F.min("hour").alias("__h0"), F.max("hour").alias("__h1")
    )
    grid = spans.select(
        "__k",
        F.explode(
            F.expr("sequence(__h0, __h1, interval 1 hour)")
        ).alias("hour"),
    )
    g = grid.join(hourly, ["__k", "hour"], "left")
    hi = (F.unix_timestamp("hour") / 3600).cast("bigint")
    g = g.withColumn("__hi", hi)
    obs_hi = F.when(F.col("__v").isNotNull(), F.col("__hi"))
    w_prev = (
        Window.partitionBy("__k")
        .orderBy("__hi")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("__k")
        .orderBy("__hi")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = g.select(
        "__k",
        "hour",
        "__hi",
        "__v",
        F.last("__v", ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(obs_hi, ignorenulls=True).over(w_prev).alias("__ph"),
        F.first("__v", ignorenulls=True).over(w_next).alias("__nv"),
        F.first(obs_hi, ignorenulls=True).over(w_next).alias("__nh"),
    )
    frac = (F.col("__hi") - F.col("__ph")) / (F.col("__nh") - F.col("__ph"))
    interp = F.floor(
        F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac + F.lit(0.5)
    ).cast("bigint")
    return carried.select(
        F.col("__k").alias(key_col),
        "hour",
        F.coalesce(F.col("__v"), interp).alias("value_fp"),
        F.col("__v").isNotNull().alias("is_observed"),
    )
