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


def anomaly_hours_exact(
    series: DataFrame,
    key_col: str,
    val_col: str,
    z: int = 3,
) -> DataFrame:
    """Per-key anomaly counts over a fixed-point series WITHOUT floats:
    a point is anomalous when its squared deviation from the key's mean
    exceeds ``z²`` times the population variance — algebraically
    ``(n·v − S)² > z²·(n·Q − S²)`` with S=Σv, Q=Σv², which needs only
    integer arithmetic. Everything runs in wide DECIMAL (the cross
    terms overflow int64 at ~1e19; decimal(38,0) carries the ≤1e22
    magnitudes exactly), so the flags are bit-identical across engines
    — no sqrt, no float mean, no tolerance.

    Shape: one stats aggregate per key + one key join back; a constant
    series has zero variance and zero flags (strict >). Returns
    (key, n_points, n_anomalies).
    """
    d19 = "decimal(19,0)"
    d38 = "decimal(38,0)"
    v = F.col(val_col)
    stats = series.groupBy(key_col).agg(
        F.count("*").alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__q"),  # v ≤ ~5e6 fixed-point → v² fits int64
    )
    j = series.join(stats, key_col)
    lhs = (
        F.col("__n").cast(d19) * v.cast(d19) - F.col("__s").cast(d19)
    ).cast(d19)
    rhs = F.lit(z * z).cast(d19) * (
        F.col("__n").cast(d19) * F.col("__q").cast(d19)
        - F.col("__s").cast(d19) * F.col("__s").cast(d19)
    ).cast(d38)
    flag = (lhs * lhs).cast(d38) > rhs.cast(d38)
    return j.groupBy(key_col).agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
    )
