"""[EXT] Time-series regularization: hourly gap-fill with linear
interpolation — turning an irregular event stream into the dense,
evenly-spaced series every downstream forecaster/anomaly-detector
assumes.

Shape (r11 gap-explode): one groupBy to the (key, hour) grain, one
``lead`` window per key, and a per-GAP ``sequence`` + ``explode``
(each observed hour emits the hours up to the next observation,
carrying both interpolation endpoints on the row — bounded by the
key's observed span, never a cross join against a global calendar).
No self-join, no second scan, no unbounded carry windows; grid
endpoints are observed by construction (the first/last observations
emit themselves), so every missing hour has both neighbors.

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

    Shape (r11): GAP-EXPLODE — each observed hour emits the hours
    [this, next-observed) via ``lead`` + ``sequence``, so every
    generated hour carries its interpolation endpoints (this value,
    next value) ON THE ROW. One events scan, one keyed shuffle, one
    window sort — replacing the r6–r10 dataflow (per-key span frame →
    full-grid explode → LEFT JOIN back onto the hourly frame → two
    unbounded carry windows), which consumed the hourly aggregate
    TWICE and therefore scanned events twice (plan-audited at r11;
    the r8 double-evaluation hazard class at the scan level). Measured
    2.24 → 0.83 s at sf0.1 under an aggregate consumer; rows
    bit-identical on the 1.05M-row sf0.1 dense grid
    (test_gapfill_lead_form_equals_join_form pins the old dataflow as
    the reference twin). At 100 TB the saving is one full scan +
    shuffle-join of the dominant input, and the surviving window is a
    bounded lead(1), not two unbounded carries.

    The keyed repartition before the window keeps the r8 fan-out fix:
    the hourly aggregate is small at harness scale, AQE coalesces its
    shuffle to one partition, and the window + explode would otherwise
    pipeline single-task at any cluster width (partition count ×2
    parallelism ≠ the shuffle default so CollapseRepartition cannot
    remove it).

    NULL-valued hours (every event value in the hour is NULL, so the
    fixed-point mean is NULL) are NOT observations: they are filtered
    after the hourly aggregate and treated as gaps — interpolated
    across, ``is_observed = false`` — matching the retired join-form's
    interior semantics (its ignorenulls carry windows skipped them;
    ADVICE r11). Output contract: ``value_fp`` is never NULL. The one
    deliberate divergence from the retired form: a null-valued hour at
    a key's span EDGE no longer extends the grid (the retired form
    emitted those edge hours with NULL values and no endpoints to
    interpolate from; this form's grid spans the first..last USABLE
    observation). Pinned in
    test_gapfill_null_hours_are_gaps_not_observations.
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
        # null-valued hours are gaps, not observations (docstring
        # contract; ADVICE r11) — filtered BEFORE the repartition so
        # they never ride the keyed shuffle
        .filter(F.col("__v").isNotNull())
    )
    hourly = hourly.repartition(
        hourly.sparkSession.sparkContext.defaultParallelism * 2, "__k"
    )
    w = Window.partitionBy("__k").orderBy("hour")
    g = hourly.select(
        "__k",
        F.col("hour").alias("__ph_ts"),
        "__v",
        F.lead("hour").over(w).alias("__nh_ts"),
        F.lead("__v").over(w).alias("__nv"),
    )
    gen = g.select(
        "__k",
        "__ph_ts",
        "__v",
        "__nh_ts",
        "__nv",
        F.explode(
            F.when(
                F.col("__nh_ts").isNull(), F.array(F.col("__ph_ts"))
            ).otherwise(
                F.expr(
                    "sequence(__ph_ts, __nh_ts - interval 1 hour,"
                    " interval 1 hour)"
                )
            )
        ).alias("hour"),
    )
    hi = (F.unix_timestamp("hour") / 3600).cast("bigint")
    ph = (F.unix_timestamp("__ph_ts") / 3600).cast("bigint")
    nh = (F.unix_timestamp("__nh_ts") / 3600).cast("bigint")
    # same deterministic IEEE interpolation expression as the join-form
    # twin (module docstring): a single ratio-of-bigints frac
    frac = (hi - ph) / (nh - ph)
    interp = F.floor(
        F.col("__v") + (F.col("__nv") - F.col("__v")) * frac + F.lit(0.5)
    ).cast("bigint")
    obs = F.col("hour") == F.col("__ph_ts")
    return gen.select(
        F.col("__k").alias(key_col),
        "hour",
        F.when(obs, F.col("__v")).otherwise(interp).alias("value_fp"),
        obs.alias("is_observed"),
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

    Shape (r11): ONE pass — per-key n/S/Q as unbounded window
    aggregates over the key partitioning, then flag + final agg. The
    previous groupBy-stats + join-back dataflow consumed ``series``
    TWICE with no materialization (the r8 double-evaluation hazard
    class): for the registered query the series is the whole gapfill
    pipeline (grid explode + two window sorts), so the join shape
    re-ran all of it — measured 2.85 → 1.77 s at sf0.1, values
    bit-identical (integer sums are order-free). The orderBy-less
    window adds NO exchange when the series is already clustered on
    the key (gapfill's windows are), and at 100 TB evaluating the
    dominant upstream once instead of twice is the real saving.
    A constant series has zero variance and zero flags (strict >).
    Returns (key, n_points, n_anomalies).
    """
    d19 = "decimal(19,0)"
    d38 = "decimal(38,0)"
    v = F.col(val_col)
    w = Window.partitionBy(key_col)
    s = series.select(
        key_col,
        v,
        F.count("*").over(w).alias("__n"),
        F.sum(v).over(w).alias("__s"),
        F.sum(v * v).over(w).alias("__q"),  # v ≤ ~5e6 fp → v² fits int64
    )
    lhs = (
        F.col("__n").cast(d19) * v.cast(d19) - F.col("__s").cast(d19)
    ).cast(d19)
    rhs = F.lit(z * z).cast(d19) * (
        F.col("__n").cast(d19) * F.col("__q").cast(d19)
        - F.col("__s").cast(d19) * F.col("__s").cast(d19)
    ).cast(d38)
    flag = (lhs * lhs).cast(d38) > rhs.cast(d38)
    return s.groupBy(key_col).agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(flag, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
    )


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    order_tiebreak: str,
    window: int = 16,
) -> DataFrame:
    """Trailing exponentially-weighted moving average (α = 1/2) of
    ``val_col`` per key at each key's LATEST event, truncated to the
    last ``window`` events and renormalized:

        ewma = Σ_j 2^-(j+1) · x_{t-j}  /  Σ_j 2^-(j+1),   j = 0..W-1

    — the smoothing primitive the time-series family lacked (gapfill /
    anomaly / seasonal / TWAP are all level-based). Fully INTEGER-
    EXACT (the engine's portable-sketch discipline): values snap to e4
    fixed-point, and the α = 1/2 weight 2^-(j+1) is carried as the
    integer numerator 2^(W-1-j) over the common denominator 2^W, so
    ewma_e4 = Σ x_e4·2^(W-1-j) div Σ 2^(W-1-j) — no float sum, no
    ordering sensitivity, bit-identical on any engine.

    Plan shape (100 TB): an untruncated EWMA is a sequential recurrence
    — not expressible as a distributed window without a quadratic
    RANGE re-evaluation (the skyline lesson, BASELINE.md round-6) or a
    per-key sequential pass. The truncated form needs only the last W
    rows per key: rank/count/max ride ONE key-partitioned window
    exchange, the tail filter keeps W rows per key, and the final
    groupBy reuses the same hash partitioning — one shuffle total, no
    self-join, no window re-evaluation, no Python.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # __last/n_events as WINDOW functions over the same key partition —
    # they ride the rank window's exchange (one scan, one shuffle)
    # instead of a groupBy + self-join that re-derives the rank branch
    wall = Window.partitionBy(key_col)
    ranked = df.select(
        F.col(key_col).alias("__k"),
        F.col(val_col).alias("__x"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wall).alias("n_events"),
    ).withColumn("__last", F.max("__rn").over(Window.partitionBy("__k")))
    tail = ranked.filter(F.col("__rn") > F.col("__last") - window)
    # j = last - rn ∈ [0, W-1]; integer weight numerator 2^(W-1-j)
    # (shift by a COLUMN goes through expr — F.shiftleft takes literal
    # shifts only, round-6 gotcha). x_e4 ≤ ~1e7, numerator ≤ 2^15,
    # W terms: the sum stays far inside BIGINT.
    xe4 = "CAST(floor(__x * 10000 + 0.5) AS BIGINT)"
    wnum = f"shiftleft(CAST(1 AS BIGINT), {window} - 1 - (__last - __rn))"
    return (
        tail.groupBy("__k")
        .agg(
            F.first("n_events").alias("n_events"),
            F.expr(f"sum({xe4} * {wnum})").alias("__num"),
            F.expr(f"sum({wnum})").alias("__den"),
        )
        .select(
            F.col("__k").alias(key_col),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr("CAST(__num div __den AS BIGINT)").alias("ewma_e4"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
) -> DataFrame:
    """Single change-point estimate per key via the CUSUM statistic
    (Page 1954; the binary-segmentation step): over the hourly series
    x_t, the deviation sum C_t = Σ_{i≤t}(x_i − μ̂) peaks at the hour
    the level shifted, so the estimate is argmax_t |C_t|. Carried
    INTEGER-EXACT by clearing the mean's denominator: with H hours and
    S = Σx (both integers after e4 value snapping),
    H·C_t = H·cum_t − t·S — no float mean, no tolerance, identical on
    any engine. Returns (key, n_hours, cp_hour_ms, max_abs_cusum)
    where max_abs_cusum is in e4·H-scaled units (a RANKING statistic —
    compare within a key, not across keys with different H).

    One shuffle to the hourly grid, then ONE window pass per key
    computes rank, running sum, and the partition totals together; the
    argmax is a top-1 window. The final hour always lands at C_H = 0
    and never wins ties (strict ordering on |C| desc, hour asc).
    """
    from pyspark.sql import Window

    hourly = (
        df.select(
            F.col(key_col).alias("__k"),
            F.date_trunc("hour", F.col(ts_col)).alias("__h"),
            F.expr(
                f"CAST(floor({val_col} * 10000 + 0.5) AS BIGINT)"
            ).alias("__xe4"),
        )
        .groupBy("__k", "__h")
        .agg(F.sum("__xe4").alias("__x"))
    )
    w = Window.partitionBy("__k").orderBy("__h")
    wall = Window.partitionBy("__k")
    scanned = hourly.select(
        "__k",
        "__h",
        F.row_number().over(w).alias("__t"),
        F.sum("__x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "__cum"
        ),
        F.count("*").over(wall).alias("__hh"),
        F.sum("__x").over(wall).alias("__s"),
    ).select(
        "__k",
        "__h",
        "__hh",
        (
            F.col("__hh") * F.col("__cum") - F.col("__t") * F.col("__s")
        ).alias("__c"),
    )
    wtop = Window.partitionBy("__k").orderBy(
        F.abs(F.col("__c")).desc(), F.col("__h").asc()
    )
    return (
        scanned.withColumn("__rn", F.row_number().over(wtop))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__k").alias(key_col),
            F.col("__hh").cast("bigint").alias("n_hours"),
            F.expr("unix_millis(__h)").alias("cp_hour_ms"),
            F.abs(F.col("__c")).cast("bigint").alias("max_abs_cusum"),
        )
    )
