"""[EXT] Stream-stream joins — watermark-bounded state on both sides.

The canonical shape is view→click attribution: two live event streams
joined on user with a time-interval condition. Spark buffers both
sides in the state store; the interval condition plus per-side
watermarks let the engine evict state older than
``watermark + horizon`` — without them an inner stream-stream join
buffers forever, which is the #1 stream-join-at-scale mistake. Inner
joins emit eagerly (as soon as a match arrives), so a bounded file
replay drained with ``processAllAvailable`` materializes exactly the
batch join's answer — which is what makes the shape oracle-checkable.

At 100 TB/day the state footprint is bounded by (event rate ×
(watermark + horizon)), independent of history length; keys shard
across executors by the join key like any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each click matches every view by the same
    user in the preceding ``horizon``. Both inputs are streaming
    DataFrames with an event-time ``ts``; watermarks on BOTH sides plus
    the two-sided time bound make the buffered state evictable.

    ``how='inner'`` emits eagerly on match; ``how='left_outer'`` also
    emits never-matched views null-padded — but only once the watermark
    has closed their join window (the engine must be sure no click can
    still arrive), so outer results trail the watermark by design."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.col("user_id"),
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("click_user_id"),
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        F.expr(
            f"""user_id = click_user_id
                AND click_ts >= view_ts
                AND click_ts <= view_ts + interval {horizon}"""
        ),
        how,
    ).select(
        "view_id",
        "click_id",
        "user_id",
        (F.unix_millis(F.col("click_ts")) - F.unix_millis(F.col("view_ts"))).alias(
            "gap_ms"
        ),
    )
