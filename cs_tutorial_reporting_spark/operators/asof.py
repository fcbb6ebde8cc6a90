"""[EXT] As-of and range joins — operators Spark lacks natively.

- **as-of join**: for each left row, the most recent right row at or
  before its timestamp, per key. Implemented as the union-window trick:
  tag both sides, sort by (key, ts), carry the last right value forward
  with last_value(ignoreNulls) — one shuffle on the key, no per-group
  Python (``pd.merge_asof`` via applyInPandas is the fallback for
  semantics this can't express, e.g. tolerance windows).
- **range join**: non-equi interval join against a small dimension →
  broadcast nested-loop. At scale, bucketize the range key first so the
  join becomes equi + residual filter (``bucketized_range_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Every left row + the nearest right ``value_cols`` per key:
    ``backward`` = latest right row with right.ts <= left.ts (standard
    merge_asof 'backward' inclusive — right rows at identical ts
    match); ``forward`` = earliest right row with right.ts >= left.ts
    (merge_asof 'forward' inclusive — the next-event attribution
    shape).

    One shuffle either way: both sides union on (key, ts) and a single
    window pass carries values forward (backward asof) or backward
    (forward asof). The mirror is exact: for forward, left rows sort
    BEFORE right rows at equal ts so the frame starting at the current
    row still sees the same-instant right row — the inclusive bound —
    and ``first(ignorenulls)`` over (currentRow, unboundedFollowing)
    picks the earliest following right value.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    l_tag = left.withColumn("__side", F.lit(1)).select(
        key, ts, "__side", *[c for c in left.columns if c not in (key, ts)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        key,
        ts,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in (key, ts)],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at equal ts → inclusive asof
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ]
    else:
        # left rows sort before right rows at equal ts → the frame from
        # the current row forward includes same-instant right rows
        w = (
            Window.partitionBy(key)
            .orderBy(F.col(ts).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = [
            F.first(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ]
    carried = unioned.select("*", *picked)
    return (
        carried.filter(F.col("__side") == 1)
        .drop("__side", *[f"__r_{c}" for c in value_cols])
    )


def range_join_broadcast(
    facts: DataFrame, ranges: DataFrame, value_col: str, lo_col: str, hi_col: str
) -> DataFrame:
    """facts ⋈ ranges ON value ∈ [lo, hi) — dimension side broadcast
    (nested-loop is fine when ranges is small; see bucketized variant)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(ranges), cond, "inner")


def bucketized_range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Scale path: explode each range into the fixed-width buckets it
    overlaps, equi-join on bucket id, residual-filter. Turns the
    nested-loop into a hash join when ranges outgrow broadcast."""
    f = facts.withColumn(
        "__bkt", F.floor(F.col(value_col) / F.lit(bucket_width)).cast("bigint")
    )
    r = ranges.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("bigint"),
                F.floor((F.col(hi_col) - 1e-9) / F.lit(bucket_width)).cast("bigint"),
            )
        ),
    )
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return f.join(r, "__bkt").filter(cond).drop("__bkt")
