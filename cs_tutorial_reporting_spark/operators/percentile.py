"""Scale-safe EXACT grouped percentiles (two-pass rank computation).

``F.percentile`` is exact but its aggregation buffer materializes every
value of the group inside one merging aggregator — on a low-cardinality
group key (e.g. 3 distinct values over a 100 TB fact table) three
reducers each hold ~1/3 of the table in memory. ``approx_percentile``
fixes the state size but gives up exactness.

This operator keeps exactness with bounded state by computing ranks in
two passes, all built-in:

1. **Histogram**: ``groupBy(group, value).count()`` — a mergeable hash
   aggregate whose partial aggregation collapses each partition to its
   distinct values, and whose shuffle key ``(group, value)`` spreads a
   hot group over the whole cluster.
2. **Rank walk**: a running ``sum(count)`` window over the *histogram*
   (one row per distinct value — orders of magnitude smaller than the
   rows, and the window sort is spill-to-disk external sort, not an
   in-memory buffer), then one ``max(when(...))`` per requested
   percentile picks the two values straddling ``(n-1)·p`` and
   interpolates exactly like ``F.percentile`` / DuckDB
   ``quantile_cont``: ``v_lo + (v_hi − v_lo) · frac``.

The answer is bit-identical to the single-pass exact percentile for
integer-valued inputs (interpolation over integers at p ∈ {.25,.5,.75}
is exact in double), so oracle hash checks carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value: Column,
    percentiles: dict[str, float],
    stddev: str | None = None,
) -> DataFrame:
    """One row per group with a column per entry of ``percentiles``
    (name → p in [0, 1]). ``value`` should be integer-typed (cast/scale
    first — e.g. cents) so cross-engine interpolation is exact.

    ``stddev`` (optional column name) adds the sample stddev of
    ``value`` computed FROM THE HISTOGRAM — the consumer's separate
    stddev scan/shuffle/join folds into this operator's single
    pipeline. Two-pass weighted form (mean via the same per-group
    window, then Σ cnt·(v−mean)²) — numerically stable, no
    catastrophic s2−s1²/n cancellation, and the aggregation state
    stays O(distinct values) like the rank walk."""
    hist = df.groupBy(F.col(group_col), value.alias("__v")).agg(
        F.count("*").alias("__cnt")
    )
    w_run = Window.partitionBy(group_col).orderBy("__v")
    w_all = Window.partitionBy(group_col)
    cols = [
        F.col(group_col),
        F.col("__v"),
        F.col("__cnt"),
        F.sum("__cnt").over(w_run).alias("__cum"),  # values ≤ __v
        F.sum("__cnt").over(w_all).alias("__n"),
    ]
    if stddev is not None:
        cols.append(
            (
                F.sum(F.col("__cnt") * F.col("__v")).over(w_all)
                / F.sum("__cnt").over(w_all)
            ).alias("__mean")
        )
    ann = hist.select(*cols)
    # a histogram row covers sorted 0-based indices [cum−cnt, cum−1]
    first_idx = F.col("__cum") - F.col("__cnt")
    last_idx = F.col("__cum") - 1
    aggs = []
    for name, p in percentiles.items():
        idx = (F.col("__n") - 1) * F.lit(float(p))
        lo = F.floor(idx)
        hi = lo + 1
        v_lo = F.max(F.when((first_idx <= lo) & (lo <= last_idx), F.col("__v")))
        v_hi = F.max(F.when((first_idx <= hi) & (hi <= last_idx), F.col("__v")))
        frac = F.max(idx - lo)
        # frac = 0 → exact hit (v_hi may not exist at the top index)
        aggs.append(
            F.when(frac == 0, v_lo.cast("double"))
            .otherwise(v_lo + (v_hi - v_lo) * frac)
            .alias(name)
        )
    if stddev is not None:
        n = F.max("__n")
        m2 = F.sum(
            F.col("__cnt")
            * (F.col("__v") - F.col("__mean"))
            * (F.col("__v") - F.col("__mean"))
        )
        aggs.append(
            F.when(n > 1, F.sqrt(m2 / (n - F.lit(1)))).alias(stddev)
        )
    return ann.groupBy(group_col).agg(*aggs)
