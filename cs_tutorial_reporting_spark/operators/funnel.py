"""[EXT] Ordered funnel conversion — the product-analytics staple:
how many users progressed view → click → purchase, where each stage
must occur STRICTLY AFTER the user's completion of the previous one.

Relational shape (no session library, no UDF): stage 1 is a
conditional min per key; stage i+1 is a conditional min over events
later than the key's stage-i time — k-1 joins for a k-stage funnel,
each a key-equi join against an aggregate that only SHRINKS (keys
still in the funnel). Greedy earliest-completion matching is optimal
for reachability, and strict ``>`` ordering makes the result
deterministic under same-timestamp ties (a same-instant next-stage
event does NOT count — pinned in tests).

At 100 TB: k is small (3-5); every join keys on the same column, so
after the first shuffle the per-stage aggregates are tiny (≤ distinct
keys) and broadcast; event rows are touched once per stage with the
stage's type filter pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Per-stage reach counts: (stage_idx, stage, n_keys) where
    ``n_keys`` is how many keys completed stages[0..i] in strict
    temporal order."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least two stages")
    spark = events.sparkSession
    # r14 (guide §1.2): each stage aggregate is eagerly checkpointed —
    # without it, stage k's .count() re-derived stages 1..k-1 through
    # the growing lineage (quadratic recompute: 6 stage computations
    # for a 3-stage funnel; A/B best 1.25 → 1.02 s at sf0.1). The
    # checkpointed frame is small (≤ distinct keys still in the
    # funnel) and each stage is now computed exactly once.
    cur = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("__t"))
        .localCheckpoint(eager=True)
    )
    counts = [cur.count()]
    for stage in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == stage)
            .join(cur, key_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(key_col)
            .agg(F.min(ts_col).alias("__t"))
            .localCheckpoint(eager=True)
        )
        counts.append(nxt.count())
        cur = nxt
    return spark.createDataFrame(
        [(i + 1, s, int(c)) for i, (s, c) in enumerate(zip(stages, counts))],
        "stage_idx bigint, stage string, n_keys bigint",
    )
