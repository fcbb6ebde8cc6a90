"""[EXT] Pre-flight data diagnostics for shuffle planning.

Before a 100 TB job commits to a join or aggregation key, the question
that decides whether it finishes is "how skewed is this key under hash
partitioning?" — one hot key melts one executor while the rest idle.
``partition_skew_report`` answers it with a single map-side-combined
aggregation over the prospective key: per-hash-partition row counts,
distinct-key counts, and the ratio of each partition to the uniform
share. Ratios near 1.0 → safe to shuffle on the key; a partition at
10× → pre-salt it (operators covered by ``skew_salted_agg``) or lean on
AQE skew-join splitting.

The partition assignment uses the engine's portable 60-bit md5 hash
(``functions.text.hash60``), not Spark's internal ``hash()`` — the
report is then reproducible in any engine (and oracle-checkable),
while remaining a faithful proxy for uniform hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60


def partition_skew_report(
    df: DataFrame, key_col: str | Column, n_partitions: int = 32
) -> DataFrame:
    """Rows, distinct keys, and load ratio per hash partition of
    ``key_col``. ``ratio_to_avg`` is fixed-point (4 decimals) for
    cross-engine float parity; the single window over the tiny
    ``n_partitions``-row aggregate is free."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    part = hash60(key.cast("string")) % n_partitions
    per = df.groupBy(part.alias("partition_id")).agg(
        F.count("*").alias("n_rows"),
        F.countDistinct(key).alias("n_keys"),
    )
    from pyspark.sql import Window

    total = F.sum("n_rows").over(Window.partitionBy())
    return per.select(
        "partition_id",
        "n_rows",
        "n_keys",
        (
            F.floor(F.col("n_rows") * n_partitions / total * 10000) / 10000
        ).alias("ratio_to_avg"),
    )
