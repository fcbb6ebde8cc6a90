"""[EXT] Row-level snapshot diff — change-data-capture between two
table versions without a CDC log: classify every key as added,
removed, changed, or unchanged by one full-outer join, and report
which columns changed how often.

The column-level complement is ``operators/profile.py`` (distribution
drift); this is the row-level audit a MERGE pipeline runs after the
fact ("yesterday's snapshot vs today's: what did the load actually
do?"), and its output is exactly the input a backfill plan needs.

Shape: ONE full-outer join on the key; change detection compares
md5 over the concatenated non-key columns (computed per side BEFORE
the join, so the join carries key + one 32-char digest per side, not
the wide rows — rule 1 of SCALE.md); per-column change counts come
from comparing the column pairs directly on the joined CHANGED subset
only. All counts are integers — bit-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: NULL-safe canonical encoding of a column for digesting/compare:
#: a nullness tag PREFIXES the value ("0" for NULL, "1"+string
#: otherwise), so no literal string can collide with the NULL encoding
#: — a bare sentinel would (a value equal to the sentinel reads as
#: NULL; pinned in tests)
def _canon(c: str):
    return F.when(F.col(c).isNull(), F.lit("0")).otherwise(
        F.concat(F.lit("1"), F.col(c).cast("string"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """One-row summary: (n_added, n_removed, n_changed, n_unchanged)
    over the key space of both snapshots."""
    def digested(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            *keys,
            F.md5(F.concat_ws("\x01", *[_canon(c) for c in compare_cols]))
            .alias(f"__h_{tag}"),
        )

    j = digested(old, "o").join(digested(new, "n"), keys, "full_outer")
    status = (
        F.when(F.col("__h_o").isNull(), F.lit("added"))
        .when(F.col("__h_n").isNull(), F.lit("removed"))
        .when(F.col("__h_o") != F.col("__h_n"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(status.alias("__s")).agg(
        F.sum(F.when(F.col("__s") == "added", 1).otherwise(0))
        .cast("bigint").alias("n_added"),
        F.sum(F.when(F.col("__s") == "removed", 1).otherwise(0))
        .cast("bigint").alias("n_removed"),
        F.sum(F.when(F.col("__s") == "changed", 1).otherwise(0))
        .cast("bigint").alias("n_changed"),
        F.sum(F.when(F.col("__s") == "unchanged", 1).otherwise(0))
        .cast("bigint").alias("n_unchanged"),
    )


def changed_column_counts(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """(column, n_changed) for keys present in BOTH snapshots — which
    columns the load actually rewrote. The inner join carries only
    keys + the compared columns; counts are one map-combined agg."""
    o = old.select(*keys, *[_canon(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(*keys, *[_canon(c).alias(f"__n_{c}") for c in compare_cols])
    j = o.join(n, keys)
    agg = j.agg(
        *[
            F.sum(
                F.when(F.col(f"__o_{c}") != F.col(f"__n_{c}"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(c)
            for c in compare_cols
        ]
    )
    stack_args = ", ".join(f"'{c}', {c}" for c in compare_cols)
    return agg.selectExpr(
        f"stack({len(compare_cols)}, {stack_args}) as (column, n_changed)"
    )
