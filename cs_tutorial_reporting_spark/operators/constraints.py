"""Engine-enforced table constraints (SURVEY §2.1 K4).

The reference declares PK / UNIQUE / NOT NULL in Postgres DDL
(``rpt.sql:18`` PK dag_id; ``rpt.sql:32-34`` composite PK + uniques;
NOT NULL columns throughout) and relies on the database to reject
violations. Spark tables don't enforce constraints, so the engine makes
them explicit *checks*: a validation pass that returns the violating
keys/rows, run before append (the complement of
``incremental.dedup_against``, which prevents cross-batch PK
violations; this catches intra-batch and data-quality ones).

Scale: each check is one aggregation over the batch — count-based, no
driver-side materialization of violations beyond the returned
DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pk_violations(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Keys a PK'd warehouse table would reject: duplicates AND keys
    with a NULL component (a PK implies NOT NULL on every part).
    Returns (pk..., n_rows) per violating key; NULL-component keys
    surface as their own groups regardless of multiplicity."""
    has_null_key = None
    for c in pk_cols:
        cond = F.col(c).isNull()
        has_null_key = cond if has_null_key is None else (has_null_key | cond)
    return (
        df.groupBy(*pk_cols)
        .agg(F.count("*").alias("n_rows"))
        .filter((F.col("n_rows") > 1) | has_null_key)
    )


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column NULL counts for declared NOT NULL columns — one
    aggregate pass, no per-column jobs. Returns a single row with one
    count per column (0 = clean)."""
    return df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
            for c in cols
        ]
    )


def check_constraints(
    df: DataFrame,
    pk_cols: list[str] | None = None,
    not_null_cols: list[str] | None = None,
) -> DataFrame:
    """One-row constraint report for a batch: violating-PK count and
    total NULLs in NOT NULL columns. A loader gates the append on both
    being zero (the engine-side equivalent of the DDL's guarantees)."""
    parts = []
    if pk_cols:
        parts.append(
            pk_violations(df, pk_cols)
            .agg(F.count("*").alias("pk_violations"))
        )
    if not_null_cols:
        nn = not_null_violations(df, not_null_cols)
        total = sum(
            (F.col(f"nulls_{c}") for c in not_null_cols[1:]),
            F.col(f"nulls_{not_null_cols[0]}"),
        )
        parts.append(nn.select(total.alias("null_violations")))
    if not parts:
        raise ValueError("nothing to check")
    out = parts[0]
    for p in parts[1:]:
        out = out.crossJoin(p)
    return out
