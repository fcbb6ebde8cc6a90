"""[EXT] Table profiling and snapshot drift detection — the data-
quality observability layer: per-column row/null/distinct counts and
min/max, and the diff of two snapshots' profiles (yesterday's load vs
today's) that catches schema rot and distribution drift before a
consumer does.

Everything is a plain aggregation: one pass over the table computes
every column's stats (multiple ``count(distinct)`` in one agg — the
optimizer expands them; k columns is a fixed small factor, not a
scan per column), and the per-column layout comes from unpivoting the
single stats row with ``stack`` — no second scan. Min/max are carried
as strings so one report schema serves every column type, with the
ORIGINAL type's ordering (cast happens after the agg).

All outputs are integers and strings — bit-exact cross-engine, so
profile and drift queries hash-match SQL oracles.

At 100 TB: the profile is one map-combined aggregation (the distinct
counts are the expensive part — swap in approx_count_distinct when
exactness isn't the contract); the drift diff joins two
column-cardinality-sized profiles — trivially small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_s, max_s) per profiled
    column — one aggregation pass, unpivoted via ``stack``."""
    if not cols:
        raise ValueError("profile_table needs at least one column")
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__null_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_null, n_distinct, min_s, max_s)",
    ).select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_null",
        "n_distinct",
        "min_s",
        "max_s",
    )


def profile_drift(
    old: DataFrame, new: DataFrame, cols: list[str]
) -> DataFrame:
    """Diff of two snapshots' profiles per column: row/null/distinct
    deltas plus whether the observed [min, max] range moved — the
    drift report a nightly load gates on."""
    po = profile_table(old, cols).select(
        "column",
        F.col("n_rows").alias("rows_old"),
        F.col("n_null").alias("null_old"),
        F.col("n_distinct").alias("nd_old"),
        F.col("min_s").alias("min_old"),
        F.col("max_s").alias("max_old"),
    )
    pn = profile_table(new, cols).select(
        "column",
        F.col("n_rows").alias("rows_new"),
        F.col("n_null").alias("null_new"),
        F.col("n_distinct").alias("nd_new"),
        F.col("min_s").alias("min_new"),
        F.col("max_s").alias("max_new"),
    )
    j = po.join(pn, "column")
    return j.select(
        "column",
        (F.col("rows_new") - F.col("rows_old")).alias("d_rows"),
        (F.col("null_new") - F.col("null_old")).alias("d_null"),
        (F.col("nd_new") - F.col("nd_old")).alias("d_distinct"),
        (
            (F.col("min_new") != F.col("min_old"))
            | (F.col("max_new") != F.col("max_old"))
        ).alias("range_moved"),
    )


def fd_violation_audit(
    df: DataFrame, candidates: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency discovery audit (the Metanome/TANE-style
    profiling primitive, scoped to a caller-supplied candidate list):
    for each candidate det → dep, how many determinant groups exist,
    how many bind MORE than one dependent value (violations), and the
    worst fan-out. An FD HOLDS iff n_violating = 0 — the schema-design
    / key-inference signal a warehouse migration reads before declaring
    constraints.

    Single-scan for ALL candidates: each row explodes into one
    (fd, det, dep) triple per candidate (constant fan-out = number of
    candidates), then two map-combinable shuffles — countDistinct per
    (fd, det), rollup per fd. Values are stringified so heterogeneous
    column types share one grid; NULL det/dep are kept as the literal
    '∅' sentinel (SQL FDs treat NULL as a value for profiling
    purposes — mirrored in the oracle).
    """
    triples = F.array(
        *[
            F.struct(
                F.lit(f"{det}->{dep}").alias("fd"),
                F.coalesce(F.col(det).cast("string"), F.lit("∅")).alias(
                    "det"
                ),
                F.coalesce(F.col(dep).cast("string"), F.lit("∅")).alias(
                    "dep"
                ),
            )
            for det, dep in candidates
        ]
    )
    flat = df.select(F.explode(triples).alias("t")).select(
        "t.fd", "t.det", "t.dep"
    )
    per_det = flat.groupBy("fd", "det").agg(
        F.countDistinct("dep").alias("__ndep")
    )
    return per_det.groupBy("fd").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("__ndep") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating"),
        F.max("__ndep").cast("bigint").alias("max_fanout"),
    )
