"""Ingest robustness: schema-evolution mapping reads and a dead-letter
queue for malformed records — the two failure modes a long-lived
extraction spine (SURVEY §2.1 S-family) actually meets in production:
upstream renames/adds columns between extracts, and upstream emits the
occasional garbage line.

Both stay within the engine's declarative stance: evolution is a
per-file projection (rename + default expressions) unioned BY NAME —
no Python row handling; the DLQ rides Spark's PERMISSIVE parse mode
(``_corrupt_record``), so good rows and quarantined rows come out of
ONE pass over the input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def read_with_schema_map(
    spark: SparkSession,
    paths: list[str],
    target_schema: str,
    renames: dict[str, str] | None = None,
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Read parquet files written under EVOLVING schemas into one frame
    of ``target_schema``: per file, historical names map through
    ``renames`` (old → new), columns the file predates fill from
    ``defaults`` (new-col → SQL literal expression, NULL when absent),
    extras are dropped; files then union BY NAME. The per-file
    projection is the schema contract made executable — a file that
    can satisfy the target neither by presence, rename, nor default
    fails LOUDLY instead of silently nulling.

    At 100 TB: this is a plan-time mapping (each file group gets its
    own projection; scans still prune/push down) — the alternative,
    rewriting history to the new schema, costs a full-table rewrite
    per evolution.
    """
    renames = renames or {}
    defaults = defaults or {}
    want = [f.strip().split()[0] for f in target_schema.split(",")]
    out: DataFrame | None = None
    for p in paths:
        df = spark.read.parquet(p)
        have = set(df.columns)
        cols = []
        for name in want:
            old = next((o for o, n in renames.items() if n == name), None)
            if name in have:
                cols.append(F.col(name))
            elif old is not None and old in have:
                cols.append(F.col(old).alias(name))
            elif name in defaults:
                cols.append(F.expr(defaults[name]).alias(name))
            else:
                raise ValueError(
                    f"file {p} cannot provide column {name!r}: not present, "
                    f"no rename maps to it, no default declared"
                )
        proj = df.select(*cols)
        out = proj if out is None else out.unionByName(proj)
    assert out is not None, "no input paths"
    # normalize to the declared types (rename sources may differ in
    # width — e.g. int ids widening to bigint across the evolution)
    pairs = [f.strip().split(None, 1) for f in target_schema.split(",")]
    return out.select(
        *[F.col(n).cast(t).alias(n) for n, t in pairs]
    )


def read_json_with_dlq(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """NDJSON ingest with a dead-letter queue: ONE permissive parse
    pass yields (good_rows, quarantined_raw_lines). Malformed lines
    land in ``_corrupt_record`` with every declared column NULL; the
    split is two filters over the same scan, so the DLQ costs no
    second read. Quarantine carries the RAW line — replayable once the
    upstream bug is fixed (the reference's K1 JSON landing made the
    same choice: keep bytes, not interpretations).
    """
    full = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark REQUIRES materialization before a query that touches
        # only the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN —
        # the raw-file scan can't re-derive it lazily); localCheckpoint
        # also guarantees both split halves come from the SAME parse
        # pass (eager, GC-reclaimed — the engine's minhash pattern)
        .localCheckpoint(eager=True)
    )
    # Spark quirk: a corrupt row keeps any fields it COULD parse; the
    # contract here is all-or-nothing, so "bad" = corrupt col set.
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad
