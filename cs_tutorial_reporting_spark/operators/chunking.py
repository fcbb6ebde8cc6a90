"""Fixed-size token-window chunking ([EXT] training-data pipeline:
shard documents into model-context-sized pieces, then measure
chunk-level duplication — the unit that actually enters a training
batch, where document-level dedup misses repeated boilerplate spans).

Chunks are built as a pure array expression (sequence over window
starts → slice → join → 60-bit hash); the only explode produces the
(doc, chunk_hash) stream that the duplication aggregate consumes, and
the only shuffles are the two hash aggregations on (source,
chunk_hash) then (source). Carrying 8-byte hashes — never chunk text —
through the shuffle is what keeps this viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import bind_once
from ..functions.text import hash60, normalize_text


def chunk_hashes(col: Column, chunk_tokens: int = 64) -> Column:
    """array<bigint> of 60-bit hashes of consecutive ``chunk_tokens``-
    token windows (stride = window: non-overlapping, like training-
    shard packing). The trailing partial window is kept — dropping it
    would silently lose document tails."""

    def _chunks(ts: Column) -> Column:
        n_chunks = F.ceil(F.size(ts) / F.lit(chunk_tokens)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1),
            lambda i: hash60(
                F.concat_ws(" ", F.slice(ts, i * chunk_tokens + 1, chunk_tokens))
            ),
        )

    return bind_once(F.split(normalize_text(col), " "), _chunks)


def chunking_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    chunk_tokens: int = 64,
) -> DataFrame:
    """Per-``group_col`` chunk-duplication report: (group, n_docs,
    n_chunks, n_chunk_kinds, n_cross_doc_kinds) — the last being
    distinct chunk hashes that occur in MORE THAN ONE document of the
    group (the spans chunk-level dedup would drop). Integer-only
    output ⇒ bit-exact cross-engine."""
    flat = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.explode(chunk_hashes(F.col(text_col), chunk_tokens)).alias("chunk_hash"),
    )
    per_kind = flat.groupBy(group_col, "chunk_hash").agg(
        F.count("*").alias("__n"),
        F.countDistinct(id_col).alias("__n_docs"),
    )
    n_docs = docs.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    kinds = per_kind.groupBy(group_col).agg(
        F.sum("__n").cast("bigint").alias("n_chunks"),
        F.count("*").alias("n_chunk_kinds"),
        F.sum(F.when(F.col("__n_docs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cross_doc_kinds"),
    )
    return n_docs.join(kinds, group_col).select(
        group_col, "n_docs", "n_chunks", "n_chunk_kinds", "n_cross_doc_kinds"
    )
