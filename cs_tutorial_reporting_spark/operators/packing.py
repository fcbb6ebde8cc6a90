"""[EXT] Sequence packing — the pretraining concat-and-chunk primitive.

GPT-style pretraining concatenates a corpus shard's documents in a
deterministic order and cuts the token stream every ``max_tokens`` into
fixed-length training sequences. The quantities a pipeline needs from
that layout — which sequence a document starts in, whether it straddles
a sequence boundary, how many sequences a shard yields, how full they
are — are all pure prefix-sum arithmetic, so the operator is one window
cumsum plus map-side math: no Python, no extra shuffle beyond the
window's partition exchange.

Scale design: a single global ordering would funnel 100 TB through one
window partition. Packing is therefore *sharded*: documents are
deterministically assigned to ``n_shards`` shards per partition column
value (``order_col % n_shards`` — reproducible, no RNG), and each
(partition, shard) packs independently. That matches production
practice (each data-parallel worker packs its own shard) and makes the
window's partition key (part, shard) — parallelism scales with
``n_shards``, and AQE splits any skewed source. The math stays exact
and SQL-expressible, so the whole layout is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: Column,
    max_tokens: int = 512,
    part_col: str = "source",
    order_col: str = "doc_id",
    n_shards: int = 4,
) -> DataFrame:
    """Per-document packing layout: for each doc, its shard, token
    count, the first/last sequence index it occupies within its
    (partition, shard) stream, and whether it straddles a sequence
    boundary. Order within a shard is ``order_col`` ascending —
    deterministic and reproducible across runs."""
    shard = (F.col(order_col) % F.lit(n_shards)).alias("shard")
    w = Window.partitionBy(F.col(part_col), F.col("shard")).orderBy(
        F.col(order_col)
    )
    out = df.select(
        F.col(order_col),
        F.col(part_col),
        shard,
        tokens_col.cast("bigint").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return (
        out.withColumn("cum_tokens", cum)
        .withColumn("start_offset", start)
        .withColumn(
            "first_seq", F.floor(F.col("start_offset") / max_tokens)
        )
        # last token of the doc lives at offset cum-1; empty docs
        # (n_tokens=0) occupy no token — pin last_seq to first_seq
        .withColumn(
            "last_seq",
            F.greatest(
                F.floor((F.col("cum_tokens") - 1) / max_tokens),
                F.col("first_seq"),
            ),
        )
        .withColumn("straddles", F.col("last_seq") > F.col("first_seq"))
        .drop("cum_tokens")
    )


def packing_summary(
    packed: DataFrame, max_tokens: int = 512, part_col: str = "source"
) -> DataFrame:
    """Shard-level packing report: docs, tokens, resulting sequence
    count (= ceil(total/max)), boundary-straddling docs, and the fill
    ratio of the produced sequences (4-decimal fixed point for
    cross-engine float parity). Input is ``pack_sequences`` output; the
    aggregation reuses its (part, shard) partitioning, so the exchange
    is free under AQE."""
    return (
        packed.groupBy(part_col, "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.ceil(F.sum("n_tokens") / max_tokens).alias("n_sequences"),
            F.sum(F.col("straddles").cast("bigint")).alias("n_straddling"),
            # a shard of only empty docs packs zero sequences: 0/0 is
            # NaN in Spark but NULL in SQL engines — pin it to NULL so
            # the oracle gate holds on degenerate data (mirrored in the
            # sequence_packing_stats oracle)
            F.when(
                F.sum("n_tokens") > 0,
                F.floor(
                    F.sum("n_tokens")
                    / (F.ceil(F.sum("n_tokens") / max_tokens) * max_tokens)
                    * 10000
                )
                / 10000,
            ).alias("fill_ratio"),
        )
    )
