"""[EXT] Corpus vocabulary + TF-IDF term weighting over ``documents``.

The two classic lexical-statistics operators of a training-data
pipeline: a deterministic top-N vocabulary (token id assignment for
tokenizer training / frequency cutoffs) and per-document TF-IDF term
ranking (keyword extraction, relevance filtering).

Scale design: token counts are one hash shuffle with map-side partial
aggregation on (doc, word); document frequency is a second aggregate
over the already-collapsed (doc, word) pairs — never over raw tokens.
The corpus-size scalar joins in as a 1-row broadcast (no driver
collect). The df-join key is the word itself, which skews on stopwords
at 100 TB — AQE skew-join splitting handles the hot keys, and the
vocabulary variant bounds the join side to top-N outright.

Float discipline: the smoothed idf is the RATIO ``(N+1)/(df+1)`` (no
logarithm). ``+ * /`` are IEEE-correctly-rounded in every engine, so
tf·idf is bit-identical between Spark and the DuckDB oracle; ``ln`` is
only ~1-ulp accurate in each libm and could flip a rounded 6-decimal
boundary. The monotone transform preserves per-document term ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import normalize_text


def _doc_words(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__w"),
    )


def build_vocab(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 200,
) -> DataFrame:
    """Deterministic top-``top_n`` vocabulary: (term, token_id,
    n_occurrences, n_docs), token ids assigned by (occurrences DESC,
    term ASC) — fully ordered, so ids are stable across runs/engines.
    The global sort ranks only the distinct words (already collapsed by
    the count shuffle), and ``top_n`` keeps the result broadcastable
    for downstream token-id joins."""
    counts = (
        _doc_words(docs, text_col, id_col)
        .groupBy("__w")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )
    # distributed top-N FIRST (TakeOrderedAndProject — per-partition
    # heaps, no global sort), THEN the id-assigning row_number over the
    # surviving ≤ top_n rows. A bare global row_number window would
    # drag every distinct word of the corpus through one partition.
    pruned = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("__w").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("__w").asc())
    return pruned.withColumn("token_id", F.row_number().over(w)).select(
        F.col("__w").alias("term"), "token_id", "n_occurrences", "n_docs"
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (doc_id, term, score, rank)
    with score = (count/doc_len) · (N+1)/(df+1) and rank ties broken on
    the term — deterministic given the float discipline above."""
    # token counts materialize ONCE (localCheckpoint — GC-reclaimed, no
    # CacheManager entry): three consumers (doc length, document
    # frequency, the scored join) would otherwise each re-evaluate the
    # explode+count subtree, tripling the corpus scan — Spark does not
    # dedup common subplans. (An unbounded-window formulation avoids
    # the joins but buffers whole partitions and measured ~40% slower.)
    tc = (
        _doc_words(docs, text_col, id_col)
        .groupBy(id_col, "__w")
        .agg(F.count("*").alias("__cnt"))
        .localCheckpoint(eager=True)  # eager: see dedup.py round-4 note
    )
    dl = tc.groupBy(id_col).agg(F.sum("__cnt").alias("__len"))
    dfreq = tc.groupBy("__w").agg(F.count("*").alias("__df"))
    n = docs.agg(F.count("*").alias("__n"))
    score: Column = (
        F.col("__cnt").cast("double") / F.col("__len").cast("double")
    ) * (
        (F.col("__n") + 1).cast("double") / (F.col("__df") + 1).cast("double")
    )
    scored = (
        tc.join(dl, id_col)
        .join(dfreq, "__w")
        .crossJoin(F.broadcast(n))
        .select(id_col, F.col("__w").alias("term"), score.alias("__s"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__s").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            (F.floor(F.col("__s") * 1e6 + F.lit(0.5)) / 1e6).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
