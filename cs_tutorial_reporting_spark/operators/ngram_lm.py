"""Corpus n-gram language-model scoring ([EXT] training-data pipeline:
flag documents whose token sequences the corpus has never seen —
machine-generated noise, OCR damage, wrong-language shards).

A self-trained bigram model: count every adjacent token pair across the
corpus, then score each document by the fraction of its bigrams that
are corpus-rare (count ≤ ``rare_threshold``). The novelty ratio is a
rational of two integers, so — unlike a log-likelihood — it is
bit-identical across engines and oracle-checkable. (A true perplexity
differs only by pushing the joined counts through ``ln``; the plumbing
below is the whole distributed cost either way.)

Scale design: tokenization and bigram construction are pure array
expressions (no explode until the model build needs one); the model is
a (gram, count) aggregate — one hash shuffle over (doc · tokens) rows;
scoring joins the exploded grams back to the model on the gram key. At
100 TB the model side is itself large, so NO broadcast hint — Catalyst
picks sort-merge vs broadcast from stats. All JVM-side; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import bind_once
from ..functions.text import normalize_text


def bigram_array(col: Column) -> Column:
    """array<string> of ``"tok_i tok_{i+1}"`` pairs over the normalized
    whitespace tokenization; empty for documents of fewer than two
    tokens (guarded — Spark's ``sequence(1, 0)`` would count DOWN)."""

    def _pairs(ts: Column) -> Column:
        n = F.size(ts)
        return F.when(n < 2, F.array().cast("array<string>")).otherwise(
            F.zip_with(
                F.slice(ts, 1, n - 1),
                F.slice(ts, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        )

    return bind_once(F.split(normalize_text(col), " "), _pairs)


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(gram, cnt) corpus bigram counts — the trained model."""
    grams = docs.select(
        F.explode(bigram_array(F.col(text_col))).alias("gram")
    )
    return grams.groupBy("gram").agg(F.count("*").alias("cnt"))


def novelty_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 2,
) -> DataFrame:
    """Per-document novelty: (doc_id, n_bigrams, n_rare, novelty) where
    ``novelty = n_rare / n_bigrams`` rounded by the portable
    ``floor(x·10⁴ + ½)/10⁴`` sequence. Self-scoring means every gram
    hits the model (count ≥ 1), so the join is inner and lossless."""
    model = bigram_model(docs, text_col)
    flat = docs.select(
        F.col(id_col), F.explode(bigram_array(F.col(text_col))).alias("gram")
    )
    rare = F.when(F.col("cnt") <= rare_threshold, F.lit(1)).otherwise(F.lit(0))
    scored = (
        flat.join(model, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(rare).cast("bigint").alias("n_rare"),
        )
    )
    novelty = (
        F.floor(
            F.col("n_rare") / F.col("n_bigrams") * 10000 + F.lit(0.5)
        )
        / 10000
    )
    return scored.select(
        id_col, "n_bigrams", "n_rare", novelty.alias("novelty")
    )


def cross_rarity_scores(
    ref_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_threshold: int = 2,
) -> DataFrame:
    """Held-out domain scoring: train the bigram model on a REFERENCE
    corpus, score a DISJOINT target corpus against it — the standard
    domain-filtering move (score web-crawl shards against a curated
    reference; keep what the reference language model finds familiar).

    Unlike self-scoring (:func:`novelty_scores`), target grams can MISS
    the model entirely, so the join is LEFT and an unseen gram counts
    as rare (count 0) — exactly the out-of-vocabulary mass a true
    cross-perplexity penalizes, kept as an integer rational so the
    score stays bit-identical across engines (module docstring).

    Same scale shape: one (gram, cnt) aggregate over the reference, one
    gram-key join for the target; no broadcast hint — at 100 TB both
    sides are large and Catalyst picks the strategy from stats.
    """
    model = bigram_model(ref_docs, text_col)
    flat = target_docs.select(
        F.col(id_col), F.explode(bigram_array(F.col(text_col))).alias("gram")
    )
    rare = F.when(
        F.col("cnt").isNull() | (F.col("cnt") <= rare_threshold), F.lit(1)
    ).otherwise(F.lit(0))
    scored = (
        flat.join(model, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(rare).cast("bigint").alias("n_rare"),
        )
    )
    rarity = (
        F.floor(F.col("n_rare") / F.col("n_bigrams") * 10000 + F.lit(0.5))
        / 10000
    )
    return scored.select(
        id_col, "n_bigrams", "n_rare", rarity.alias("rarity")
    )


def ngram_array(col: Column, n: int) -> Column:
    """array<string> of ALL word n-grams (non-distinct, in order) over
    the normalized whitespace tokenization; empty below n tokens.
    Single-level transform lambda (the expression policy forbids
    nesting); the split runs once per row via bind_once."""

    def _grams(ws: Column) -> Column:
        cnt = F.size(ws) - (n - 1)
        return F.when(cnt < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), cnt - 1),
                lambda i: F.concat_ws(
                    " ",
                    *[
                        F.try_element_at(ws, (i + j + 1).cast("int"))
                        for j in range(n)
                    ],
                ),
            )
        )

    return bind_once(F.split(normalize_text(col), " "), _grams)


def topgram_repetition_signals(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Gopher-style word-n-gram repetition signals (Rae et al. 2021,
    arXiv:2112.11446, App. A1.1 repetition filters): per document,
    the occurrence share of the single most frequent 2-gram
    (``top2_ppm``) and the share of 3-gram occurrences whose gram
    repeats within the document (``dup3_ppm``) — the two filters that
    catch templated spam and keyword-stuffed SEO text that sentence- or
    line-level repetition ratios miss. ppm fixed-point (integer div) so
    both engines agree bit-for-bit.

    One corpus scan: the 2- and 3-gram arrays concatenate into a single
    explode, and the gram SIZE (space count) recovers the n tag after
    aggregation — no tag column rides the explode, no second scan.
    Shuffles: (id, gram) count with map-side combine, then the per-doc
    rollup. Documents of fewer than two tokens emit no grams and no
    output row.
    """
    grams = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.concat(bigram_array(F.col(text_col)), ngram_array(F.col(text_col), 3))
        ).alias("__g"),
    )
    counts = grams.groupBy("__id", "__g").agg(F.count("*").alias("__cnt"))
    per = counts.withColumn("__n", F.size(F.split("__g", " ")))
    is2 = F.col("__n") == 2
    is3 = F.col("__n") == 3
    cnt = F.col("__cnt")
    return (
        per.groupBy("__id")
        .agg(
            F.sum(F.when(is2, cnt).otherwise(0)).alias("__n2"),
            F.max(F.when(is2, cnt)).alias("__top2"),
            F.sum(F.when(is3, cnt).otherwise(0)).alias("__n3"),
            F.sum(F.when(is3 & (cnt > 1), cnt).otherwise(0)).alias("__dup3"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__n2").cast("bigint").alias("n_grams2"),
            F.expr("CAST(__top2 * 1000000 div __n2 AS BIGINT)").alias("top2_ppm"),
            F.col("__n3").cast("bigint").alias("n_grams3"),
            F.expr(
                "CAST(CASE WHEN __n3 = 0 THEN 0"
                " ELSE __dup3 * 1000000 div __n3 END AS BIGINT)"
            ).alias("dup3_ppm"),
        )
    )
