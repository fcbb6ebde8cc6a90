"""[EXT] Inverted-index keyword search — posting lists as a relational
layout, conjunctive (AND) queries as joins.

The mini search engine every corpus tool grows: BUILD an inverted
index once at ingest — a (term, doc_id, tf) posting table, just
another parquet artifact — then answer "docs containing ALL of these
terms, ranked by term frequency" with one selective scan + one
group-by. No search library: the index IS a table, the query IS a
plan, and every full-text primitive (posting intersection, tf
ranking) maps onto operators Catalyst already optimizes.

Scale story: the posting table is term-partitionable and
bucket-sortable like any fact table; a k-term query filters the scan
with ``term IN (...)`` (pushed to parquet — reads only the probed
terms' row groups under a term-sorted/bucketed layout), so query cost
scales with the MATCHED postings, not the corpus. The AND semantics
is ``count(distinct term) == k`` after grouping by document — no
iterative intersection, one shuffle on doc_id. Ranking is
``TakeOrderedAndProject`` (top-k, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf) posting table over the normalized
    tokenization — the ingest-time artifact; write it term-sorted
    (``write_sorted`` / ``write_bucketed``) and probes become row-group
    pruning."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", id_col).agg(F.count("*").alias("tf"))


def conjunctive_search(
    index: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents containing ALL ``terms``, ranked by summed
    term frequency (desc), ties to the lowest doc id. The term filter
    is an IN-list literal — pushed into the posting scan — and AND is
    ``count(distinct term) == len(terms)`` after one doc-key shuffle."""
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    hits = index.filter(F.col("term").isin([t.lower() for t in terms]))
    return (
        hits.groupBy(id_col)
        .agg(
            F.countDistinct("term").alias("__nt"),
            F.sum("tf").cast("bigint").alias("score_tf"),
        )
        .filter(F.col("__nt") == len(terms))
        .drop("__nt")
        .orderBy(F.col("score_tf").desc(), F.col(id_col).asc())
        .limit(k)
    )


def build_positional_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, positions) positional posting table — ``positions``
    is the sorted array of 1-based token offsets, the layout phrase and
    proximity queries need. Same ingest economics as the tf index: one
    corpus tokenize + one (term, doc) aggregate."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "__p", "term"
        ),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list(F.col("__p") + 1)).alias("positions")
    )


def phrase_search(
    index: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents containing the exact consecutive ``phrase``,
    ranked by occurrence count (desc, ties to the lowest id).

    Adjacency is set algebra over the positional arrays: start
    positions = positions(t0) ∩ (positions(t1) − 1) ∩ … — one
    ``array_intersect`` per phrase term after the per-term posting
    join, each shift a single-level ``transform`` (the ngram_lm lambda
    precedent). Overlapping occurrences count (standard positional
    semantics). Query cost ∝ the phrase terms' postings only."""
    if len(phrase) < 2:
        raise ValueError("phrase_search needs at least two terms")
    terms = [t.lower() for t in phrase]
    joined = None
    for i, term in enumerate(terms):
        side = index.filter(F.col("term") == term).select(
            F.col(id_col),
            F.col("positions").alias(f"__pos{i}"),
        )
        joined = side if joined is None else joined.join(side, id_col)
    # NOTE: the shift lambda must take exactly ONE parameter — PySpark
    # passes (element, index) to two-parameter lambdas, so the usual
    # default-arg loop-capture trick (lambda x, _i=i: ...) silently
    # binds the ARRAY INDEX instead of the phrase offset. Use a factory.
    def _shift(offset: int):
        return lambda x: x - offset

    starts = F.col("__pos0")
    for i in range(1, len(terms)):
        starts = F.array_intersect(
            starts, F.transform(F.col(f"__pos{i}"), _shift(i))
        )
    return (
        joined.select(
            F.col(id_col), F.size(starts).cast("bigint").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
        .orderBy(F.col("n_occurrences").desc(), F.col(id_col).asc())
        .limit(k)
    )
