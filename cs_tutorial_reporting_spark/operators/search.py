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
