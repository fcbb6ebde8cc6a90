"""Shared DuckDB-dialect SQL fragments used by the oracle generators.

These live in their own leaf module (no imports from the registry
chain) so any ``queries_*`` module can use them without creating an
import cycle through ``queries.py``'s side-effect imports. Each
fragment is the DuckDB twin of a Spark expression in
``functions/text.py`` — the Python constant is the single source for
both engines.
"""

from __future__ import annotations

import hashlib

#: DuckDB twin of functions/text.py::normalize_text
NORM_SQL = r"trim(lower(regexp_replace({col}, '\s+', ' ', 'g')))"

#: DuckDB twin of functions/text.py::hash60 (60-bit md5 prefix)
HASH60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

#: normalized whitespace tokenization of the documents.text column
WORDS_SQL = f"string_split({NORM_SQL.format(col='text')}, ' ')"

#: winnowing parameters — MUST match functions/text.py::winnow_fingerprints
WINNOW_K, WINNOW_W = 8, 4

# ---------------------------------------------------------------------------
# Learned quality scorer (frozen linear model) — single source for the
# Spark expression (functions/text.py::learned_quality_parts) and the
# DuckDB oracle fragment below. The model is a fastText-style linear
# classifier over the HASHED bag of words: feature j = count of words
# whose portable 60-bit hash lands in bucket j (mod QW_N); the weight
# vector is FROZEN integer ppm values in [0, 1e6] derived from md5 so
# both engines embed identical literals (a stand-in for trained
# weights — the engine feature is the scoring stage: at 100 TB it is
# an embarrassingly parallel map expression, one fold per document,
# no shuffle, no Python).
# ---------------------------------------------------------------------------

#: hashed-feature bucket count
QW_N = 64

#: frozen per-bucket weights, ppm in [0, 1_000_000]; non-negative by
#: construction so truncating integer division (Spark ``div``) and
#: floor division (DuckDB ``//``) agree on every document logit
QW_WEIGHTS: list[int] = [
    int(hashlib.md5(f"qw|{i}".encode()).hexdigest()[:8], 16) % 1_000_001
    for i in range(QW_N)
]

#: logit threshold (ppm) above which a document passes the learned
#: quality gate — the weight mean is ~5e5, so the gate is discriminative
#: on any corpus rather than degenerate at 0% or 100%
QW_PASS_PPM = 500_000

_QW_LIST_SQL = "[" + ", ".join(str(w) for w in QW_WEIGHTS) + "]"

#: DuckDB twin of the per-document learned logit: mean bucket weight
#: over the document's words, integer ppm. ``{words}`` is any VARCHAR[]
#: expression (normalized whitespace tokens).
LEARNED_LOGIT_SQL = (
    f"CAST(list_sum(list_transform({{words}}, w -> ({_QW_LIST_SQL})["
    f"CAST({HASH60_SQL.format(x='w')} % {QW_N} AS INT) + 1]))"
    f" // len({{words}}) AS BIGINT)"
)

#: DuckDB twin of winnow_fingerprints over documents, exploded to
#: (doc_id, fp) rows (arrays are unsortable in the driver's pandas
#: canonicalizer, and rows are what a fingerprint index consumes)
WINNOW_SQL = f"""
    SELECT doc_id, unnest(fps) AS fp
    FROM (
        SELECT doc_id, list_distinct(
            list_transform(range(0, greatest(len(grams) - {WINNOW_W - 1}, 1)),
                           j -> list_min(grams[j + 1 : j + {WINNOW_W}]))
        ) AS fps
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(0, greatest(length(norm) - {WINNOW_K - 1}, 1)),
                       i -> {HASH60_SQL.format(x=f"substr(norm, i + 1, {WINNOW_K})")}
                   ) AS grams
            FROM (SELECT doc_id, {NORM_SQL.format(col='text')} AS norm FROM documents)
        )
    )
"""
