"""Shared DuckDB-dialect SQL fragments used by the oracle generators.

These live in their own leaf module (no imports from the registry
chain) so any ``queries_*`` module can use them without creating an
import cycle through ``queries.py``'s side-effect imports. Each
fragment is the DuckDB twin of a Spark expression in
``functions/text.py`` — the Python constant is the single source for
both engines.
"""

from __future__ import annotations

#: DuckDB twin of functions/text.py::normalize_text
NORM_SQL = r"trim(lower(regexp_replace({col}, '\s+', ' ', 'g')))"

#: DuckDB twin of functions/text.py::hash60 (60-bit md5 prefix)
HASH60_SQL = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

#: normalized whitespace tokenization of the documents.text column
WORDS_SQL = f"string_split({NORM_SQL.format(col='text')}, ' ')"

#: winnowing parameters — MUST match functions/text.py::winnow_fingerprints
WINNOW_K, WINNOW_W = 8, 4

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
