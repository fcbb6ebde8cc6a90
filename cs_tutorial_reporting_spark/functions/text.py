"""Columnar text-analysis expressions ([EXT] north star: language-ID,
quality scoring, token counting, fingerprinting over ``documents``).

Design constraint: everything here is a *portable* composition of
built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen — no
Python UDFs), using only primitives with identical semantics in DuckDB
(md5, length/replace counting, substring) so every operator can be
oracle-checked. At 100 TB these are embarrassingly parallel map
expressions — no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker words per language for the n-gram/stopword
# heuristic. Counting uses the length-replace trick (no regex dialect
# dependence): count(s, m) = (len(s) - len(replace(s, m, ''))) / len(m).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " das "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
    "zh": ["的", "了", "是"],
}


def occurrence_count(col: Column, marker: str) -> Column:
    """# of non-overlapping occurrences of ``marker`` via length delta."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / len(marker)
    ).cast("bigint")


def whitespace_token_count(col: Column) -> Column:
    """Whitespace token count = spaces + 1 (documents are single-spaced)."""
    return (occurrence_count(col, " ") + 1).cast("bigint")


def word_token_count(col: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, and single
    punctuation marks each count as one token (regex kept to a class
    portable across engines)."""
    return F.regexp_count(col, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hit counts (ties and
    all-zero fall back to 'en'). Deterministic; identical CASE/GREATEST
    logic is expressible in the DuckDB oracle."""
    scores = {
        lang: sum(
            (occurrence_count(col, m) for m in markers), F.lit(0).cast("bigint")
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.lit("en")
    # fixed evaluation order (reverse list order) ⇒ first-listed wins ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]: mean-word-length band +
    stopword presence + alpha ratio. A deterministic toy of the
    Gopher/C4-style quality rules, built from portable primitives."""
    n_chars = F.length(col).cast("double")
    n_words = whitespace_token_count(col).cast("double")
    mean_wlen = (n_chars - (n_words - 1)) / n_words  # chars sans spaces / words
    stop_hits = sum(
        (occurrence_count(col, m) for m in LANG_MARKERS["en"]),
        F.lit(0).cast("bigint"),
    ).cast("double")
    alpha_chars = F.length(
        F.regexp_replace(col, F.lit("[^a-zA-Z]"), F.lit(""))
    ).cast("double")
    score = (
        F.when((mean_wlen >= 3) & (mean_wlen <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_hits / n_words > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.least(F.lit(0.3), (alpha_chars / n_chars) * 0.3)
    )
    # portable round-4: floor(x*1e4 + .5)/1e4 is the same IEEE op sequence
    # in every engine — round(x, 4) is NOT (Spark rounds the double's
    # exact decimal, DuckDB rounds the scaled double; a .xxxx5 boundary
    # splits them — seen at sf0.1)
    return F.floor(score * 10000 + F.lit(0.5)) / 10000


def repetition_ratio(col: Column, sep_regex: str = r"\.") -> Column:
    """Duplicate-segment fraction in [0,1]: 1 − distinct/total over the
    text split on ``sep_regex`` (sentence periods by default; pass
    ``"\\n"`` for the Gopher duplicate-line rule). High values mark
    boilerplate/spam for corpus filtering. Pure array expression — no
    explode, no shuffle."""
    segs = F.filter(
        F.transform(F.split(col, sep_regex, -1), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n = F.size(segs)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(segs)) / n.cast("double")
    )


#: PII patterns kept to syntax with identical semantics in Java regex
#: (Spark) and RE2 (DuckDB): character classes, bounded repetition —
#: no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "<EMAIL>": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "<PHONE>": r"\d{3}-\d{3}-\d{4}",
}


def redact_pii(col: Column) -> Column:
    """Training-corpus PII scrub: replace email addresses and
    NNN-NNN-NNNN phone numbers with typed placeholder tokens. A pure
    regexp_replace chain — no shuffle, pipelines into the scan; the
    pattern table is the single source for engine and oracle."""
    out = col
    for token, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, F.lit(pat), F.lit(token))
    return out


def pii_count(col: Column, token: str) -> Column:
    """# of matches of one PII pattern (pre-scrub audit metric)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[token])).cast("bigint")


def normalize_text(col: Column) -> Column:
    """Canonical text form every dedup/fingerprint family hashes:
    lower-cased, ALL whitespace runs (spaces/tabs/newlines) collapsed to
    one space, trimmed. DuckDB twin:
    ``trim(lower(regexp_replace(col, '\\s+', ' ', 'g')))``."""
    return F.trim(F.lower(F.regexp_replace(col, F.lit(r"\s+"), F.lit(" "))))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: 60-bit integer from the md5 of the
    whitespace-normalized, lower-cased text. md5 is identical in every
    engine ⇒ oracle-checkable; 15 hex digits keep it inside BIGINT."""
    return F.conv(F.substring(F.md5(normalize_text(col)), 1, 15), 16, 10).cast(
        "bigint"
    )


def hash60(col: Column) -> Column:
    """Portable 60-bit string hash (md5 prefix); building block for
    minhash/simhash where Spark's xxhash64 would not match DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def winnow_fingerprints(col: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken): hash every
    char ``k``-gram of the normalized text (the rolling-hash stream),
    then keep the minimum of each ``w``-wide window — a deterministic
    ~1/w sample that two documents share wherever they share a run of
    ≥ w+k-1 chars. Returns the sorted distinct fingerprint array.

    Pure higher-order expressions (sequence/transform/slice/array_min):
    no explode, no shuffle, no Python.
    """
    from . import bind_once

    normalized = normalize_text(col)

    def _grams(nrm):
        n_grams = F.greatest(F.length(nrm) - (k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), n_grams - 1),
            lambda i: hash60(nrm.substr(i + 1, F.lit(k))),
        )

    def _winnow(grams):
        n_windows = F.greatest(F.size(grams) - (w - 1), F.lit(1))
        return F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), n_windows - 1),
                    lambda j: F.array_min(F.slice(grams, j + 1, w)),
                )
            )
        )

    # bind normalized text, then the gram-hash array, exactly once per
    # row — inlined they re-evaluate per element (O(n²) per document)
    return bind_once(bind_once(normalized, _grams), _winnow)


def learned_quality_parts(col: Column) -> tuple[Column, Column]:
    """Learned (frozen-linear-model) quality logit, as its two integer
    parts: ``(weight_sum, n_tokens)``. The per-document logit is
    ``weight_sum div n_tokens`` (ppm) — callers do the integer
    division on NAMED columns (``F.expr("__tot div __n")``) so the
    truncation semantics stay in the SQL engine, never in a lossy
    double round-trip.

    Model: fastText-style linear scorer over the hashed bag of words —
    each whitespace token of the normalized text hashes (portable md5
    ``hash60 % QW_N``) into one of QW_N buckets; the frozen ppm weight
    vector lives in ``duck_sql.QW_WEIGHTS`` (single source for both
    engines' literals). At 100 TB this is a pure map expression: one
    single-level fold per document, no shuffle, no Python, whole-stage
    codegen. DuckDB twin: ``duck_sql.LEARNED_LOGIT_SQL``.
    """
    from ..duck_sql import QW_N, QW_WEIGHTS

    warr = F.array(*[F.lit(w).cast("bigint") for w in QW_WEIGHTS])
    words = F.split(normalize_text(col), " ")
    tot = F.aggregate(
        words,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.element_at(warr, (hash60(w) % QW_N).cast("int") + F.lit(1)),
    )
    return tot, F.size(words).cast("bigint")
