"""[EXT] Distributed BPE tokenizer training — merge-pair learning at
corpus scale.

Byte-pair-encoding training is the canonical "tokenizer on 100 TB"
job: count word frequencies once (the ONLY corpus-sized shuffle), then
learn merges iteratively over the word-frequency table — which is
vocabulary-sized, not corpus-sized, so every merge round is a cheap
map + one small aggregation no matter how big the input corpus was.
This is exactly how production BPE trainers scale: the corpus pass is
embarrassingly parallel word counting; the merge loop runs on the
aggregated vocab.

Spark shape per merge round:
  1. bigram pair counts over symbol sequences, weighted by word
     frequency — explode + map-combined sum (one tiny shuffle);
  2. top pair = 1-row driver scalar (the watermark-fetch pattern —
     the ONLY driver-side values are k single rows);
  3. sequence update = pure string ``replace`` map over the vocab.

Merge semantics — the CONTRACT is two-pass padded string replace, not
canonical symbol-level BPE: each round runs TWO passes of padded
``replace(' a b ', ' ab ')``. One pass misses back-to-back runs
because the shared separator space is consumed by the previous match
("a b a b" → "ab a b"); the second pass completes them. On odd repeat
runs of length >= 5 this diverges from the canonical left-to-right
symbol scan (Sennrich/HF): "a a a a a" yields "aa a aa" here, where a
canonical trainer yields "aa aa a" — pass 1 merges positions (1,2) and
(3,4), pass 2 then merges the tail (4,5) remnant pair. The result is
fully deterministic and both engines' ``replace`` scan left-to-right
over non-overlapping matches, so the DuckDB oracle replicates the
identical sequences, but learned vocab/counts can differ from standard
BPE trainers on such degenerate inputs (round-5 ADVICE — documented as
the contract; natural-language corpora hit this only on repeated-
character runs). Ties in pair counts break on the pair string
ascending — fully deterministic training.

No nested lambdas anywhere (BASELINE.md round-4 note): the bigram
expansion is the same single-level ``transform(sequence(...))`` form
as operators/ngram_lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_text

#: end-of-word marker appended to every symbol sequence (standard BPE —
#: lets merges distinguish word-final from word-internal pairs). The
#: corpus is whitespace-normalized text, so '<' never collides.
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the normalized corpus — the one corpus-sized
    shuffle of BPE training; everything after operates on this table."""
    words = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq"))


def initial_sequence(word_col) -> F.Column:
    """'hello' → 'h e l l o </w>': characters space-joined plus the
    end-of-word marker (the fixed ``(.)`` pattern never interprets word
    content as regex)."""
    return F.concat(
        F.trim(F.regexp_replace(word_col, "(.)", "$1 ")), F.lit(" " + EOW)
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(pair, cnt): adjacent symbol pairs over every word's sequence,
    weighted by word frequency. Single-level transform lambda (the
    ngram_lm precedent), map-combined sum."""
    syms = F.split(F.col("seq"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(syms, i), F.element_at(syms, i + 1)
        ),
    )
    return (
        vocab.select(F.explode(bigrams).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(vocab: DataFrame, pair: str) -> DataFrame:
    """Merge ``pair`` in every sequence via two passes of padded
    replace — see the module docstring for the exact (non-canonical on
    odd repeat runs >= 5) contract this implements."""
    merged = pair.replace(" ", "")
    padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
    one = F.replace(padded, F.lit(f" {pair} "), F.lit(f" {merged} "))
    two = F.replace(one, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return vocab.withColumn("seq", F.trim(two))


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 3,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns (merges, final_vocab): merges = [(pair, merged, count)]
    in learned order; final_vocab = (word, freq, seq) after all merges.
    The word table is localCheckpoint-materialized once so each round's
    map+agg runs over the cached vocab, not the corpus lineage."""
    vocab = (
        word_frequencies(df, text_col)
        .withColumn("seq", initial_sequence(F.col("word")))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .first()
        )
        if top is None:
            break
        merges.append((top["pair"], top["pair"].replace(" ", ""), int(top["cnt"])))
        vocab = _apply_merge(vocab, top["pair"]).localCheckpoint()
    return merges, vocab


def bpe_tokenize_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """APPLY a learned merge table to the corpus — the tokenizer's
    encode path, complementing :func:`bpe_train`.

    Per document: normalize, char-split every word (`` </w>``-marked),
    then run the k learned merges IN RANK ORDER as the same two-pass
    padded replaces training used (module docstring) — over the
    document's FLAT space-joined sequence, which is equivalent to
    per-word application: a learned pair's left symbol never ends in
    ``</w>`` (a word-final symbol has no right neighbor during
    training, so such a pair is never counted), while every cross-word
    adjacency in the flat string has a ``</w>``-suffixed left symbol —
    no learned merge can fire across a word boundary.

    Scale shape: the merge table is k driver-side scalars (it came out
    of training that way — the watermark pattern), so application is a
    pure per-row expression map over the corpus: ZERO shuffles before
    the caller's aggregation, linear in corpus bytes, and the 2k
    sequential ``replace`` passes stay inside whole-stage codegen. No
    lambda nesting: the one single-level ``transform`` (char-split per
    word) matches the :func:`_pair_counts` precedent.

    Returns (id, n_words, n_chars, n_tokens) per document.
    """
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")  # normalize ⇒ no empty words when norm != ''
    seq = F.array_join(
        F.transform(
            words,
            lambda w: F.concat(
                F.trim(F.regexp_replace(w, F.lit("(.)"), F.lit("$1 "))),
                F.lit(" " + EOW),
            ),
        ),
        " ",
    )
    col = seq
    for pair, merged, _ in merges:
        padded = F.concat(F.lit(" "), col, F.lit(" "))
        one = F.replace(padded, F.lit(f" {pair} "), F.lit(f" {merged} "))
        two = F.replace(one, F.lit(f" {pair} "), F.lit(f" {merged} "))
        col = F.trim(two)
    empty = norm == F.lit("")
    return df.select(
        F.col(id_col),
        F.when(empty, F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .cast("bigint")
        .alias("n_words"),
        F.length(F.regexp_replace(norm, F.lit(" "), F.lit("")))
        .cast("bigint")
        .alias("n_chars"),
        F.when(empty, F.lit(0))
        .otherwise(F.size(F.split(col, " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )


def bpe_merge_table(
    df: DataFrame, text_col: str, n_merges: int = 3
) -> DataFrame:
    """The learned merge table as a DataFrame: (merge_rank, pair,
    merged, cnt) — the distributable artifact a tokenizer ships. The
    rows are k driver scalars re-lifted into a frame (the
    watermark-scalar pattern); all heavy work stayed distributed."""
    spark = df.sparkSession
    merges, _ = bpe_train(df, text_col, n_merges)
    return spark.createDataFrame(
        [(i + 1, p, m, c) for i, (p, m, c) in enumerate(merges)],
        "merge_rank bigint, pair string, merged string, cnt bigint",
    )
