"""Unigram-LM (SentencePiece-style) subword tokenization, EM-free
integer variant.

Completes the tokenizer-training family next to the BPE trainer
(``operators/bpe.py``): where BPE LEARNS merges bottom-up, the unigram
model starts from a large seeded piece vocabulary and SEGMENTS each
word by exact Viterbi dynamic programming — the inference half of
Kudo (2018), with the EM probability refinement replaced by a
deterministic one-shot score assignment so every quantity stays an
exact integer (the engine's log-free stance, cf. the BM25 rational
idf and the Gini entropy surrogate):

- piece cost = ``length(bin(T)) - length(bin(count))`` with T the
  selected vocabulary's total count mass — the 1-bit-quantized
  ``-log2(p_piece)`` of the unigram model ``p = count / T``. Every
  piece costs > 0 bits exactly as every real log-prob is negative,
  so the DP inherits the true model's pressure toward FEWER, more
  FREQUENT pieces; no float log ever materializes.
- segmentation objective = lexicographic (min total cost, then min
  piece count), encoded in ONE integer key ``-(64*cost_total +
  n_pieces)`` so the per-position DP state is a plain ``max()``
  aggregate. Appending a piece is ``key - 64*piece_cost - 1``.

The 1-bit quantization IS the contract, not an approximation bug:
both engines compute identical integer costs, and segmentations are
those of a genuine unigram LM whose probabilities are rounded to
powers of two.

Scale design (100 TB): the corpus-sized work is ONE word-frequency
aggregation. Everything downstream — the substring grid, the top-V
window, and the segmentation itself — runs on the DISTINCT-WORD
frame, which is vocabulary-bounded, not corpus-bounded. Since round
10 the query path segments in ONE Arrow stage
(:func:`viterbi_paths_arrow`): each word's DP is independent and
all-integer, so the pass parallelizes at the shuffle width with zero
sequential rounds. The distributed-DP dataflow (``max_word_len``
rounds of frontier join broadcast-vocab then word-keyed max, the
pointer-doubling-CC shape with a localCheckpoint per round) is kept
as the pinned reference twin (``viterbi_dp_table`` +
``*_jvm`` readers) — its per-round job floor was measured
data-independent (~0.25 s/round, SCALE.md), which made the EM round
pay ~48 sequential barriers at any corpus size. The vocabulary
(≤ top_v + alphabet rows) is broadcast either way; no corpus shuffle
happens after the first aggregation.

Reference scope note: the reference pipeline (public repo
astronomer/cs-tutorial-reporting) has no tokenizer; this operator is
part of the training-data-pipeline surface the build brief adds on
top of reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: lexicographic key base: n_pieces per word is bounded by the word
#: length (< 64 everywhere we accept), so maximizing
#: ``-(64*cost_total + n_pieces)`` minimizes cost then pieces.
KEY_BASE = 64


def seed_piece_scores(
    words: DataFrame,
    max_piece_len: int = 4,
    top_v: int = 24,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Seed vocabulary: every substring of length 1..max_piece_len of
    every distinct word, weighted by word frequency; keep the top_v by
    (count DESC, piece ASC) plus ALL single characters (so every word
    stays segmentable). Returns (piece, cnt, cost) with
    cost = length(bin(T)) - length(bin(cnt)), T = the selected
    vocabulary's total count — the quantized -log2 of the unigram
    probability cnt/T."""
    w = F.col(word_col)
    grid = (
        words.select(
            w.alias("__w"), F.col(freq_col).cast("bigint").alias("__f")
        )
        .select(
            "__w",
            "__f",
            F.explode(F.sequence(F.lit(1), F.length("__w"))).alias("__i"),
        )
        .select(
            "__w",
            "__f",
            "__i",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("__w") - F.col("__i") + 1
                    ),
                )
            ).alias("__s"),
        )
        .select(
            F.expr("substring(__w, __i, __s)").alias("piece"),
            F.col("__f").alias("__f"),
        )
    )
    counts = grid.groupBy("piece").agg(F.sum("__f").cast("bigint").alias("cnt"))
    topv = (
        counts.withColumn(
            "__rn", F.row_number().over(Window.orderBy(F.desc("cnt"), "piece"))
        )
        .filter(F.col("__rn") <= top_v)
        .drop("__rn")
    )
    singles = counts.filter(F.length("piece") == 1)
    sel = topv.unionByName(singles).dropDuplicates(["piece"])
    tot = sel.agg(F.sum("cnt").alias("__t"))
    return sel.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.expr(
            "CAST(length(bin(__t)) - length(bin(cnt)) AS BIGINT)"
        ).alias("cost"),
    )


def viterbi_dp_table(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
) -> tuple[DataFrame, DataFrame, int]:
    """The full Viterbi DP table: (word, pos, key) for every prefix
    position of every distinct word, with
    key = -(KEY_BASE * best_prefix_cost + n_pieces_so_far). Returns
    (dp, broadcast-ready vocab, maxlen) so callers can read off final
    states (``viterbi_segment_keys``) or walk optimal paths backward
    (``viterbi_backtrack_usage``).

    Dataflow: ``maxlen`` rounds; each round extends every DP state at
    positions [j - max_piece_len, j) by one vocabulary piece ending
    at j (a broadcast equi-join on the computed substring) and keeps
    the max key per word — O(len * alphabet) state, flattened by a
    localCheckpoint per round like connected_components."""
    w = (
        words.select(F.col(word_col).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .distinct()
    )
    maxlen_row = w.agg(F.max(F.length("word"))).collect()  # bounded scalar
    maxlen = maxlen_row[0][0] or 0
    states = w.select(
        "word",
        F.lit(0).cast("int").alias("pos"),
        F.lit(0).cast("bigint").alias("key"),
    ).localCheckpoint()
    # materialize the (tiny) vocab once — the driver loop would
    # otherwise recompute its grid+window lineage every round
    vb = F.broadcast(vocab.select("piece", "cost").localCheckpoint())
    for j in range(1, maxlen + 1):
        frontier = states.filter(
            (F.col("pos") >= j - max_piece_len)
            & (F.col("pos") < j)
            & (F.length("word") >= j)
        ).withColumn("__piece", F.expr(f"substring(word, pos + 1, {j} - pos)"))
        new = (
            frontier.join(vb, F.col("__piece") == F.col("piece"))
            .groupBy("word")
            .agg(
                F.max(
                    F.col("key") - F.lit(KEY_BASE) * F.col("cost") - F.lit(1)
                ).alias("key")
            )
            .select("word", F.lit(j).cast("int").alias("pos"), "key")
        )
        states = states.unionByName(new).localCheckpoint()
    return states, vb, maxlen


def viterbi_paths_arrow(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
    compute_pieces: bool = True,
) -> DataFrame:
    """Round-10 Arrow twin of the (viterbi_dp_table → segment-keys /
    backtrack) dataflow: per-word exact integer Viterbi AND the
    longest-piece backtrack in ONE mapInPandas pass. Returns
    (word, key, pieces array<string>) — key is the final DP key,
    pieces the optimal path in word order; words with no final state
    (unreachable under vocab) are dropped, exactly like the DP table's
    missing final row.

    Why (r10 sweep): the JVM dataflow is maxlen sequential rounds
    (broadcast join + max-agg + localCheckpoint) per DP sweep, and its
    cost was measured DATA-INDEPENDENT (~0.25 s/round local job floor;
    SCALE.md) — unigram_em_refine pays ~3 DP sweeps + a backtrack
    ≈ 48 sequential barriers at ANY data size. Every word's DP is
    independent and all arithmetic is plain int64 (the engine's
    log-free integer costs — no IEEE-order concerns at all, unlike
    the cosine twins), so one Arrow stage over the distinct-word
    frame computes the identical table with ZERO sequential rounds.
    At 100 TB the distinct-word frame is vocabulary-bounded and
    arrives pre-shuffled (the distinct()), so parallelism is the
    shuffle width, and the 16-barrier latency is gone.

    Equivalence to the JVM twins is STRUCTURAL, not just numeric:
    key[j] = max over p ∈ [j-max_piece_len, j) of
    key[p] - KEY_BASE·cost(word[p+1..j]) - 1 over reachable p with
    in-vocab pieces (the DP rounds' join+max), and the backtrack
    takes the SMALLEST predecessor position satisfying the key
    equation (the JVM row_number orderBy ppos) — pytest pins both
    outputs bitwise against the JVM path on the harness corpus plus
    crafted tie-break words.

    The vocab collect below is a bounded scalar by construction:
    seed_piece_scores returns ≤ top_v + |alphabet| rows (tens), the
    same bounded-collect class as the probe bucket lists.

    NOTE construction is EAGER (ADVICE r10): the vocab collect and
    the duplicate-piece check run a Spark job at DataFrame-BUILD time,
    unlike the fully-lazy pre-r10 JVM twins — callers composing plans
    speculatively pay that job even if the result frame is never
    executed. The broadcast created per call is reclaimed by driver GC
    + ContextCleaner rather than an explicit destroy() (the frame
    outlives this function and may be executed repeatedly, so there is
    no safe destroy point); at the documented bounded-vocab contract
    (tens of entries) the per-call footprint is a few KB — the same
    ContextCleaner reliance as dedup.py's localCheckpoint blocks. If
    vocab bounds ever grow, callers that iterate (em_refine makes two
    broadcasts per invocation) should checkpoint the result and
    destroy the broadcast explicitly.

    ``compute_pieces=False`` skips the backtrack loop and the Arrow
    transfer of the pieces arrays for keys-only consumers
    (viterbi_segment_keys, em_refine's re-segmentation pass) — the
    backtrack roughly doubles per-word Python work and mapInPandas is
    opaque to Spark, so a downstream .select cannot prune it."""
    spark = words.sparkSession
    w = (
        words.select(F.col(word_col).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .distinct()
    )
    cost_rows = vocab.select("piece", "cost").collect()  # bounded scalar
    # Duplicate pieces are REJECTED loudly: dict-last-wins would
    # silently diverge from the JVM twin's join+max (which keeps the
    # cheaper duplicate in the DP), and the JVM twin's own BACKTRACK
    # is ill-defined under duplicates (a spurious (p, dup-cost)
    # candidate can satisfy the key equation off the optimal path).
    # Both real vocab producers (seed_piece_scores, em_refine's
    # usage re-cost) are unique-by-piece by construction.
    costs_map: dict[str, int] = {}
    dups = []
    for r in cost_rows:
        if r["piece"] in costs_map:
            dups.append(r["piece"])
        costs_map[r["piece"]] = int(r["cost"])
    if dups:
        raise ValueError(
            f"vocab has duplicate piece rows {sorted(set(dups))!r} — "
            "segmentation under duplicate costs is ill-defined; "
            "dedupe (e.g. min(cost) per piece) before segmenting"
        )
    bc = spark.sparkContext.broadcast(costs_map)
    kb, mp = KEY_BASE, max_piece_len
    want_pieces = compute_pieces

    def segment(batches):
        import pandas as pd

        costs = bc.value
        for pdf in batches:
            out_w, out_k, out_p = [], [], []
            for word in pdf["word"]:
                n = len(word)
                key: list[int | None] = [None] * (n + 1)
                key[0] = 0
                for j in range(1, n + 1):
                    best = None
                    for p in range(max(0, j - mp), j):
                        kp = key[p]
                        if kp is None:
                            continue
                        c = costs.get(word[p:j])
                        if c is None:
                            continue
                        k = kp - kb * c - 1
                        if best is None or k > best:
                            best = k
                    key[j] = best
                if key[n] is None:
                    continue  # no final state — word drops out
                out_w.append(word)
                out_k.append(key[n])
                if not want_pieces:
                    continue
                pieces = []
                j = n
                while j > 0:
                    # smallest predecessor position == longest piece
                    # (the JVM row_number().orderBy(ppos) tie-break)
                    for p in range(max(0, j - mp), j):
                        kp = key[p]
                        if kp is None:
                            continue
                        c = costs.get(word[p:j])
                        if c is None:
                            continue
                        if key[j] == kp - kb * c - 1:
                            pieces.append(word[p:j])
                            j = p
                            break
                    else:  # pragma: no cover — DP guarantees a pred
                        raise AssertionError(f"no predecessor: {word}@{j}")
                pieces.reverse()
                out_p.append(pieces)
            data = {"word": out_w, "key": out_k}
            if want_pieces:
                data["pieces"] = out_p
            yield pd.DataFrame(data)

    schema = (
        "word string, key long, pieces array<string>"
        if compute_pieces
        else "word string, key long"
    )
    return w.mapInPandas(segment, schema)


def usage_from_paths(
    paths: DataFrame,
    words: DataFrame,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Piece-usage census from a :func:`viterbi_paths_arrow` frame:
    explode the optimal pieces and weight by word frequency. Shared by
    :func:`viterbi_backtrack_usage` and unigram_em_refine's E-step so
    the two can never drift."""
    wf = words.select(
        F.col(word_col).alias("word"), F.col(freq_col).alias("freq")
    )
    return (
        paths.select("word", F.explode("pieces").alias("piece"))
        .join(wf, "word")
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("usage"))
    )


def viterbi_segment_keys(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
) -> DataFrame:
    """Exact integer Viterbi over each distinct word: returns
    (word, key) where key = -(KEY_BASE * best_total_cost + n_pieces)
    for the optimal segmentation under ``vocab``'s (piece, cost).
    Words longer than ``max_word_len`` are excluded (callers report
    them; none exist in the harness corpus). Unsegmentable words (a
    character outside the vocab) simply never reach a final state and
    drop out — seed_piece_scores keeps all single chars precisely so
    this cannot happen when vocab and words share a corpus.

    Since round 10 the query path is the single Arrow pass
    (:func:`viterbi_paths_arrow`, keys-only mode — the backtrack and
    its Arrow transfer are skipped for this consumer);
    :func:`viterbi_segment_keys_jvm` keeps the distributed-DP dataflow
    as the pinned reference twin."""
    return viterbi_paths_arrow(
        words, vocab, max_piece_len, max_word_len, word_col,
        compute_pieces=False,
    )


def viterbi_segment_keys_jvm(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
) -> DataFrame:
    """Pre-round-10 distributed-DP segment keys — the pinned reference
    twin of the Arrow path (see viterbi_paths_arrow's equivalence
    note); not on the query path."""
    dp, _, _ = viterbi_dp_table(
        words, vocab, max_piece_len, max_word_len, word_col
    )
    return dp.filter(F.col("pos") == F.length("word")).select("word", "key")


def viterbi_backtrack_usage(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Piece USAGE census from the single-pass Arrow path (round 10):
    explode each word's optimal pieces and weight by word frequency
    (:func:`usage_from_paths` — shared with unigram_em_refine's
    E-step). Same output contract as
    :func:`viterbi_backtrack_usage_jvm` (the pinned DP-table walk):
    usage conservation and the longest-piece tie-break hold
    identically (pytest-pinned bitwise)."""
    paths = viterbi_paths_arrow(
        words, vocab, max_piece_len, max_word_len, word_col
    )
    return usage_from_paths(paths, words, word_col, freq_col)


def viterbi_backtrack_usage_jvm(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Piece USAGE census: walk each word's optimal segmentation
    backward through the DP table and count how often every
    vocabulary piece is actually used, weighted by word frequency —
    the M-step statistic of unigram-LM EM and the input to vocabulary
    pruning (a seeded piece with ~zero usage is dead weight).

    Path recovery: from the final state, a valid predecessor at pos p
    satisfies key(j) = key(p) - KEY_BASE*cost(word[p+1..j]) - 1; ties
    between equally-optimal paths break deterministically toward the
    SMALLEST p (the longest piece — the standard tokenizer
    preference), via a per-word row_number. ``maxlen`` bounded rounds,
    each a self-join of the (word, pos) frame with the broadcast
    vocab; usage conservation (sum = sum(freq * n_pieces)) is pinned
    in pytest and by construction in the oracle twin."""
    dp, vb, maxlen = viterbi_dp_table(
        words, vocab, max_piece_len, max_word_len, word_col
    )
    cur = (
        dp.filter(F.col("pos") == F.length("word"))
        .select("word", "pos", "key")
        .localCheckpoint()
    )
    pieces: DataFrame | None = None
    for _ in range(maxlen):
        cand = (
            cur.filter(F.col("pos") > 0)
            .alias("c")
            .join(
                dp.alias("p"),
                (F.col("p.word") == F.col("c.word"))
                & (F.col("p.pos") >= F.col("c.pos") - max_piece_len)
                & (F.col("p.pos") < F.col("c.pos")),
            )
            .withColumn(
                "__piece",
                F.expr("substring(c.word, p.pos + 1, c.pos - p.pos)"),
            )
            .join(vb, F.col("__piece") == F.col("piece"))
            .filter(
                F.col("c.key")
                == F.col("p.key") - F.lit(KEY_BASE) * F.col("cost") - F.lit(1)
            )
            .select(
                F.col("c.word").alias("word"),
                F.col("p.pos").alias("ppos"),
                F.col("p.key").alias("pkey"),
                F.col("__piece").alias("piece"),
            )
        )
        chosen = (
            cand.withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("word").orderBy("ppos")),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()
        )
        emitted = chosen.select("word", "piece")
        pieces = emitted if pieces is None else pieces.unionByName(emitted)
        cur = chosen.select(
            "word", F.col("ppos").alias("pos"), F.col("pkey").alias("key")
        )
    assert pieces is not None
    wf = words.select(
        F.col(word_col).alias("word"), F.col(freq_col).alias("freq")
    )
    return pieces.join(wf, "word").groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("usage")
    )
