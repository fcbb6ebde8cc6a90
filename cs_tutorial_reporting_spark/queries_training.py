"""Registrations for the training-data-pipeline operators ([EXT] north
star): corpus bigram-LM novelty scoring, token-window chunking with
chunk-level duplication stats, int8 embedding quantization with a
reconstruction-error audit, winnowing containment pairs, sequence
packing (concat-and-chunk pretraining layout), and mixture-weighted
training order.

Oracle notes: novelty and chunking emit integer counts plus rationals
of integers (portable floor-round) — bit-exact cross-engine; the
quantization audit's only order-sensitive float is the self-dot, which
reuses the fold ⇄ ``list_dot_product`` parity the similarity queries
already hash-match at round-6 (operators/similarity.py:179).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .duck_sql import HASH60_SQL, NORM_SQL, WINNOW_SQL
from .queries_ext import _QUALITY_SQL, _occ_sql
from .queries import register, t

_TOKS = f"string_split({NORM_SQL.format(col='text')}, ' ')"


@register(
    "ngram_novelty_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS ts FROM documents
    ), flat AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS gram
        FROM toks
    ), model AS (
        SELECT gram, count(*) AS cnt FROM flat GROUP BY gram
    )
    SELECT f.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(CASE WHEN m.cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare,
           floor(CAST(sum(CASE WHEN m.cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS novelty
    FROM flat f JOIN model m USING (gram)
    GROUP BY f.doc_id
    """,
)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM novelty per document (operators/
    ngram_lm.py): fraction of a document's bigrams that are corpus-rare
    — the integer-exact stand-in for perplexity filtering."""
    from .operators.ngram_lm import novelty_scores

    return novelty_scores(t(spark, sf_dir, "documents"))


@register(
    "ngram_cross_domain_rarity",
    oracle=f"""
    WITH ref AS (
        SELECT doc_id, {_TOKS} AS ts FROM documents WHERE source = 'src1'
    ), tgt AS (
        SELECT doc_id, {_TOKS} AS ts FROM documents WHERE source <> 'src1'
    ), model AS (
        SELECT gram, count(*) AS cnt FROM (
            SELECT unnest(list_transform(range(1, len(ts)),
                                         i -> ts[i] || ' ' || ts[i + 1])) AS gram
            FROM ref
        ) GROUP BY gram
    ), flat AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS gram
        FROM tgt
    )
    SELECT f.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(CASE WHEN m.cnt IS NULL OR m.cnt <= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rare,
           floor(CAST(sum(CASE WHEN m.cnt IS NULL OR m.cnt <= 2
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) * 10000 + 0.5) / 10000 AS rarity
    FROM flat f LEFT JOIN model m USING (gram)
    GROUP BY f.doc_id
    """,
)
def ngram_cross_domain_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT domain scoring (operators/ngram_lm.py
    cross_rarity_scores): the bigram model trains on the curated
    reference split (source='src1') and scores every OTHER source's
    documents against it — unseen grams count as rare (LEFT join), the
    out-of-vocabulary mass a cross-perplexity penalizes, kept
    integer-rational so both engines agree bit-for-bit. The standard
    "filter the crawl against a trusted reference" pipeline stage."""
    from .operators.ngram_lm import cross_rarity_scores

    d = t(spark, sf_dir, "documents")
    return cross_rarity_scores(
        d.filter(F.col("source") == "src1"),
        d.filter(F.col("source") != "src1"),
    )


@register(
    "doc_chunking_stats",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, {_TOKS} AS ts FROM documents
    ), chunks AS (
        SELECT source, doc_id,
               unnest(list_transform(
                   range(0, CAST(greatest(ceil(len(ts) / 64.0), 1) AS BIGINT)),
                   i -> {HASH60_SQL.format(
                       x="array_to_string(ts[i * 64 + 1 : i * 64 + 64], ' ')")}
               )) AS chunk_hash
        FROM toks
    ), per_kind AS (
        SELECT source, chunk_hash,
               count(*) AS n, count(DISTINCT doc_id) AS nd
        FROM chunks GROUP BY source, chunk_hash
    ), docs_per AS (
        SELECT source, count(DISTINCT doc_id) AS n_docs
        FROM documents GROUP BY source
    )
    SELECT d.source, d.n_docs,
           CAST(sum(k.n) AS BIGINT) AS n_chunks,
           count(*) AS n_chunk_kinds,
           CAST(sum(CASE WHEN k.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_doc_kinds
    FROM per_kind k JOIN docs_per d USING (source)
    GROUP BY d.source, d.n_docs
    """,
)
def doc_chunking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token training-shard chunking + chunk-level duplication per
    source (operators/chunking.py): how many context-window chunks the
    corpus yields, and how many chunk kinds recur across documents —
    what document-level dedup cannot see."""
    from .operators.chunking import chunking_stats

    return chunking_stats(t(spark, sf_dir, "documents"))


@register(
    "embedding_int8_quantize",
    oracle="""
    WITH s AS (
        SELECT vec_id, v,
               CASE WHEN amax = 0 THEN 1.0 ELSE amax / 127 END AS scale
        FROM (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   list_max(list_transform(embedding::DOUBLE[],
                                           x -> abs(x))) AS amax
            FROM embeddings
        )
    ), q AS (
        SELECT vec_id, v, scale,
               list_transform(v, x -> CAST(floor(x / scale + 0.5)
                                           AS BIGINT)) AS qa
        FROM s
    )
    SELECT vec_id,
           round(scale, 6) AS scale,
           CAST(len(list_filter(qa, x -> abs(x) >= 127)) AS BIGINT) AS n_sat,
           CAST(list_sum(list_transform(qa, x -> x * x)) AS BIGINT)
               AS int_dot,
           round(list_max(list_transform(range(1, len(v) + 1),
                 i -> abs(qa[i] * scale - v[i]))), 6) AS max_abs_err,
           round(CASE WHEN list_dot_product(v, v) = 0 THEN 0.0
                      ELSE abs(CAST(list_sum(list_transform(qa, x -> x * x))
                                    AS DOUBLE) * scale * scale
                               - list_dot_product(v, v))
                           / list_dot_product(v, v) END, 6) AS rel_err
    FROM q
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit over the embedding corpus
    (operators/quantize.py): per-vector scale, saturation count, exact
    quantized self-dot, worst per-lane reconstruction error, and
    relative self-dot error."""
    from .operators.quantize import quantization_report

    return quantization_report(t(spark, sf_dir, "embeddings"))


@register(
    "winnow_containment_pairs",
    oracle=f"""
    WITH flat AS ({WINNOW_SQL}),
    keep AS (
        SELECT fp FROM flat GROUP BY fp
        HAVING count(*) >= 2 AND count(*) <= 50
    ),
    kept AS (SELECT f.doc_id, f.fp FROM flat f JOIN keep USING (fp))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
    FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    HAVING count(*) >= 20
    """,
)
def winnow_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment candidates over shared winnowing fingerprints
    (operators/dedup.py::winnow_containment_pairs) — catches a small
    document pasted INTO a larger one, where set-Jaccard (minhash)
    dilutes below threshold."""
    from .operators.dedup import winnow_containment_pairs

    return winnow_containment_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id"
    )


@register(
    "sequence_packing_stats",
    bench=True,
    oracle="""
    WITH toks AS (
        SELECT source, doc_id, doc_id % 4 AS shard,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                    AS BIGINT) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT source, shard, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM toks
    ), layout AS (
        SELECT source, shard, n_tokens,
               (cum - n_tokens) // 512 AS first_seq,
               greatest((cum - 1) // 512, (cum - n_tokens) // 512) AS last_seq
        FROM packed
    )
    SELECT source, shard, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(ceil(sum(n_tokens) / 512.0) AS BIGINT) AS n_sequences,
           CAST(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_straddling,
           CASE WHEN sum(n_tokens) > 0 THEN
               floor(CAST(sum(n_tokens) AS DOUBLE)
                     / (ceil(sum(n_tokens) / 512.0) * 512) * 10000) / 10000
           ELSE NULL END AS fill_ratio
    FROM layout GROUP BY source, shard
    """,
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining concat-and-chunk layout (operators/packing.py): docs
    are deterministically sharded (doc_id % 4) per source, each shard's
    token stream is cut every 512 tokens, and the report gives per-shard
    sequence counts, boundary-straddling docs, and fill ratio — the
    sample-packing primitive of every LLM data pipeline, as one window
    cumsum with no Python in the plan."""
    from .functions.text import whitespace_token_count
    from .operators.packing import pack_sequences, packing_summary

    d = t(spark, sf_dir, "documents")
    packed = pack_sequences(
        d, whitespace_token_count(d["text"]), max_tokens=512, n_shards=4
    )
    return packing_summary(packed, max_tokens=512)


def mix_order(d: DataFrame, limit: int = 64) -> DataFrame:
    """The mixture-order core over any (source, doc_id) frame: weights
    from the source's numeric suffix (1-4), portable-hash shuffle within
    source, stride-12/w interleave, top-``limit`` head.

    Tie determinism: when two sources share a weight, their docs land
    on IDENTICAL interleave positions every stride — the ORDER BY
    breaks those ties by (source ASC, src_rank ASC), so the schedule
    head is a pure function of the data (pinned by an exact-schedule
    pytest on an equal-weight fixture). A future source-list change
    can reorder ties only by changing source NAMES, never silently."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .functions.text import hash60

    w_src = Window.partitionBy("source").orderBy(
        hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "source",
        "doc_id",
        (
            F.regexp_extract("source", "([0-9]+)", 1).cast("bigint") % 4 + 1
        ).alias("w"),
        F.row_number().over(w_src).alias("src_rank"),
    )
    out = ranked.select(
        "source",
        "doc_id",
        F.col("src_rank").cast("bigint").alias("src_rank"),
        F.expr("(src_rank - 1) * 12 div w").alias("interleave_pos"),
    )
    return out.orderBy("interleave_pos", "source", "src_rank").limit(limit)



@register(
    "training_mix_order",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id,
               CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 4 + 1
                   AS w,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                                     1, 15)) AS BIGINT),
                            doc_id
               ) AS src_rank
        FROM documents
    )
    SELECT source, doc_id, src_rank,
           (src_rank - 1) * 12 // w AS interleave_pos
    FROM ranked
    ORDER BY interleave_pos, source, src_rank
    LIMIT 64
    """,
)
def training_mix_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture-weighted training order: each source gets
    an integer weight (here derived from its numeric suffix, 1-4), docs
    shuffle within their source by portable hash, and sources interleave
    by stride 12/w — weight-4 sources appear 4x as often as weight-1 in
    any prefix of the schedule. Pure window + TakeOrderedAndProject
    (top-64): no global sort materializes, so the schedule head is
    computable at any corpus size; epochs shift the hash salt. Core
    logic (and the equal-weight tie contract) in :func:`mix_order`."""
    return mix_order(t(spark, sf_dir, "documents"), limit=64)


def _bpe_cte(n_merges: int) -> str:
    """Shared WITH-body for the BPE oracles: word frequencies → char
    sequences → ``n_merges`` unrolled rounds of (pair counts → top-1 by
    (cnt DESC, pair ASC) → two-pass padded replace — the exact merge
    semantics of operators/bpe.py's ``_apply_merge``, including
    back-to-back repeats)."""
    parts = [r"""
    WITH wf AS (
        SELECT w AS word, count(*) AS freq FROM (
            SELECT unnest(string_split(
                trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    v0 AS (
        SELECT word, freq,
               concat(trim(regexp_replace(word, '(.)', '\1 ', 'g')),
                      ' </w>') AS seq
        FROM wf
    )"""]
    for r in range(1, n_merges + 1):
        prev = f"v{r - 1}"
        parts.append(f""",
    p{r} AS (
        SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM (
            SELECT freq, unnest(list_transform(range(1, len(ts)),
                                i -> ts[i] || ' ' || ts[i + 1])) AS pair
            FROM (SELECT freq, string_split(seq, ' ') AS ts FROM {prev})
        ) GROUP BY pair
    ),
    t{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
    v{r} AS (
        SELECT word, freq, trim(replace(replace(' ' || seq || ' ',
            ' ' || (SELECT pair FROM t{r}) || ' ',
            ' ' || (SELECT replace(pair, ' ', '') FROM t{r}) || ' '),
            ' ' || (SELECT pair FROM t{r}) || ' ',
            ' ' || (SELECT replace(pair, ' ', '') FROM t{r}) || ' ')) AS seq
        FROM {prev}
    )""")
    return "".join(parts)


def _bpe_oracle(n_merges: int) -> str:
    """DuckDB replication of the FULL BPE training loop — the learned
    merge table is hash-checked end-to-end (CTE rounds in
    :func:`_bpe_cte`)."""
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, pair, "
        f"replace(pair, ' ', '') AS merged, cnt FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return _bpe_cte(n_merges) + "\n    " + selects


def _bpe_tokenize_oracle(n_merges: int) -> str:
    """Tokenizer ENCODE oracle: train (the same unrolled rounds), then
    apply the learned merges in rank order to every document's flat
    ``</w>``-marked char sequence — the identical two-pass padded
    replace — and count tokens. Mirrors
    operators/bpe.py::bpe_tokenize_stats exactly."""
    parts = [_bpe_cte(n_merges), r""",
    docs AS (
        SELECT doc_id,
               trim(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        FROM documents
    ),
    a0 AS (
        SELECT doc_id, norm,
               CASE WHEN norm = '' THEN '' ELSE
                   array_to_string(list_transform(
                       string_split(norm, ' '),
                       w -> concat(trim(regexp_replace(w, '(.)', '\1 ', 'g')),
                                   ' </w>')), ' ')
               END AS seq
        FROM docs
    )"""]
    for r in range(1, n_merges + 1):
        prev = f"a{r - 1}"
        parts.append(f""",
    a{r} AS (
        SELECT doc_id, norm, trim(replace(replace(' ' || seq || ' ',
            ' ' || (SELECT pair FROM t{r}) || ' ',
            ' ' || (SELECT replace(pair, ' ', '') FROM t{r}) || ' '),
            ' ' || (SELECT pair FROM t{r}) || ' ',
            ' ' || (SELECT replace(pair, ' ', '') FROM t{r}) || ' ')) AS seq
        FROM {prev}
    )""")
    parts.append(f"""
    SELECT doc_id,
           CAST(CASE WHEN norm = '' THEN 0
                ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_words,
           CAST(length(replace(norm, ' ', '')) AS BIGINT) AS n_chars,
           CAST(CASE WHEN seq = '' THEN 0
                ELSE len(string_split(seq, ' ')) END AS BIGINT) AS n_tokens
    FROM a{n_merges}""")
    return "".join(parts)


@register("bpe_merge_ranks", oracle=_bpe_oracle(3))
def bpe_merge_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): ONE
    corpus-sized word-count shuffle, then 3 merge rounds over the
    vocabulary-sized word table — each round a map + tiny aggregation
    plus a 1-row driver scalar (the watermark pattern), which is why
    the loop costs the same at 100 TB as at sf0.01 once words are
    counted. Returns the learned merge table (rank, pair, merged,
    count); the oracle unrolls the identical loop in SQL, so training
    is value-checked end-to-end including tie-breaks and the two-pass
    replace semantics on repeats."""
    from .operators.bpe import bpe_merge_table

    return bpe_merge_table(t(spark, sf_dir, "documents"), "text", n_merges=3)


@register("bpe_tokenize_stats", oracle=_bpe_tokenize_oracle(3))
def bpe_tokenize_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer's ENCODE path (operators/bpe.py
    bpe_tokenize_stats): train 3 merges, then apply them in rank order
    to every document — a pure per-row expression map (the merge table
    is k driver scalars), zero shuffles, so tokenizing 100 TB costs one
    linear pass. Flat-sequence application is provably equivalent to
    per-word (no learned pair can fire across a ``</w>`` boundary —
    operator docstring). Per-doc word/char/token counts are
    value-checked against the fully unrolled train+apply pipeline in
    SQL."""
    from .operators.bpe import bpe_tokenize_stats, bpe_train

    d = t(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, "text", n_merges=3)
    return bpe_tokenize_stats(d, "text", "doc_id", merges)


@register(
    "doc_length_mad_by_lang",
    oracle="""
    WITH med AS (
        SELECT lang, median(length(text)) AS med_len
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           round(any_value(m.med_len), 1) AS med_len,
           round(median(abs(length(d.text) - m.med_len)), 1) AS mad_len,
           count(*) AS n_docs
    FROM documents d JOIN med m USING (lang)
    GROUP BY d.lang
    """,
)
def doc_length_mad_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-language length dispersion — median absolute
    deviation, the outlier-resistant spread statistic a corpus-quality
    audit wants (stddev is dominated by the boilerplate tail). No
    built-in MAD exists, so this showcases the GROUPED-AGG Arrow
    pandas_udf class (the one UDF class the engine had not yet
    exercised — scalar pandas_udf, grouped-map applyInPandas, stateful
    applyInPandasWithState, and mapInPandas are all in service
    elsewhere): one Arrow batch per group → NumPy medians, never
    row-at-a-time Python. Median parity: np.median and DuckDB median
    both average the two middle values on even counts; the round-1
    grid keeps the comparison exact."""
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def med(v: pd.Series) -> float:
        return float(np.median(v.to_numpy()))

    @F.pandas_udf("double")
    def mad(v: pd.Series) -> float:
        x = v.to_numpy().astype("float64")
        return float(np.median(np.abs(x - np.median(x))))

    # Spark disallows mixing grouped-agg pandas UDFs with JVM
    # aggregates in one agg(), so the count is a pandas aggregate too
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    d = t(spark, sf_dir, "documents").select(
        "lang", F.length("text").alias("len")
    )
    return d.groupBy("lang").agg(
        F.round(med(F.col("len")), 1).alias("med_len"),
        F.round(mad(F.col("len")), 1).alias("mad_len"),
        n_rows(F.col("len")).alias("n_docs"),
    )


@register(
    "hard_negative_mining",
    oracle="""
    SELECT query_id, query_label, vec_id, neg_label, cos, rank FROM (
        SELECT q.vec_id AS query_id, q.label AS query_label, e.vec_id,
               e.label AS neg_label,
               round(list_cosine_similarity(e.embedding::DOUBLE[],
                                            q.embedding::DOUBLE[]), 6) AS cos,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[],
                                  q.embedding::DOUBLE[]), 6) DESC, e.vec_id
               ) AS BIGINT) AS rank
        FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 8) q
        WHERE e.label <> q.label
    ) WHERE rank <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-5 most-similar vectors with a DIFFERENT label —
    the negatives that sit closest to the decision boundary, which is
    what makes a contrastive batch informative (random negatives are
    trivially separable). Exact cosine baseline (the mining twin of
    similarity_topk_bruteforce with the label-mismatch predicate).

    100 TB: anchors broadcast (mining runs per anchor block); the
    label-mismatch filter lands pre-window, so ranked state is k per
    (anchor, partition). At full scale the same predicate rides the
    IVF/PQ probe path instead of the exact scan — mining accuracy
    degrades gracefully with the index's recall, and the label filter
    is free either way.
    """
    from pyspark.sql.window import Window

    from .functions.vectors import cosine_flat

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("query_vec"),
    )
    pairs = e.crossJoin(F.broadcast(q)).filter(
        F.col("label") != F.col("query_label")
    )
    scored = pairs.select(
        "query_id",
        "query_label",
        "vec_id",
        F.col("label").alias("neg_label"),
        F.round(cosine_flat("embedding", "query_vec", 64), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )


@register(
    "embedding_dim_covariance_topk",
    oracle="""
    WITH x AS MATERIALIZED (
        SELECT vec_id, i,
               CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000 + 0.5)
                    AS BIGINT) AS v
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
    ),
    nn AS (SELECT count(*)::HUGEINT AS n FROM embeddings),
    s1 AS MATERIALIZED (SELECT i, sum(v)::HUGEINT AS s FROM x GROUP BY i),
    s2 AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(a.v * b.v)::HUGEINT AS sij
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ),
    vi AS (SELECT i, sij AS sii FROM s2 WHERE i = j)
    SELECT CAST(s2.i AS BIGINT) AS dim_i,
           CAST(s2.j AS BIGINT) AS dim_j,
           CAST(nn.n * s2.sij - sa.s * sb.s AS BIGINT) AS cov_num,
           CAST(nn.n * va.sii - sa.s * sa.s AS BIGINT) AS var_i_num,
           CAST(nn.n * vb.sii - sb.s * sb.s AS BIGINT) AS var_j_num
    FROM s2
    JOIN s1 sa ON sa.i = s2.i
    JOIN s1 sb ON sb.i = s2.j
    JOIN vi va ON va.i = s2.i
    JOIN vi vb ON vb.i = s2.j
    CROSS JOIN nn
    WHERE s2.i < s2.j
    ORDER BY abs(CAST(nn.n * s2.sij - sa.s * sb.s AS BIGINT)) DESC,
             s2.i, s2.j
    LIMIT 10
    """,
)
def embedding_dim_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-correlation audit: the 10 most-covarying embedding
    dimension pairs, in EXACT integer arithmetic — e4 fixed-point per
    element (float32 promoted to DOUBLE before the snap, the measured
    round-6 gotcha), then cov_num = n·Σxy − Σx·Σy alongside the two
    variance numerators so correlation is one offline divide away.
    Redundant/duplicated dimensions (a projection-head bug, a repeated
    feature) surface here before any training run.

    100 TB: the reduction is an Arrow ``mapInArrow`` matmul — each
    batch emits its Xᵀ·X partial (64×64 ints) and column sums, so the
    shuffle carries ~2 k scalars per batch regardless of row count
    (the canonical map-side-combine outer product); integer partials
    are exact under any summation order, which is what keeps the
    DuckDB join-form oracle bit-identical. The alternative explode +
    self-join form shuffles n·d² rows — measured as the oracle's own
    plan, it is the shape this operator exists to avoid.
    """
    DIM = 64

    def op(batches):
        import pyarrow as pa

        for tbl in batches:
            if tbl.num_rows == 0:
                continue
            col = tbl.column(0)
            arr = np.stack(
                [np.asarray(x, dtype=np.float64) for x in col.to_pylist()]
            )
            x = np.floor(arr * 10000.0 + 0.5).astype(np.int64)
            s1 = x.sum(axis=0)
            s2 = x.T @ x
            iu, ju = np.triu_indices(DIM)
            i_out = np.concatenate(
                [iu + 1, np.arange(1, DIM + 1), np.array([-1])]
            ).astype(np.int32)
            j_out = np.concatenate(
                [ju + 1, np.full(DIM, -1), np.array([-1])]
            ).astype(np.int32)
            v_out = np.concatenate(
                [s2[iu, ju], s1, np.array([tbl.num_rows])]
            ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(i_out), pa.array(j_out), pa.array(v_out)],
                names=["i", "j", "v"],
            )

    e = t(spark, sf_dir, "embeddings").select("embedding")
    parts = e.mapInArrow(op, schema="i int, j int, v bigint")
    agg = parts.groupBy("i", "j").agg(F.sum("v").alias("v")).localCheckpoint()
    n = agg.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    s1 = agg.filter((F.col("i") > 0) & (F.col("j") == -1)).select(
        "i", F.col("v").alias("s")
    )
    s2 = agg.filter((F.col("i") > 0) & (F.col("j") > 0)).select(
        "i", "j", F.col("v").alias("sij")
    )
    vi = s2.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("vd"), F.col("sij").alias("sii")
    )
    out = (
        s2.filter(F.col("i") < F.col("j"))
        .join(F.broadcast(s1.toDF("i", "sa")), "i")
        .join(F.broadcast(s1.toDF("j", "sb")), "j")
        .join(F.broadcast(vi.toDF("i", "via")), "i")
        .join(F.broadcast(vi.toDF("j", "vib")), "j")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("i").cast("bigint").alias("dim_i"),
            F.col("j").cast("bigint").alias("dim_j"),
            (F.col("n") * F.col("sij") - F.col("sa") * F.col("sb"))
            .cast("bigint")
            .alias("cov_num"),
            (F.col("n") * F.col("via") - F.col("sa") * F.col("sa"))
            .cast("bigint")
            .alias("var_i_num"),
            (F.col("n") * F.col("vib") - F.col("sb") * F.col("sb"))
            .cast("bigint")
            .alias("var_j_num"),
        )
    )
    return out.orderBy(
        F.abs(F.col("cov_num")).desc(), "dim_i", "dim_j"
    ).limit(10)


@register(
    "epoch_repetition_plan",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({{TOK}}) AS BIGINT) AS corpus_tokens,
               CAST((CAST(substr(source, 4) AS BIGINT) + 1) * 1000000
                    // 210 AS BIGINT) AS weight_ppm
        FROM documents GROUP BY source
    ),
    planned AS (
        SELECT source, n_docs, corpus_tokens, weight_ppm,
               CAST(1000000 * weight_ppm // 1000000 AS BIGINT) AS alloc_tokens
        FROM per_source
    )
    SELECT source, n_docs, corpus_tokens, weight_ppm, alloc_tokens,
           CAST(least(alloc_tokens * 1000 // corpus_tokens, 4000)
                AS BIGINT) AS epochs_e3,
           CAST(least(alloc_tokens, corpus_tokens * 4) AS BIGINT)
               AS sampled_tokens,
           CAST(alloc_tokens - least(alloc_tokens, corpus_tokens * 4)
                AS BIGINT) AS shortfall_tokens
    FROM planned
    """.replace("{TOK}", "(" + _occ_sql("text", " ") + " + 1)"),
)
def epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixture planning (Muennighoff et al. 2023,
    arXiv:2305.16264 — repeating data beyond ~4 epochs stops helping):
    given target mixture weights (deterministic ramp over sources,
    (i+1)/210) and a 1M-token budget, compute each source's allocated
    tokens, the repetition factor in milli-epochs, the cap at 4
    epochs, and the unfillable shortfall a re-weighting pass would
    redistribute. Integer-exact throughout (ppm weights, truncating
    div) — the planner's numbers must not drift between the engine
    that plans and the engine that samples.

    One corpus scan (token counts are a pure expression) + a
    20-row planning frame: the plan costs nothing next to the sample
    it governs; at 100 TB the scan rides whatever quality pass already
    reads the text.
    """
    from .functions.text import whitespace_token_count

    d = t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(whitespace_token_count(F.col("text")))
        .cast("bigint")
        .alias("corpus_tokens"),
    )
    planned = per.select(
        "source",
        "n_docs",
        "corpus_tokens",
        F.expr(
            "CAST((CAST(substr(source, 4) AS BIGINT) + 1) * 1000000"
            " div 210 AS BIGINT)"
        ).alias("weight_ppm"),
    ).withColumn(
        "alloc_tokens",
        F.expr("CAST(1000000 * weight_ppm div 1000000 AS BIGINT)"),
    )
    return planned.select(
        "source",
        "n_docs",
        "corpus_tokens",
        "weight_ppm",
        "alloc_tokens",
        F.expr(
            "CAST(least(alloc_tokens * 1000 div corpus_tokens, 4000)"
            " AS BIGINT)"
        ).alias("epochs_e3"),
        F.expr(
            "CAST(least(alloc_tokens, corpus_tokens * 4) AS BIGINT)"
        ).alias("sampled_tokens"),
        F.expr(
            "CAST(alloc_tokens - least(alloc_tokens, corpus_tokens * 4)"
            " AS BIGINT)"
        ).alias("shortfall_tokens"),
    )


@register(
    "quality_curriculum_phases",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, ({{Q}}) AS q,
               ({_occ_sql('text', ' ')} + 1) AS toks
        FROM (SELECT doc_id, source, text,
                     CAST({_occ_sql('text', ' ')} + 1 AS DOUBLE) AS nw
              FROM documents)
    ),
    qint AS (
        SELECT doc_id, source, toks,
               CAST(floor(q * 10000 + 0.5) AS BIGINT) AS q4
        FROM scored
    ),
    hist AS (
        SELECT q4, count(*) AS cnt FROM qint GROUP BY q4
    ),
    cum AS (
        SELECT q4,
               sum(cnt) OVER (ORDER BY q4) AS c,
               sum(cnt) OVER () AS tot
        FROM hist
    ),
    bounds AS (
        SELECT min(CASE WHEN c * 4 >= tot * 1 THEN q4 END) AS b1,
               min(CASE WHEN c * 4 >= tot * 2 THEN q4 END) AS b2,
               min(CASE WHEN c * 4 >= tot * 3 THEN q4 END) AS b3
        FROM cum
    ),
    phased AS (
        SELECT doc_id, source, toks, q4,
               CASE WHEN q4 <= b.b1 THEN 1
                    WHEN q4 <= b.b2 THEN 2
                    WHEN q4 <= b.b3 THEN 3
                    ELSE 4 END AS phase
        FROM qint, bounds b
    ),
    per_source AS (
        SELECT phase, source, count(*) AS sn FROM phased
        GROUP BY phase, source
    ),
    src_stats AS (
        SELECT phase, count(*) AS n_sources, max(sn) AS top_sn
        FROM per_source GROUP BY phase
    )
    SELECT p.phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(p.q4) AS BIGINT) AS lo_q4,
           CAST(max(p.q4) AS BIGINT) AS hi_q4,
           CAST(sum(p.toks) AS BIGINT) AS total_tokens,
           CAST(any_value(s.n_sources) AS BIGINT) AS n_sources,
           CAST(any_value(s.top_sn) * 1000000 // count(*) AS BIGINT)
               AS top_source_share_ppm
    FROM phased p JOIN src_stats s USING (phase)
    GROUP BY p.phase
    """.replace("{Q}", _QUALITY_SQL),
)
def quality_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum assembly: split the corpus into FOUR equi-depth
    quality phases (train low→high quality last, or vice versa —
    curriculum-learning's data side) WITHOUT a global sort: the
    e4-snapped quality histogram yields the three quartile bounds by
    integer cross-multiplication (the percentile-crossing technique),
    and phase assignment is a broadcast CASE — map-combinable
    shuffles over O(distinct scores) state only. Per phase: doc/token
    mass, score range, source diversity, and the top-source share
    (a curriculum phase dominated by one source is a sampling bug).
    """
    from pyspark.sql import Window

    from .functions.text import quality_score, whitespace_token_count

    d = t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        whitespace_token_count(F.col("text")).alias("toks"),
        F.floor(quality_score(F.col("text")) * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("q4"),
    )
    hist = scored.groupBy("q4").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("q4").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()
    cum = hist.select(
        "q4",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(wtot).alias("tot"),
    )
    bounds = cum.agg(
        F.min(F.when(F.col("c") * 4 >= F.col("tot") * 1, F.col("q4"))).alias("b1"),
        F.min(F.when(F.col("c") * 4 >= F.col("tot") * 2, F.col("q4"))).alias("b2"),
        F.min(F.when(F.col("c") * 4 >= F.col("tot") * 3, F.col("q4"))).alias("b3"),
    )
    phased = scored.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "source",
        "toks",
        "q4",
        F.when(F.col("q4") <= F.col("b1"), 1)
        .when(F.col("q4") <= F.col("b2"), 2)
        .when(F.col("q4") <= F.col("b3"), 3)
        .otherwise(4)
        .alias("phase"),
    )
    per_source = phased.groupBy("phase", "source").agg(
        F.count("*").alias("sn")
    )
    src_stats = per_source.groupBy("phase").agg(
        F.count("*").alias("n_sources"), F.max("sn").alias("top_sn")
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("q4").cast("bigint").alias("lo_q4"),
            F.max("q4").cast("bigint").alias("hi_q4"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
        )
        .join(F.broadcast(src_stats), "phase")
        .select(
            "phase",
            "n_docs",
            "lo_q4",
            "hi_q4",
            "total_tokens",
            F.col("n_sources").cast("bigint").alias("n_sources"),
            F.expr(
                "CAST(top_sn * 1000000 div n_docs AS BIGINT)"
            ).alias("top_source_share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) Viterbi segmentation
# ---------------------------------------------------------------------------


def _unigram_cte(
    max_piece_len: int = 4, top_v: int = 24, max_word_len: int = 12
) -> str:
    """Shared WITH-body for the unigram oracles — seed substring
    counts, top-V + single-char vocab with quantized -log2 bit costs,
    and the integer Viterbi DP unrolled to ``max_word_len``
    MATERIALIZED levels (each level is referenced by up to
    ``max_piece_len`` later ones; plain CTEs would inline
    exponentially — the HITS lesson). Ends after d{max_word_len}
    with no trailing comma."""
    parts = [r"""
    WITH wf AS (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(
                trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
            FROM documents
        ) WHERE w <> '' GROUP BY w
    ),
    grid AS (
        SELECT substr(word, CAST(i AS INT), CAST(s AS INT)) AS piece, freq
        FROM wf,
             unnest(range(1, length(word) + 1)) AS t1(i),
             unnest(range(1, least(""" + str(max_piece_len) + r""",
                    length(word) - i + 1) + 1)) AS t2(s)
    ),
    counts AS (
        SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        FROM grid GROUP BY piece
    ),
    vsel AS MATERIALIZED (
        SELECT DISTINCT piece, cnt FROM (
            SELECT piece, cnt FROM (
                SELECT piece, cnt, row_number() OVER (
                    ORDER BY cnt DESC, piece) AS rn
                FROM counts
            ) WHERE rn <= """ + str(top_v) + r"""
            UNION ALL
            SELECT piece, cnt FROM counts WHERE length(piece) = 1
        )
    ),
    vocab AS MATERIALIZED (
        SELECT piece,
               CAST(length(bin((SELECT sum(cnt) FROM vsel)))
                    - length(bin(cnt)) AS BIGINT) AS cost
        FROM vsel
    ),
    wl AS (
        SELECT word, freq FROM wf
        WHERE length(word) <= """ + str(max_word_len) + r"""
    ),
    d0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS key FROM wl)"""]
    for j in range(1, max_word_len + 1):
        lo = max(0, j - max_piece_len)
        prev = "\n            UNION ALL ".join(
            f"SELECT word, pos, key FROM d{i}" for i in range(lo, j)
        )
        parts.append(f""",
    d{j} AS MATERIALIZED (
        SELECT p.word, {j} AS pos, max(p.key - 64 * v.cost - 1) AS key
        FROM ({prev}) p
        JOIN vocab v
          ON v.piece = substr(p.word, p.pos + 1, {j} - p.pos)
        WHERE length(p.word) >= {j}
        GROUP BY p.word
    )""")
    return "".join(parts)


def _unigram_oracle(
    max_piece_len: int = 4, top_v: int = 24, max_word_len: int = 12
) -> str:
    """Segmentation-census oracle: the shared DP body plus the
    per-piece-count rollup."""
    alld = "\n        UNION ALL ".join(
        f"SELECT word, pos, key FROM d{j}"
        for j in range(1, max_word_len + 1)
    )
    return _unigram_cte(max_piece_len, top_v, max_word_len) + f""",
    final AS (
        SELECT w.word, w.freq,
               (-d.key) % 64 AS n_pieces,
               (-d.key) // 64 AS cost_total
        FROM wl w JOIN ({alld}) d
          ON d.word = w.word AND d.pos = length(w.word)
    )
    SELECT CAST(n_pieces AS BIGINT) AS n_pieces,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(freq) AS BIGINT) AS total_occurrences,
           CAST(sum(cost_total) AS BIGINT) AS sum_cost_bits
    FROM final GROUP BY n_pieces"""


def _unigram_usage_oracle(
    max_piece_len: int = 4, top_v: int = 24, max_word_len: int = 12
) -> str:
    """Usage-census oracle: the shared DP body plus an unrolled
    BACKTRACK — from each word's final state, each level picks the
    valid predecessor (key(j) = key(p) - 64*cost - 1) with the
    smallest p (longest piece), emits that piece, and recurses; the
    emitted multiset is weighted by word frequency. Every b-level is
    MATERIALIZED (referenced by the next level AND the final union)."""
    parts = [_unigram_cte(max_piece_len, top_v, max_word_len)]
    alld = "\n        UNION ALL ".join(
        f"SELECT word, pos, key FROM d{j}"
        for j in range(0, max_word_len + 1)
    )
    parts.append(f""",
    alld AS MATERIALIZED ({alld}),
    f0 AS (
        SELECT w.word, length(w.word) AS pos, d.key
        FROM wl w JOIN alld d ON d.word = w.word AND d.pos = length(w.word)
    )""")
    for r in range(1, max_word_len + 1):
        parts.append(f""",
    c{r} AS (
        SELECT cur.word, prev.pos AS ppos, prev.key AS pkey,
               substr(cur.word, prev.pos + 1, cur.pos - prev.pos) AS piece,
               row_number() OVER (
                   PARTITION BY cur.word ORDER BY prev.pos) AS rn
        FROM f{r-1} cur
        JOIN alld prev ON prev.word = cur.word
         AND prev.pos >= cur.pos - {max_piece_len} AND prev.pos < cur.pos
        JOIN vocab v
          ON v.piece = substr(cur.word, prev.pos + 1, cur.pos - prev.pos)
        WHERE cur.pos > 0 AND cur.key = prev.key - 64 * v.cost - 1
    ),
    b{r} AS MATERIALIZED (
        SELECT word, ppos, pkey, piece FROM c{r} WHERE rn = 1
    ),
    f{r} AS (SELECT word, ppos AS pos, pkey AS key FROM b{r})""")
    allb = "\n        UNION ALL ".join(
        f"SELECT word, piece FROM b{r}" for r in range(1, max_word_len + 1)
    )
    parts.append(f""",
    used AS (
        SELECT u.piece, CAST(sum(w.freq) AS BIGINT) AS usage
        FROM ({allb}) u JOIN wl w USING (word) GROUP BY u.piece
    ),
    utot AS (SELECT sum(usage) AS t FROM used)
    SELECT piece, usage,
           CAST(usage * 1000000 // (SELECT t FROM utot) AS BIGINT)
               AS share_ppm
    FROM used""")
    return "".join(parts)


@register("unigram_viterbi_stats", oracle=_unigram_oracle(4, 24, 12))
def unigram_viterbi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) subword segmentation
    (operators/unigram_lm.py) — the tokenizer family's second trainer
    next to BPE: seed a piece vocabulary from weighted substring
    counts (top-24 by count plus every single character), score each
    piece with the integer quantized log2 of its count, and segment
    every distinct word by EXACT integer Viterbi maximizing
    (total score, then fewest pieces). Reports the segmentation
    census: how many words land at each piece count, weighted by
    corpus occurrences — the tokenizer-fertility report that decides
    vocab size in a real pipeline.

    100 TB: one corpus-sized word count; vocabulary seeding and the
    single-stage Arrow segmentation (viterbi_paths_arrow, r10) run on
    the distinct-word frame with a broadcast vocab — zero sequential
    DP rounds (oracle unrolls the same DP as MATERIALIZED CTEs)."""
    from .operators.bpe import word_frequencies
    from .operators.unigram_lm import (
        KEY_BASE,
        seed_piece_scores,
        viterbi_segment_keys,
    )

    docs = t(spark, sf_dir, "documents")
    # three consumers (vocab grid, DP word list, final join) — count once
    words = word_frequencies(docs, "text").localCheckpoint()
    vocab = seed_piece_scores(words, max_piece_len=4, top_v=24)
    keys = viterbi_segment_keys(
        words, vocab, max_piece_len=4, max_word_len=12
    )
    per_word = words.join(keys, "word").select(
        "freq",
        F.expr(f"(-key) % {KEY_BASE}").alias("n_pieces"),
        F.expr(f"(-key) div {KEY_BASE}").alias("cost_total"),
    )
    return per_word.groupBy(
        F.col("n_pieces").cast("bigint").alias("n_pieces")
    ).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("freq").cast("bigint").alias("total_occurrences"),
        F.sum("cost_total").cast("bigint").alias("sum_cost_bits"),
    )


@register("unigram_piece_usage", oracle=_unigram_usage_oracle(4, 24, 12))
def unigram_piece_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram tokenizer piece USAGE census
    (operators/unigram_lm.py::viterbi_backtrack_usage): which
    vocabulary pieces the learned segmentations actually use, weighted
    by corpus word frequency — the M-step statistic of unigram-LM EM
    and the vocabulary-pruning report (a seeded piece with near-zero
    usage share is dead vocab). Optimal paths are recovered by walking
    the DP table backward with a deterministic longest-piece
    tie-break; usage conservation (sum(usage) = sum(freq * n_pieces))
    is pinned in pytest.

    100 TB: same scale shape as unigram_viterbi_stats — one corpus
    word count, then ONE Arrow pass (r10) computing DP + backtrack
    per word on the distinct-word frame with a broadcast vocab; the
    former maxlen bounded self-join rounds live on as the pinned
    viterbi_backtrack_usage_jvm twin."""
    from .operators.bpe import word_frequencies
    from .operators.unigram_lm import (
        seed_piece_scores,
        viterbi_backtrack_usage,
    )

    docs = t(spark, sf_dir, "documents")
    words = word_frequencies(docs, "text").localCheckpoint()
    vocab = seed_piece_scores(words, max_piece_len=4, top_v=24)
    used = viterbi_backtrack_usage(
        words, vocab, max_piece_len=4, max_word_len=12
    )
    tot = used.agg(F.sum("usage").alias("__t"))
    return used.crossJoin(F.broadcast(tot)).select(
        "piece",
        "usage",
        F.expr("CAST(usage * 1000000 div __t AS BIGINT)").alias("share_ppm"),
    )


def _unigram_bits_oracle(
    max_piece_len: int = 4, top_v: int = 24, max_word_len: int = 12
) -> str:
    """Bits-per-token oracle: the shared DP body, word costs off the
    final states, then a per-source rollup over every token of every
    document."""
    alld = "\n        UNION ALL ".join(
        f"SELECT word, pos, key FROM d{j}"
        for j in range(1, max_word_len + 1)
    )
    return _unigram_cte(max_piece_len, top_v, max_word_len) + f""",
    wcost AS (
        SELECT w.word, (-d.key) // 64 AS bits
        FROM wl w JOIN ({alld}) d
          ON d.word = w.word AND d.pos = length(w.word)
    ),
    toks AS (
        SELECT source, unnest(string_split(
            trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w
        FROM documents
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(c.bits) AS BIGINT) AS total_bits,
           CAST(sum(c.bits) * 1000000 // count(*) AS BIGINT)
               AS bits_per_token_ppm
    FROM toks t JOIN wcost c ON c.word = t.w
    GROUP BY t.source"""


@register("unigram_bits_per_token", oracle=_unigram_bits_oracle(4, 24, 12))
def unigram_bits_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus quality signal: each document token costs
    its word's optimal segmentation bit cost under the unigram LM
    (quantized -log2 likelihood — the tokenizer's own compression
    measure), rolled up per source as exact bits-per-token ppm. The
    integer stand-in for the perplexity/compression-ratio quality
    filters real curation pipelines run: a source whose text
    compresses badly under the corpus model is out-of-domain or
    noisy. Complements the surface-statistics quality family
    (corpus_quality_filter) with a MODEL-based score.

    100 TB: word costs are a distinct-word-frame artifact (the same
    DP as unigram_viterbi_stats); scoring is one token explode +
    broadcast-sized join + per-source map-combined rollup."""
    from .operators.bpe import word_frequencies
    from .operators.unigram_lm import (
        KEY_BASE,
        seed_piece_scores,
        viterbi_segment_keys,
    )
    from .functions.text import normalize_text

    docs = t(spark, sf_dir, "documents")
    words = word_frequencies(docs, "text").localCheckpoint()
    vocab = seed_piece_scores(words, max_piece_len=4, top_v=24)
    wcost = viterbi_segment_keys(
        words, vocab, max_piece_len=4, max_word_len=12
    ).select(
        F.col("word").alias("w"),
        F.expr(f"(-key) div {KEY_BASE}").alias("bits"),
    )
    toks = docs.select(
        "source",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        toks.join(F.broadcast(wcost), "w")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("bits").cast("bigint").alias("total_bits"),
            F.expr(
                "CAST(sum(bits) * CAST(1000000 AS BIGINT) div count(*)"
                " AS BIGINT)"
            ).alias("bits_per_token_ppm"),
        )
    )


def _unigram_em_oracle(
    max_piece_len: int = 4, top_v: int = 24, max_word_len: int = 12
) -> str:
    """EM-round oracle: the usage-census body (DP + backtrack), a
    re-costed vocab2 (cost = quantized -log2(usage/U), zero-usage
    pieces pruned — provably safe: every piece on any optimal path
    has usage >= that word's freq), a SECOND unrolled DP chain under
    vocab2, and the convergence compare."""
    usage_body = _unigram_usage_oracle(max_piece_len, top_v, max_word_len)
    # strip the usage oracle's final SELECT (everything after utot's
    # closing paren) and keep its WITH-chain through ``used``
    marker = ",\n    utot AS"
    body = usage_body[: usage_body.index(marker)]
    parts = [body]
    parts.append(""",
    vocab2 AS MATERIALIZED (
        SELECT piece,
               CAST(length(bin((SELECT sum(usage) FROM used)))
                    - length(bin(usage)) AS BIGINT) AS cost
        FROM used
    ),
    e0 AS (SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS key FROM wl)""")
    for j in range(1, max_word_len + 1):
        lo = max(0, j - max_piece_len)
        prev = "\n            UNION ALL ".join(
            f"SELECT word, pos, key FROM e{i}" for i in range(lo, j)
        )
        parts.append(f""",
    e{j} AS MATERIALIZED (
        SELECT p.word, {j} AS pos, max(p.key - 64 * v.cost - 1) AS key
        FROM ({prev}) p
        JOIN vocab2 v
          ON v.piece = substr(p.word, p.pos + 1, {j} - p.pos)
        WHERE length(p.word) >= {j}
        GROUP BY p.word
    )""")
    alle = "\n        UNION ALL ".join(
        f"SELECT word, pos, key FROM e{j}"
        for j in range(1, max_word_len + 1)
    )
    alld1 = "\n        UNION ALL ".join(
        f"SELECT word, pos, key FROM d{j}"
        for j in range(1, max_word_len + 1)
    )
    parts.append(f""",
    r0 AS (
        SELECT w.word, w.freq,
               (-d.key) // 64 AS bits0, (-d.key) % 64 AS np0
        FROM wl w JOIN ({alld1}) d
          ON d.word = w.word AND d.pos = length(w.word)
    ),
    r1 AS (
        SELECT w.word, w.freq,
               (-e.key) // 64 AS bits1, (-e.key) % 64 AS np1
        FROM wl w JOIN ({alle}) e
          ON e.word = w.word AND e.pos = length(w.word)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(r0.freq * r0.bits0) AS BIGINT) AS corpus_bits_seed,
           CAST(sum(r0.freq * r1.bits1) AS BIGINT) AS corpus_bits_em,
           CAST(sum(CASE WHEN r0.np0 <> r1.np1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_words_resegmented
    FROM r0 JOIN r1 USING (word)""")
    return "".join(parts)


@register("unigram_em_refine", oracle=_unigram_em_oracle(4, 24, 12))
def unigram_em_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE honest EM iteration of the unigram tokenizer: E-step =
    Viterbi usage census under the seed costs
    (unigram_piece_usage's backtrack); M-step = re-cost every piece
    from its ACTUAL usage (quantized -log2(usage/U), zero-usage
    pieces pruned — safe because every piece on an optimal path
    carries its word's frequency); then re-segment under the new
    costs and report convergence: corpus bit cost under seed vs EM
    costs and how many words changed piece count (the conservative
    re-segmentation proxy — equal-length path swaps don't register,
    and the two bit totals are each under their OWN quantized code,
    which is what a compression report quotes). The quantized analogue of
    Kudo (2018)'s EM loop, every quantity an exact integer.

    100 TB: since round 10 the whole round is TWO single-stage Arrow
    passes over the distinct-word frame (viterbi_paths_arrow — each
    word's DP is independent, all-integer): pass 1 under the seed
    costs yields the E-step usage census AND the seed-cost keys from
    ONE materialization; pass 2 re-segments under the EM costs. The
    corpus is touched once for word counts — the EM round costs the
    same at any corpus size, and the former ~48 sequential DP/backtrack
    barriers (3 sweeps + walk at ~0.25 s/round local job floor,
    SCALE.md) are gone."""
    from .operators.bpe import word_frequencies
    from .operators.unigram_lm import (
        KEY_BASE,
        seed_piece_scores,
        usage_from_paths,
        viterbi_paths_arrow,
    )

    docs = t(spark, sf_dir, "documents")
    words = word_frequencies(docs, "text").localCheckpoint()
    vocab = seed_piece_scores(words, max_piece_len=4, top_v=24)
    # one Arrow pass under seed costs: E-step census + k0 keys
    paths0 = viterbi_paths_arrow(
        words, vocab, max_piece_len=4, max_word_len=12
    ).localCheckpoint()  # two consumers (usage, k0) — materialize once
    usage = usage_from_paths(paths0, words).localCheckpoint()
    # (checkpointed: the E-step artifact feeds the M-step re-cost)
    utot = usage.agg(F.sum("usage").alias("__u"))
    vocab2 = usage.crossJoin(F.broadcast(utot)).select(
        "piece",
        F.expr(
            "CAST(length(bin(__u)) - length(bin(usage)) AS BIGINT)"
        ).alias("cost"),
    )
    k0 = paths0.select(
        "word",
        F.expr(f"(-key) div {KEY_BASE}").alias("bits0"),
        F.expr(f"(-key) % {KEY_BASE}").alias("np0"),
    )
    k1 = viterbi_paths_arrow(
        words, vocab2, max_piece_len=4, max_word_len=12,
        compute_pieces=False,  # re-segmentation pass: keys only
    ).select(
        "word",
        F.expr(f"(-key) div {KEY_BASE}").alias("bits1"),
        F.expr(f"(-key) % {KEY_BASE}").alias("np1"),
    )
    return (
        words.join(k0, "word")
        .join(k1, "word")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(F.col("freq") * F.col("bits0"))
            .cast("bigint")
            .alias("corpus_bits_seed"),
            F.sum(F.col("freq") * F.col("bits1"))
            .cast("bigint")
            .alias("corpus_bits_em"),
            F.sum(
                F.when(F.col("np0") != F.col("np1"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_words_resegmented"),
        )
    )
