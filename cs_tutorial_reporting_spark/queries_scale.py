"""[EXT] Scale-primitive query registrations: portable sketches
(HyperLogLog, Bloom prefilter), deterministic dataset splitting,
activity-island detection, and the bucketed interval join.

These extend SURVEY.md §2.8's training-pipeline mandate with the
primitives a 100 TB ingest actually leans on: mergeable cardinality
sketches (register tables as exchangeable datasets), broadcastable
membership prefilters (shuffle only the survivors), hash-deterministic
train/val/test assignment (reproducible across engines and reruns),
and the day/hour-bucket decomposition that turns an interval
(range) join into an equi-join.

Oracle strategy (same contract as queries_ext): every hash is an md5
derivation, every estimate is integer/decimal fixed-point, so DuckDB
reproduces each value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.sketches import (
    BLOOM_K,
    bloom_build_words,
    bloom_might_contain,
    bloom_pos_sql,
    hll_estimate,
    hll_estimate_sql,
    hll_registers,
    hll_registers_sql,
)
from .queries import register, t

# ---------------------------------------------------------------------------
# Portable HyperLogLog
# ---------------------------------------------------------------------------

_HLL_REG_SQL = hll_registers_sql(
    key_sql="CAST(user_id AS VARCHAR)", from_sql="events", group_sql="event_type"
)
_HLL_EST_SQL = hll_estimate_sql(_HLL_REG_SQL, group_sql="event_type")


@register(
    "hll_portable_distinct",
    oracle=f"""
    SELECT h.event_type, h.n_registers, h.sum_scaled, h.hll_estimate,
           x.exact_distinct
    FROM ({_HLL_EST_SQL}) h
    JOIN (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type) x USING (event_type)
    """,
)
def hll_portable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HLL distinct-user estimate per event_type, next to the
    exact count so the sketch's error is visible in the result.

    100 TB: the register table (64 rows/group) is the only shuffle
    payload; merging days/shards = max per (group, register). The
    estimate itself is exact fixed-point — see operators/sketches.py.
    """
    ev = t(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id")
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type", "n_registers", "sum_scaled", "hll_estimate", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# Portable Bloom-filter semi-join prefilter
# ---------------------------------------------------------------------------

_BLOOM_DIM_SQL = "SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000"
_BLOOM_P_SQL = " UNION ".join(
    f"SELECT {bloom_pos_sql('CAST(c_custkey AS VARCHAR)', i)} AS pos "
    f"FROM ({_BLOOM_DIM_SQL})"
    for i in range(BLOOM_K)
)
_BLOOM_PROBE_POS = ", ".join(
    f"{bloom_pos_sql('CAST(o_custkey AS VARCHAR)', i)} AS pos{i}"
    for i in range(BLOOM_K)
)
_BLOOM_PASS_PRED = " AND ".join(
    f"pos{i} IN (SELECT pos FROM p)" for i in range(BLOOM_K)
)


@register(
    "bloom_prefilter_semi",
    oracle=f"""
    WITH dim AS ({_BLOOM_DIM_SQL}),
         p AS ({_BLOOM_P_SQL}),
         probe AS (
            SELECT o_orderkey,
                   ({_BLOOM_PASS_PRED}) AS bloom_pass,
                   (o_custkey IN (SELECT c_custkey FROM dim)) AS exact_pass
            FROM (SELECT o_orderkey, o_custkey, {_BLOOM_PROBE_POS} FROM orders)
         )
    SELECT (SELECT count(*) FROM dim) AS n_dim_keys,
           count(*) AS n_probe,
           count(*) FILTER (WHERE bloom_pass) AS n_bloom_pass,
           count(*) FILTER (WHERE exact_pass) AS n_exact_pass,
           count(*) FILTER (WHERE bloom_pass AND NOT exact_pass)
               AS n_false_pos
    FROM probe
    """,
)
def bloom_prefilter_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: orders probed against a bitmap of
    high-balance customers, then exactness measured against the true
    semi-join.

    100 TB: the 4096-bit bitmap is built once from the dim side
    (bounded 128-word driver collect, the codebook pattern) and rides
    into every probe task as a plan literal — the probe side pays ZERO
    shuffle for the prefilter, and the real semi-join afterwards
    shuffles only the bloom survivors. No false negatives by
    construction; false positives are counted in the output.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey").distinct()
    words = bloom_build_words(spark, dim, "c_custkey")
    probe = orders.select(
        "o_orderkey",
        bloom_might_contain(words, "o_custkey").alias("bloom_pass"),
        F.col("o_custkey"),
    )
    exact = probe.join(
        F.broadcast(dim), probe.o_custkey == dim.c_custkey, "left_semi"
    ).count()
    agg = probe.agg(
        F.count("*").alias("n_probe"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
    )
    n_dim = dim.count()
    # bloom has no false negatives ⇒ every exact row is a bloom row
    return agg.select(
        F.lit(n_dim).cast("bigint").alias("n_dim_keys"),
        "n_probe",
        "n_bloom_pass",
        F.lit(exact).cast("bigint").alias("n_exact_pass"),
        (F.col("n_bloom_pass") - F.lit(exact)).cast("bigint").alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_BUCKET_SQL = (
    "CAST(concat('0x', substr(md5(concat('split#', CAST(doc_id AS VARCHAR)))"
    ", 1, 15)) AS BIGINT) % 100"
)


@register(
    "split_assign_stats",
    oracle=f"""
    SELECT split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(bucket) AS min_bucket, max(bucket) AS max_bucket
    FROM (
        SELECT lang, n_chars, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT lang, n_chars, {_SPLIT_BUCKET_SQL} AS bucket
              FROM documents)
    )
    GROUP BY split, lang
    """,
)
def split_assign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by salted md5
    of the document id, with per-(split, lang) volume stats.

    100 TB: assignment is a pure map — no shuffle, no RNG state, no
    reliance on row order; the same doc lands in the same split on
    every engine and every rerun (the property that keeps eval sets
    uncontaminated when the corpus is re-ingested). The salt prefix
    ('split#') decorrelates this hash from every other md5 use on the
    same key space (dedup, bloom, hll).
    """
    from .functions.text import hash60

    docs = t(spark, sf_dir, "documents")
    bucket = (
        hash60(F.concat(F.lit("split#"), F.col("doc_id").cast("string"))) % 100
    ).alias("bucket")
    with_split = docs.select("lang", "n_chars", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test"),
    )
    return with_split.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("bucket").alias("min_bucket"),
        F.max("bucket").alias("max_bucket"),
    )


# ---------------------------------------------------------------------------
# Islands & gaps: consecutive-hour activity runs
# ---------------------------------------------------------------------------

_HOUR_IDX_SQL = "CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600"


@register(
    "user_activity_islands",
    oracle=f"""
    SELECT user_id, count(*) AS n_islands, max(run_len) AS longest_run,
           CAST(sum(run_len) AS BIGINT) AS active_hours
    FROM (
        SELECT user_id, anchor, count(*) AS run_len
        FROM (
            SELECT user_id, h,
                   h - row_number() OVER (PARTITION BY user_id ORDER BY h)
                       AS anchor
            FROM (SELECT DISTINCT user_id, {_HOUR_IDX_SQL} AS h FROM events)
        )
        GROUP BY user_id, anchor
    )
    GROUP BY user_id
    """,
)
def user_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per user: maximal runs of consecutive active
    hours, via the classic ``hour_index - row_number()`` anchor (rows
    in the same consecutive run share an anchor).

    100 TB: one shuffle on user_id (the window partition); the window
    sorts each user's DISTINCT hours (bounded: ≤ 24*365 per user-year,
    independent of event volume because distinct-hour reduction
    happens map-side first). No global sort, no self-join — the naive
    formulation is an O(hours²) self-join per user.
    """
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    hours = ev.select(
        "user_id",
        F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600").alias("h"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("h")
    runs = (
        hours.withColumn("anchor", F.col("h") - F.row_number().over(w))
        .groupBy("user_id", "anchor")
        .agg(F.count("*").alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("active_hours"),
    )


# ---------------------------------------------------------------------------
# Bucketed interval join (range join → equi-join decomposition)
# ---------------------------------------------------------------------------

_IVL_HOURS = 2  # error window length


@register(
    "interval_bucket_join",
    oracle=f"""
    SELECT count(*) AS n_pairs,
           count(DISTINCT c_id) AS n_clicks_in_window,
           count(DISTINCT e_id) AS n_errors_with_clicks
    FROM (
        SELECT er.event_id AS e_id, c.event_id AS c_id
        FROM events er JOIN events c
          ON er.event_type = 'error' AND c.event_type = 'click'
         AND er.user_id = c.user_id
         AND c.ts >= er.ts AND c.ts < er.ts + INTERVAL {_IVL_HOURS} HOUR
    )
    """,
)
def interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join decomposed into an equi-join: each error
    event opens a 2-hour window; count the same user's clicks inside
    it.

    100 TB: a naive range join is a per-user cross product (Spark
    plans ``ts`` range predicates under a sort-merge join only when
    the optimizer's range-join support kicks in; otherwise BNLJ).
    Decomposition: explode each interval into the 3 hour-buckets it
    can overlap (``sequence(h0, h1)``), join on (user_id, bucket) —
    a plain hash equi-join — then apply the exact range predicate and
    dedupe pair ids (a pair can match in two buckets). Bucket fan-out
    is interval_len/bucket_len + 1 ≈ 3, a constant — the shuffle
    grows 3×, not quadratically.
    """
    ev = t(spark, sf_dir, "events")
    hour = lambda c: F.expr(f"unix_timestamp(date_trunc('hour', {c})) div 3600")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
            F.expr(
                f"sequence(unix_timestamp(date_trunc('hour', ts)) div 3600, "
                f"unix_timestamp(date_trunc('hour', ts + INTERVAL {_IVL_HOURS} "
                f"HOURS)) div 3600)"
            ).alias("buckets"),
        )
        .select("e_id", "e_user", "e_ts", F.explode("buckets").alias("bucket"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        hour("ts").alias("bucket"),
    )
    pairs = (
        errors.join(
            clicks,
            (errors.e_user == clicks.c_user) & (errors.bucket == clicks.bucket),
        )
        .filter(
            (F.col("c_ts") >= F.col("e_ts"))
            & (F.col("c_ts") < F.col("e_ts") + F.expr(f"INTERVAL {_IVL_HOURS} HOURS"))
        )
        .select("e_id", "c_id")
        .distinct()
    )
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.count_distinct("c_id").alias("n_clicks_in_window"),
        F.count_distinct("e_id").alias("n_errors_with_clicks"),
    )
