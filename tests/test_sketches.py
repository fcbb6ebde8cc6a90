"""Portable-sketch operator tests: HLL accuracy + mergeability, Bloom
no-false-negatives + FP bound, islands boundary semantics, and the
bucketed interval join's dedupe across bucket-spanning matches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cs_tutorial_reporting_spark.operators.sketches import (
    BLOOM_M_BITS,
    HLL_M,
    bloom_build_words,
    bloom_might_contain,
    hll_estimate,
    hll_registers,
)


def test_hll_estimate_within_standard_error(spark):
    """Raw HLL at m=64 has ~13% standard error; assert the portable
    fixed-point estimate lands within 3 sigma (±40%) on a cardinality
    far above the small-range regime (no bias correction implemented —
    the portability contract pins the raw estimator)."""
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"), F.lit("g").alias("grp"))
    est = hll_estimate(hll_registers(df, ["grp"], "k"), ["grp"]).collect()[0]
    assert est.n_registers <= HLL_M
    assert abs(est.hll_estimate - n) / n < 0.40, est.hll_estimate


def test_hll_registers_merge_equals_union(spark):
    """Mergeability: max-merging two register tables ≡ the register
    table of the unioned inputs — the property that lets daily sketch
    shards merge without re-reading raw data."""
    a = spark.range(0, 800).select(F.col("id").alias("k"), F.lit("g").alias("grp"))
    b = spark.range(500, 1500).select(
        F.col("id").alias("k"), F.lit("g").alias("grp")
    )
    merged = (
        hll_registers(a, ["grp"], "k")
        .unionByName(hll_registers(b, ["grp"], "k"))
        .groupBy("grp", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = hll_registers(a.unionByName(b), ["grp"], "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    words = bloom_build_words(spark, keys, "k")
    assert len(words) == BLOOM_M_BITS // 32
    # every inserted key passes
    n_pass = keys.filter(bloom_might_contain(words, "k")).count()
    assert n_pass == 200
    # disjoint probe range: FP rate for 200 keys in 4096 bits with k=3
    # is (1-exp(-600/4096))^3 ~ 0.3%; assert < 5% with slack
    probe = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(words, "k")).count()
    assert fp / 2000 < 0.05, fp


def test_islands_gap_boundary(spark):
    """Hours h and h+1 are one island; h and h+2 are two. Longest-run
    and island counts follow."""
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (1, base),
        (1, base + dt.timedelta(hours=1)),
        (1, base + dt.timedelta(hours=3)),  # gap of one empty hour
        (2, base),
        (2, base + dt.timedelta(minutes=10)),  # same hour, dedupes
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp").select(
        F.lit(0).alias("event_id"),
        "ts",
        "user_id",
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from cs_tutorial_reporting_spark.queries import QUERIES

        out = {
            r.user_id: (r.n_islands, r.longest_run, r.active_hours)
            for r in QUERIES["user_activity_islands"].fn(spark, d).collect()
        }
    assert out[1] == (2, 2, 3)
    assert out[2] == (1, 1, 1)


def test_interval_join_dedupes_bucket_spanning_pairs(spark):
    """A click 1.5h after an error falls in two of the error's hour
    buckets; the pair must count once. A click exactly at +2h is
    outside the half-open window."""
    t0 = dt.datetime(2024, 1, 1, 10, 45)
    rows = [
        (100, t0, 7, "error"),
        (101, t0 + dt.timedelta(minutes=90), 7, "click"),  # in, spans buckets
        (102, t0 + dt.timedelta(hours=2), 7, "click"),  # boundary: out
        (103, t0 - dt.timedelta(seconds=1), 7, "click"),  # before: out
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        from cs_tutorial_reporting_spark.queries import QUERIES

        row = QUERIES["interval_bucket_join"].fn(spark, d).collect()[0]
    assert (row.n_pairs, row.n_clicks_in_window, row.n_errors_with_clicks) == (
        1,
        1,
        1,
    )


def test_cms_estimate_never_underestimates(spark):
    """CMS structural guarantee: min over depth rows >= exact count for
    every candidate (collisions only ADD)."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [(i, f"w{i % 7} common word", "en", "s", 10) for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = QUERIES["cms_heavy_hitters"].fn(spark, d).collect()
    assert out, "no heavy hitters returned"
    for r in out:
        assert r.cms_estimate >= r.exact_cnt, (r.word, r.exact_cnt, r.cms_estimate)
    by_word = {r.word: r for r in out}
    assert by_word["common"].exact_cnt == 200
    assert by_word["word"].exact_cnt == 200


def test_udtf_chunk_rows_shape(spark):
    """120-word doc -> chunks of 50/50/20; chunk first words line up
    with the normalized word stream."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    text = "  " + "  ".join(f"W{i}" for i in range(120))  # messy whitespace+case
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        rows = sorted(
            QUERIES["udtf_chunk_rows"].fn(spark, d).collect(),
            key=lambda r: r.chunk_idx,
        )
    assert [(r.chunk_idx, r.n_words, r.first_word) for r in rows] == [
        (0, 50, "w0"),
        (1, 50, "w50"),
        (2, 20, "w100"),
    ]


def test_pagerank_ppm_hand_computed_two_nodes(spark):
    """A->B (B dangling): after >=2 iterations ranks reach the fixed
    point rank(A)=base=75000, rank(B)=base+0.85*base=138750 — exact in
    ppm integer arithmetic."""
    from cs_tutorial_reporting_spark.operators.graph import pagerank_ppm

    edges = spark.createDataFrame([("A", "B", 1)], "src string, dst string, w bigint")
    out = {r.node: r.rank_ppm for r in pagerank_ppm(edges, "src", "dst", "w", iters=5).collect()}
    assert out == {"A": 75000, "B": 138750}


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    """The AllPairs prefix join must find EXACTLY the pairs a brute-
    force all-pairs Jaccard scan finds (prefix filtering is a lossless
    candidate reduction, not an approximation)."""
    import duckdb

    from cs_tutorial_reporting_spark.duck_sql import WORDS_SQL
    from cs_tutorial_reporting_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.doc_a, r.doc_b, r.jac_ppm)
        for r in QUERIES["prefix_filter_jaccard_pairs"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    brute = con.execute(f"""
        WITH sets AS (
            SELECT doc_id, list_distinct(list_transform(
                range(1, greatest(len(words) - 2, 1) + 1),
                i -> concat_ws(' ', words[i], words[i+1], words[i+2]))) AS s
            FROM (SELECT doc_id, {WORDS_SQL} AS words FROM documents)
        )
        SELECT a.doc_id, b.doc_id,
               len(list_intersect(a.s, b.s)) * 1000000
                   // (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.s, b.s)) * 1000000
                  // (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= 600000
    """).fetchall()
    assert got == {(a, b, j) for a, b, j in brute}


def test_histogram_quantile_crossing_boundary(spark):
    """cum*100 >= tot*50 at EXACTLY half the mass must pick that bin
    (>=, not >): two bins of equal count -> p50 is the lower bin."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [(i, dt.datetime(2024, 1, 1), 1, "view", v, "{}")
            for i, v in enumerate([0.55] * 5 + [1.25] * 5)]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        r = QUERIES["histogram_quantile_sketch"].fn(spark, d).collect()[0]
    assert (r.n, r.p50_bin, r.p95_bin) == (10, 5, 12)


def test_streaming_hll_registers_equal_batch(spark):
    """The streaming register table (complete mode, windowed max) must
    equal the batch hll_registers over the same day windows — the
    bounded-state equivalence the streaming sketch rests on."""
    from cs_tutorial_reporting_spark.operators.sketches import hll_registers
    from cs_tutorial_reporting_spark.queries import QUERIES
    from cs_tutorial_reporting_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    # run the streaming query (drains to memory; returns estimates)
    QUERIES["streaming_hll_distinct"].fn(spark, sf).collect()
    stream_regs = {
        (r.w.start, r.event_type, r.reg, r.max_rho)
        for r in spark.table("stream_hll_gate").collect()
    }
    ev = load_table(spark, sf, "events").withColumn(
        "w", F.window("ts", "1 day")
    )
    batch_regs = {
        (r.w.start, r.event_type, r.reg, r.max_rho)
        for r in hll_registers(ev, ["w", "event_type"], "user_id").collect()
    }
    assert stream_regs == batch_regs


def test_varint_width_boundaries(spark):
    """LEB128 width cases at the exact 7-bit boundaries."""
    from cs_tutorial_reporting_spark.queries_scale import _VARINT_BYTES

    rows = spark.createDataFrame(
        [(127,), (128,), (16383,), (16384,), (2097151,), (2097152,)],
        "gap bigint",
    ).select(F.expr(_VARINT_BYTES).alias("b")).collect()
    assert [r.b for r in rows] == [1, 2, 2, 3, 3, 4]


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")


def test_bm25_saturation_and_exclusion(spark):
    """More matches rank higher (2x 'dup' > 1x 'dup' at equal dl);
    docs containing no query term never appear."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, d, [
            (1, "dup dup pad pad", "en", "s", 10),
            (2, "dup pad pad pad", "en", "s", 10),
            (3, "pad pad pad pad", "en", "s", 10),
        ])
        rows = QUERIES["bm25_rank_topk"].fn(spark, d).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids
    s = {r.doc_id: r.bm25_e6 for r in rows}
    assert s[1] > s[2] > 0


def test_gini_extremes(spark):
    """Single-type user -> 0; uniform over 5 types -> exactly 800000."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "view", 0.0, "{}") for i in range(10)]
    rows += [
        (100 + i, t0, 2, et, 0.0, "{}")
        for i, et in enumerate(
            ["view", "click", "signup", "error", "purchase"] * 2
        )
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        from cs_tutorial_reporting_spark.queries import QUERIES

        out = {
            r.user_id: r.gini_ppm
            for r in QUERIES["user_behavior_gini"].fn(spark, d).collect()
        }
    assert out[1] == 0
    assert out[2] == 800000


def test_scd2_versions_and_dwell(spark):
    """view(0m) -> view(5m) -> click(10m) -> view(20m): 3 versions;
    closed dwell = 10m + 10m; open tail excluded."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, t0, 1, "view"),
        (2, t0 + 5 * m, 1, "view"),
        (3, t0 + 10 * m, 1, "click"),
        (4, t0 + 20 * m, 1, "view"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        ).selectExpr(
            "event_id", "ts", "user_id", "event_type",
            "CAST(0.0 AS DOUBLE) AS value", "'{}' AS props",
        ).write.parquet(f"{d}/events.parquet")
        r = QUERIES["scd2_interval_stats"].fn(spark, d).collect()[0]
    assert (r.n_versions, r.closed_dwell_ms, r.longest_dwell_ms) == (
        3,
        20 * 60 * 1000,
        10 * 60 * 1000,
    )


def test_skyline_matches_not_exists_brute_force(spark):
    """Independent algorithm cross-check: the window-based skyline must
    equal the declarative NOT-EXISTS dominance scan (quadratic — run
    at sf0.001 only)."""
    import duckdb

    from cs_tutorial_reporting_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.o_orderkey, r.cents, r.date_ms)
        for r in QUERIES["skyline_orders_2d"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    brute = con.execute("""
        WITH pts AS (
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(epoch_ms(o_orderdate) AS BIGINT) AS date_ms
            FROM orders
        )
        SELECT o_orderkey, cents, date_ms FROM pts a
        WHERE NOT EXISTS (
            SELECT 1 FROM pts b
            WHERE b.cents >= a.cents AND b.date_ms >= a.date_ms
              AND (b.cents > a.cents OR b.date_ms > a.date_ms)
        )
    """).fetchall()
    assert got == set(brute)
    assert got, "empty skyline"


def test_skyline_duplicate_points_both_surface(spark):
    """Two identical non-dominated points must BOTH be in the frontier
    (weak dominance: equal pairs don't dominate each other)."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [
        (1, 10, "O", 100.0, dt.datetime(2024, 1, 5), "1-URGENT"),
        (2, 11, "O", 100.0, dt.datetime(2024, 1, 5), "1-URGENT"),
        (3, 12, "O", 50.0, dt.datetime(2024, 1, 1), "1-URGENT"),  # dominated
        (4, 13, "O", 40.0, dt.datetime(2024, 1, 9), "1-URGENT"),  # frontier
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.parquet(f"{d}/orders.parquet")
        ids = {r.o_orderkey for r in QUERIES["skyline_orders_2d"].fn(spark, d).collect()}
    assert ids == {1, 2, 4}


def test_hll_merge_is_exact_on_harness_data(spark):
    """Max-merging parity shards must reproduce the single-pass
    estimate EXACTLY for every group (lossless merge)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["hll_merge_shards"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r.merge_exact for r in rows)


def test_lift_hand_computed(spark):
    """3 users: u1 {a,b}, u2 {a}, u3 {a,b}. n_ab=2, n_a=3, n_b=2,
    N=3 -> lift = 2*3/(3*2) = 1.0 -> 1000000 ppm; confidence(a->b)
    = 2/3 -> 666666 ppm."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click"), (2, t0, 1, "view"),
        (3, t0, 2, "click"),
        (4, t0, 3, "click"), (5, t0, 3, "view"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        ).selectExpr(
            "event_id", "ts", "user_id", "event_type",
            "CAST(0.0 AS DOUBLE) AS value", "'{}' AS props",
        ).write.parquet(f"{d}/events.parquet")
        out = QUERIES["event_type_lift_pairs"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_ab) == ("click", "view", 2)
    assert (r.support_ppm, r.confidence_ppm, r.lift_ppm) == (666666, 666666, 1000000)


def test_equidepth_bounds_are_monotone_and_cover(spark):
    """Bounds must be non-decreasing in k and each bound's cumulative
    mass must reach k/8 of the total."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["equidepth_partition_bounds"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.k] = r.bound_bin
    for et, bounds in by_type.items():
        assert sorted(bounds) == list(range(1, 8)), et
        seq = [bounds[k] for k in range(1, 8)]
        assert seq == sorted(seq), (et, seq)


def test_weighted_sample_respects_weight_monotonicity(spark):
    """With equal hash draws the higher-weight doc wins: construct two
    docs whose salted hashes are fixed; verify the priority formula is
    monotone in weight by direct computation, and the query returns
    exactly k rows per source on the harness data."""
    from collections import Counter

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["weighted_sample_topk"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_source = Counter(r.source for r in rows)
    assert all(v == 3 for v in per_source.values()), per_source
    for r in rows:
        assert r.pri > 0


def test_centroid_inertia_zero_for_identical_vectors(spark):
    """All-identical vectors in a label -> centroid equals them ->
    inertia exactly 0 (the fixed-point path has no float residue)."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [(i, [0.25, -0.125, 0.5], 7) for i in range(4)]
    rows += [(10 + i, [float(i), 0.0, 0.0], 8) for i in range(2)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        out = {r.label: r for r in QUERIES["label_centroid_inertia"].fn(spark, d).collect()}
    assert out[7].inertia_e12 == 0
    # label 8: vectors (0,..) and (1,..): centroid 0.5e6 -> inertia 2*(5e5)^2
    assert out[8].inertia_e12 == 2 * 500_000 * 500_000


def test_tiff_packbits_roundtrip_and_foreign_decode():
    """Property: encode->decode is identity for adversarial payloads
    (runs at the 128 boundary, alternating bytes, empty); a foreign
    single-strip PackBits TIFF also decodes; malformed inputs raise."""
    import pytest

    from cs_tutorial_reporting_spark.multimodal.tiff import (
        decode_tiff,
        packbits_decode,
        packbits_encode,
        tiff_bytes,
    )

    cases = [
        b"",
        b"\x00" * 300,
        bytes(range(256)),
        b"ab" * 200,
        b"x" * 127 + b"y" + b"z" * 129,
        bytes([7]) * 128,
    ]
    for payload in cases:
        enc = packbits_encode(payload)
        assert packbits_decode(enc, len(payload)) == payload
        stats = decode_tiff(tiff_bytes(payload))
        n = max(-(-len(payload) // 16), 1)
        assert stats["height"] == n
        assert stats["n_strips"] == -(-n // 4)
        assert stats["sum_gray"] == sum(payload)
        assert stats["head_px"] == (payload[0] if payload else 0)

    # foreign file: hand-built single-strip image, different tag order
    import struct

    px = bytes([9, 8, 7, 6])
    strip = packbits_encode(px)
    entries = b"".join(
        struct.pack("<HHII", *e)
        for e in [
            (256, 4, 1, 4), (257, 4, 1, 1), (258, 3, 1, 8),
            (259, 3, 1, 32773), (262, 3, 1, 1),
            (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 4),
            (279, 4, 1, len(strip)),
        ]
    )
    ifd = struct.pack("<H", 9) + entries + struct.pack("<I", 0)
    foreign = struct.pack("<2sHI", b"II", 42, 8 + len(strip)) + strip + ifd
    s = decode_tiff(foreign)
    assert (s["width"], s["height"], s["sum_gray"], s["head_px"]) == (4, 1, 30, 9)

    with pytest.raises(ValueError):
        decode_tiff(b"MM\x00\x2a" + b"\x00" * 8)  # big-endian unsupported
    with pytest.raises(ValueError):
        packbits_decode(b"\x05ab", 6)  # literal overruns input
    bad = bytearray(tiff_bytes(b"hello world"))
    bad[4] = 0xFF  # IFD offset garbage
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))


def test_interval_union_merges_overlaps(spark):
    """Two overlapping windows merge to one island; a disjoint third
    stands alone. Coverage = union length, not sum of lengths."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1, 8, 0)
    h = dt.timedelta(hours=1)
    rows = [
        (1, t0, 5, "error"),            # [8, 10)
        (2, t0 + h, 5, "error"),        # [9, 11) overlaps -> [8, 11)
        (3, t0 + 5 * h, 5, "error"),    # [13, 15) disjoint
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
        ).selectExpr(
            "event_id", "ts", "user_id", "event_type",
            "CAST(0.0 AS DOUBLE) AS value", "'{}' AS props",
        ).write.parquet(f"{d}/events.parquet")
        r = QUERIES["interval_union_coverage"].fn(spark, d).collect()[0]
    assert (r.n_merged, r.covered_ms) == (2, 5 * 3600 * 1000)


def test_cms_inner_product_overestimates_join_size(spark):
    """CMS inner product >= true join size always (collisions add);
    with 1024 counters vs ~1.5k keys the estimate should stay within
    ~2x at sf0.001."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    r = QUERIES["cms_join_size_estimate"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.est_join_size >= r.exact_join_size
    assert r.est_join_size < 3 * r.exact_join_size, r


def test_kmv_small_groups_exact_large_close(spark):
    """Groups under k report exactly; the sf0.001 groups (~150
    distinct) should estimate within 50% at k=32 (~18% stderr)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["kmv_distinct_estimate"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r.exact_distinct <= 32:
            assert r.kmv_estimate == r.exact_distinct
        else:
            assert abs(r.kmv_estimate - r.exact_distinct) / r.exact_distinct < 0.5, r


def test_hits_two_node_fixed_point(spark):
    """A->B: A is the pure hub (hub=1e6, auth=0), B the pure authority
    (auth=1e6, hub=0) — reached in one iteration and stable."""
    from cs_tutorial_reporting_spark.operators.graph import hits_ppm

    edges = spark.createDataFrame(
        [("A", "B", 3)], "src string, dst string, w bigint"
    )
    out = {
        r.node: (r.hub_ppm, r.auth_ppm)
        for r in hits_ppm(edges, "src", "dst", "w", iters=4).collect()
    }
    assert out == {"A": (1000000, 0), "B": (0, 1000000)}


def test_ols_slope_hand_computed(spark):
    """Perfect line y = 2e4 * x per hour -> slope_ppm_e4_per_hour
    exactly 2e4 * 1e6... in ppm scale: slope = 20000 => 20000*1e6 ppm
    of e4 units; verify the closed form on a 3-point exact line."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([1.0, 3.0, 5.0]):  # +2.0 per hour
        rows.append((i, t0 + dt.timedelta(hours=i), 1, "view", v, "{}"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        r = QUERIES["hourly_trend_slope_exact"].fn(spark, d).collect()[0]
    # y_e4 steps by 20000 per hour -> slope 20000 e4/hour -> x1e6 ppm
    assert (r.n_hours, r.slope_ppm_e4_per_hour) == (3, 20000 * 1000000)


def test_multitouch_credit_conservation(spark):
    """Each attributed purchase distributes ~1e6 ppm across its
    touches (minus integer-div remainder < n_touch)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    r = QUERIES["multitouch_attribution_linear"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_attributed_purchases > 0
    assert r.credit_ppm_total <= r.n_attributed_purchases * 1_000_000
    assert r.credit_ppm_total > r.n_attributed_purchases * 1_000_000 - r.n_touchpoints


def test_quota_waterfall_invariants(spark):
    """final_take <= avail always; the total take lands within
    n_sources of the 60% target (truncation remainder only)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["quota_waterfall_mix"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    total_avail = sum(r.avail for r in rows)
    target = total_avail * 6 // 10
    take = sum(r.final_take for r in rows)
    for r in rows:
        assert 0 <= r.final_take <= r.avail, r
        assert r.taken_r1 <= r.quota_r1
    assert take <= target
    assert take > target - 2 * len(rows), (take, target)


def test_cluster_representative_is_best_member(spark):
    """The representative must be the longest member of its cluster
    (doc_id tiebreak) and clusters must be >= 2 docs (pairs-derived)."""
    from cs_tutorial_reporting_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from cs_tutorial_reporting_spark.queries import QUERIES
    from cs_tutorial_reporting_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    reps = QUERIES["cluster_best_representative"].fn(spark, sf).collect()
    assert reps
    d = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    pairs = minhash_lsh_pairs(
        d.join(load_table(spark, sf, "documents").select("doc_id", "text"), "doc_id"),
        "text", "doc_id", num_hashes=8, band_size=2, jaccard_threshold=0.5,
    )
    labels = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    chars = {r.doc_id: r.n_chars for r in d.collect()}
    by_cluster: dict = {}
    for node, cid in labels.items():
        by_cluster.setdefault(cid, []).append(node)
    for r in reps:
        members = by_cluster[r.cluster_id]
        assert r.n_docs == len(members) >= 2
        best = sorted(members, key=lambda n: (-chars[n], n))[0]
        assert r.rep_doc_id == best


def test_hamming_band_blocking_is_lossless(spark):
    """Pigeonhole: 4 bands of 4 bits find EVERY pair within Hamming
    distance 3 — cross-check the banded census against brute force on
    crafted fingerprints including a distance-4 pair that must NOT
    appear (it can still band-match; the popcount filter drops it)."""
    import itertools
    import tempfile

    from pyspark.sql import functions as F

    # craft docs whose simhash we don't control — instead check the
    # BANDING LOGIC directly on a literal fingerprint table
    fps = [0b0000000000000000, 0b0000000000000001, 0b0000000000000111,
           0b0000000000001111, 0b1111000000000000]
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "doc_id bigint, fp bigint"
    )
    bands = df.select(
        "doc_id", "fp",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     F.expr(f"CAST(shiftright(fp, {4 * j}) & 15 AS INT)").alias("bv"))
            for j in range(4)
        ])).alias("b"),
    ).select("doc_id", "fp", "b.j", "b.bv")
    a = bands.select(F.col("doc_id").alias("da"), F.col("fp").alias("fa"), "j", "bv")
    b = bands.select(F.col("doc_id").alias("db"), F.col("fp").alias("fb"), "j", "bv")
    got = {
        (r.da, r.db)
        for r in (
            a.join(b, ["j", "bv"]).filter(F.col("da") < F.col("db"))
            .select("da", "db", "fa", "fb").distinct()
            .filter(F.expr("bit_count(fa ^ fb) <= 3"))
        ).collect()
    }
    brute = {
        (i, j)
        for i, j in itertools.combinations(range(len(fps)), 2)
        if bin(fps[i] ^ fps[j]).count("1") <= 3
    }
    assert got == brute
    assert (0, 3) not in got  # distance 4: band-matches but filtered


def test_acf_alternating_and_constant_series(spark):
    """Hand-computed ACF: a 4-hour alternating series (1,3,1,3) has
    z = (-4e4, 4e4, -4e4, 4e4) so acf1 = -48/64 = -750000 ppm exactly,
    and no lag-24 pair exists (NULL); a constant series has den = 0
    and reports NULL at every lag."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def run(vals):
        rows = [
            (i, t0 + dt.timedelta(hours=i), 1, "view", v, "{}")
            for i, v in enumerate(vals)
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows,
                "event_id bigint, ts timestamp, user_id bigint,"
                " event_type string, value double, props string",
            ).write.parquet(f"{d}/events.parquet")
            return QUERIES["acf_hourly_lags"].fn(spark, d).collect()[0]

    r = run([1.0, 3.0, 1.0, 3.0])
    assert (r.n_hours, r.acf1_ppm, r.acf24_ppm) == (4, -750000, None)
    r = run([2.0, 2.0, 2.0])  # constant: den = 0
    assert (r.acf1_ppm, r.acf24_ppm) == (None, None)


def test_theilsen_ignores_single_outlier(spark):
    """A perfect +5.0/hour line with the LAST point blown up to 500:
    6 of 10 pairwise slopes are exactly 5e4 e4-units/hour, so the
    median (and thus Theil-Sen) still reports the line; the OLS twin
    on the same data is dragged far above it."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, "view", v, "{}")
        for i, v in enumerate([10.0, 15.0, 20.0, 25.0, 500.0])
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ).write.parquet(f"{d}/events.parquet")
        ts = QUERIES["theilsen_slope_hourly"].fn(spark, d).collect()[0]
        ols = QUERIES["hourly_trend_slope_exact"].fn(spark, d).collect()[0]
    assert (ts.n_hours, ts.n_pairs) == (5, 10)
    assert ts.theilsen_slope_e6 == 50_000 * 1_000_000
    assert ols.slope_ppm_e4_per_hour > 2 * ts.theilsen_slope_e6


def test_rrf_fusion_invariants(spark):
    """RRF output: fused ranks are 1..15 with rrf_e6 non-increasing,
    every score equals the recomputed 1e6//(60+r) sum of its member
    ranks, and at least one doc fuses evidence from BOTH lists
    (vec_id 0's own doc is rank 1 semantically)."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = QUERIES["hybrid_rrf_fusion"].fn(
        spark, "/root/testdata/sf0.001"
    ).orderBy("fused_rank").collect()
    assert [r.fused_rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 15
    scores = [r.rrf_e6 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        want = (1_000_000 // (60 + r.lex_rank) if r.lex_rank > 0 else 0) + (
            1_000_000 // (60 + r.sem_rank) if r.sem_rank > 0 else 0
        )
        assert r.rrf_e6 == want, r
    assert any(r.lex_rank > 0 and r.sem_rank > 0 for r in rows) or any(
        r.sem_rank == 1 for r in rows
    )


def test_trimmed_mean_drops_exactly_k_each_end(spark):
    """10 orders, values 1..9 plus a 10000 outlier: k = 1, so the
    trimmed mean averages 2..9 (cents) = 550; the plain mean would be
    ~100450. Duplicate boundary values split correctly because the
    histogram overlap trims by COUNT, not by value."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [
        (i, 1, "1-URGENT", float(v), dt.date(2024, 1, 1), "a", 0, "c")
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10000])
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "o_orderkey bigint, o_custkey bigint, o_orderpriority string,"
            " o_totalprice double, o_orderdate date, o_orderstatus string,"
            " o_shippriority int, o_clerk string",
        ).write.parquet(f"{d}/orders.parquet")
        r = QUERIES["trimmed_mean_order_value"].fn(spark, d).collect()[0]
    assert (r.n_orders, r.k_trimmed_each_end, r.n_kept) == (10, 1, 8)
    # kept cents: 200..900 -> mean 550
    assert r.trimmed_mean_cents == 550


def test_mann_kendall_monotone_and_flat(spark):
    """Strictly increasing hourly series -> S = n_pairs, tau = 1e6;
    constant series -> S = 0, tau = 0."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def run(vals):
        rows = [
            (i, t0 + dt.timedelta(hours=i), 1, "view", v, "{}")
            for i, v in enumerate(vals)
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows,
                "event_id bigint, ts timestamp, user_id bigint,"
                " event_type string, value double, props string",
            ).write.parquet(f"{d}/events.parquet")
            return QUERIES["mann_kendall_trend"].fn(spark, d).collect()[0]

    r = run([1.0, 2.0, 5.0, 9.0])
    assert (r.n_pairs, r.s_statistic, r.tau_a_ppm) == (6, 6, 1_000_000)
    r = run([3.0, 3.0, 3.0])
    assert (r.s_statistic, r.tau_a_ppm) == (0, 0)


def test_ks_drift_extremes(spark):
    """Disjoint half-distributions -> D = 1e6 exactly; identical
    halves -> D = 0. Median event_id of 1..8 is 4, so ids 1-4 are the
    first half."""
    import datetime as dt
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)

    def run(vals):
        rows = [
            (i + 1, t0, 1, "view", v, "{}") for i, v in enumerate(vals)
        ]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                rows,
                "event_id bigint, ts timestamp, user_id bigint,"
                " event_type string, value double, props string",
            ).write.parquet(f"{d}/events.parquet")
            return QUERIES["ks_value_drift"].fn(spark, d).collect()[0]

    r = run([1.0, 1.0, 2.0, 2.0, 10.0, 10.0, 20.0, 20.0])  # disjoint
    assert (r.n_first, r.n_second, r.ks_d_ppm) == (4, 4, 1_000_000)
    r = run([1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0])  # identical
    assert r.ks_d_ppm == 0


def test_unigram_viterbi_hand_computed(spark):
    """Corpus 'abab'x4 + 'cd'x2: the full vocab (all 10 substrings,
    T=46, bitlen 6) gives cost('abab') = 6-3 = 3, which beats
    'ab'+'ab' (2+2=4) and chars (8) -> both words segment as ONE
    piece: bucket (n_pieces=1, n_words=2, occurrences=6,
    cost_bits 3+4=7)."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, "abab abab abab abab cd cd", "en", "s", 25)],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        rows = QUERIES["unigram_viterbi_stats"].fn(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_pieces, r.n_words, r.total_occurrences, r.sum_cost_bits) == (
        1, 2, 6, 7,
    )


def test_unigram_usage_conservation(spark):
    """sum(usage) over the piece census must equal
    sum(freq * n_pieces) over the segmentation census — every piece of
    every word's optimal path is emitted exactly once."""
    from cs_tutorial_reporting_spark.queries import QUERIES

    d = "/root/testdata/sf0.001"
    seg = QUERIES["unigram_viterbi_stats"].fn(spark, d).collect()
    usage = QUERIES["unigram_piece_usage"].fn(spark, d).collect()
    want = sum(r.total_occurrences * r.n_pieces for r in seg)
    got = sum(r.usage for r in usage)
    assert got == want
    assert all(r.usage > 0 for r in usage)


def test_quantile_normalize_identity_when_distributions_match(spark):
    """Two sources with IDENTICAL length distributions map onto the
    pooled distribution unchanged: rank r of 3 -> pooled position 2r
    -> the same value, so total_shift = 0 for both."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    rows = [
        (i, "x", "en", src, v)
        for i, (src, v) in enumerate(
            [("s1", 10), ("s1", 20), ("s1", 30),
             ("s2", 10), ("s2", 20), ("s2", 30)]
        )
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        out = {
            r.source: r
            for r in QUERIES["quantile_normalize_doclen"].fn(spark, d).collect()
        }
    for src in ("s1", "s2"):
        assert (out[src].n_docs, out[src].total_shift) == (3, 0)
        assert out[src].sum_mapped == out[src].sum_orig == 60


def test_unigram_em_recost_hand_computed(spark):
    """'abab'x4 + 'cd'x2: the E-step usage census is {abab:4, cd:2}
    (U=6, bitlen 3), so M-step costs become abab: 3-3=0, cd: 3-2=1;
    re-segmentation keeps both single-piece paths. Corpus bits drop
    from 4*3+2*4=20 (seed code) to 4*0+2*1=2 (EM code), with zero
    piece-count changes."""
    import tempfile

    from cs_tutorial_reporting_spark.queries import QUERIES

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, "abab abab abab abab cd cd", "en", "s", 25)],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        r = QUERIES["unigram_em_refine"].fn(spark, d).collect()[0]
    assert (
        r.n_words,
        r.corpus_bits_seed,
        r.corpus_bits_em,
        r.n_words_resegmented,
    ) == (2, 20, 2, 0)


def test_unigram_arrow_bitwise_equals_jvm_dp(spark):
    """The r10 single-pass Arrow segmentation (viterbi_paths_arrow)
    must be BIT-IDENTICAL to the pinned distributed-DP twins — final
    keys AND the piece-usage census (which witnesses the backtrack's
    longest-piece tie-break) — on the harness corpus and on crafted
    words: equal-key tie paths, an unsegmentable word (char outside
    vocab drops out in both), and the max_word_len boundary."""
    from cs_tutorial_reporting_spark.operators.bpe import word_frequencies
    from cs_tutorial_reporting_spark.operators.unigram_lm import (
        seed_piece_scores,
        viterbi_backtrack_usage,
        viterbi_backtrack_usage_jvm,
        viterbi_segment_keys,
        viterbi_segment_keys_jvm,
    )

    # (a) harness corpus, harness parameters
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = word_frequencies(docs, "text").localCheckpoint()
    vocab = seed_piece_scores(words, max_piece_len=4, top_v=24)
    jvm_k = {
        (r.word, r.key)
        for r in viterbi_segment_keys_jvm(words, vocab, 4, 12).collect()
    }
    arr_k = {
        (r.word, r.key)
        for r in viterbi_segment_keys(words, vocab, 4, 12).collect()
    }
    assert jvm_k == arr_k and jvm_k
    jvm_u = {
        (r.piece, r.usage)
        for r in viterbi_backtrack_usage_jvm(words, vocab, 4, 12).collect()
    }
    arr_u = {
        (r.piece, r.usage)
        for r in viterbi_backtrack_usage(words, vocab, 4, 12).collect()
    }
    assert jvm_u == arr_u and jvm_u

    # (b) crafted: "aba" ties a+ba vs ab+a at equal key (cost 1+2 both,
    # 2 pieces both) — the tie-break must pick the same path in both
    # engines; "axb" is unsegmentable (no 'x' piece) and must DROP in
    # both; "abababababab" sits exactly AT max_word_len=12 (kept) and
    # "abababababababa" (15) beyond it (excluded).
    crafted = spark.createDataFrame(
        [("aba", 5), ("axb", 3), ("abababababab", 2),
         ("abababababababa", 1), ("ba", 7)],
        "word string, freq bigint",
    )
    cvocab = spark.createDataFrame(
        [("a", 1), ("b", 1), ("ab", 2), ("ba", 2), ("abab", 3)],
        "piece string, cost bigint",
    )
    jk = {
        (r.word, r.key)
        for r in viterbi_segment_keys_jvm(crafted, cvocab, 4, 12).collect()
    }
    ak = {
        (r.word, r.key)
        for r in viterbi_segment_keys(crafted, cvocab, 4, 12).collect()
    }
    assert jk == ak
    segmented = {w for w, _ in ak}
    assert "axb" not in segmented            # unsegmentable drops
    assert "abababababab" in segmented       # at the boundary: kept
    assert "abababababababa" not in segmented  # beyond: excluded
    ju = {
        (r.piece, r.usage)
        for r in viterbi_backtrack_usage_jvm(crafted, cvocab, 4, 12).collect()
    }
    au = {
        (r.piece, r.usage)
        for r in viterbi_backtrack_usage(crafted, cvocab, 4, 12).collect()
    }
    assert ju == au and ju

    # (c) duplicate vocab rows are REJECTED loudly by the Arrow path:
    # dict-last-wins would silently diverge from the JVM join+max, and
    # the JVM twin's own backtrack is ill-defined under duplicates (a
    # spurious dup-cost candidate can satisfy the key equation off the
    # optimal path) — so the contract is unique-by-piece, enforced.
    import pytest as _pytest

    dvocab = spark.createDataFrame(
        [("a", 9), ("a", 1), ("b", 1), ("ab", 2), ("ba", 2)],
        "piece string, cost bigint",
    )
    with _pytest.raises(ValueError, match="duplicate piece"):
        viterbi_segment_keys(crafted, dvocab, 4, 12)


def test_unigram_key_matches_bruteforce_enumeration(spark):
    """Third, independent oracle for the Viterbi key: brute-force
    enumeration of ALL segmentations of short words must agree with
    the engine on max key = -(KEY_BASE·cost + n_pieces), and the
    emitted pieces must re-derive exactly that key. Catches a defect
    shared by BOTH the Arrow path and the JVM twin (which the bitwise
    pin alone cannot)."""
    from cs_tutorial_reporting_spark.operators.unigram_lm import (
        KEY_BASE,
        viterbi_paths_arrow,
    )

    vocab_rows = [("a", 1), ("b", 2), ("c", 3), ("ab", 2), ("bc", 1),
                  ("abc", 5), ("ca", 1), ("aa", 3)]
    costs = dict(vocab_rows)

    def brute_best(word):
        best = None

        def rec(i, cost, n):
            nonlocal best
            if i == len(word):
                k = -(KEY_BASE * cost + n)
                if best is None or k > best:
                    best = k
                return
            for j in range(i + 1, min(i + 4, len(word)) + 1):
                c = costs.get(word[i:j])
                if c is not None:
                    rec(j, cost + c, n + 1)

        rec(0, 0, 0)
        return best

    words = ["a", "abc", "abca", "bcab", "aabbcc", "cabcab", "abcabc",
             "aaaa", "abab", "bcbc", "cab", "xq", "abcx"]
    wdf = spark.createDataFrame([(w, 1) for w in words], "word string, freq bigint")
    vdf = spark.createDataFrame(vocab_rows, "piece string, cost bigint")
    got = {
        r.word: (r.key, list(r.pieces))
        for r in viterbi_paths_arrow(wdf, vdf, 4, 12).collect()
    }
    for w in words:
        want = brute_best(w)
        if want is None:
            assert w not in got, w  # unsegmentable must drop
            continue
        key, pieces = got[w]
        assert key == want, (w, key, want)
        # the emitted path must re-derive exactly that key
        assert "".join(pieces) == w
        rekey = -(KEY_BASE * sum(costs[p] for p in pieces) + len(pieces))
        assert rekey == key, (w, pieces, rekey, key)


def test_agg_mv_keys_vanish_at_zero_and_appear_on_insert(spark):
    """maintain_agg_mv: retracting every row of a key drops it from
    the view (exactly as a recompute would); a key seen only in the
    delta's inserts appears with the delta's aggregate."""
    from cs_tutorial_reporting_spark.operators.matview import maintain_agg_mv

    mv = spark.createDataFrame(
        [("a", 2, 10), ("b", 1, 7)], "k string, n_events long, sum_v long"
    )
    delta = spark.createDataFrame(
        [("a", -1, 4), ("a", -1, 6), ("c", 1, 9)],
        "k string, __sign int, __v long",
    )
    out = {
        r.k: (r.n_events, r.sum_v)
        for r in maintain_agg_mv(mv, delta, ["k"]).collect()
    }
    assert out == {"b": (1, 7), "c": (1, 9)}
