"""[EXT] Similarity search over embedding columns (``array<float>``).

Two paths:

- **Brute-force cosine top-k** — exact baseline: query-set × corpus
  join, cosine via zip_with/aggregate (JVM, codegen), window top-k.
  The corpus scan shuffles once for the window; the query side is
  broadcast. Right answer at any scale where #queries is modest.
- **Random-hyperplane LSH buckets** — the scale path: each vector maps
  to a bucket id from the signs of k fixed hyperplane projections;
  candidate pairs share buckets (multi-probe = also adjacent buckets).
  Hyperplanes are generated from a seeded hash of (plane, dim) so they
  are deterministic, reproducible cluster-wide, and need no driver-side
  randomness or broadcast variable.

At 100 TB: brute force is O(Q·N·d) — bounded by broadcasting Q;
IVF/LSH prunes N to the probed buckets. Both paths avoid Python row
loops entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    assume_normalized: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query vector.

    Returns (query_id, vec_id, cos, rank), rank 1..k, deterministic
    tie-break on vec_id. ``assume_normalized`` switches cosine → dot
    (the driver embeddings are L2-normalized; saves two norms per pair).
    """
    from pyspark.sql.window import Window

    sim_fn = dot if assume_normalized else cosine
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(sim_fn(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component h[plane][d] ∈
    (-1, 1): scaled 60-bit md5 hash of "hp{plane}:{d}". Computed
    driver-side (hashlib ≡ any engine's md5), embedded as literals —
    seeded, reproducible cluster-wide, no RNG state or broadcast var."""
    import hashlib

    return [
        int(hashlib.md5(f"hp{plane}:{d}".encode()).hexdigest()[:15], 16)
        / float(2**60)
        * 2.0
        - 1.0
        for d in range(dim)
    ]


def hyperplane_bucket(vec_col, n_planes: int = 8, dim: int = 64):
    """LSH bucket id from the sign pattern of ``n_planes`` fixed random
    hyperplane projections (bit b set ⇔ ⟨v, h_b⟩ ≥ 0).

    Built as ONE ``F.expr`` SQL string (projection via
    aggregate(zip_with(...))) — constructing the same tree out of
    nested Column ops costs ~8 s of py4j round-trips at dim=64; a
    single parse call is milliseconds and yields the identical plan.

    Cross-engine parity assumption (shared with
    :func:`hyperplane_bucket_duckdb_sql`): both engines fold the same
    constants over the same vector, but summation order/rounding may
    differ in the last ULPs, so a projection EXACTLY at 0 within ~1e-14
    could in principle flip sign in one engine only. For unit-norm
    inputs that needs |⟨v, h⟩| ≲ d·ε ≈ 1e-14 — probability ~1e-14 per
    (vector, plane), unobserved across every sf. Quantizing before the
    sign test would not help: snapping to a 1e-9 grid makes boundary
    coincidences MORE likely (~1e-6/grid-edge), so the raw sign test is
    kept and the assumption documented here instead.
    """
    name = vec_col if isinstance(vec_col, str) else vec_col._jc.toString()
    terms = []
    for p in range(n_planes):
        consts = ", ".join(f"{c!r}D" for c in _hyperplane(p, dim))
        proj = (
            f"aggregate(zip_with({name}, array({consts}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {2**p}L ELSE 0L END)")
    return F.expr("CAST(" + " + ".join(terms) + " AS BIGINT)")


def hyperplane_bucket_duckdb_sql(vec_sql: str, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB twin of :func:`hyperplane_bucket`, generated from the SAME
    ``_hyperplane`` constants — so an oracle can replicate the LSH
    bucketing exactly (sign of ``list_dot_product`` per plane). Keeping
    both expressions derived from one Python source prevents drift.
    Near-zero-projection float parity: see :func:`hyperplane_bucket`'s
    docstring (shared assumption, deliberately not quantized)."""
    terms = []
    for p in range(n_planes):
        consts = ", ".join(repr(c) for c in _hyperplane(p, dim))
        proj = f"list_dot_product({vec_sql}::DOUBLE[], [{consts}])"
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {2**p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    n_probes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket — or a Hamming-≤1 neighbor of it (multi-probe) — are scored.
    Recall < 1 by construction; the exactness oracle is
    ``brute_force_topk``. One equi-join on bucket id replaces the cross
    join — at 100 TB this is the difference between O(N·Q) and
    O(N·Q·probes/2^planes). Default probes = n_planes+1 (the bucket
    plus every single-bit flip: vectors near a hyperplane land on
    either side, so probing flipped buckets recovers most of the loss)."""
    from pyspark.sql.window import Window

    if n_probes is None:
        n_probes = n_planes + 1
    e = emb.withColumn("__bkt", hyperplane_bucket(vec_col, n_planes, dim))
    q0 = queries.withColumn(
        "__bkt0", hyperplane_bucket(query_vec_col, n_planes, dim)
    )
    probes = [F.col("__bkt0")] + [
        F.col("__bkt0").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
    ]
    q = q0.withColumn(
        "__bkt", F.explode(F.array(*probes[:n_probes]))
    ).drop("__bkt0")
    scored = e.join(F.broadcast(q), "__bkt").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(dot(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _dot_sql(vec_name: str, consts: list[float]) -> str:
    arr = ", ".join(f"{c!r}D" for c in consts)
    return (
        f"aggregate(zip_with({vec_name}, array({arr}), "
        "(x, y) -> CAST(x AS DOUBLE) * y), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )


def _centroid_dots(vec_name: str, centroids: list[list[float]]):
    """array<double> of ⟨vec, c_i⟩ for every centroid — one F.expr parse
    (same py4j-economy rationale as hyperplane_bucket)."""
    return F.expr(
        "array(" + ", ".join(_dot_sql(vec_name, c) for c in centroids) + ")"
    )


def build_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 1,
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic IVF codebook: seeds = the ``n_centroids`` vectors
    with smallest md5(id) (a seeded pseudo-random sample), refined by
    ``lloyd_iters`` k-means steps (assign via argmax dot — vectors are
    L2-normalized — then per-cluster elementwise mean, re-normalized).

    Driver-side state is just k×d floats; every heavy step is one Spark
    job (per-dimension ``avg`` aggregates — a single hash shuffle).
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    seeds = (
        emb.select(vec_col, F.md5(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(n_centroids)
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in seeds]
    for _ in range(lloyd_iters):
        dots = _centroid_dots(vec_col, cents)
        assigned = emb.select(
            F.col(vec_col).alias("__v"),
            F.array_position(dots, F.array_max(dots)).alias("__c"),
        )
        means = (
            assigned.groupBy("__c")
            .agg(*[F.avg(F.col("__v").getItem(d)).alias(f"m{d}") for d in range(dim)])
            .collect()
        )
        new = list(cents)
        for r in means:
            v = [r[f"m{d}"] for d in range(dim)]
            nrm = sum(x * x for x in v) ** 0.5 or 1.0
            new[int(r["__c"]) - 1] = [x / nrm for x in v]
        cents = new
    return cents


def write_ivf_partitioned(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest-time IVF layout: assign each vector to its nearest
    centroid and write the corpus parquet PARTITIONED BY cell. This is
    the 100 TB story the inline ``ivf_topk`` documents: once the data
    lives partitioned by cell, a probe is *partition pruning* — the
    scan reads ``n_probes/n_centroids`` of the files and never touches
    the rest (asserted via PartitionFilters in tests/test_plans.py)."""
    dots = _centroid_dots(vec_col, centroids)
    emb.select(
        id_col, vec_col, F.array_position(dots, F.array_max(dots)).alias("__cell")
    ).write.mode("overwrite").partitionBy("__cell").parquet(path)


def ivf_topk_pruned(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Query side of the partitioned IVF index: the probe-cell join key
    is a PARTITION column, so Catalyst turns the bucket equi-join into
    dynamic partition pruning / partition filters — only the probed
    cells' files are read. Results are identical to ``ivf_topk`` with
    the same codebook (pinned in tests)."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(path)
    q_dots = _centroid_dots(query_vec_col, centroids)
    probe_arr = F.slice(
        F.array_sort(
            F.zip_with(
                q_dots,
                F.sequence(F.lit(1), F.lit(len(centroids))),
                lambda d, i: F.struct((-d).alias("nd"), i.cast("long").alias("c")),
            )
        ),
        1,
        n_probes,
    )
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(F.transform(probe_arr, lambda s: s.getField("c"))).alias("__cell"),
    )
    scored = e.join(F.broadcast(q), "__cell").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(dot(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer: corpus vectors are
    bucketed by nearest centroid; each query scores only the ``n_probes``
    closest cells. Exactness oracle is ``brute_force_topk``.

    At 100 TB the assignment column is computed once at ingest and the
    corpus is written partitioned/bucketed by ``__cell``, so a query
    reads ``n_probes/n_centroids`` of the data with partition pruning —
    this function re-derives the assignment inline for self-containment.
    """
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = build_ivf_centroids(emb, n_centroids, id_col, vec_col)
    e_dots = _centroid_dots(vec_col, centroids)
    e = emb.select(
        id_col, vec_col, F.array_position(e_dots, F.array_max(e_dots)).alias("__cell")
    )
    q_dots = _centroid_dots(query_vec_col, centroids)
    # probe cells = indices of the n_probes largest centroid dots:
    # sort (−dot, index) structs, slice, project the index
    probe_arr = F.slice(
        F.array_sort(
            F.zip_with(
                q_dots,
                F.sequence(F.lit(1), F.lit(len(centroids))),
                lambda d, i: F.struct((-d).alias("nd"), i.cast("long").alias("c")),
            )
        ),
        1,
        n_probes,
    )
    q = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(F.transform(probe_arr, lambda s: s.getField("c"))).alias("__cell"),
    )
    scored = e.join(F.broadcast(q), "__cell").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(dot(F.col(vec_col), F.col(query_vec_col)), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain scale path
# ---------------------------------------------------------------------------


def build_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the vector is split into ``m``
    subspaces of ``dim/m`` dims; subspace ``j``'s codebook is the j-th
    slice of the ``ks`` seed vectors with smallest md5(id) — the same
    seeded sample rule as the IVF coarse quantizer, so the build is
    reproducible cluster-wide and SQL-expressible for the oracle.
    Driver-side state is ks×dim floats (build once, query many)."""
    sub = dim // m
    seeds = (
        emb.select(vec_col, F.md5(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(ks)
        .collect()
    )
    vecs = [[float(x) for x in r[0]] for r in seeds]
    return [
        [v[j * sub : (j + 1) * sub] for v in vecs] for j in range(m)
    ]


def _pq_codes_expr(vec_name: str, codebooks: list[list[list[float]]]):
    """array<bigint> of per-subspace nearest-code ids (1-based): for
    each subspace, argmin over the codebook of the L2 distance
    ``const(||c||²) − 2·⟨v_sub, c⟩`` (the ||v_sub||² term is constant
    per row and drops out of the argmin). One F.expr parse — the py4j
    economy rationale of hyperplane_bucket applies m×ks-fold here."""
    sub = len(codebooks[0][0])
    per_j = []
    for j, cb in enumerate(codebooks):
        sl = f"slice({vec_name}, {j * sub + 1}, {sub})"
        dists = ", ".join(
            f"({sum(c * c for c in cent)!r}D - 2.0D * {_dot_sql(sl, cent)})"
            for cent in cb
        )
        arr = f"array({dists})"
        per_j.append(
            f"CAST(array_position({arr}, array_min({arr})) AS BIGINT)"
        )
    return F.expr("array(" + ", ".join(per_j) + ")")


def _pq_lut_expr(vec_name: str, codebooks: list[list[list[float]]]):
    """Per-query ADC lookup table: array<array<double>> where
    lut[j][c] = ⟨q_sub_j, codebook[j][c]⟩ — computed once per query,
    broadcast with it; scoring a corpus vector is then m array lookups
    instead of a dim-wide dot product."""
    sub = len(codebooks[0][0])
    rows = []
    for j, cb in enumerate(codebooks):
        sl = f"slice({vec_name}, {j * sub + 1}, {sub})"
        rows.append(
            "array(" + ", ".join(_dot_sql(sl, cent) for cent in cb) + ")"
        )
    return F.expr("array(" + ", ".join(rows) + ")")


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress the corpus to (id, codes): m small ints per vector —
    m bytes against dim×4 for float32 (32× at the 64-dim/8-subspace
    default). At 100 TB the encoded table is what lives hot; the float
    vectors stay in cold storage for optional exact re-ranking."""
    return emb.select(
        F.col(id_col), _pq_codes_expr(vec_col, codebooks).alias("codes")
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    codebooks: list[list[list[float]]] | None = None,
    encoded: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): the
    corpus is scanned in compressed form (codes only), each query
    carries its LUT, and the approximate dot is the sum of m table
    lookups — ``zip_with(codes, lut) → element_at`` — entirely JVM
    expressions. Exactness oracle is ``brute_force_topk``; composes
    with IVF (encode within probed cells) for the full IVF-PQ layout.
    Pass ``encoded`` (a ``pq_encode`` result, materialized at ingest)
    to search the compressed table directly — the 100 TB shape, where
    encoding happens once per corpus, not once per query."""
    from pyspark.sql.window import Window

    if codebooks is None:
        codebooks = build_pq_codebooks(emb, m, ks, id_col, vec_col)
    e = encoded if encoded is not None else pq_encode(emb, codebooks, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col), _pq_lut_expr(query_vec_col, codebooks).alias("lut")
    )
    score = F.expr(
        "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, CAST(c AS INT))), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col), F.col(id_col), F.round(score, 6).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def refine_pq_codebooks(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    iters: int = 1,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace k-means refinement of the seed codebooks (the PQ
    twin of the IVF Lloyd step): assign every vector's subspace slice
    to its nearest code, replace each code with the mean of its
    assignees. Each iteration is one encode pass plus m small
    aggregations; codes with no assignees keep their seed. Like the
    IVF Lloyd variant, the refined build is distribution-dependent, so
    its quality is pinned by recall tests rather than the SQL oracle."""
    sub = len(codebooks[0][0])
    for _ in range(iters):
        codes = emb.select(
            F.col(vec_col).alias("__v"),
            _pq_codes_expr(vec_col, codebooks).alias("__codes"),
        ).localCheckpoint()
        new = []
        for j, cb in enumerate(codebooks):
            means = (
                codes.groupBy(F.element_at("__codes", j + 1).alias("__c"))
                .agg(
                    *[
                        F.avg(F.col("__v").getItem(j * sub + d)).alias(f"m{d}")
                        for d in range(sub)
                    ]
                )
                .collect()
            )
            cbj = list(cb)
            for r in means:
                cbj[int(r["__c"]) - 1] = [float(r[f"m{d}"]) for d in range(sub)]
            new.append(cbj)
        codebooks = new
    return codebooks


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probes: int = 4,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The composed IVF-PQ layout — the standard billion-vector ANN
    shape: the IVF coarse quantizer prunes the corpus to the probed
    cells (partition pruning at ingest-partitioned scale), and within
    them scoring runs on PQ codes via ADC (m lookups per candidate, no
    float vectors touched). Each corpus vector carries (cell, codes) —
    both computed once at ingest; a query ships (probe cells, LUT).
    This variant quantizes raw vectors (IVF-Flat-PQ); the classic
    residual refinement (encode v − centroid) would improve recall at
    the cost of per-cell codebooks. Exactness oracle: brute_force_topk;
    relational oracle: same seed rule as ivf_topk + pq_topk."""
    from pyspark.sql.window import Window

    if centroids is None:
        centroids = build_ivf_centroids(emb, 16, id_col, vec_col, lloyd_iters=0)
    if codebooks is None:
        codebooks = build_pq_codebooks(emb, 8, 16, id_col, vec_col)
    e_dots = _centroid_dots(vec_col, centroids)
    e = emb.select(
        F.col(id_col),
        F.array_position(e_dots, F.array_max(e_dots)).alias("__cell"),
        _pq_codes_expr(vec_col, codebooks).alias("codes"),
    )
    q_dots = _centroid_dots(query_vec_col, centroids)
    probe_arr = F.slice(
        F.array_sort(
            F.zip_with(
                q_dots,
                F.sequence(F.lit(1), F.lit(len(centroids))),
                lambda d, i: F.struct((-d).alias("nd"), i.cast("long").alias("c")),
            )
        ),
        1,
        n_probes,
    )
    q = queries.select(
        F.col(query_id_col),
        _pq_lut_expr(query_vec_col, codebooks).alias("lut"),
        F.explode(F.transform(probe_arr, lambda s: s.getField("c"))).alias("__cell"),
    )
    score = F.expr(
        "aggregate(zip_with(codes, lut, (c, l) -> element_at(l, CAST(c AS INT))), "
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    scored = e.join(F.broadcast(q), "__cell").select(
        F.col(query_id_col), F.col(id_col), F.round(score, 6).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
