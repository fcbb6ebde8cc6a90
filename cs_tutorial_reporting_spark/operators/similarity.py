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
