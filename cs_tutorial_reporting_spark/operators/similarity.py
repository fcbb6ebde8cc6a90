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


def _hyperplane(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane component h[plane][d] ∈
    (-1, 1): scaled 60-bit md5 hash of "plane:d". Seeded, engine-
    portable, no RNG state."""
    return [
        (
            F.conv(F.substring(F.md5(F.lit(f"hp{plane}:{d}")), 1, 15), 16, 10)
            .cast("double")
            / F.lit(float(2**60))
        )
        * 2.0
        - 1.0
        for d in range(dim)
    ]


def hyperplane_bucket(vec_col, n_planes: int = 8, dim: int = 64):
    """LSH bucket id from the sign pattern of ``n_planes`` fixed random
    hyperplane projections (bit b set ⇔ ⟨v, h_b⟩ ≥ 0)."""
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        comps = _hyperplane(p, dim)
        proj = sum(
            (vec_col.getItem(d).cast("double") * comps[d] for d in range(dim)),
            F.lit(0.0),
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**p).cast("bigint")).otherwise(
            F.lit(0)
        )
    return bucket


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
    e = emb.withColumn("__bkt", hyperplane_bucket(F.col(vec_col), n_planes, dim))
    q0 = queries.withColumn(
        "__bkt0", hyperplane_bucket(F.col(query_vec_col), n_planes, dim)
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
