"""[EXT] Relational graph algorithms: fixed-point PageRank over a
weighted edge list.

Iterative algorithms on Spark are plan-unrolled joins: each PageRank
iteration is one (edges x ranks) hash join + one groupBy — the
classic GraphX/Pregel dataflow expressed in plain DataFrame algebra so
Catalyst plans it and the DuckDB oracle can replay it as unrolled
CTEs. All arithmetic is integer ppm (parts-per-million) with
truncating division, so every engine reproduces ranks bit-for-bit;
the truncation loses <= 1 ppm per edge per iteration (documented
contract — this is a RANKING primitive, not a numerics benchmark).

Scale design (100 TB): per iteration the edge list is the only large
operand — one shuffle by src to attach ranks, one shuffle by dst to
sum inflows; ranks/out-weights are node-sized. On a real cluster the
rank frame should be checkpointed every few iterations to truncate
lineage (local tests unroll 5 iterations, well under plan limits).
Dangling nodes (no out-edges) keep their damped base share; their
residual mass is dropped, not redistributed (standard simplification;
documented).

Reference: no graph surface in the reference engine — this extends
the training-pipeline mandate (graph-shaped data curation: site rank
for crawl prioritization, transition salience).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PPM = 1_000_000
DAMPING_PPM = 850_000


def pagerank_ppm(
    edges: DataFrame,
    src: str,
    dst: str,
    weight: str,
    iters: int = 5,
) -> DataFrame:
    """Weighted PageRank in exact ppm integer arithmetic.

    rank0 = PPM div N for every node;
    inflow(v) = sum over edges u->v of (rank(u) * w) div out_w(u);
    rank'(v) = (PPM - DAMPING) div N + (DAMPING * inflow(v)) div PPM.

    The node count N is a bounded driver scalar (one count over the
    node frame — the codebook-collect pattern, not a hot-path
    collect).
    """
    # Materialize the aggregated edge list ONCE: every iteration (and
    # the node/out-weight derivations) reuses it. Without this the
    # plan re-derives edges from the RAW input per consumer — audited
    # at 22 source scans for 5 iterations. localCheckpoint, not
    # persist: eager, GC-reclaimed, no cross-call cache accumulation.
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_ppm: empty edge list (no nodes)")
    base = (PPM - DAMPING_PPM) // n
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("__out_w"))
    e = edges.join(out_w, src).select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        F.col(weight).cast("bigint").alias("__w"),
        F.col("__out_w").cast("bigint"),
    )
    ranks = nodes.select(
        "node", F.lit(PPM // n).cast("bigint").alias("rank_ppm")
    )
    for _ in range(iters):
        inflow = (
            e.join(ranks, e.__src == ranks.node)
            .select(
                F.col("__dst").alias("node"),
                F.expr("(rank_ppm * __w) div __out_w").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__inflow"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(
                    f"({DAMPING_PPM} * coalesce(__inflow, CAST(0 AS BIGINT)))"
                    f" div {PPM}"
                )
            ).alias("rank_ppm"),
        )
    return ranks


def pagerank_ppm_sql(
    edges_sql: str, src: str, dst: str, weight: str, iters: int = 5
) -> str:
    """DuckDB twin: the same iteration unrolled as CTEs r0..r{iters}.

    Single-sourced constants (PPM/DAMPING) so the two engines cannot
    drift; `//` on non-negative hugeints floors exactly like Spark's
    `div` on bigints.
    """
    ctes = [
        f"edges AS ({edges_sql})",
        f"nodes AS (SELECT DISTINCT node FROM (SELECT {src} AS node FROM edges"
        f" UNION SELECT {dst} FROM edges))",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"outw AS (SELECT {src} AS src, CAST(sum({weight}) AS BIGINT) AS out_w"
        f" FROM edges GROUP BY {src})",
        "r0 AS (SELECT node, CAST(1000000 // (SELECT n FROM nn) AS BIGINT)"
        " AS rank_ppm FROM nodes)",
    ]
    base = f"({PPM - DAMPING_PPM} // (SELECT n FROM nn))"
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
            SELECT n.node,
                   CAST({base} + ({DAMPING_PPM} *
                        COALESCE(inf.inflow, 0)) // {PPM} AS BIGINT)
                       AS rank_ppm
            FROM nodes n LEFT JOIN (
                SELECT e.{dst} AS node,
                       CAST(sum((r.rank_ppm * e.{weight}) // o.out_w)
                            AS BIGINT) AS inflow
                FROM edges e
                JOIN {prev} r ON r.node = e.{src}
                JOIN outw o ON o.src = e.{src}
                GROUP BY e.{dst}
            ) inf ON inf.node = n.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, rank_ppm FROM r{iters}"
    )


def hits_ppm(
    edges: DataFrame, src: str, dst: str, weight: str, iters: int = 4
) -> DataFrame:
    """HITS hub/authority scores in exact ppm integer arithmetic —
    the second iterative algorithm on the PageRank machinery (same
    join+agg-per-iteration dataflow, different recurrence):

    auth_raw(v) = sum over u->v of w * hub(u);
    hub_raw(u)  = sum over u->v of w * auth(v);
    each normalized to ppm of its own total per iteration
    (DECIMAL(38,0) multiply before the integral divide — raw*1e6
    overflows int64 on large graphs).

    Nodes with no in-edges get authority 0 (and mirror for hubs) —
    they still appear in the output via the node frame left join.
    """
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if nodes.count() == 0:
        raise ValueError("hits_ppm: empty edge list")
    e = edges.select(
        F.col(src).alias("__src"),
        F.col(dst).alias("__dst"),
        F.col(weight).cast("bigint").alias("__w"),
    )
    hub = nodes.select("node", F.lit(PPM).cast("bigint").alias("hub_ppm"))
    auth = None
    for _ in range(iters):
        auth_raw = (
            e.join(hub, e.__src == hub.node)
            .select(F.col("__dst").alias("node"), (F.col("__w") * F.col("hub_ppm")).alias("__r"))
            .groupBy("node")
            .agg(F.sum("__r").alias("__raw"))
        )
        auth = _normalize_ppm(nodes, auth_raw, "auth_ppm")
        hub_raw = (
            e.join(auth, e.__dst == auth.node)
            .select(F.col("__src").alias("node"), (F.col("__w") * F.col("auth_ppm")).alias("__r"))
            .groupBy("node")
            .agg(F.sum("__r").alias("__raw"))
        )
        hub = _normalize_ppm(nodes, hub_raw, "hub_ppm")
    return hub.join(auth, "node")


def _normalize_ppm(nodes: DataFrame, raw: DataFrame, out_col: str) -> DataFrame:
    """ppm-normalize a raw score frame over ALL nodes (missing = 0).

    ``raw`` is consumed TWICE (the global total + the per-node join)
    and chains to the previous iteration's scores, so without a
    materialization the unrolled HITS plan doubles per normalization —
    2^(2·iters) subtree growth, the Spark twin of the DuckDB
    CTE-inlining blowup hits_ppm_sql pins with AS MATERIALIZED.
    Measured (r8, iters=4): 12,489-line plan / ~32 s wall at ANY SF
    before; 200-line plan / ~2 s after. localCheckpoint per round is
    the same lineage bound lpa_communities/kcore already pay."""
    raw = raw.localCheckpoint()
    total = raw.agg(F.sum("__raw").alias("__t"))
    return (
        nodes.join(raw, "node", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "node",
            F.expr(
                "CAST(CASE WHEN __t IS NULL OR __t = 0 THEN 0 ELSE"
                " (CAST(coalesce(__raw, 0) AS DECIMAL(38,0)) * 1000000)"
                f" div __t END AS BIGINT)"
            ).alias(out_col),
        )
    )


def hits_ppm_sql(
    edges_sql: str, src: str, dst: str, weight: str, iters: int = 4
) -> str:
    """DuckDB twin of hits_ppm: unrolled CTEs h0, a1, h1, ... — one
    generator emits both engines' recipes (the pagerank pattern)."""
    ctes = [
        f"edges AS ({edges_sql})",
        f"nodes AS (SELECT DISTINCT node FROM (SELECT {src} AS node FROM edges"
        f" UNION SELECT {dst} FROM edges))",
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub_ppm FROM nodes)",
    ]

    # Every raw frame is referenced twice (join + total) and chains to
    # the previous iteration's CTE; DuckDB INLINES plain CTEs, so the
    # naive form expands 2^iters-fold (OOM'd at sf0.1). MATERIALIZED
    # pins each level to one evaluation.
    def norm(raw_name: str, out: str, name: str) -> str:
        return f"""{name} AS MATERIALIZED (
            SELECT n.node,
                   CAST(CASE WHEN t.t IS NULL OR t.t = 0 THEN 0 ELSE
                        (COALESCE(r.raw, 0)::HUGEINT * 1000000) // t.t
                   END AS BIGINT) AS {out}
            FROM nodes n
            LEFT JOIN {raw_name} r ON r.node = n.node,
                 (SELECT sum(raw) AS t FROM {raw_name}) t)"""

    for i in range(1, iters + 1):
        ctes.append(
            f"ar{i} AS MATERIALIZED ("
            f"SELECT e.{dst} AS node, CAST(sum(e.{weight} * h.hub_ppm)"
            f" AS HUGEINT) AS raw FROM edges e"
            f" JOIN h{i - 1} h ON h.node = e.{src} GROUP BY e.{dst})"
        )
        ctes.append(norm(f"ar{i}", "auth_ppm", f"a{i}"))
        ctes.append(
            f"hr{i} AS MATERIALIZED ("
            f"SELECT e.{src} AS node, CAST(sum(e.{weight} * a.auth_ppm)"
            f" AS HUGEINT) AS raw FROM edges e"
            f" JOIN a{i} a ON a.node = e.{dst} GROUP BY e.{src})"
        )
        ctes.append(norm(f"hr{i}", "hub_ppm", f"h{i}"))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT h.node, h.hub_ppm, a.auth_ppm"
        f" FROM h{iters} h JOIN a{iters} a USING (node)"
    )


def lpa_communities(
    edges: DataFrame,
    src: str,
    dst: str,
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) made
    DETERMINISTIC: each round every node adopts the most frequent
    label among its neighbors, ties broken by the SMALLEST label —
    canonical LPA randomizes both update order and ties, which no
    value-checked engine can ship; the synchronous min-tie variant is
    reproducible bit-for-bit and converges to the same coarse
    communities on graphs with clear structure. Distinct from
    connected components (min-label REACHABILITY): LPA weighs label
    FREQUENCY, so two components linked by one stray edge stay
    separate communities where CC must merge them.

    Returns (community, n_members, sum_members) per final label.

    Scale: per round ONE node-keyed message join + a (node, label)
    count + a per-node top-1 window — the same plan-unrolled iteration
    economics as PageRank/HITS (fixed rounds, localCheckpoint bounds
    lineage); community count falls monotonically so later rounds
    shrink. No randomness, no driver state beyond the unroll constant.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        msgs = und.join(
            labels.withColumnRenamed("node", "v"), "v"
        ).select(F.col("u").alias("node"), "label")
        labels = (
            msgs.groupBy("node", "label")
            .agg(F.count("*").alias("cnt"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum("node").cast("bigint").alias("sum_members"),
    )


def lpa_communities_sql(edges_sql: str, src: str, dst: str, rounds: int = 3) -> str:
    """DuckDB twin of :func:`lpa_communities` — the same synchronous
    min-tie iteration unrolled as CTEs (MATERIALIZED: each level is
    referenced by the next; plain CTEs inline 2^rounds-fold)."""
    ctes = [
        f"e0 AS MATERIALIZED ({edges_sql})",
        f"und AS MATERIALIZED (SELECT DISTINCT u, v FROM ("
        f"SELECT {src} AS u, {dst} AS v FROM e0"
        f" UNION ALL SELECT {dst}, {src} FROM e0))",
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)",
    ]
    for i in range(1, rounds + 1):
        prev = f"l{i - 1}"
        ctes.append(
            f"""l{i} AS MATERIALIZED (
            SELECT node, label FROM (
                SELECT m.node, m.label,
                       row_number() OVER (
                           PARTITION BY m.node
                           ORDER BY m.cnt DESC, m.label ASC
                       ) AS rn
                FROM (
                    SELECT und.u AS node, p.label, count(*) AS cnt
                    FROM und JOIN {prev} p ON p.node = und.v
                    GROUP BY und.u, p.label
                ) m
            ) WHERE rn = 1
        )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(node) AS BIGINT) AS sum_members
    FROM l{rounds} GROUP BY label
    """
    )
