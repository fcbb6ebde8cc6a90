"""Additional SQL-surface registrations (SURVEY §2 "absent in reference,
engine exposes anyway" rows): percentiles, subquery shapes, array
functions, ordered string aggregation, date-part spectrum, regex
extraction, and the salted two-phase aggregation scale pattern.

Determinism rules shared with the oracle: set-valued outputs go through
``array_sort``; string aggregation concatenates a sorted list; date-part
numbering is normalized to DuckDB's conventions explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register, t


@register(
    "percentile_stats",
    bench=True,
    oracle="""
    SELECT l_returnflag,
           round(qs[1] / 100, 2) AS p25,
           round(qs[2] / 100, 2) AS p50,
           round(qs[3] / 100, 2) AS p75,
           round(sd, 2) AS sd
    FROM (
        SELECT l_returnflag,
               quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                             [0.25, 0.5, 0.75]) AS qs,
               stddev_samp(l_extendedprice) AS sd
        FROM lineitem GROUP BY l_returnflag
    )
    """,
)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles + sample stddev per group, via the
    two-pass rank operator (operators/percentile.py): histogram on
    (group, cents) then a rank walk over distinct values — aggregation
    state is O(distinct values), not O(group), so a 3-value group key
    cannot concentrate the table into three percentile buffers at 100×
    scale. Percentiles interpolate over integer CENTS (exact in double)
    so both engines produce bit-identical midpoints — interpolating raw
    doubles can land a half-cent boundary on differently-associated
    floats and flip round(·, 2) (seen at sf0.001). The answer (and the
    oracle) is unchanged from the single-pass ``F.percentile`` form.

    r14: the sample stddev folds into the same histogram — the separate
    stddev_samp leg cost a SECOND full lineitem scan + broadcast join;
    sd over exact integer cents /100 ≡ sd over prices (stddev is
    scale-equivariant and the cents are exact integers)."""
    from .operators.percentile import grouped_exact_percentiles

    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    qs = grouped_exact_percentiles(
        li,
        "l_returnflag",
        cents,
        {"__p25": 0.25, "__p50": 0.5, "__p75": 0.75},
        stddev="__sd_c",
    )
    return qs.select(
        "l_returnflag",
        F.round(F.col("__p25") / 100, 2).alias("p25"),
        F.round(F.col("__p50") / 100, 2).alias("p50"),
        F.round(F.col("__p75") / 100, 2).alias("p75"),
        F.round(F.col("__sd_c") / 100, 2).alias("sd"),
    )


@register(
    "subquery_exists_anti",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_cust,
           round(sum(c.c_acctbal), 2) AS sum_bal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '5-LOW')
    GROUP BY c.c_mktsegment
    """,
)
def subquery_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the DataFrame restatement is a
    left-semi then left-anti join on the correlation key (J1
    generalized); Catalyst broadcasts both probe sides."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(urgent, "c_custkey", "left_semi")
        .join(low, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — expressed as a 1-row broadcast
    cross join (no driver collect: the threshold stays in the plan)."""
    o = t(spark, sf_dir, "orders")
    thresh = o.agg(F.avg("o_totalprice").alias("__avg"))
    return (
        o.crossJoin(F.broadcast(thresh))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


@register(
    "array_functions_spectrum",
    oracle="""
    SELECT o_orderstatus,
           -- arrays are serialized: the driver's pandas canonicalizer
           -- cannot hash list cells (same class of crash as winnow r01)
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|')
               AS priorities,
           CAST(len(list(DISTINCT o_orderpriority)) AS INTEGER) AS n_prio,
           list_contains(list(DISTINCT o_orderpriority), '1-URGENT') AS has_urgent,
           list_sort(list(DISTINCT o_orderpriority))[1] AS first_prio
    FROM orders GROUP BY o_orderstatus
    """,
)
def array_functions_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + sort/size/contains/element_at over grouped
    collect_set (deterministic via array_sort; the array itself leaves
    the query serialized so the driver can hash it)."""
    o = t(spark, sf_dir, "orders")
    prios = F.array_sort(F.collect_set("o_orderpriority"))
    return o.groupBy("o_orderstatus").agg(
        F.concat_ws("|", prios).alias("priorities"),
        F.size(prios).alias("n_prio"),
        F.array_contains(prios, "1-URGENT").alias("has_urgent"),
        F.element_at(prios, 1).alias("first_prio"),
    )


@register(
    "string_agg_suppliers",
    oracle="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           count(*) AS n_supp
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def string_agg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: concat_ws over a sorted collect_list
    (keeps duplicates — string_agg semantics, order pinned)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "suppliers"
            ),
            F.count("*").alias("n_supp"),
        )
    )


@register(
    "date_parts_spectrum",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
           CAST(min(dayofweek(o_orderdate)) AS INTEGER) AS min_dow,
           CAST(max(dayofyear(o_orderdate)) AS INTEGER) AS max_doy,
           CAST(max(weekofyear(o_orderdate)) AS INTEGER) AS max_week,
           count(*) AS n
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), date_trunc('quarter', o_orderdate)
    """,
)
def date_parts_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc month/quarter + dow/doy/week extraction. Numbering is
    normalized to DuckDB conventions: its dayofweek is 0=Sunday..6 while
    Spark's dayofweek is 1=Sunday..7 (shift by −1); weekofyear is ISO in
    both."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.select(
            F.date_trunc("month", d).cast("date").alias("month"),
            F.date_trunc("quarter", d).cast("date").alias("quarter"),
            (F.dayofweek(d) - 1).alias("dow"),
            F.dayofyear(d).alias("doy"),
            F.weekofyear(d).alias("week"),
        )
        .groupBy("month", "quarter")
        .agg(
            F.min("dow").alias("min_dow"),
            F.max("doy").alias("max_doy"),
            F.max("week").alias("max_week"),
            F.count("*").alias("n"),
        )
    )


@register(
    "regexp_extract_part_colors",
    oracle="""
    SELECT color, count(*) AS n, count(DISTINCT p_brand) AS n_brand
    FROM (
        SELECT regexp_extract(p_name, '(red|blue|green|hot|small)', 1) AS color,
               p_brand
        FROM part
        WHERE regexp_matches(p_name, '(red|blue|green|hot|small)')
    )
    GROUP BY color
    """,
)
def regexp_extract_part_colors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract + rlike predicate (X-surface regex functions)."""
    p = t(spark, sf_dir, "part")
    pat = "(red|blue|green|hot|small)"
    return (
        p.filter(F.col("p_name").rlike(pat))
        .select(
            F.regexp_extract("p_name", pat, 1).alias("color"), "p_brand"
        )
        .groupBy("color")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("p_brand").alias("n_brand"),
        )
    )


@register(
    "skew_salted_agg",
    bench=True,
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the hot-key mitigation for skewed
    group-bys at 100 TB: phase 1 aggregates on (key, salt) spreading each
    hot key over 16 reducers, phase 2 merges the 16 partials per key.
    Results are identical to the plain GROUP BY (the oracle); sum order
    differences are absorbed by round(). Spark's map-side partial
    aggregation makes this unnecessary for count/sum on moderate skew —
    the pattern matters for high-cardinality-state aggs (collect_list,
    exact distinct) where partial aggregation can't shrink the hot key.
    """
    e = t(spark, sf_dir, "events")
    salted = (
        e.withColumn("__salt", F.pmod(F.hash("event_id"), F.lit(16)))
        .groupBy("event_type", "__salt")
        .agg(F.count("*").alias("__n"), F.sum("value").alias("__s"))
    )
    return salted.groupBy("event_type").agg(
        F.sum("__n").alias("n"),
        F.round(F.sum("__s"), 2).alias("sum_value"),
    )


@register(
    "having_filter_groups",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 8 AND sum(o_totalprice) > 500000
    """,
)
def having_filter_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING predicate (filter on aggregate columns)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("__raw_total"),
        )
        .filter((F.col("n_orders") >= 8) & (F.col("__raw_total") > 500000))
        .select(
            "o_custkey", "n_orders", F.round("__raw_total", 2).alias("total")
        )
    )


@register(
    "null_safe_join_props",
    oracle="""
    WITH keyed AS (
        SELECT event_id,
               CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) < 10
                    THEN NULL
                    ELSE CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 5
                              AS VARCHAR)
               END AS grp
        FROM events
    )
    SELECT coalesce(a.grp, '<null>') AS grp, count(*) AS n
    FROM (SELECT * FROM keyed WHERE event_id < 5000) a
    JOIN (SELECT DISTINCT grp FROM keyed) b
      ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY 1
    """,
)
def null_safe_join_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match NULL keys instead of being dropped — the semantics a
    dedup-by-nullable-column needs. The key mixes NULLs (k < 10) and
    values (k % 5) so both match paths are exercised."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    keyed = e.select(
        "event_id",
        F.when(k < 10, F.lit(None)).otherwise((k % 5).cast("string")).alias("grp"),
    )
    a = keyed.filter(F.col("event_id") < 5000)
    b = keyed.select("grp").distinct()
    return (
        a.join(b, a["grp"].eqNullSafe(b["grp"]))
        .select(F.coalesce(a["grp"], F.lit("<null>")).alias("grp"))
        .groupBy("grp")
        .agg(F.count("*").alias("n"))
    )


@register(
    "union_by_name_missing",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, count(note) AS n_with_note
    FROM (
        SELECT o_orderstatus, NULL AS note FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT 'legacy' AS note, o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderstatus
    """,
)
def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: columns aligned by NAME with missing
    columns null-filled (unionByName allowMissingColumns ≡ DuckDB
    UNION ALL BY NAME)."""
    o = t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderstatus")
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.lit("legacy").alias("note"), "o_orderstatus"
    )
    u = old.unionByName(new, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), F.count("note").alias("n_with_note")
    )


@register(
    "explode_lateral_shingles",
    oracle="""
    SELECT shingle, count(*) AS n
    FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS shingle
        FROM documents WHERE doc_id < 50
    )
    GROUP BY shingle HAVING count(*) >= 10
    """,
)
def explode_lateral_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral view / unnest): array column to rows, then a
    frequency rollup — the row-generating operator family."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 10)
    )


@register(
    "map_functions_scalar",
    oracle="""
    SELECT o_orderpriority,
           -- CAST: DuckDB sum(int) → HUGEINT → pandas float (hash skew)
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_o,
           CAST(count(DISTINCT o_orderstatus) AS INTEGER) AS n_keys
    FROM orders GROUP BY o_orderpriority
    """,
)
def map_functions_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed intermediate state: per-priority status→count map built
    with map_from_entries, probed with element_at/map_keys. Output is
    scalar (key-addressed) so the unordered map never reaches the hash
    compare; the oracle recomputes the same scalars relationally."""
    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    m = F.map_from_entries(
        F.collect_list(F.struct("o_orderstatus", "n"))
    )
    return (
        per.groupBy("o_orderpriority")
        .agg(m.alias("__m"))
        .select(
            "o_orderpriority",
            F.coalesce(F.element_at("__m", "F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.element_at("__m", "O"), F.lit(0)).alias("n_o"),
            F.size(F.map_keys("__m")).alias("n_keys"),
        )
    )


@register(
    "constraint_check_report",
    oracle="""
    WITH batch AS (
        SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, l_shipdate
        FROM lineitem WHERE l_orderkey % 100 = 0
    )
    SELECT
        (SELECT count(*) FROM (
            SELECT l_orderkey, l_linenumber
            FROM batch
            GROUP BY l_orderkey, l_linenumber
            HAVING count(*) > 1
                OR max(l_orderkey IS NULL OR l_linenumber IS NULL)
        )) AS pk_violations,
        (SELECT count(*) - count(l_shipdate) FROM batch) AS null_violations
    """,
)
def constraint_check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 engine-enforced constraints: PK-duplicate count over a batch
    with planted violations (lineitem ∪ every-100th-order copy) and
    NULL count in a NOT NULL column (operators/constraints.py)."""
    from .operators.constraints import check_constraints

    li = t(spark, sf_dir, "lineitem")
    batch = li.unionByName(li.filter(F.col("l_orderkey") % 100 == 0))
    return check_constraints(
        batch.select("l_orderkey", "l_linenumber", "l_shipdate"),
        pk_cols=["l_orderkey", "l_linenumber"],
        not_null_cols=["l_shipdate"],
    ).select(
        F.col("pk_violations").cast("bigint").alias("pk_violations"),
        F.col("null_violations").cast("bigint").alias("null_violations"),
    )
