"""The declared query surface (SURVEY.md §2 inventory + [EXT] operators).

Each query is registered with a Spark callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, the equivalent DuckDB oracle SQL
— kept adjacent so names/aliases stay in lockstep (the driver's compare
sorts columns by name and hashes values, so every computed column is
aliased identically on both sides).

Float discipline: every floating-point aggregate is ``ROUND(..., 2-6)``
on BOTH sides — Spark's partial-aggregation order differs from DuckDB's
sequential scan, so raw double sums differ in final ULPs.

Timestamp discipline: session tz UTC; event timestamps (parquet ns,
Spark µs) are compared via ``unix_millis`` ⇄ ``epoch_ms`` so both
engines see identical ms instants (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.readers import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: SparkQuery
    oracle: str | None
    #: headline queries run in bench.py at sf0.1
    bench: bool = False


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = Query(fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference-parity shapes (SURVEY §2.2-§2.4) expressed over the star schema
# so the DuckDB oracle can check them (FIXTURES.md "Mapping fixtures→tests").
# ---------------------------------------------------------------------------


@register(
    "incremental_watermark_load",
    oracle="""
    WITH existing AS (
        SELECT * FROM orders WHERE o_orderkey % 3 = 0
    ), wm AS (
        SELECT max(o_orderdate) AS w FROM existing
    ), delta AS (
        SELECT o.* FROM orders o, wm
        WHERE o.o_orderdate > wm.w
          AND o.o_orderkey NOT IN (SELECT o_orderkey FROM existing)
    )
    SELECT o_orderstatus,
           count(*) AS n_loaded,
           round(sum(o_totalprice), 2) AS sum_price
    FROM delta GROUP BY o_orderstatus
    """,
    bench=True,
)
def incremental_watermark_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 pattern (SURVEY §3): A1 watermark → F1 strict-> filter → J1
    anti-join dedup → grouped load report. 'Existing' = the already-loaded
    split (o_orderkey % 3 == 0); 'incoming' = the full re-extract.
    """
    from .operators.incremental import dedup_against, incremental_filter, watermark

    orders = t(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0)
    wm = watermark(existing, "o_orderdate")
    delta = incremental_filter(orders, "o_orderdate", wm)
    delta = dedup_against(delta, existing, ["o_orderkey"])
    return delta.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_loaded"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "dedup_anti_join",
    oracle="""
    SELECT count(*) AS n_new,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — left-anti join on a single-column key (gcs_to_postgres.py:
    153-175 intended semantics), existing-keys side broadcast."""
    from .operators.incremental import dedup_against

    li = t(spark, sf_dir, "lineitem")
    existing = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    new = dedup_against(li, existing, ["l_orderkey"])
    return new.agg(
        F.count("*").alias("n_new"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "composite_pk_dedup",
    oracle="""
    SELECT count(*) AS n_remaining
    FROM lineitem l
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem e
        WHERE e.l_linenumber <= 2
          AND e.l_orderkey = l.l_orderkey AND e.l_linenumber = l.l_linenumber
    )
    """,
)
def composite_pk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 generalized to a composite PK — rpt.dag_run's 2-col key
    (rpt.sql:32) exercised as (l_orderkey, l_linenumber)."""
    from .operators.incremental import dedup_against

    li = t(spark, sf_dir, "lineitem")
    existing = li.filter(F.col("l_linenumber") <= 2)
    new = dedup_against(li, existing, ["l_orderkey", "l_linenumber"])
    return new.agg(F.count("*").alias("n_remaining"))


@register(
    "project_cast_null_if_empty",
    oracle="""
    SELECT CAST(o_orderkey AS varchar) AS order_id,
           CASE WHEN o_orderpriority = '' THEN NULL ELSE o_orderpriority END
               AS priority,
           CAST(floor(o_totalprice) AS int) AS price_int
    FROM orders WHERE o_orderkey <= 100
    """,
)
def project_cast_null_if_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3 — projection + cast + ''→NULL (the COPY ``NULL AS ''``
    semantics, gcs_to_postgres.py:179)."""
    from .operators.project import null_if_empty

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    df = orders.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_orderpriority").alias("priority"),
        F.floor("o_totalprice").cast("int").alias("price_int"),
    )
    return null_if_empty(df, "priority")


@register(
    "watermark_scalar",
    oracle="""
    SELECT max(o_orderdate) AS wm, count(*) AS n
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def watermark_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — global max over a timestamp column (the watermark fetch,
    reporting_dag.py:31-45) as a 1-row DataFrame."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .agg(F.max("o_orderdate").alias("wm"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Core analytics surface (SURVEY §2.4-§2.6 "absent in reference, engine
# exposes anyway") — the reporting queries rpt.* exists to serve.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                       AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + pushed-down filter + 8-agg hash aggregate.
    Partial (map-side) aggregation makes this shuffle 6 rows at 100 TB.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    bench=True,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Fact-fact join (lineitem⋈orders)
    shuffles on the key; dimension sides broadcast at small SF (the
    constant-size nation/region by explicit hint, the data-proportional
    customer/supplier by Catalyst's own size check) — at 100 TB the
    fact join is the one mandatory shuffle and the big dims degrade
    gracefully to shuffled joins instead of OOMing a forced broadcast."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Hint discipline (review r13): only CONSTANT-size dims carry an
    # explicit broadcast hint (nation=25 rows, region=5 — fixed by the
    # schema at any SF). customer/supplier grow with the data — at
    # 100 TB they are terabytes, and an explicit hint bypasses Spark's
    # size check entirely; hint-free, Catalyst auto-broadcasts them at
    # small SF (same physical plan, pinned) and AQE falls back to a
    # shuffled join from real stats at scale.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + global agg —
    the pure predicate-pushdown benchmark (all four predicates reach the
    parquet row-group stats)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS custkey,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0.0), 2) AS spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no matching orders
    (count=0 rows must survive)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ EXISTS — customers with at least one big order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH f AS (
        SELECT o_custkey AS custkey, count(*) AS n_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), o AS (
        SELECT o_custkey AS custkey, count(*) AS n_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT coalesce(f.custkey, o.custkey) AS custkey,
           coalesce(f.n_f, 0) AS n_finished,
           coalesce(o.n_o, 0) AS n_open
    FROM f FULL OUTER JOIN o ON f.custkey = o.custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with coalesced keys — customers having only
    finished, only open, or both order kinds."""
    orders = t(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_f"))
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_o"))
    )
    return f.join(o, "custkey", "full_outer").select(
        F.col("custkey"),
        F.coalesce(F.col("n_f"), F.lit(0)).alias("n_finished"),
        F.coalesce(F.col("n_o"), F.lit(0)).alias("n_open"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (two distinct columns in one grouped agg —
    Catalyst expands, AQE handles the extra shuffle)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — hierarchical subtotals incl. grand total (NULL keys)."""
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "cube_returnflag_linestatus",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all grouping-set combinations."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )


@register(
    "grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (spark.sql over a temp view) —
    same Catalyst plan as the DataFrame API."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT c_mktsegment, custkey, spend, rn
    FROM (
        SELECT c.c_mktsegment,
               c.c_custkey AS custkey,
               round(sum(o.o_totalprice), 2) AS spend,
               row_number() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY round(sum(o.o_totalprice), 2) DESC, c.c_custkey
               ) AS rn
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ) WHERE rn <= 3
    """,
    bench=True,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: window row_number over an aggregate, deterministic
    tie-break on the key. At scale this is the standard 'top spenders per
    segment' shape — one shuffle for the agg, one for the window."""
    from pyspark.sql.window import Window

    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment", F.col("c_custkey").alias("custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend").desc(), F.col("custkey").asc()
    )
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "custkey", "spend", "rn")
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders WHERE o_custkey <= 50
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame (running total per customer, deterministic
    order by date + unique key)."""
    from pyspark.sql.window import Window

    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_lag_gap",
    oracle="""
    SELECT user_id, event_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_ms
    FROM events WHERE user_id <= 20
    """,
)
def window_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() — inter-event gap per user in ms (event ts precision is
    reduced to ms on both engines; SURVEY §7.4 ns-truncation note)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    return e.select(
        "user_id",
        "event_id",
        (ms - F.lag(ms).over(w)).alias("gap_ms"),
    )


@register(
    "set_ops",
    oracle="""
    WITH big AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000),
         recent AS (SELECT o_custkey AS custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT DISTINCT custkey FROM (
        SELECT custkey FROM big UNION ALL SELECT custkey FROM recent))
    UNION ALL
    SELECT 'intersect', count(*) FROM (SELECT custkey FROM big INTERSECT SELECT custkey FROM recent)
    UNION ALL
    SELECT 'except', count(*) FROM (SELECT custkey FROM big EXCEPT SELECT custkey FROM recent)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except over key sets, one labeled count each."""
    o = t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    rows = [
        big.unionAll(recent).distinct().agg(
            F.lit("union").alias("op"), F.count("*").alias("n")
        ),
        big.intersect(recent).agg(
            F.lit("intersect").alias("op"), F.count("*").alias("n")
        ),
        big.subtract(recent).agg(  # EXCEPT (distinct) semantics
            F.lit("except").alias("op"), F.count("*").alias("n")
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, o_orderstatus
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .select("c_mktsegment", "o_orderstatus")
        .distinct()
    )


@register(
    "limit_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def limit_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 — the reference's batch pagination surface (page_limit/
    page_offset, airflow_to_gcs.py:163,215) as ORDER BY + LIMIT/OFFSET
    over a unique key (deterministic pages)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@register(
    "scalar_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
               AS days_since_95,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2, 3, 4
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X3 family — extract/trunc/diff date functions."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("bigint")
            .alias("days_since_95"),
        )
        .groupBy("yr", "mo", "month_start", "days_since_95")
        .agg(F.count("*").alias("n"))
    )


@register(
    "scalar_string_functions",
    oracle="""
    SELECT upper(p_brand) AS brand_u,
           substr(p_name, 1, 8) AS name_prefix,
           CAST(length(p_name) AS BIGINT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END
               AS starts_word,
           count(*) AS n
    FROM part GROUP BY 1, 2, 3, 4, 5, 6
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4-X6 family — case, substring, length, concat, LIKE, regexp."""
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            F.upper("p_brand").alias("brand_u"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
            F.when(F.col("p_name").rlike(r"^[a-z]+ "), 1).otherwise(0).alias("starts_word"),
        )
        .groupBy(
            "brand_u", "name_prefix", "name_len", "brand_type", "is_brass", "starts_word"
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "scalar_math_functions",
    oracle="""
    SELECT round(sum(abs(l_discount - 0.05)), 4)          AS sum_absdev,
           round(sum(sqrt(l_quantity)), 4)                AS sum_sqrt,
           round(sum(ln(l_extendedprice)), 4)             AS sum_ln,
           round(sum(power(l_tax, 2)), 6)                 AS sum_tax_sq,
           round(sum(CAST(l_orderkey % 7 AS DOUBLE)), 1)  AS sum_mod
    FROM lineitem
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins: abs/sqrt/ln/power/mod, all JVM-side codegen."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.sum(F.abs(F.col("l_discount") - 0.05)), 4).alias("sum_absdev"),
        F.round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt"),
        F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_ln"),
        F.round(F.sum(F.pow(F.col("l_tax"), 2)), 6).alias("sum_tax_sq"),
        F.round(F.sum((F.col("l_orderkey") % 7).cast("double")), 1).alias("sum_mod"),
    )


@register(
    "conditional_case_coalesce",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS bucket,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'urgent!') AS prio,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def conditional_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF conditionals."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.when(F.col("o_totalprice") >= 300000, "large")
            .when(F.col("o_totalprice") >= 100000, "medium")
            .otherwise("small")
            .alias("bucket"),
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
                F.lit("urgent!"),
            ).alias("prio"),
        )
        .groupBy("bucket", "prio")
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           -- outer CAST: DuckDB sum(BIGINT) yields HUGEINT, which the
           -- driver's pandas canonicalizer renders as float (hash skew)
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    bench=True,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — JSON parse of the events.props payload (from_json with the
    explicit catalog schema, not schema inference)."""
    from .schemas import EVENT_PROPS

    e = t(spark, sf_dir, "events")
    return (
        e.withColumn("p", F.from_json("props", EVENT_PROPS))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("p.k")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (the batch twin of the streaming windowed
    agg in ``streaming/``) — hypertable-style hourly rollup."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (o_orderstatus = 'F') AS n_F,
           count(*) FILTER (o_orderstatus = 'O') AS n_O,
           count(*) FILTER (o_orderstatus = 'P') AS n_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation) — explicit value list so the
    plan is a single pass, no second job to discover pivot values."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_F"),
            F.coalesce("O", F.lit(0)).alias("n_O"),
            F.coalesce("P", F.lit(0)).alias("n_P"),
        )
    )


@register(
    "approx_count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderkey) AS n_orders,
           true AS approx_customers_ok,
           true AS approx_orders_ok
    FROM orders
    """,
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct would shuffle every key. DuckDB's HLL sketch differs, so
    the checkable invariant is a tolerance boolean: |approx − exact| /
    exact ≤ 5% (rsd=0.01 ⇒ far inside that) next to the exact counts."""
    o = t(spark, sf_dir, "orders")
    # The HLLs run in their OWN aggregate, joined back as a 1-row
    # scalar (r8, value-identical — HLL register-max merge is
    # layout-insensitive): combining count(DISTINCT) with
    # approx_count_distinct in ONE Aggregate makes the distinct
    # rewrite key the HLL partials by the expanded distinct VALUES —
    # one rsd=0.01 sketch per distinct key, and the merge stage does
    # O(n_distinct × 2^p registers) work (measured 60 s of executor
    # time / 8 s wall on 150k rows at sf0.1; at real scale it is
    # quadratic-ish in distincts and defeats the sketch's whole
    # point). Separated, partials are one sketch per partition.
    exact = o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderkey").alias("n_orders"),
    )
    approx = o.agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("__ac"),
        F.approx_count_distinct("o_orderkey", 0.01).alias("__ao"),
    )
    agg = exact.crossJoin(F.broadcast(approx))
    def ok(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) <= 0.05
        )
    return agg.select(
        "n_customers",
        "n_orders",
        ok("__ac", "n_customers").alias("approx_customers_ok"),
        ok("__ao", "n_orders").alias("approx_orders_ok"),
    )


@register(
    "q3_top_unshipped_orders",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
    bench=True,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim side broadcast) + agg + top-k.
    Deterministic tie-break (orderkey) so LIMIT matches the oracle."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer grows with the data: no explicit hint (review r13) —
        # auto-broadcast keeps the same plan at small SF, AQE decides
        # from stats at 100 TB
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


# [EXT] + surface registrations live in sibling modules; importing
# populates QUERIES.
from . import queries_ext  # noqa: E402,F401  (registry side-effect import)
from . import queries_scale  # noqa: E402,F401
from . import queries_surface  # noqa: E402,F401
from . import queries_tpch  # noqa: E402,F401
from . import queries_training  # noqa: E402,F401

# r13 scoped registration (SURVEY §16): the deletion-vector block is
# registered HERE, not inside queries_dv — queries_dv has no import
# back into this module, so it cannot hit the circular-import window
# where a sibling imported first registers after _reorder_registry()
# and silently lands outside the checked head (review r13). The three
# names are not in _DEMOTED_TAIL: windowed immediately.
from . import queries_dv  # noqa: E402

for _dv_name in queries_dv.DV_BLOCK:
    register(_dv_name, oracle=queries_dv.DV_ORACLES[_dv_name])(
        queries_dv.DV_BLOCK[_dv_name]
    )
del _dv_name

#: The correctness harness checks the FIRST 50 registry entries. Every
#: SURVEY §2 family and every benched query must land inside that
#: window, so near-duplicate shapes are demoted to the tail — each tail
#: entry names the checked query that covers its family. Tail queries
#: keep their oracles and stay covered by tools/check_oracle.py locally.
#:
#: The tail ROTATES across rounds so every registered query accumulates
#: at least one driver CORRECTNESS row: round 3 promoted the ten
#: never-driver-checked r1/r2 tail entries and demoted shapes that
#: already hold green rows in BOTH CORRECTNESS_r01 and _r02 (marked
#: [r1+r2 ✓] — demotion loses them nothing; their rows exist).
#:
#: STANDING ROTATION POLICY (round 5): each round, (a) any query whose
#: operator code changed since its last driver row is re-windowed — a
#: stale green row attests code that no longer exists; (b) after that,
#: the OLDEST remaining rows rotate in, displacing non-bench shapes
#: whose code is unchanged since their latest green row. Bench queries
#: never demote (enforced below).
#:
#: Round 6 promoted all ten never-driver-checked newcomers (the eight
#: round-5 ones + round-6's asof_join_next_event and
#: multimodal_jpeg_decode) plus the FIFTEEN oldest r1/r2-stale rows,
#: demoting twenty-five [r5 ✓] non-bench shapes with untouched code.
#:
#: Round 7 (this round) retires the first block of the attestation
#: debt per the VERDICT r6 schedule: the TEN r2-stale entries, the
#: FIFTEEN round-6 mid-round additions, and the deferred
#: ngram_jaccard_consecutive — TWENTY-SIX promotions — plus the one
#: verdict-demanded newcomer (corpus_quality_score, the learned
#: quality stage, windowed immediately so it never joins the debt).
#: The REGISTRY IS FROZEN otherwise (VERDICT r6 next-round #1): no
#: new tail entries until the never-attested count is below one
#: window. Round 8 promoted the 27-block hll_portable_distinct …
#: multimodal_tiff_decode (never-count 94→67). Round 9 promoted the
#: next 27 in tail order — table_ndv_profile …
#: corpus_cleaning_funnel (never-count 67→40). Round 10 (this round)
#: promotes the following 27 — dedup_substring_spans …
#: theilsen_slope_hourly (never-count 40→13); round 11 owes the
#: final 13 nevers (trimmed_mean_order_value …
#: matview_agg_delta_refresh) + the oldest re-demoted rows (r3).
#: After that every row is ≤ 2 rounds old.
#: `tools/freshness_report.py` prints the live worklist;
#: `tools/freshness_report.py --gate` (wired into ship_gate.sh) FAILS
#: the round if a non-bench window slot is spent on a query that
#: already holds a current-round row, or the never-attested tail
#: exceeds the retirement schedule.
_DEMOTED_TAIL: list[str] = [
    # round-4 rotation: winnow_containment_pairs promoted (the one
    # registered query with no driver row after r3); [r3 ✓] shapes
    # demoted to free its slot and the round-4 newcomers' slots.
    # Round 11 PROMOTED the fourteen oldest r3 rows back into the
    # window per the §12 schedule (scalar_math_functions …
    # q22_dormant_balances); round 12 PROMOTED the four remaining r3
    # rows (q18_large_volume_orders, q14_promo_revenue_ratio,
    # correlated_min_subquery, doc_repetition_ratio — age-forced by
    # the gate) together with ALL sixteen r4 rows and the seven
    # standing clause-(a) re-attestations (timeseries_gapfill_hourly,
    # timeseries_anomaly_hours, approx_count_distinct,
    # embedding_near_dup_pairs, multimodal_jpeg_decode,
    # multimodal_mjpeg_frames, multimodal_gif_decode) — the exactly
    # booked 27-block from SURVEY §16's binding r12 decision.
    # round-6 rotation (standing policy above): twenty-five [r5 ✓]
    # non-bench shapes with code UNCHANGED since their r5 row step down
    # so (a) the eight round-5 newcomers, (b) the two round-6 newcomers
    # (asof_join_next_event, multimodal_jpeg_decode), and (c) the
    # FIFTEEN oldest r1/r2-stale rows can attest. dedup_fuzzy_keepmin
    # and dedup_transitive_clusters stay IN the window despite their r5
    # rows: the minhash pair expansion they depend on was rewritten
    # lambda-free this round (policy clause (a)).
    # (round 13 PROMOTED the twenty-three remaining r5 rows —
    # composite_pk_dedup … training_mix_order — per the §16 booking;
    # they were age-forced at r13, the gate's MAX_ROW_AGE bound.)
    # round-6 late additions (sketch/scale primitives): the r8 27-block
    # (hll_portable_distinct … multimodal_tiff_decode) and the r9
    # 27-block (table_ndv_profile … corpus_cleaning_funnel) PROMOTED to
    # the window per the mechanical r8–r11 schedule (SURVEY §12); the
    # rest queue for r10+ below
    # (round 11 PROMOTED the final thirteen never-attested entries —
    # trimmed_mean_order_value … matview_agg_delta_refresh — into the
    # window per the §12 schedule; never-attested tail is now ZERO)
    # ---- round-14 rotation (standing policy): the twenty-five r6 rows
    # (dedup_anti_join … doc_length_mad_by_lang) plus the two oldest r7
    # rows (ngram_jaccard_consecutive, multimodal_wav_dsp) PROMOTED to
    # the window per freshness_report --plan (age-forced at 8 rounds =
    # MAX_ROW_AGE+1 without this rotation); the twenty-seven [r13 ✓]
    # shapes step down to the tail end below.
    # ---- round-15 rotation (standing policy): the twenty-one [r7 ✓]
    # rows (record_linkage_blocked … bpe_tokenize_stats) and the six
    # oldest [r8 ✓] rows (hll_portable_distinct, bloom_prefilter_semi,
    # split_assign_stats, user_activity_islands, interval_bucket_join,
    # udtf_chunk_rows) PROMOTED to the window per freshness_report
    # --plan (age-forced); the twenty-seven [r14 ✓] shapes step down
    # to the tail end below.
    # ---- round-9 rotation (standing policy): the remaining [r8 ✓]
    # non-bench window shapes with code UNCHANGED since their r8 row
    # step down so the r9 27-block (table_ndv_profile …
    # corpus_cleaning_funnel, SURVEY §12 schedule) can attest. Freshest
    # rows in the registry — they queue at the very end of the
    # retirement schedule (r12+).
    "cms_heavy_hitters",        # [r8 ✓] CMS point queries ⊂ cms_join_size_estimate (promoted)
    "seasonal_hourly_profile",  # [r8 ✓] hour-of-week profile ⊂ hopping_window_traffic (promoted)
    "pagerank_event_graph",     # [r8 ✓] iterative link analysis ⊂ hits_event_graph (promoted)
    "histogram_quantile_sketch",  # [r8 ✓] equi-width sketch ⊂ equidepth/percentile family
    "prefix_filter_jaccard_pairs",  # [r8 ✓] exact-Jaccard prefix filter ⊂ minhash (bench)
    "streaming_hll_distinct",   # [r8 ✓] streaming sketch ⊂ streaming_hourly_rollup (bench)
    "window_rank_spectrum",     # [r8 ✓] rank-fn surface ⊂ window_topk_per_group (bench)
    "posting_gap_encode_stats", # [r8 ✓] delta-gap encoding ⊂ inverted_index/bm25 family
    "bm25_rank_topk",           # [r8 ✓] BM25 scoring ⊂ tfidf_top_terms (bench)
    "user_behavior_gini",       # [r8 ✓] Lorenz/Gini math ⊂ pareto/coverage family
    "pareto_revenue_coverage",  # [r8 ✓] cumulative coverage ⊂ cumulative_new_users (promoted)
    "scd2_interval_stats",      # [r8 ✓] validity intervals ⊂ multitouch_attribution_linear (promoted)
    "skyline_orders_2d",        # [r8 ✓] dominance filter ⊂ window/top-k family
    "benford_digit_audit",      # [r8 ✓] leading-digit audit ⊂ distribution_drift_tv family
    "twap_user_value",          # [r8 ✓] time-weighted avg ⊂ ewma/twap ts family
    "event_type_lift_pairs",    # [r8 ✓] co-occurrence lift ⊂ item_similarity_topk family
    "hll_merge_shards",         # [r8 ✓] register-max merge ⊂ hll_intersection_overlap (promoted)
    "equidepth_partition_bounds",  # [r8 ✓] NDV-bounded ranges ⊂ quality_curriculum_phases family
    "weighted_sample_topk",     # [r8 ✓] A-ES weighted sample ⊂ deterministic_sample family
    "label_centroid_inertia",   # [r8 ✓] grouped Arrow agg ⊂ embedding_dim_covariance_topk (promoted)
    "multimodal_tiff_decode",   # [r8 ✓] PackBits decode ⊂ multimodal codec family
    # ---- round-10 rotation (standing policy): the twenty-seven [r9 ✓]
    # non-bench window shapes with code UNCHANGED since their r9 row
    # step down so the r10 27-block (dedup_substring_spans …
    # theilsen_slope_hourly, SURVEY §12 schedule) can attest. Freshest
    # rows in the registry — they queue at the very end of the
    # retirement schedule (r13+). Four of these stay on the bench
    # board without the registry flag (bench.py's explicit entrants:
    # dedup_incremental_new_batch, bitmap_retention_days,
    # triangle_count_copurchase, kcore_copurchase) — demotion only
    # moves them out of the CORRECTNESS window; bench_compare still
    # sees them every round.
    "cluster_best_representative",  # [r9 ✓] per-cluster argmin ⊂ semdedup/CC family
    "simhash_hamming_census",   # [r9 ✓] 16-bit Hamming census ⊂ simhash/minhash family
    "layout_locality_audit",    # [r9 ✓] file-span locality ⊂ zorder/layout family
    "dedup_incremental_new_batch",  # [r9 ✓] O(batch) index probe ⊂ band-index family (bench row)
    "corpus_cleaning_funnel",   # [r9 ✓] staged gate funnel ⊂ quality-score/filter family
    "table_ndv_profile",        # [r9 ✓] per-column NDV profile ⊂ fd/constraint family
    "interval_union_coverage",  # [r9 ✓] swept-line union ⊂ islands/scd2 family
    "cms_join_size_estimate",   # [r9 ✓] CMS inner-product ⊂ cms_heavy_hitters family
    "kmv_distinct_estimate",    # [r9 ✓] k-min-values NDV ⊂ hll/kmv sketch family
    "hopping_window_traffic",   # [r9 ✓] overlapping windows ⊂ seasonal/hourly family
    "period_over_period_revenue",  # [r9 ✓] lag-window ratios ⊂ trend/seasonal family
    "hits_event_graph",         # [r9 ✓] hub/authority iteration ⊂ pagerank graph family
    "hourly_trend_slope_exact", # [r9 ✓] exact LSQ slope ⊂ theilsen/trend family
    "cumulative_new_users",     # [r9 ✓] first-seen cumsum ⊂ pareto/retention family
    "multitouch_attribution_linear",  # [r9 ✓] span-share credit ⊂ scd2/attribution family
    "quota_waterfall_mix",      # [r9 ✓] greedy quota fill ⊂ mixture/epoch-plan family
    "arrow_native_tokenstats",  # [r9 ✓] mapInArrow pass ⊂ udtf/Arrow surface family
    "bitmap_retention_days",    # [r9 ✓] roaring-style bitmap ops ⊂ retention family (bench row)
    "kmv_jaccard_sources",      # [r9 ✓] KMV set-overlap ⊂ kmv/hll sketch family
    "keyset_pagination_orders", # [r9 ✓] keyset twin of L1 ⊂ pagination family
    "triangle_count_copurchase",  # [r9 ✓] oriented wedge join ⊂ graph family (bench row)
    "hll_intersection_overlap", # [r9 ✓] inclusion-exclusion HLL ⊂ hll sketch family
    "bfs_levels_copurchase",    # [r9 ✓] frontier BFS ⊂ graph iteration family
    "kcore_copurchase",         # [r9 ✓] peeling iteration ⊂ graph family (bench row)
    "rendezvous_shard_rebalance",  # [r9 ✓] HRW movement audit ⊂ split-assign family
    "hard_negative_mining",     # [r9 ✓] near-miss pair mining ⊂ similarity/training family
    "embedding_dim_covariance_topk",  # [r9 ✓] grouped Arrow covariance ⊂ centroid/inertia family
    # ---- round-11 rotation (standing policy): the twenty-seven [r10 ✓]
    # non-bench window shapes with code UNCHANGED since their r10 row
    # step down so the FINAL 13 never-attested entries
    # (trimmed_mean_order_value … matview_agg_delta_refresh) and the 14
    # oldest r3-stale rows (scalar_math_functions … q22_dormant_balances)
    # can attest — after this round the attestation debt is ZERO and
    # every row is ≤ 2 rounds old at rotation time. Freshest rows in
    # the registry — they queue at the very end of the retirement
    # schedule (r14+).
    "dedup_substring_spans",    # [r10 ✓] k-gram span windows ⊂ minhash/exact-substr family (bench row)
    "doc_topgram_repetition",   # [r10 ✓] top-gram share ⊂ doc_text_stats (bench)
    "semdedup_prune_report",    # [r10 ✓] cluster-scoped cosine prune ⊂ semdedup family (bench row)
    "streaming_neardup_ingest", # [r10 ✓] stream LSH probe ⊂ streaming/dedup family
    "streaming_pyds_crawl_feed",  # [r10 ✓] python datasource stream ⊂ streaming family
    "multimodal_image_dhash_dedup",  # [r10 ✓] dHash grouping ⊂ multimodal codec family
    "multimodal_scene_changes", # [r10 ✓] MJPEG scene deltas ⊂ multimodal codec family
    "multimodal_container_sniff",  # [r10 ✓] magic-byte sniff ⊂ multimodal codec family
    "multimodal_wav_vad_segments",  # [r10 ✓] PCM VAD spans ⊂ multimodal codec family
    "lsh_recall_audit",         # [r10 ✓] banding recall audit ⊂ minhash/presigned family
    "ewma_user_value",          # [r10 ✓] recursive EWMA ⊂ twap/ts family
    "fd_violation_audit",       # [r10 ✓] FD counterexamples ⊂ constraint/ndv family
    "matview_join_delta_refresh",  # [r10 ✓] join-delta IVM ⊂ matview/IVM family
    "cusum_changepoint_hours",  # [r10 ✓] CUSUM drift spans ⊂ trend/changepoint family
    "lsh_precision_funnel",     # [r10 ✓] banding precision audit ⊂ lsh_recall family
    "join_fanout_hotspots",     # [r10 ✓] join-cardinality audit ⊂ fk/containment family
    "quantile_sketch_error_audit",  # [r10 ✓] sketch-vs-exact error ⊂ percentile/sketch family
    "late_arrival_backfill_report",  # [r10 ✓] watermark lateness audit ⊂ incremental family
    "lpa_communities_copurchase",  # [r10 ✓] label propagation ⊂ graph iteration family
    # (round 13 RE-WINDOWED item_similarity_topk — clause (a): the
    # late-r11 explode-symmetrization rewrite post-dates its r10 row;
    # the one non-DV free slot per the §16 arithmetic.)
    "distribution_drift_tv",    # [r10 ✓] total-variation drift ⊂ drift/profile family
    "hybrid_rrf_fusion",        # [r10 ✓] reciprocal-rank fusion ⊂ bm25/similarity family
    "acf_hourly_lags",          # [r10 ✓] autocorrelation lags ⊂ trend/seasonal family
    "theilsen_slope_hourly",    # [r10 ✓] pairwise-median slope ⊂ trend family
    "q2_min_cost_supplier",     # [r10 ✓] correlated-min join ⊂ TPC-H family
    "epoch_repetition_plan",    # [r10 ✓] epoch dup planning ⊂ mixture/packing family
    "quality_curriculum_phases",  # [r10 ✓] phase bucketing ⊂ curriculum/quota family
    # ---- round-12 rotation (standing policy): the twenty-seven [r11 ✓]
    # non-bench window shapes with code UNCHANGED since their r11 row
    # step down so the exactly booked r12 27-block (4 age-forced r3
    # rows + all 16 r4 rows + the 7 clause-(a) re-attestations, SURVEY
    # §16 binding decision) can attest. Freshest rows in the registry —
    # they queue at the very end of the retirement schedule (r15+).
    "grouping_sets_sql",        # [r11 ✓] GROUPING SETS ⊂ rollup/cube family
    "window_running_total",     # [r11 ✓] running frame ⊂ window_topk_per_group (bench)
    "window_lag_gap",           # [r11 ✓] lag deltas ⊂ window rank/frame family
    "set_ops",                  # [r11 ✓] UNION/INTERSECT/EXCEPT ⊂ distinct_pairs family
    "scalar_math_functions",    # [r11 ✓] X-math surface ⊂ scalar function family
    "conditional_case_coalesce",  # [r11 ✓] CASE/COALESCE ⊂ project/conditional family
    "knn_label_agreement",      # [r11 ✓] Arrow kNN audit ⊂ similarity family (epoch-watch row)
    "dbscan_embedding_clusters",  # [r11 ✓] density clusters ⊂ semdedup/CC family (epoch-watch row)
    "trimmed_mean_order_value", # [r11 ✓] percentile trim ⊂ quantile/robust family
    "mann_kendall_trend",       # [r11 ✓] rank-pair trend ⊂ theilsen/trend family
    "ks_value_drift",           # [r11 ✓] KS statistic ⊂ distribution_drift_tv family
    "event_trigram_paths",      # [r11 ✓] path trigrams ⊂ transition-matrix family
    "quantile_normalize_doclen",  # [r11 ✓] rank-normalize ⊂ quantile family
    "lexical_diversity_by_source",  # [r11 ✓] type-token ratios ⊂ doc_text_stats (bench)
    "matview_agg_delta_refresh",  # [r11 ✓] agg-delta IVM ⊂ matview/IVM family
    "date_parts_spectrum",      # [r11 ✓] X1-X3 surface ⊂ scalar_date_functions family
    "having_filter_groups",     # [r11 ✓] HAVING ⊂ q18/group-filter family
    "q7_nation_pair_revenue",   # [r11 ✓] pair-filter join ⊂ q5 (bench) family
    "q8_market_share",          # [r11 ✓] share-of-total ⊂ q14/q7 family
    "q10_returned_item_revenue",  # [r11 ✓] top-k revenue join ⊂ q3 (bench) family
    "q19_disjunctive_predicates",  # [r11 ✓] OR-pushdown ⊂ q6/q1 family
    "q21_sole_supplier_orders", # [r11 ✓] EXISTS/NOT-EXISTS chain ⊂ q4 family
    "q22_dormant_balances",     # [r11 ✓] anti-join + scalar avg ⊂ q16/q17 family
    "unigram_viterbi_stats",    # [r11 ✓] Arrow DP segmentation ⊂ unigram-LM family
    "unigram_piece_usage",      # [r11 ✓] piece census ⊂ unigram-LM family
    "unigram_bits_per_token",   # [r11 ✓] bits/token rollup ⊂ unigram-LM family
    "unigram_em_refine",        # [r11 ✓] EM re-estimate ⊂ unigram-LM family
    # ---- round-13 rotation (standing policy): the twenty-seven [r12 ✓]
    # non-bench window shapes with code UNCHANGED since their r12 row
    # step down so the exactly booked r13 27-block (23 age-forced r5
    # rows + the 3 deletion-vector registrations windowed immediately +
    # item_similarity_topk's clause-(a) re-attest, SURVEY §16 binding
    # decision) can attest. The registry is now 232 and FROZEN for
    # good; these queue at the very end of the retirement schedule
    # (r16+).
    "join_full_outer",          # [r12 ✓] outer-preserve ⊂ join surface family
    "approx_count_distinct",    # [r12 ✓] HLL sketch agg ⊂ hll/kmv sketch family
    "doc_fingerprint",          # [r12 ✓] rolling-hash fp ⊂ doc_text_stats (bench)
    "embedding_near_dup_pairs", # [r12 ✓] exact-cosine baseline ⊂ near_dup_lsh (bench)
    "flag_contaminated_docs",   # [r12 ✓] gram-overlap probe ⊂ fuzzy_decontaminate family
    "doc_repetition_ratio",     # [r12 ✓] dup-line share ⊂ doc_topgram_repetition family
    "streaming_session_rollup", # [r12 ✓] session windows ⊂ streaming_hourly_rollup (bench)
    "pii_scrub_stats",          # [r12 ✓] regex scrub census ⊂ doc_text_stats (bench)
    "streaming_dedup_distinct", # [r12 ✓] stream dropDuplicates ⊂ streaming family
    "multimodal_bmp_decode",    # [r12 ✓] BMP decode ⊂ multimodal codec family
    "multimodal_gif_decode",    # [r12 ✓] LZW decode ⊂ multimodal codec family
    "multimodal_jpeg_decode",   # [r12 ✓] baseline JPEG decode ⊂ multimodal codec family
    "multimodal_mjpeg_frames",  # [r12 ✓] MJPEG frame split ⊂ multimodal codec family
    "multimodal_avi_frames",    # [r12 ✓] RIFF/AVI walk ⊂ multimodal codec family
    "vocab_top_terms",          # [r12 ✓] global vocab census ⊂ tfidf_top_terms (bench)
    "stratified_sample",        # [r12 ✓] per-stratum sample ⊂ deterministic_sample family
    "timeseries_gapfill_hourly",  # [r12 ✓] gap-explode interpolate ⊂ ts family (bench twin)
    "timeseries_anomaly_hours", # [r12 ✓] one-pass z-score spans ⊂ ts/gapfill family
    "zorder_curve_keys",        # [r12 ✓] bit-interleave keys ⊂ layout_locality family
    "partition_skew_report",    # [r12 ✓] key-skew census ⊂ join_fanout_hotspots family
    "q14_promo_revenue_ratio",  # [r12 ✓] conditional share ⊂ q8/q19 family
    "q18_large_volume_orders",  # [r12 ✓] HAVING-IN join ⊂ having_filter family
    "correlated_min_subquery",  # [r12 ✓] per-group min probe ⊂ q2/q17 family
    "q4_order_priority_check",  # [r12 ✓] EXISTS semi ⊂ q21/subquery_exists family
    "q12_priority_by_linestatus",  # [r12 ✓] conditional agg ⊂ pivot/q14 family
    "q13_customer_order_distribution",  # [r12 ✓] outer-join histogram ⊂ q22 family
    "q15_top_supplier",         # [r12 ✓] scalar-max view join ⊂ q11/q20 family
    # ---- round-14 rotation (standing policy): the twenty-seven [r13 ✓]
    # non-bench window shapes with code UNCHANGED since their r13 row
    # step down so the age-forced 27-block (25 r6 rows + the 2 oldest
    # r7 rows, freshness_report --plan) can attest. Freshest rows in
    # the registry — they queue at the very end of the retirement
    # schedule (r17+).
    "composite_pk_dedup",       # [r13 ✓] F2/J1 composite ⊂ incremental_watermark_load (bench)
    "join_left_outer",          # [r13 ✓] outer-preserve ⊂ join surface family
    "agg_distinct",             # [r13 ✓] A2 key-set ⊂ dedup_exact_docs (bench)
    "rollup_status_priority",   # [r13 ✓] ROLLUP ⊂ grouping-sets family
    "cube_returnflag_linestatus",  # [r13 ✓] CUBE ⊂ grouping-sets family
    "limit_offset_pagination",  # [r13 ✓] L1 batching ⊂ keyset_pagination family
    "scalar_string_functions",  # [r13 ✓] X6 surface ⊂ string scalar family
    "doc_lang_id",              # [r13 ✓] n-gram lang-ID ⊂ doc_text_stats (bench)
    "simhash_collision_groups", # [r13 ✓] simhash grouping ⊂ simhash/minhash family
    "similarity_topk_ivf_pruned",  # [r13 ✓] partition-pruned IVF ⊂ similarity_topk_ivf (bench)
    "multimodal_feature_extract",  # [r13 ✓] binary metadata extract ⊂ multimodal codec family
    "similarity_topk_ivfpq",    # [r13 ✓] ADC scan ⊂ ivfpq_residual (bench)
    "item_similarity_topk",     # [r13 ✓] explode-symmetrized cosine ⊂ similarity family (bench row)
    "constraint_check_report",  # [r13 ✓] K4 PK invariants ⊂ fd/constraint family
    "q9_product_profit",        # [r13 ✓] multi-dim profit join ⊂ q5 (bench) family
    "q16_supplier_part_counts", # [r13 ✓] anti-join distinct ⊂ q22 family
    "q17_small_quantity_revenue",  # [r13 ✓] correlated avg probe ⊂ q2/correlated family
    "q11_important_parts",      # [r13 ✓] share-of-total HAVING ⊂ q15/q20 family
    "q20_promo_part_suppliers", # [r13 ✓] nested IN chain ⊂ q21/q4 family
    "ngram_novelty_scores",     # [r13 ✓] cross-corpus LM ⊂ ngram_cross_domain family
    "doc_chunking_stats",       # [r13 ✓] chunk spans ⊂ sequence_packing (bench) family
    "embedding_int8_quantize",  # [r13 ✓] int8 quantize ⊂ pq/quantize family
    "winnow_containment_pairs", # [r13 ✓] winnow overlap ⊂ doc_winnow/minhash family
    "training_mix_order",       # [r13 ✓] interleaved mix ⊂ mixture/epoch-plan family
    "dv_delete_read_consistency",  # [r13 ✓] DV delete+read ⊂ versioned/DV family
    "dv_chain_time_travel",     # [r13 ✓] DV chain resolve ⊂ versioned/DV family
    "dv_compaction_equivalence",  # [r13 ✓] DV compaction ⊂ versioned/DV family
    # ---- round-15 rotation (standing policy): the twenty-seven
    # [r14 ✓] non-bench window shapes with code UNCHANGED since their
    # r14 row step down so the age-forced 27-block (21 r7 rows + 6
    # oldest r8 rows, freshness_report --plan) can attest. Freshest
    # rows in the registry — they queue at the very end of the
    # retirement schedule (r18+).
    "dedup_anti_join",          # [r14 ✓] F2/J1 anti-join ⊂ incremental_watermark_load (bench)
    "project_cast_null_if_empty",  # [r14 ✓] P1–P3 projection ⊂ project surface family
    "watermark_scalar",         # [r14 ✓] A1 scalar MAX ⊂ incremental_watermark_load (bench)
    "q6_forecast_revenue",      # [r14 ✓] pushdown aggregate ⊂ q1 (bench) family
    "join_semi",                # [r14 ✓] LEFT SEMI ⊂ join surface family
    "distinct_pairs",           # [r14 ✓] A2 key-set distinct ⊂ dedup_exact_docs (bench)
    "scalar_date_functions",    # [r14 ✓] X1–X3 surface ⊂ date scalar family
    "events_hourly_rollup",     # [r14 ✓] hourly truncate rollup ⊂ streaming_hourly_rollup (bench)
    "pivot_status_by_priority", # [r14 ✓] pivot ⊂ q12/q14 conditional-agg family
    "doc_winnow_fingerprints",  # [r14 ✓] winnowing k-gram ⊂ doc_winnow/minhash family
    "fuzzy_decontaminate_docs", # [r14 ✓] LSH decontaminate ⊂ minhash (bench) family
    "ngram_jaccard_consecutive",  # [r14 ✓] shingle Jaccard ⊂ prefix_filter family
    "dedup_transitive_clusters",  # [r14 ✓] CC over dup pairs ⊂ minhash/CC family
    "asof_join_next_event",     # [r14 ✓] forward as-of ⊂ asof_join_last_click (bench)
    "range_join_value_buckets", # [r14 ✓] banded range join ⊂ interval_bucket_join family
    "dedup_fuzzy_keepmin",      # [r14 ✓] keep-min survivor ⊂ minhash (bench) family
    "multimodal_wav_decode",    # [r14 ✓] RIFF/PCM decode ⊂ multimodal codec family
    "multimodal_png_decode",    # [r14 ✓] DEFLATE/unfilter ⊂ multimodal codec family
    "multimodal_wav_dsp",       # [r14 ✓] window DSP ⊂ multimodal_wav_decode family
    "corpus_quality_filter",    # [r14 ✓] quality gate ⊂ doc_text_stats (bench) family
    "mixture_temperature_sample",  # [r14 ✓] temperature weights ⊂ training mix family
    "deterministic_sample",     # [r14 ✓] hash-threshold sample ⊂ sampling family
    "similarity_topk_ivfpq_pruned",  # [r14 ✓] pruned ADC ⊂ ivfpq_residual (bench)
    "similarity_topk_ivfpq_rerank",  # [r14 ✓] exact rerank ⊂ ivfpq_residual (bench)
    "union_by_name_missing",    # [r14 ✓] allowMissingColumns ⊂ set-op surface family
    "bpe_merge_ranks",          # [r14 ✓] BPE train ⊂ bpe_tokenize_stats family
    "doc_length_mad_by_lang",   # [r14 ✓] grouped MAD ⊂ doc_text_stats (bench) family
]

_CHECK_WINDOW = 50

#: Rotation-policy clause (a) escape hatch for the freshness gate
#: (tools/freshness_report.py --gate): a query listed here was
#: RE-WINDOWED because its operator code changed since its latest
#: driver row — the gate would otherwise reject it as "window slot
#: spent on a fresh row". Reset to empty each round after the driver
#: run attests the new code. Round 8: empty — the round's
#: operator-code changes (hits_ppm plan-growth fix, the Arrow
#: all-pairs scorers behind knn/dbscan) touch only NEVER-attested
#: tail queries (hits_event_graph r10; knn_label_agreement and
#: dbscan_embedding_clusters r11), so there is no stale green row to
#: re-window; their first driver rows attest the new code on
#: schedule. All tri-SF oracle-verified locally at change time.
#: CLAUSE-(a) BOUNDARY CASE, decided and documented (r8): four
#: ATTESTED tail queries received PLAN-ONLY changes —
#: timeseries_gapfill_hourly + timeseries_anomaly_hours (r7 rows; a
#: physical repartition fixing the single-task grid),
#: approx_count_distinct (r7 row; HLLs split into their own
#: aggregate — register-max merge is layout-insensitive), and
#: embedding_near_dup_pairs (r5 row; exact leg swapped to the
#: bitwise-pinned Arrow scorer). Zero expression/semantic delta in
#: each, and the retirement schedule leaves no window slack for
#: re-windows before r12 (promoting any would push the never-count
#: over the gate ceiling). Ruling: value identity re-verified
#: tri-SF at change time for every touched query, plan pins and the
#: GUARDED replay still pass, and their next scheduled window pass
#: re-attests under the driver. A SEMANTIC change to an attested
#: query would still demand a true re-window (or wait for the debt
#: to clear).
#: Round 9 addendum: the ADVICE-r8 hardening of the Arrow scorers
#: (broadcast query matrix, 64 MB row-block chunking, zero-norm
#: guard, empty-input early return) plus the work-proportional
#: corpus fan-out (similarity.py::_fan_out_corpus — plan-inert at
#: harness corpus sizes, parts=1) touch embedding_near_dup_pairs'
#: exact leg again — mechanics-only, bitwise-pinned by
#: test_allpairs_threshold_arrow_bitwise_equals_crossjoin_path plus
#: the chunking value-neutrality and fan-out property pins; same
#: clause-(a) ruling, same ≤ r12 re-attestation deadline.
#: knn_label_agreement and dbscan_embedding_clusters share the
#: changed code but have never been attested, so their first driver
#: rows (r11) attest the new code on schedule. The round's OTHER
#: perf changes touch only never-attested queries
#: (lsh_recall_audit/minhash presigned path — inline path plan
#: unchanged; semdedup_prune_report Arrow pair leg;
#: multimodal_scene_changes / multimodal_container_sniff fan-out),
#: so no further clause-(a) entries accrue.
#: Round 10 addendum: the ADVICE-r9 closures touch two queries —
#: lsh_recall_audit (minhash_sign now checkpoints the shingle frame
#: before the signature aggregate and stamps sign parameters;
#: presigned banding validates the stamp) and semdedup_prune_report
#: (_semdedup_pairs_arrow filters NULL labels to match the JVM
#: twin's equi-join semantics — no-op on the registered corpus,
#: whose labels are non-null). BOTH are in THIS round's promoted
#: window block with no prior driver row, so their first rows attest
#: the new code on schedule; REWINDOWED stays empty. The four
#: standing clause-(a) entries (timeseries_gapfill_hourly,
#: timeseries_anomaly_hours, approx_count_distinct,
#: embedding_near_dup_pairs) re-attest at their scheduled window
#: return (≤ r12); no window slack existed this round (27 slots, 27
#: promoted nevers).
#: Round 11 addendum: the pre-measured fan-out fix SHIPPED for the
#: expensive-codec trio (multimodal_jpeg_decode,
#: multimodal_mjpeg_frames, multimodal_gif_decode — 7.1→1.6 /
#: 6.4→1.3 / 3.0→1.1 s at sf0.1; rows bit-identical across
#: geometries, oracles tri-SF green, partition-width pytest pin).
#: They join the clause-(a) queue and re-window at r12 alongside the
#: four standing entries — r12's 27 slots are exactly booked: 4 r3
#: remainder (q18_large_volume_orders, q14_promo_revenue_ratio,
#: correlated_min_subquery, doc_repetition_ratio) + 16 r4 rows + 7
#: clause-(a). REWINDOWED itself stays empty: none of the seven holds
#: a current-round row, so the r11 gate needs no exemption; r12's
#: rotation promotes them ahead of oldest-first per clause (a).
#: Late-r11 addendum: the same-file re-scan census also rewrote
#: item_similarity_topk (explode symmetrization; r10 row, demoted
#: this round). r12 cannot absorb an eighth clause-(a) entry without
#: displacing an age-forced row, so it re-windows at r13 — taking
#: r13's one remaining free slot (23 r5 rows + 3 DV newcomers + this
#: = 27, see SURVEY §16). Interim risk is bounded: it was ADDED to
#: bench.py's unflagged entrants this round (front-running its r13
#: re-entry, the knn/dbscan/unigram precedent — it was NOT previously
#: benched; the review pass caught the stale "(bench row)" tail
#: annotations claiming otherwise), its oracle is tri-SF green on the
#: new code, and the union-form twin pytest runs every round's gate.
#: dedup_exact_docs
#: and the two timeseries queries changed this round too but need NO
#: queue entry: dedup_exact_docs is bench=True (permanently in the
#: window — this round's driver row attests it) and the timeseries
#: pair was already in the standing clause-(a) seven.
#: Round 12 addendum: the rotation CONSUMED the clause-(a) queue — all
#: seven standing entries (timeseries_gapfill_hourly,
#: timeseries_anomaly_hours, approx_count_distinct,
#: embedding_near_dup_pairs, multimodal_jpeg_decode,
#: multimodal_mjpeg_frames, multimodal_gif_decode) are IN the r12
#: window per SURVEY §16's booked block, so their driver rows this
#: round attest the rewritten code paths. The ONLY outstanding
#: clause-(a) entry is item_similarity_topk (r13, taking r13's one
#: free slot alongside the 3-query DV block — queries_dv.py is the
#: rehearsed, unregistered block). The r12 gapfill change (null-valued
#: hours filtered as gaps, ADVICE r11) lands BEFORE
#: timeseries_gapfill_hourly's scheduled window row, so its fresh r12
#: attestation covers the final shape; REWINDOWED stays empty.
#: Round 13 addendum: the clause-(a) queue is now EMPTY —
#: item_similarity_topk (the last entry) is promoted into this round's
#: window per the §16 slot arithmetic; its r10 row predates r13, so
#: the gate needs no exemption and REWINDOWED stays empty. The three
#: deletion-vector registrations are newcomers windowed immediately
#: (never-attested, exempt by construction). The registry is 232 and
#: frozen for good; steady state is pure oldest-first rotation.
#: Round 14 addendum: the broadcast-hint census closure (VERDICT r13
#: item 2 + ADVICE r13 medium) dropped every data-proportional
#: F.broadcast hint repo-wide — 16 registered queries touched
#: (dbscan_embedding_clusters, knn_label_agreement via
#: knn_agreement_from_candidates, item_similarity_topk,
#: bloom_prefilter_semi, pareto_revenue_coverage, and 11 TPC-H
#: shapes: q7/q8/q9/q14/q15/q16/q17/q19/q20/q21/q2). PLAN-ONLY in
#: every case (a hint never changes values; auto-broadcast keeps the
#: identical physical plan at harness SF — test_plans.py 25/25
#: unchanged), value identity re-verified against the DuckDB oracles
#: at sf0.001/0.01/0.1 for all 16. The r8 clause-(a) boundary ruling
#: applies verbatim: no re-window needed; each re-attests at its
#: scheduled window return. tests/test_broadcast_census.py now pins
#: the full adjudicated hint allowlist. REWINDOWED stays empty; the
#: r14 window is the age-forced 27-block per freshness_report --plan.
REWINDOWED: set[str] = set()


def _reorder_registry() -> None:
    missing = [n for n in _DEMOTED_TAIL if n not in QUERIES]
    if missing:
        raise AssertionError(f"demoted-but-unregistered queries: {missing}")
    benched_tail = [n for n in _DEMOTED_TAIL if QUERIES[n].bench]
    if benched_tail:
        raise AssertionError(f"bench queries may not be demoted: {benched_tail}")
    tail = set(_DEMOTED_TAIL)
    head = [n for n in QUERIES if n not in tail]
    if len(head) > _CHECK_WINDOW:
        raise AssertionError(
            f"{len(head)} queries in the checked window (max {_CHECK_WINDOW}) — "
            "demote a near-duplicate shape to _DEMOTED_TAIL"
        )
    ordered = {n: QUERIES[n] for n in head + _DEMOTED_TAIL}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_registry()
