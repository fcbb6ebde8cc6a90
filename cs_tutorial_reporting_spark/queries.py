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
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
