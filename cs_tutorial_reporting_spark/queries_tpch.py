"""Adapted TPC-H analytic shapes (Q4, Q7-Q22 except the pure-partsupp
Q2-as-written, plus a Q2-style correlated-min; 17 shapes total) over
the driver's star schema.

The generated tables lack ``partsupp``, ``l_shipmode``,
``l_commitdate``/``l_receiptdate`` and ``c_phone``, so each classic
query keeps its PLAN shape — the join graph, subquery structure, and
aggregate pattern Catalyst must optimize — with predicates re-expressed
over existing columns (noted per query). The point of this module is
breadth of *optimizer surface*: multi-way joins with broadcastable
dims, disjunctive pushdown, correlated scalar/EXISTS subqueries,
HAVING over grouped facts, and deterministic top-k — each shape a user
of the reference's warehouse tables would run downstream.

Float discipline (module contract, queries.py:9): every floating-point
aggregate is rounded on BOTH sides; ratios divide ALREADY-ROUNDED sums
(identical doubles in either engine) and re-round via the portable
``floor(x * 10^k + 0.5) / 10^k`` sequence. ``l_quantity`` is integral
doubles, so quantity sums are exact and comparable pre-round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register, t

_REV_SQL = "l_extendedprice * (1 - l_discount)"


def _rev():
    # built lazily — Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q7_nation_pair_revenue",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           round(sum(l.{_REV_SQL}), 2) AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey   = l.l_orderkey
    JOIN customer c  ON c.c_custkey    = o.o_custkey
    JOIN supplier s  ON s.s_suppkey    = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation shipping volume by year. The two
    nation dims are filtered to the pair BEFORE touching the facts, so
    supplier/customer shrink through the hinted 2-row nation joins and
    the disjunctive pair predicate runs on two short string columns —
    the fact table never carries rows outside the two nations. The
    nation-filtered supplier/customer sides join hint-free: they are
    SF-proportional, so stats/AQE broadcast them only while actually
    small. At 100 TB the only big shuffle is lineitem⋈orders on
    orderkey."""
    pair = ("NATION_1", "NATION_2")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@register(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END), 2) AS nation_volume,
           round(sum(volume), 2) AS total_volume,
           floor(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                ELSE 0 END), 2)
                 / round(sum(volume), 2) * 10000 + 0.5) / 10000 AS mkt_share
    FROM (
        SELECT CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
               {_REV_SQL} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey   = l.l_orderkey
        JOIN customer c  ON c.c_custkey    = o.o_custkey
        JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
        JOIN region r    ON r.r_regionkey  = cn.n_regionkey
        JOIN supplier s  ON s.s_suppkey    = l.l_suppkey
        JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE'
    )
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's market
    per year. The market side prunes customers to one region through
    two broadcast dims; the share divides two already-rounded sums
    (identical doubles cross-engine) and re-rounds with the portable
    floor sequence. Conditional aggregation — not a second scan — keeps
    it one pass over the joined facts."""
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    sup = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    vol = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("l_shipdate").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    agg = vol.groupBy("o_year").agg(
        F.round(F.sum(target), 2).alias("nation_volume"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
    )
    share = F.floor(
        F.col("nation_volume") / F.col("total_volume") * 10000 + F.lit(0.5)
    ) / 10000
    return agg.select(
        "o_year", "nation_volume", "total_volume", share.alias("mkt_share")
    )


@register(
    "q10_returned_item_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.{_REV_SQL}), 2) AS revenue,
           round(max(c.c_acctbal), 2) AS acctbal
    FROM customer c
    JOIN orders o   ON o.o_custkey    = c.c_custkey
    JOIN lineitem l ON l.l_orderkey   = o.o_orderkey
    JOIN nation n   ON n.n_nationkey  = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.
    The returnflag filter is pushed to the lineitem scan; the agg
    shuffles on custkey; ordering is on the ROUNDED revenue with a
    custkey tiebreak so the limit boundary is deterministic in both
    engines. Global top-k = TakeOrderedAndProject, no full sort."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT promo_revenue, total_revenue,
           floor(promo_revenue / total_revenue * 10000 + 0.5) / 10000
               AS promo_share
    FROM (
        SELECT round(sum(CASE WHEN p.p_type = 'PROMO' THEN l.{_REV_SQL}
                              ELSE 0 END), 2) AS promo_revenue,
               round(sum(l.{_REV_SQL}), 2) AS total_revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share over a one-year window
    (p_type = 'PROMO' stands in for the reference schema's
    ``PROMO%%`` prefix class). Part is broadcast; the year range is
    pushed to the scan; one conditional aggregate — the ratio divides
    the two rounded sums."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    agg = joined.agg(
        F.round(F.sum(promo), 2).alias("promo_revenue"),
        F.round(F.sum(_rev()), 2).alias("total_revenue"),
    )
    share = F.floor(
        F.col("promo_revenue") / F.col("total_revenue") * 10000 + F.lit(0.5)
    ) / 10000
    return agg.select(
        "promo_revenue", "total_revenue", share.alias("promo_share")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           round(o.o_totalprice, 2) AS totalprice,
           round(big.sum_qty, 2) AS sum_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 200
    ) big
    JOIN orders o   ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed very large orders. The
    HAVING runs on the grouped fact BEFORE any dimension join, so only
    qualifying orderkeys (a tiny set) reach the orders/customer joins —
    the right order at 100 TB. ``l_quantity`` is integral doubles, so
    the >200 threshold compares exact sums in both engines."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sum_qty"))
        .filter(F.col("__sum_qty") > 200)
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("__sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT count(*) AS n_lines,
           round(sum(l.{_REV_SQL}), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-way disjunction mixing build-side (brand,
    size) and probe-side (quantity) predicates. Catalyst extracts the
    common ``p_brand IN (...)`` / quantity-range conjuncts and pushes
    them below the broadcast join, so the fact scan skips rows no
    disjunct can accept — the shape exists to verify predicate
    extraction keeps working over a broadcast hash join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#3") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#12") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#21") & size.between(1, 15) & qty.between(20, 30))
    )
    return joined.filter(cond).agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(_rev()), 2).alias("revenue"),
    )


@register(
    "q21_sole_supplier_orders",
    oracle="""
    SELECT n.n_name AS supp_nation, count(*) AS n_orders
    FROM (
        SELECT l_orderkey, min(l_suppkey) AS the_supp
        FROM lineitem GROUP BY l_orderkey
        HAVING count(*) >= 2 AND count(DISTINCT l_suppkey) = 1
    ) solo
    JOIN orders o   ON o.o_orderkey = solo.l_orderkey
                   AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey   = solo.the_supp
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY supp_nation
    """,
)
def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-supplier variant — the classic needs
    l_receiptdate): finished multi-line orders served entirely by ONE
    supplier, counted by that supplier's nation. Q21's correlated
    EXISTS/NOT-EXISTS pair collapses to a single grouped pass over
    lineitem (count lines, count distinct suppliers) — one shuffle on
    orderkey instead of two self-joins, the formulation that survives
    100 TB."""
    li = t(spark, sf_dir, "lineitem")
    solo = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("the_supp"),
            F.count("*").alias("__n_lines"),
            F.countDistinct("l_suppkey").alias("__n_supp"),
        )
        .filter((F.col("__n_lines") >= 2) & (F.col("__n_supp") == 1))
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation")
    return (
        solo.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(s, F.col("the_supp") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("supp_nation"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "q22_dormant_balances",
    oracle="""
    SELECT CAST(c.c_custkey % 10 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT round(avg(c_acctbal), 2) FROM customer
            WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
          )
    GROUP BY cntrycode
    """,
)
def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no c_phone: country code is custkey mod 10;
    'no orders in 7 years' becomes 'no urgent orders'): well-funded
    customers the urgent-order pipeline never reached. Scalar-subquery
    threshold stays in the plan as a 1-row broadcast; the threshold is
    ROUNDED before comparing so both engines cut on the identical
    double (a raw avg differs in final ULPs across partial-agg
    orders). NOT EXISTS is a broadcast anti-join on the filtered
    orders side."""
    c = t(spark, sf_dir, "customer")
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("__thresh"))
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("__thresh"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy((F.col("c_custkey") % 10).cast("bigint").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "correlated_min_subquery",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_cheapest,
           round(min(p.p_retailprice), 2) AS min_price
    FROM part p
    WHERE p.p_retailprice = (
            SELECT min(p2.p_retailprice) FROM part p2
            WHERE p2.p_brand = p.p_brand
          )
    GROUP BY p_brand
    """,
)
def correlated_min_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: retail price stands in for supply
    cost): rows matching their group's correlated minimum. The
    correlated scalar subquery de-correlates to a grouped-min dim
    (one row per brand) broadcast back onto the scan — no window sort,
    no per-row subquery. Equality compares stored doubles (a pure
    selection, no arithmetic), so it is exact in both engines."""
    p = t(spark, sf_dir, "part")
    brand_min = p.groupBy("p_brand").agg(
        F.min("p_retailprice").alias("__min_price")
    )
    return (
        p.join(F.broadcast(brand_min), "p_brand")
        .filter(F.col("p_retailprice") == F.col("__min_price"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_cheapest"),
            F.round(F.min("p_retailprice"), 2).alias("min_price"),
        )
    )


@register(
    "q4_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 10 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (no l_commitdate/l_receiptdate in this schema:
    "late" = shipped >10 days after order date): per-priority count of
    a year's orders having at least one late line. The EXISTS becomes a
    LEFT SEMI join whose condition spans both sides — one orderkey
    shuffle; the date window prunes orders at the scan."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 10 days")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT sn.n_name AS nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
               {_REV_SQL} - p.p_retailprice * l.l_quantity / 10 AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey    = l.l_partkey
        JOIN supplier s ON s.s_suppkey    = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE p.p_type IN ('ECONOMY', 'SMALL')
    )
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp: supply cost stands in as
    p_retailprice×qty/10): profit per supplier nation per year over a
    part-type slice. The classic 5-way graph — facts join two
    broadcastable dims (filtered part, supplier→nation) before the
    single grouped aggregate; no orderkey shuffle is needed at all
    since o_year comes from l_shipdate."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_type").isin("ECONOMY", "SMALL")
    ).select("p_partkey", "p_retailprice")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    li = t(spark, sf_dir, "lineitem")
    joined = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount = _rev() - F.col("p_retailprice") * F.col("l_quantity") / 10
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus stands in for the absent
    l_shipmode): per-status counts of high- vs low-priority orders
    among a year's late-shipped lines. Conditional-sum pivot over one
    orderkey join; the ship-date window pushes to the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer order-count histogram, with the
    join-level filter (priority, standing in for the comment LIKE)
    applied INSIDE the outer join so zero-order customers survive as
    c_count=0. Two aggregations; the second groups a tiny histogram."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem stands in for the absent partsupp as
    the part↔supplier relation; negative balance stands in for the
    complaints LIKE): distinct suppliers per surviving (brand, type,
    size). The oracle's NOT IN is implemented as a broadcast anti-join;
    the two differ on NULL probe keys (NOT IN filters a NULL l_suppkey,
    left_anti keeps it), so NULL probes are filtered explicitly first —
    making the operators equivalent regardless of data, not just on the
    non-null generated keys. Distinct-agg is the one shuffle."""
    excluded = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        # NOT-IN semantics: a NULL probe key never passes the subquery
        .filter(F.col("l_suppkey").isNotNull())
    )
    kept = li.join(
        excluded,
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    return kept.groupBy(
        "p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size")
    ).agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) cut ON cut.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#17' AND l.l_quantity < cut.qty_cut
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand — the correlated per-part avg subquery de-correlated into a
    grouped aggregate joined back on partkey (Catalyst's own rewrite,
    stated explicitly). l_quantity is integral doubles, so the 0.2×avg
    threshold is the same double in both engines."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#17").select(
        "p_partkey"
    )
    cut = li.groupBy(F.col("l_partkey").alias("cut_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    small = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(cut, F.col("l_partkey") == F.col("cut_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@register(
    "q11_important_parts",
    oracle=f"""
    SELECT l_partkey, round(sum({_REV_SQL}), 2) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING round(sum({_REV_SQL}), 2) > (
        SELECT round(sum({_REV_SQL}), 2) * 0.002 FROM lineitem
    )
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem revenue stands in for the absent
    partsupp stock value): parts whose revenue exceeds a fixed fraction
    of the GLOBAL total — a grouped aggregate filtered against a scalar
    aggregate of the same table. The scalar side is a 1-row broadcast
    (no driver collect); both sums round before the comparison so the
    threshold is the same double in both engines."""
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum(_rev()), 2).alias("part_value")
    )
    total = li.agg((F.round(F.sum(_rev()), 2) * 0.002).alias("__cut"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__cut"))
        .select("l_partkey", "part_value")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum({_REV_SQL}), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier(s) — a
    grouped revenue view consumed twice (per-supplier rows and its own
    max) then equality-joined back to the dim. The view is
    localCheckpoint-free: Catalyst re-uses the exchange; the max is a
    1-row broadcast. Revenue rounds before the max/equality so the
    comparison is exact cross-engine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("__top"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__top"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_promo_part_suppliers",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_type = 'PROMO'
        )
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 400
    )
    AND s.s_acctbal > 0
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (lineitem stands in for partsupp availability):
    suppliers who moved >400 units of PROMO-type parts — a nested IN
    chain (supplier ← grouped-HAVING lineitem ← part filter) that
    Catalyst executes as two semi joins; the part filter broadcasts
    into the fact scan before any shuffle."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    heavy = (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 400)
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    return s.join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c
        FROM lineitem GROUP BY 1, 2
    ),
    eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT p.p_partkey, e.s_name, e.s_acctbal, e.n_name, c.cost_c,
               row_number() OVER (
                   PARTITION BY p.p_partkey
                   ORDER BY c.cost_c, e.s_name
               ) AS rn
        FROM part p
        JOIN cost c ON c.partkey = p.p_partkey
        JOIN eur e ON e.s_suppkey = c.suppkey
        WHERE p.p_size < 10
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, CAST(cost_c AS BIGINT) AS cost_c
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, ADAPTED: the harness star schema carries no
    partsupp table, so the part-supplier cost relation is DERIVED from
    observed lineitems (min extendedprice in integer cents per
    (part, supplier) — deterministic, no float ties) and the
    correlated min-cost-supplier subquery becomes a per-part top-1
    window (cost, name tiebreak) over the EUROPE-filtered supplier
    dim. Same plan skeleton as real Q2: small dims broadcast
    (region→nation→supplier reduce before touching the fact-derived
    cost), one fact-sized (part, supp) aggregation, one per-part
    window, global top-10.
    """
    li = t(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "cost_c"
        )
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 10).select("p_partkey")
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey").orderBy("cost_c", "s_name")
    ranked = (
        cost.join(eur, F.col("suppkey") == F.col("s_suppkey"))
        .join(p, F.col("partkey") == F.col("p_partkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        ranked.select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost_c").cast("bigint").alias("cost_c"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(10)
    )
