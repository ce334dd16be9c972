"""Composite analytics queries (TPC-H Q3/Q5/Q10 shapes over the fixture
star schema) — multi-join + aggregate workloads where Catalyst's join
ordering, broadcast selection, and partial aggregation all compose in one
plan. The single-operator queries prove parts; these prove the whole.

Plan expectations at scale: region/nation broadcast everywhere; the
customer⋈orders⋈lineitem chain shuffles on the join keys with partial
aggregation above; date filters push to the Parquet scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "tpch_q3_shipping_priority",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
              o.o_orderdate, o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < DATE '1998-03-15'
         AND l.l_shipdate > DATE '1998-03-15'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, o_orderdate, l_orderkey
       LIMIT 10""",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: unshipped-order revenue by priority — segment-filtered customer
    dim joins the orders→lineitem fact chain; top-10 under a total order."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@q(
    "tpch_q5_local_supplier_volume",
    """SELECT n.n_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
       FROM customer c
       JOIN orders o   ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n   ON s.s_nationkey = n.n_nationkey
       JOIN region r   ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= DATE '1997-01-01'
         AND o.o_orderdate < DATE '1998-01-01'
       GROUP BY n.n_name""",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: revenue where customer and supplier share a nation, per nation —
    the six-table join; region/nation/supplier broadcast against the
    customer⋈orders⋈lineitem chain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
    )


@q(
    "tpch_q10_returned_items",
    """SELECT c.c_custkey, c.c_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
              n.n_name
       FROM customer c
       JOIN orders o   ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n   ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderdate >= DATE '1997-10-01'
         AND o.o_orderdate < DATE '1998-01-01'
         AND l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c_custkey
       LIMIT 20""",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: customers who returned items, ranked by lost revenue — fact
    chain + broadcast nation, top-20 under a total order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@q(
    "tpch_q6_forecast_revenue",
    """SELECT CAST(sum((l_extendedprice * l_discount)::DECIMAL(18,6)) AS VARCHAR)
                AS revenue,
              count(*) AS n
       FROM lineitem
       WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: forecast-revenue-change — the pure scan benchmark. Every
    predicate is sargable (all three push to the parquet reader), the agg
    is one global partial+final pair, and the per-row product is cast to
    DECIMAL(18,6) before summing so the single-row total is exact in any
    partition order on both engines. The exact total is emitted as its
    canonical STRING (decimals degrade to float64 in pandas bridges)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(rev).cast("string").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@q(
    "tpch_q14_promo_effect",
    """SELECT round(
                100.0
                * sum(CASE WHEN p_type LIKE 'PROMO%'
                           THEN (l_extendedprice * (1 - l_discount))::DECIMAL(18,6)
                           ELSE 0::DECIMAL(18,6) END)::DOUBLE
                / sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE,
              6) AS promo_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — month-filtered fact joins the broadcast
    part dim; conditional aggregation in one pass. Both sums are exact
    decimals; the single final division happens in identical IEEE double
    on both engines, so round-6 is stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    promo = F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(zero))
    total = F.sum(rev)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / total.cast("double"), 6
            ).alias("promo_pct")
        )
    )


@q(
    "tpch_q18_large_orders",
    """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
              CAST(sum(l.l_quantity::DECIMAL(18,6)) AS VARCHAR) AS total_qty
       FROM customer c
       JOIN orders o   ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
       HAVING sum(l.l_quantity::DECIMAL(18,6)) > 300
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 20""",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders — full customer⋈orders⋈lineitem chain,
    grouped on the order grain with a HAVING threshold over an exact
    decimal quantity sum, then a total-order top-20. The group-by keys
    ride through unaggregated, so only the decimal sum needs cross-engine
    care."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,6)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).alias("_total_qty"))
        .filter(F.col("_total_qty") > 300)
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
        .withColumn("total_qty", F.col("_total_qty").cast("string"))
        .drop("_total_qty")
    )


@q(
    "tpch_q4_late_orders",
    """SELECT o.o_orderpriority, count(*) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= DATE '1997-01-01'
         AND o.o_orderdate <  DATE '1997-07-01'
         AND EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
         )
       GROUP BY o.o_orderpriority""",
)
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order-priority checking, adapted to the fixture schema —
    no commit/receipt dates, so 'late' = any line shipped >60 days after
    the order date): EXISTS decorrelates to a LEFT SEMI join with a mixed
    equi + range predicate, so lineitem contributes at most one match per
    order and never inflates the count. At scale the semi join shuffles
    both sides on orderkey once; the date filter pushes to the orders
    scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@q(
    "tpch_q19_disjunctive_revenue",
    """SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 1 AND 30)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
              AND l.l_quantity BETWEEN 10 AND 40)
          OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50
              AND l.l_quantity BETWEEN 20 AND 50)""",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted-revenue, fixture columns): three OR'd
    brand/size/quantity branches across the part⋈lineitem join. Catalyst
    extracts the common p_partkey equi-key so this plans as a broadcast
    hash join with the disjunction as a post-join filter — never a
    nested-loop — and pushes the brand/size union predicate down to the
    part scan. The classic test that OR-predicates don't break join
    planning."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, p.p_partkey == li.l_partkey)
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 30))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(16, 30)
           & F.col("l_quantity").between(10, 40))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(31, 50)
           & F.col("l_quantity").between(20, 50))
    )
    return joined.filter(branch).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "revenue"
        )
    )
