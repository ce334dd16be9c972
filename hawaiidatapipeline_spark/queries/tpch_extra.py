"""TPC-H shapes Q7–Q22 adapted to the fixture star schema.

The fixture omits ``partsupp``, commit/receipt dates, comments and
phones, so the classic queries that depend on them (Q2/Q9/Q11/Q13/Q16/
Q20/Q21/Q22) are re-stated over the columns that exist while keeping
the *plan shape* the benchmark exercises — two-sided dimension aliasing
(Q7/Q8), scalar-subquery thresholds (Q11/Q17/Q22), left-outer + double
aggregation (Q13), window-max supplier ranking (Q15), distinct-count
de-duplication (Q16), multi-EXISTS semi/anti chains (Q21), and
anti-join dormancy (Q22).

Scale notes: every nation/region/part-filtered dimension broadcasts;
the orders⋈lineitem chain shuffles once on orderkey; scalar-subquery
thresholds compute as one-row aggregates cross-joined (broadcast) back
against the fact side, never as correlated per-row re-scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "tpch_q7_volume_shipping",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l.l_shipdate) AS l_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
       FROM supplier s
       JOIN lineitem l ON s.s_suppkey = l.l_suppkey
       JOIN orders o   ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
       JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
       WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         AND l.l_shipdate >= DATE '1996-01-01'
         AND l.l_shipdate <  DATE '1998-01-01'
       GROUP BY supp_nation, cust_nation, l_year
       ORDER BY supp_nation, cust_nation, l_year""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: bilateral trade volume between two nations by ship year. The
    nation dimension joins TWICE under different roles (supplier side vs
    customer side) — the aliasing test. Both nation joins broadcast; the
    OR over the nation pair stays a post-join filter on two broadcast
    lookups, and the fact chain shuffles once on orderkey."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "tpch_q8_market_share",
    """SELECT o_year,
              round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                    / sum(volume), 6) AS mkt_share
       FROM (SELECT year(o.o_orderdate) AS o_year,
                    l.l_extendedprice * (1 - l.l_discount) AS volume,
                    n2.n_name AS nation
             FROM part p
             JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN orders o   ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
             JOIN region r   ON n1.n_regionkey = r.r_regionkey
             JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
             WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY') t
       GROUP BY o_year
       ORDER BY o_year""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's share of ECONOMY-part revenue sold into AMERICA,
    per order year. Eight-table join where every dimension (part filtered
    to one type, supplier, both nation roles, region) broadcasts against
    the orders⋈lineitem spine; the share is a conditional-sum / sum ratio
    computed in ONE aggregation pass, not two plans joined."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "tpch_q9_product_profit",
    """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
              round(sum(l.l_extendedprice * (1 - l.l_discount)
                        - 0.1 * p.p_retailprice * l.l_quantity), 6) AS sum_profit
       FROM part p
       JOIN lineitem l ON p.p_partkey = l.l_partkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN orders o   ON o.o_orderkey = l.l_orderkey
       JOIN nation n   ON s.s_nationkey = n.n_nationkey
       WHERE p.p_name LIKE '%bolt%'
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-line profit; fixture has no partsupp, so the
    unit cost proxies as 10% of p_retailprice): profit per supplier
    nation per order year over name-matched parts. The LIKE filter prunes
    part before its broadcast; profit is a single fused arithmetic
    expression inside the partial aggregate — no second pass."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 6).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@q(
    "tpch_q13_order_count_distribution",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
             FROM customer c
             LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                               AND o.o_orderpriority <> '1-URGENT'
             GROUP BY c.c_custkey) t
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count histogram; the fixture has no
    o_comment, so the exclusion predicate is on o_orderpriority): LEFT
    OUTER join keeps zero-order customers, with the filter INSIDE the
    join condition (filtering before/after the join would drop them or
    count wrong). Two stacked aggregations: per-customer count, then the
    count-of-counts — each a narrow one-column shuffle."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@q(
    "tpch_q15_top_supplier",
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s.s_suppkey""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue. The classic
    view-plus-scalar-subquery plans here as one revenue aggregate reused
    by a rank-1 window over an EMPTY frame partition — Spark evaluates
    the max alongside the aggregate in the same shuffle instead of
    re-scanning lineitem for the subquery (the two-pass trap)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "total_revenue"
        )
    )
    # rank over a global window: tiny (|suppliers| rows post-agg), single
    # partition is safe and avoids a second lineitem scan
    w = Window.orderBy(F.col("total_revenue").desc())
    top = (
        revenue.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "tpch_q16_supplier_part_variety",
    """SELECT p.p_brand, p.p_type, p.p_size,
              count(DISTINCT l.l_suppkey) AS supplier_cnt
       FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
       WHERE p.p_brand <> 'Brand#5'
         AND p.p_type <> 'PROMO'
         AND p.p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)
def tpch_q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (supplier variety per brand/type/size; partsupp absent,
    so supplier-part pairs come from shipped lineitems): negated and IN
    predicates prune the broadcast part side; COUNT(DISTINCT) expands to
    the two-phase distinct aggregate — dedupe on (group, suppkey) then
    count — both phases partial-aggregated map-side."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@q(
    "tpch_q17_small_quantity_revenue",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 6) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
             FROM lineitem GROUP BY l_partkey) t
         ON t.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#13' AND l.l_quantity < t.qty_limit""",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue lost if small-quantity orders went unfilled. The
    correlated AVG subquery decorrelates into a per-part aggregate joined
    back to lineitem — at scale that aggregate is small (|parts| rows)
    and broadcasts, so lineitem is scanned twice but shuffled never."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    limits = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(limits), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 6).alias("avg_yearly"))
    )


@q(
    "tpch_q20_part_promotion_suppliers",
    """SELECT s.s_name, n.n_name AS nation
       FROM supplier s
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE s.s_suppkey IN (
           SELECT l_suppkey FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           WHERE p.p_name LIKE 'red%'
             AND l.l_shipdate >= DATE '1997-01-01'
             AND l.l_shipdate <  DATE '1998-01-01'
           GROUP BY l_suppkey
           HAVING sum(l_quantity) > 100)
       ORDER BY s_name""",
)
def tpch_q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (suppliers with excess stock of promoted parts; partsupp
    absent, so 'stock' = shipped quantity over the year): the IN-subquery
    plans as aggregate → HAVING → LEFT SEMI join. The qualifying-supplier
    set is tiny after HAVING, so the semi join broadcasts it against the
    supplier dim rather than shuffling."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qual = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(qual), s.s_suppkey == qual.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@q(
    "tpch_q21_late_supplier_blame",
    """WITH late AS (
         SELECT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
       multi AS (
         SELECT l_orderkey FROM lineitem
         GROUP BY l_orderkey HAVING count(DISTINCT l_suppkey) > 1)
       SELECT s.s_name, count(DISTINCT late.l_orderkey) AS numwait
       FROM late
       JOIN multi ON late.l_orderkey = multi.l_orderkey
       JOIN supplier s ON late.l_suppkey = s.s_suppkey
       WHERE NOT EXISTS (
           SELECT 1 FROM late l2
           WHERE l2.l_orderkey = late.l_orderkey
             AND l2.l_suppkey <> late.l_suppkey)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s_name
       LIMIT 20""",
)
def tpch_q21_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers solely to blame for a late multi-supplier
    order; no commit/receipt dates in the fixture, so 'late' = shipped
    >60 days after the order date, as in q4): the EXISTS/NOT-EXISTS pair
    becomes a semi join (order had >1 distinct supplier) plus an anti
    join (no OTHER supplier was late on that order). All three legs key
    on l_orderkey, so AQE coalesces them into one shuffle exchange
    reused across the chain."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("nsupp"))
        .filter(F.col("nsupp") > 1)
        .select("l_orderkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    blamed = (
        late.join(multi, "l_orderkey", "left_semi")
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@q(
    "tpch_q22_dormant_customers",
    """SELECT t.cohort, count(*) AS numcust,
              round(sum(t.c_acctbal), 6) AS totacctbal
       FROM (SELECT c.c_nationkey % 5 AS cohort, c.c_acctbal
             FROM customer c
             WHERE c.c_nationkey % 5 IN (0, 1, 3)
               AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                                  WHERE c_acctbal > 0
                                    AND c_nationkey % 5 IN (0, 1, 3))
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderdate >= DATE '2000-01-01')) t
       GROUP BY t.cohort
       ORDER BY t.cohort""",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (well-funded customers who never ordered; the fixture
    has no c_phone, so the country-code cohort is nationkey mod 5, and
    'dormant' = no order since 2000 rather than none ever — the fixture
    gives every customer early orders): the scalar AVG subquery computes
    once and joins as a broadcast single-row cross; NOT EXISTS is a LEFT
    ANTI join against date-filtered orders on custkey. At scale the anti
    join shuffles on custkey and the orders side prunes to the join
    column + pushed date filter at the scan."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cohort", F.col("c_nationkey") % 5
    )
    cohorts = c.filter(F.col("cohort").isin(0, 1, 3))
    avg_bal = cohorts.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        cohorts.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, cohorts.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 6).alias("totacctbal"),
        )
        .orderBy("cohort")
    )


@q(
    "tpch_q2_min_cost_supplier",
    """WITH sp AS (
         SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey
         FROM lineitem l),
       ranked AS (
         SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
                n.n_name AS nation,
                row_number() OVER (PARTITION BY p.p_partkey
                                   ORDER BY s.s_acctbal, s.s_suppkey) AS rk
         FROM part p
         JOIN sp ON sp.partkey = p.p_partkey
         JOIN supplier s ON s.s_suppkey = sp.suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         WHERE p.p_size <= 10 AND p.p_type = 'LARGE')
       SELECT p_partkey, p_name, s_suppkey, s_name,
              round(s_acctbal, 2) AS s_acctbal, nation
       FROM ranked WHERE rk = 1
       ORDER BY s_acctbal DESC, p_partkey
       LIMIT 20""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier per part; no partsupp in the
    fixture, so supplier-part pairs derive from shipped lineitems and
    s_acctbal proxies the supply cost): the correlated min-subquery is
    the classic decorrelation target — here stated directly as a rank-1
    window over the pairs, which is both the Catalyst rewrite and the
    scale-safe plan (one shuffle on partkey; the filtered part dim
    broadcasts)."""
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        sp.join(F.broadcast(p), sp.partkey == p.p_partkey)
        .join(F.broadcast(s), sp.suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            F.col("n_name").alias("nation"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"), "nation",
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(20)
    )


@q(
    "tpch_q11_important_stock",
    """WITH nation_stock AS (
         SELECT l.l_partkey,
                sum((l.l_quantity * p.p_retailprice)::DECIMAL(28,4)) AS value
         FROM lineitem l
         JOIN part p ON p.p_partkey = l.l_partkey
         JOIN supplier s ON s.s_suppkey = l.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE n.n_name = 'NATION_3'
         GROUP BY l.l_partkey)
       SELECT l_partkey, round(value, 2)::DOUBLE AS stock_value
       FROM nation_stock
       WHERE value > (SELECT sum(value) * 0.001 FROM nation_stock)
       ORDER BY stock_value DESC, l_partkey""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock; partsupp's availqty·supplycost proxies
    as shipped quantity · retail price for one nation's suppliers): the
    scalar-subquery threshold (0.1% of the nation total) computes as a
    single-row aggregate over the SAME grouped result, broadcast back as
    a cross join — Spark evaluates the CTE once for both consumers at
    fixture scale and the exact-decimal sums keep both engines identical."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    stock = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(28,4)")
            ).alias("value")
        )
    )
    # two consumers: the rows and the global threshold
    stock = materialize(stock)
    threshold = stock.agg((F.sum("value") * F.lit(0.001)).alias("thr"))
    return (
        stock.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select(
            "l_partkey", F.round("value", 2).cast("double").alias("stock_value")
        )
        .orderBy(F.col("stock_value").desc(), "l_partkey")
    )


@q(
    "tpch_q12_late_lines_by_priority",
    """SELECT year(l.l_shipdate) AS ship_year,
              sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
              sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS low_line_count
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
       GROUP BY ship_year
       ORDER BY ship_year""",
)
def tpch_q12_late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-delay audit; the fixture has no ship mode or
    commit/receipt dates, so 'late' = shipped >90 days after the order
    date and the two ship modes become ship years): the priority CASE
    split rides the same conditional-aggregation shape as the original —
    one orderkey join, the range predicate applied post-join, and a tiny
    grouped output."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )
