"""Modern SQL surface — Spark-4 conveniences and safety functions.

GROUP BY ALL, star-EXCEPT projection, the ANSI-mode ``try_*`` escape
hatches, an explicit SHUFFLE_HASH join-strategy hint, and the hidden
``_metadata`` file-lineage column. Small operators individually, but
they are the surface a SQL-first user touches daily; each has an exact
DuckDB twin (EXCLUDE, GROUP BY ALL, NULL-on-error division/cast/index,
``read_parquet(filename=true)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "sql_group_by_all",
    """SELECT o_orderpriority, year(o_orderdate) AS yr,
              count(*) AS n, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY ALL
       ORDER BY o_orderpriority, yr""",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — every non-aggregate select item becomes a grouping
    key (the anti-boilerplate form both Spark 4 and DuckDB standardize).
    Resolution happens in the analyzer; the physical plan is the
    identical two-phase hash aggregate the explicit form produces."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """SELECT o_orderpriority, year(o_orderdate) AS yr,
                  count(*) AS n, round(sum(o_totalprice), 2) AS total
           FROM orders_gba
           GROUP BY ALL
           ORDER BY o_orderpriority, yr"""
    )


@q(
    "sql_star_except",
    """SELECT * EXCLUDE (n_comment_len)
       FROM (SELECT n.n_nationkey, n.n_name, r.r_name AS region_name,
                    length(n.n_name) AS n_comment_len
             FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey) t
       ORDER BY n_nationkey""",
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` — project everything but the listed
    columns (DuckDB spells it EXCLUDE). The exclusion resolves at
    analysis time into an ordinary pruned projection, so the scan's
    ReadSchema never reads the dropped column's ancestors more than the
    plan needs — wide-table hygiene without enumerating 400 columns."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_se")
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_se")
    return spark.sql(
        """SELECT * EXCEPT (n_comment_len)
           FROM (SELECT n.n_nationkey, n.n_name, r.r_name AS region_name,
                        length(n.n_name) AS n_comment_len
                 FROM nation_se n JOIN region_se r
                   ON n.n_regionkey = r.r_regionkey) t
           ORDER BY n_nationkey"""
    )


@q(
    "fn_try_safe",
    """SELECT p_partkey,
              (p_size * 10) / (p_size % 3) AS safe_div,
              TRY_CAST(substring(p_brand, 7) AS INT) AS brand_num,
              TRY_CAST(p_type AS INT) AS bad_cast,
              string_split(p_name, ' ')[3] AS third_word
       FROM part
       ORDER BY p_partkey
       LIMIT 40""",
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety family: try_divide (NULL on zero divisor
    instead of the error Spark 4's default ANSI mode raises), try_cast
    (NULL on malformed input), try_element_at (NULL past the end).
    DuckDB's native semantics already return NULL for each case, so the
    oracle is the plain expression. This is the documented escape hatch
    that keeps dirty-data pipelines running under ANSI SQL."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.try_divide(F.col("p_size") * 10, F.col("p_size") % 3).alias("safe_div"),
            F.expr("try_cast(substring(p_brand, 7) AS INT)").alias("brand_num"),
            F.expr("try_cast(p_type AS INT)").alias("bad_cast"),
            F.try_element_at(F.split("p_name", " "), F.lit(3)).alias("third_word"),
        )
        .orderBy("p_partkey")
        .limit(40)
    )


@q(
    "join_hint_shuffle_hash",
    """SELECT o.o_orderpriority, count(*) AS n_items,
              round(sum(l.l_extendedprice), 2) AS total
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderpriority
       ORDER BY o.o_orderpriority""",
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit SHUFFLE_HASH strategy hint: build a hash table per
    partition instead of sorting both sides (SMJ) — the right call when
    one side is much smaller than the other but too big to broadcast,
    because it skips both sorts. The hint only constrains strategy
    selection; the result is identical, which is exactly what the oracle
    checks. Plan-asserted as ShuffledHashJoin in tools/explain_audit.py."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "scan_file_metadata",
    # the fixture table is one file, so the expected lineage report is a
    # single (file_name, row_count) row; DuckDB's equivalent mechanism is
    # read_parquet(..., filename=true), which the driver's table views
    # abstract away — the content contract is what's checked here
    """SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows
       FROM lineitem
       GROUP BY file_name
       ORDER BY file_name""",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden ``_metadata`` column: per-source-file lineage surfaced
    as ordinary data (file_name here; row_index/size/mtime also exist) —
    the debugging handle for "which input file produced this bad row".
    Constant-folded from the scan's own bookkeeping: no extra I/O, no
    shuffle beyond the tiny per-file aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("file_name")
    )


@q(
    "subquery_exists_correlated",
    """SELECT c.c_custkey, c.c_name
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT')
         AND NOT EXISTS (SELECT 1 FROM orders o2
                         WHERE o2.o_custkey = c.c_custkey
                           AND o2.o_orderstatus = 'F'
                           AND o2.o_totalprice > 200000)
       ORDER BY c.c_custkey
       LIMIT 100""",
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — the remaining subquery shape next
    to ``subquery_scalar_correlated`` and ``subquery_not_in_nulls``:
    customers with at least one urgent order and no large finalized one.
    Catalyst decorrelates both predicates into LEFT SEMI and LEFT ANTI
    joins on o_custkey (visible in the executed plan) — at 100 TB these
    are ordinary shuffled equi-joins with the orders side filtered FIRST
    by the pushed-down priority/status predicates, never a per-row
    re-execution of the inner query."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ec")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ec")
    return spark.sql(
        """SELECT c.c_custkey, c.c_name
           FROM customer_ec c
           WHERE EXISTS (SELECT 1 FROM orders_ec o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
             AND NOT EXISTS (SELECT 1 FROM orders_ec o2
                             WHERE o2.o_custkey = c.c_custkey
                               AND o2.o_orderstatus = 'F'
                               AND o2.o_totalprice > 200000)
           ORDER BY c.c_custkey
           LIMIT 100"""
    )


@q(
    "sql_pivot_clause",
    """SELECT o_orderpriority,
              coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)::BIGINT AS n_f,
              coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)::BIGINT AS n_o,
              coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)::BIGINT AS n_p,
              round(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                                      THEN o_totalprice END), 0), 6) AS total_f,
              round(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                                      THEN o_totalprice END), 0), 6) AS total_o,
              round(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                                      THEN o_totalprice END), 0), 6) AS total_p
       FROM orders GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (Spark-native syntax, not the DataFrame
    ``.pivot()`` that ``agg_pivot`` covers): order counts AND price
    totals per priority pivoted across the three order statuses in one
    clause — two aggregates × three pivot values = six output measures.
    The oracle states the de-sugared form (conditional aggregation),
    which is exactly what Catalyst lowers PIVOT to — one partial+final
    hash aggregate, no extra shuffle vs a plain GROUP BY; the pivot
    value list is explicit, so the plan is static (no collect-distinct
    planning step). Same plan at 100 TB."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_pv"
    )
    return spark.sql(
        """SELECT * FROM (
             SELECT o_orderpriority, o_orderstatus, o_totalprice
             FROM orders_pv)
           PIVOT (
             coalesce(count(o_orderstatus), 0) AS n,
             round(coalesce(sum(o_totalprice), 0), 6) AS total
             FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
           ORDER BY o_orderpriority"""
    ).select(
        "o_orderpriority",
        F.col("f_n").cast("long").alias("n_f"),
        F.col("o_n").cast("long").alias("n_o"),
        F.col("p_n").cast("long").alias("n_p"),
        F.col("f_total").alias("total_f"),
        F.col("o_total").alias("total_o"),
        F.col("p_total").alias("total_p"),
    )
