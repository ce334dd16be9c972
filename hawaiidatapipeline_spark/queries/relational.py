"""Relational core — projection / filter / fulltext / distinct (SURVEY.md §2.B),
sorts / limit / offset / top-k (§2.F), set operations (§2.G).

These are the SoQL ``$select/$where/$order/$limit/$offset`` surface of the
reference (server-side SoQL) plus its client-side Ruby ``Enumerable`` set
algebra, re-expressed declaratively so Catalyst pushes filters and projections
into the Parquet scan. At 100 TB each of these is a single scan stage with no
shuffle (sorts excepted — global sorts are range-partitioned exchanges; top-k
is TakeOrderedAndProject, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


# ---------------------------------------------------------------- §2.B


@q(
    "project_select",
    "SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$select=a,b`` — column pruning reaches the scan (ReadSchema)."""
    return load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@q(
    "project_alias",
    "SELECT c_custkey AS id, c_name AS customer_name, c_acctbal AS balance FROM customer",
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$select=a AS x``."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("balance"),
    )


@q(
    "project_computed",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice * (1 - l_discount), 6) AS net_price,
              round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
       FROM lineitem""",
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expressions in the projection (constant-folded, codegen'd)."""
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("charged"),
    )


@q(
    "filter_compare",
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000.0",
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicate — shows up in PushedFilters on the Parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 100000.0).select("o_orderkey", "o_totalprice")


@q(
    "filter_boolean",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE (l_discount > 0.05 AND l_quantity < 10.0) OR NOT (l_returnflag = 'N')""",
)
def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_discount") > 0.05) & (F.col("l_quantity") < 10.0))
        | ~(F.col("l_returnflag") == "N")
    ).select("l_orderkey", "l_linenumber")


@q(
    "filter_in_between_null",
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
         AND o_totalprice BETWEEN 50000.0 AND 150000.0
         AND o_custkey IS NOT NULL""",
)
def filter_in_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000.0, 150000.0)
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@q(
    "filter_like",
    """SELECT p_partkey, p_name, p_brand FROM part
       WHERE p_name LIKE '%widget%' OR (p_name LIKE 'red%' AND p_brand LIKE '%#1%')""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``like`` / ``starts_with`` / ``contains``."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%")
        | (F.col("p_name").startswith("red") & F.col("p_brand").contains("#1"))
    ).select("p_partkey", "p_name", "p_brand")


@q(
    "fulltext_search",
    """SELECT doc_id, lang, source FROM documents
       WHERE lower(text) LIKE '%merge%' OR lower(lang) LIKE '%merge%'
          OR lower(source) LIKE '%merge%'""",
)
def fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$q`` — case-insensitive token match ORed across all text columns."""
    d = load_table(spark, sf_dir, "documents")
    needle = "merge"
    cond = None
    for colname in ("text", "lang", "source"):  # all string columns
        c = F.lower(F.col(colname)).contains(needle)
        cond = c if cond is None else (cond | c)
    return d.filter(cond).select("doc_id", "lang", "source")


@q(
    "fulltext_ranked",
    """WITH scored AS (
         SELECT doc_id, lang, source,
                ((len(lower(text)) - len(replace(lower(text), 'merge', ''))) / 5
                 + (len(lower(source)) - len(replace(lower(source), 'merge', ''))) / 5
                )::BIGINT AS tf
         FROM documents
       )
       SELECT doc_id, lang, source, tf FROM scored
       WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 50""",
)
def fulltext_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$q`` with RELEVANCE RANKING — Socrata orders ``$q`` results by
    match quality, which the boolean ``fulltext_search`` above ignores. Score
    = term frequency of the needle across the text columns (occurrence count
    via length arithmetic — pure codegen, no regex), deterministic tiebreak
    on doc_id so the top-50 set is exact and oracle-checkable."""
    d = load_table(spark, sf_dir, "documents")
    needle = "merge"

    def tf(colname: str):
        low = F.lower(F.col(colname))
        return (F.length(low) - F.length(F.expr(f"replace(lower({colname}), '{needle}', '')"))) / len(needle)

    score = (tf("text") + tf("source")).cast("long")
    return (
        d.select("doc_id", "lang", "source", score.alias("tf"))
        .filter(F.col("tf") > 0)
        .orderBy(F.col("tf").desc(), "doc_id")
        .limit(50)
    )


@q(
    "distinct_rows",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — partial-agg dedup before the exchange (map-side)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------- §2.F


@q(
    "sort_multikey",
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
       ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort: range-partitioned exchange, sampled boundaries."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(
        F.col("o_orderpriority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@q(
    "limit_n",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$limit`` under a total order (PK tiebreak → deterministic)."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").limit(100)


@q(
    "offset_paging",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 25 OFFSET 50",
)
def offset_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``$offset`` paging — the reference's fetch-all loop page shape.
    Native DataFrame offset (Spark 4)."""
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy("o_orderkey").select("o_orderkey", "o_totalprice").offset(50).limit(25)


@q(
    "topk_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps, no full sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


# ---------------------------------------------------------------- §2.G


_RICH = "SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0"
_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


def _rich(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    )


def _building(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


@q("set_union_all", f"{_RICH} UNION ALL {_BUILDING}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — pure concatenation, no shuffle."""
    return _rich(spark, sf_dir).unionByName(_building(spark, sf_dir))


@q("set_union_distinct", f"{_RICH} UNION {_BUILDING}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).union(_building(spark, sf_dir)).distinct()


@q("set_intersect", f"{_RICH} INTERSECT {_BUILDING}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rich(spark, sf_dir).intersect(_building(spark, sf_dir))


@q("set_except", f"{_RICH} EXCEPT {_BUILDING}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT (``subtract``); ``exceptAll`` is the bag variant."""
    return _rich(spark, sf_dir).subtract(_building(spark, sf_dir))


@q(
    "subquery_scalar_correlated",
    """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 6) AS o_totalprice
       FROM orders o1
       WHERE o_totalprice > (
           SELECT 1.5 * avg(o_totalprice) FROM orders o2
           WHERE o2.o_orderpriority = o1.o_orderpriority)""",
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL entry point — Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into an aggregate +
    join (the plan a hand-written join would produce), so the declarative
    form costs nothing at scale. Exercises parser → analyzer → decorrelation
    (SURVEY.md §3.2 entry point 2)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 6) AS o_totalprice
           FROM orders_sq o1
           WHERE o_totalprice > (
               SELECT 1.5 * avg(o_totalprice) FROM orders_sq o2
               WHERE o2.o_orderpriority = o1.o_orderpriority)"""
    )


@q(
    "dq_profile",
    """SELECT 'l_quantity' AS column_name,
              count(*) - count(l_quantity) AS n_nulls,
              count(DISTINCT l_quantity) AS n_distinct,
              round(min(l_quantity), 6)::VARCHAR AS min_value,
              round(max(l_quantity), 6)::VARCHAR AS max_value
       FROM lineitem
       UNION ALL
       SELECT 'l_returnflag',
              count(*) - count(l_returnflag),
              count(DISTINCT l_returnflag),
              min(l_returnflag), max(l_returnflag)
       FROM lineitem
       UNION ALL
       SELECT 'l_discount',
              count(*) - count(l_discount),
              count(DISTINCT l_discount),
              round(min(l_discount), 6)::VARCHAR,
              round(max(l_discount), 6)::VARCHAR
       FROM lineitem""",
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profiling: per-column null count, exact cardinality,
    min/max (stringified for a uniform long-format schema) — the validation
    pass a pipeline runs before publishing a table. All three column
    profiles come from ONE scan (Spark unions the aggregates; at 100 TB use
    one pass per few dozen columns, or approx_count_distinct when exact
    cardinality isn't required)."""
    li = load_table(spark, sf_dir, "lineitem")

    def prof(col: str, numeric: bool) -> DataFrame:
        mn, mx = F.min(col), F.max(col)
        if numeric:
            mn, mx = F.round(mn, 6).cast("string"), F.round(mx, 6).cast("string")
        return li.agg(
            F.lit(col).alias("column_name"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            mn.alias("min_value"),
            mx.alias("max_value"),
        )

    return (
        prof("l_quantity", True)
        .unionByName(prof("l_returnflag", False))
        .unionByName(prof("l_discount", True))
    )


_DQ_RULES = {
    "qty_positive": "l_quantity > 0",
    "disc_in_range": "l_discount between 0 and 1",
    "price_floor": "l_extendedprice >= 900",
    "flag_known": "l_returnflag in ('A', 'N', 'R')",
}


@q(
    "dq_expectations",
    f"""WITH base AS (
         SELECT count(*) AS n_rows,
                {", ".join(
                    f"sum(CASE WHEN coalesce({expr}, false) THEN 0 ELSE 1 END) AS v_{name}"
                    for name, expr in _DQ_RULES.items()
                )}
         FROM lineitem)
       {" UNION ALL ".join(
           f'''SELECT '{name}' AS rule, v_{name}::BIGINT AS n_violations,
                      n_rows::BIGINT AS n_rows, v_{name} = 0 AS pass FROM base'''
           for name in _DQ_RULES
       )}""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic expectations gate (operators/quality.py): declared boolean
    rules become ONE conditional aggregation over a single scan — per-rule
    violation counts regardless of rule count; null results count as
    violations (three-valued logic must not slip through a gate)."""
    from hawaiidatapipeline_spark.operators.quality import expect

    li = load_table(spark, sf_dir, "lineitem")
    return expect(li, _DQ_RULES)


@q(
    "dq_referential",
    """SELECT 'orders->customer' AS relation, count(*) AS n_orphans
       FROM orders o WHERE NOT EXISTS
           (SELECT 1 FROM customer c WHERE o.o_custkey = c.c_custkey)
       UNION ALL
       SELECT 'lineitem->orders', count(*)
       FROM lineitem l WHERE NOT EXISTS
           (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey)
       UNION ALL
       SELECT 'customer->nation', count(*)
       FROM customer c WHERE NOT EXISTS
           (SELECT 1 FROM nation n WHERE c.c_nationkey = n.n_nationkey)""",
)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan counts per
    foreign-key edge via anti joins (dim side broadcast where small). A
    healthy pipeline emits all zeros; non-zero rows name the broken edge.
    At 100 TB each edge is one shuffle-free (broadcast) or single-shuffle
    anti join — run per partition increment, not over history."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")

    def edge(name: str, left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
        return (
            left.join(F.broadcast(right), left[lk] == right[rk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_orphans")
        )

    return (
        edge("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionByName(edge("lineitem->orders", li, o, "l_orderkey", "o_orderkey"))
        .unionByName(edge("customer->nation", c, n, "c_nationkey", "n_nationkey"))
    )


@q(
    "set_union_by_name",
    """SELECT s_suppkey, s_name, NULL::BIGINT AS s_nationkey
       FROM supplier WHERE s_suppkey < 60
       UNION ALL
       SELECT s_suppkey, NULL::VARCHAR AS s_name, s_nationkey
       FROM supplier WHERE s_suppkey >= 90""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: ``unionByName(allowMissingColumns=True)``
    aligns frames by COLUMN NAME and null-fills what either side lacks —
    how heterogeneous landing batches (old files without new columns)
    stack into one frame without positional-union corruption. The oracle
    spells out the same alignment with explicit NULL padding (DuckDB's
    ``UNION ALL BY NAME`` is the engine-native twin)."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.filter(F.col("s_suppkey") < 60).select("s_suppkey", "s_name")
    b = s.filter(F.col("s_suppkey") >= 90).select("s_suppkey", "s_nationkey")
    return a.unionByName(b, allowMissingColumns=True)


@q(
    "subquery_not_in_nulls",
    """WITH sub AS (
         SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS k
         FROM customer WHERE c_custkey < 500
       )
       SELECT
         (SELECT count(*) FROM orders
          WHERE o_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM sub s
                            WHERE s.k = o.o_custkey)) AS n_not_exists""",
)
def subquery_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN / NOT EXISTS null-semantics trap as a checked query: the
    subquery set contains NULLs, so under ANSI three-valued logic NOT IN
    can never be TRUE (n_not_in = 0) while NOT EXISTS counts normally —
    the single most common silent-wrong-answer rewrite in warehouse SQL.
    Both engines implement the standard; the hash check proves the anti
    join Catalyst plans for NOT IN keeps null-aware semantics
    (NullAwareAntiJoin), not the naive anti join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_nin")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_nin")
    return spark.sql(
        """WITH sub AS (
             SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS k
             FROM customer_nin WHERE c_custkey < 500
           )
           SELECT
             (SELECT count(*) FROM orders_nin
              WHERE o_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
             (SELECT count(*) FROM orders_nin o
              WHERE NOT EXISTS (SELECT 1 FROM sub s
                                WHERE s.k = o.o_custkey)) AS n_not_exists"""
    )


@q(
    "join_null_safe_eq",
    """WITH keyed AS (
         SELECT o_orderkey,
                CASE WHEN o_orderkey % 50 = 0 THEN NULL
                     ELSE o_orderkey % 7 END AS k
         FROM orders WHERE o_orderkey < 1000
       )
       SELECT coalesce(a.k, -1) AS join_key, count(*) AS n_pairs
       FROM keyed a JOIN keyed b
         ON a.k IS NOT DISTINCT FROM b.k AND a.o_orderkey < b.o_orderkey
       GROUP BY 1""",
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality JOIN (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics merges and SCD
    comparisons need for nullable business keys. Spark plans eqNullSafe as
    a hash join on a null-safe-wrapped key (still an equi-join, no
    nested-loop penalty), which the driver hash check silently verifies
    by including the NULL<=>NULL pair group."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 50 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            F.col("a.k").eqNullSafe(F.col("b.k"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .groupBy(F.coalesce(F.col("a.k"), F.lit(-1)).alias("join_key"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@q(
    "sql_recursive_calendar",
    """WITH RECURSIVE months(k) AS (
         SELECT 0 UNION ALL SELECT k + 1 FROM months WHERE k < 79
       ),
       spine AS (
         SELECT (DATE '1995-01-01' + (k * INTERVAL 1 MONTH))::DATE AS month_start
         FROM months
       )
       SELECT s.month_start, count(o.o_orderkey) AS n_orders
       FROM spine s
       LEFT JOIN orders o
         ON date_trunc('month', o.o_orderdate)::DATE = s.month_start
       GROUP BY s.month_start""",
)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): an 80-month calendar spine
    generated by bounded recursion, LEFT JOINed to orders so empty months
    survive with zero counts — the date-spine idiom reporting pipelines
    hand-roll with sequence()+explode, now first-class SQL. Spark's
    recursion is UNION ALL with a monotone guard (UNION-dedup recursion is
    not yet supported), which an acyclic generator satisfies; cyclic
    transitive closures stay on the iterative operators
    (operators/dedup.py connected_components)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rc")
    return spark.sql(
        """WITH RECURSIVE months(k) AS (
             SELECT 0 UNION ALL SELECT k + 1 FROM months WHERE k < 79
           ),
           spine AS (
             SELECT add_months(DATE '1995-01-01', k) AS month_start FROM months
           )
           SELECT s.month_start, count(o.o_orderkey) AS n_orders
           FROM spine s
           LEFT JOIN orders_rc o
             ON trunc(o.o_orderdate, 'month') = s.month_start
           GROUP BY s.month_start"""
    )


@q(
    "join_lateral_topn",
    """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
       FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
       LATERAL (SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
                FROM orders o
                WHERE o.o_orderpriority = p.o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""",
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY/LIMIT — top-2 orders per
    priority expressed as a per-row subquery instead of a rank window.
    Catalyst decorrelates this to the same join+window shape
    win_topk_per_group plans by hand, so the declarative form costs
    nothing; the hash check proves the decorrelation preserves per-group
    limit semantics."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
           FROM (SELECT DISTINCT o_orderpriority FROM orders_lat) p,
           LATERAL (SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
                    FROM orders_lat o
                    WHERE o.o_orderpriority = p.o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t"""
    )


@q(
    "sql_parameterized",
    """SELECT o_orderpriority, count(*) AS n
       FROM orders
       WHERE o_totalprice > 200000 AND o_orderdate >= DATE '1997-01-01'
       GROUP BY o_orderpriority""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (`spark.sql(query, args=...)`): values bind as
    typed literals in the parser, never string-spliced — the
    injection-safe entry point a service exposes. The oracle inlines the
    same literals, so the hash check proves binding is semantically
    identical to literal SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql(
        """SELECT o_orderpriority, count(*) AS n
           FROM orders_pv
           WHERE o_totalprice > :thresh AND o_orderdate >= :cutoff
           GROUP BY o_orderpriority""",
        args={"thresh": 200000, "cutoff": "1997-01-01"},
    )


@q(
    "dq_observe_metrics",
    """SELECT count(*) AS n_rows,
              count(*) - count(l_quantity) AS n_null_qty,
              round(sum(l_extendedprice), 6) AS total_price,
              count_if(l_discount > 0.08)::BIGINT AS n_high_discount
       FROM lineitem""",
)
def dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation API: DQ counters piggybacked on a real pass over the
    data (`df.observe(...)` + a noop-sink action) — the zero-extra-scan
    way a production job publishes row counts / null rates / control
    totals alongside its output instead of re-scanning for them. The
    observed metrics come back driver-side as one tiny row; the oracle
    recomputes them with plain aggregates, proving the piggybacked
    counters equal the ground truth."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("n_null_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("total_price"),
        F.count_if(F.col("l_discount") > 0.08).alias("n_high_discount"),
    )
    # the action the metrics ride on (a real job would be writing output)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_null_qty"], m["total_price"], m["n_high_discount"])],
        "n_rows bigint, n_null_qty bigint, total_price double, n_high_discount bigint",
    )


_BAG_A = ("SELECT o_custkey FROM orders "
          "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')")
_BAG_B = "SELECT o_custkey FROM orders WHERE o_totalprice > 100000"


def _bag_a(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey")
    )


def _bag_b(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_custkey")
    )


@q("set_except_all", f"{_BAG_A} EXCEPT ALL {_BAG_B}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference with MULTIPLICITY subtraction: a
    custkey with 3 urgent/high orders and 2 expensive ones survives
    once (3−2), which DISTINCT-semantics ``set_except`` cannot express.
    The inputs are deliberately multisets (order-grain custkeys) so the
    bag and set answers genuinely differ. Spark plans ``exceptAll`` as
    a count-aggregate + generate (multiplicity replay) — one shuffle on
    the row value, linear; same shape at 100 TB."""
    return _bag_a(spark, sf_dir).exceptAll(_bag_b(spark, sf_dir))


@q("set_intersect_all", f"{_BAG_A} INTERSECT ALL {_BAG_B}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag intersection keeping min(multiplicity) per
    value (the SQL-standard bag semantics ``set_intersect``'s DISTINCT
    form collapses). Planned as a paired count-aggregate + min replay;
    one value-keyed shuffle, linear."""
    return _bag_a(spark, sf_dir).intersectAll(_bag_b(spark, sf_dir))
