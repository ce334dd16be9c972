"""Cost-based-optimizer evidence (VERDICT r3 item 7): ANALYZE TABLE stats
must visibly inform the plan, so the 100×-scale join-order story is
asserted, not assumed.

The crisp stats-informed decision: a selectively-filtered orders side whose
FILE size is far above the broadcast threshold. Without CBO Spark only has
size-in-bytes (filter estimate = child size → SortMergeJoin); with CBO +
column stats FilterEstimation shrinks the estimate below the threshold →
BroadcastHashJoin. Same query, same data — only the statistics differ.
AQE is disabled inside the test so the decision is provably the *planner's*
(AQE would fix it at runtime from actual sizes; a real 100 TB cluster wants
it right before the first shuffle materializes).
"""

import re

import pytest

from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001

CBO_CONFS = (
    "spark.sql.cbo.enabled",
    "spark.sql.cbo.planStats.enabled",
    "spark.sql.cbo.joinReorder.enabled",
)


@pytest.fixture(scope="module")
def cbo_tables(spark):
    import shutil

    names = ("region", "nation", "customer", "orders", "lineitem", "supplier")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in names:
        # in-memory catalog: a prior session's table FILES can survive its
        # catalog entry — clear both before creating
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")
        shutil.rmtree(f"{warehouse}/cbo_{t}", ignore_errors=True)
        load_table(spark, SF0001, t).write.mode("overwrite").saveAsTable(f"cbo_{t}")
        spark.sql(f"ANALYZE TABLE cbo_{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    yield names
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS cbo_{t}")


def _with_confs(spark, cbo: bool, fn):
    saved = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        **{k: spark.conf.get(k) for k in CBO_CONFS},
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024))
        for k in CBO_CONFS:
            spark.conf.set(k, str(cbo).lower())
        return fn()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_analyze_stats_recorded(spark, cbo_tables):
    """ANALYZE must land row counts in the catalog — the input joinReorder
    and FilterEstimation read."""
    row = (
        spark.sql("DESC EXTENDED cbo_orders")
        .filter("col_name = 'Statistics'")
        .collect()[0]
    )
    m = re.search(r"(\d+) rows", row.data_type)
    assert m, f"no row stats: {row.data_type}"
    assert int(m.group(1)) == spark.table("cbo_orders").count()


def test_cbo_flips_filtered_join_to_broadcast(spark, cbo_tables):
    """The stats-informed physical order: a 1500-row orders table filtered
    to <100 keys joins lineitem. Size-only planning keeps SMJ (file size >
    threshold, filter not estimated); CBO + column stats shrinks the
    filtered side below the threshold and broadcasts it."""
    q = """SELECT o.o_orderpriority, count(*) AS n
           FROM cbo_lineitem l
           JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey < 100
           GROUP BY o.o_orderpriority"""

    def phys():
        return spark.sql(q)._jdf.queryExecution().sparkPlan().toString()

    plan_off = _with_confs(spark, False, phys)
    plan_on = _with_confs(spark, True, phys)
    assert "SortMergeJoin" in plan_off and "BroadcastHashJoin" not in plan_off
    assert "BroadcastHashJoin" in plan_on and "SortMergeJoin" not in plan_on


def test_cbo_row_count_estimate_defined(spark, cbo_tables):
    """With stats + CBO the optimizer carries a row-count estimate through
    the whole q5-shaped join chain (the quantity joinReorder's DP
    minimizes); size-only planning has no rowCount at all."""
    q5 = """SELECT n.n_name, sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
            FROM cbo_lineitem l
            JOIN cbo_supplier s ON l.l_suppkey = s.s_suppkey
            JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
            JOIN cbo_customer c ON o.o_custkey = c.c_custkey
                               AND c.c_nationkey = s.s_nationkey
            JOIN cbo_nation n ON s.s_nationkey = n.n_nationkey
            JOIN cbo_region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name"""

    def root_rowcount():
        opt = spark.sql(q5)._jdf.queryExecution().optimizedPlan()
        return opt.stats().rowCount().isDefined()

    assert _with_confs(spark, True, root_rowcount) is True
    assert _with_confs(spark, False, root_rowcount) is False
