"""Higher-order array functions, SCD2 point-in-time attribution,
weighted aggregates, and cohort lift testing.

The PIT join is the warehouse counterpart of ``join_asof``: an SCD2
validity lookup IS an as-of join on (key, time), and the union+window
formulation keeps it one shuffle instead of a range join. The lift test
shows the one-pass conditional-aggregate shape for experiment readouts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "fn_lambda_arrays",
    """SELECT doc_id,
              array_to_string(
                list_transform(list_slice(string_split(text, ' '), 1, 5),
                               t -> length(t) * length(t)), '|') AS sq_lens,
              len(list_filter(string_split(text, ' '),
                              t -> length(t) > 4))::BIGINT AS n_long,
              list_aggregate(list_transform(string_split(text, ' '),
                                            t -> length(t)),
                             'sum')::BIGINT AS total_len,
              len(list_filter(string_split(text, ' '),
                              t -> t = 'data')) > 0 AS has_data
       FROM documents
       ORDER BY doc_id
       LIMIT 50""",
)
def fn_lambda_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambda functions over arrays — transform / filter /
    aggregate (fold) / exists. These run as codegen'd expression trees on
    the JVM, NOT as Python lambdas: the functional style costs nothing at
    100 TB, which is why array-heavy feature engineering should reach for
    them before any UDF. (fn_array covers the non-lambda slice/sort ops.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        d.select(
            "doc_id",
            F.concat_ws(
                "|",
                F.transform(
                    F.slice(toks, 1, 5), lambda t: F.length(t) * F.length(t)
                ),
            ).alias("sq_lens"),
            F.size(F.filter(toks, lambda t: F.length(t) > 4))
            .cast("long")
            .alias("n_long"),
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_len"),
            F.exists(toks, lambda t: t == "data").alias("has_data"),
        )
        .orderBy("doc_id")
        .limit(50)
    )


@q(
    "etl_scd2_pit_join",
    """WITH dedup AS (
         SELECT o_custkey, o_orderdate AS valid_from,
                max(o_orderkey) AS version_key
         FROM orders GROUP BY o_custkey, o_orderdate),
       v AS (
         SELECT o_custkey, valid_from, version_key,
                lead(valid_from) OVER (PARTITION BY o_custkey
                                       ORDER BY valid_from) AS valid_to
         FROM dedup),
       f AS (
         SELECT o.o_custkey, l.l_shipdate
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_returnflag = 'R'),
       m AS (
         SELECT f.o_custkey, f.l_shipdate, v.version_key, v.valid_to
         FROM f ASOF LEFT JOIN v
           ON f.o_custkey = v.o_custkey AND f.l_shipdate >= v.valid_from)
       SELECT CASE WHEN version_key IS NULL THEN 'before_history'
                   WHEN valid_to IS NULL THEN 'current'
                   ELSE 'historical' END AS version_status,
              count(*) AS n_facts,
              count(DISTINCT o_custkey) AS n_customers
       FROM m GROUP BY version_status
       ORDER BY version_status""",
)
def etl_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join against SCD2 validity ranges: every
    returned lineitem attributed to the customer version in effect at
    ship time. An SCD2 lookup IS an as-of join, so this reuses the
    union+window shape of ``join_asof`` — version-start rows and fact
    rows merge into one (custkey, ts) stream, ``last(..., ignorenulls)``
    carries the in-effect version forward, and the whole lookup is ONE
    shuffle. The naive BETWEEN range join explodes pairwise at scale;
    this never does. Versions are deduped to one per (custkey, date) so
    both engines make the identical deterministic pick."""
    o = load_table(spark, sf_dir, "orders")
    dedup = o.groupBy(
        "o_custkey", F.col("o_orderdate").alias("valid_from")
    ).agg(F.max("o_orderkey").alias("version_key"))
    wv = Window.partitionBy("o_custkey").orderBy("valid_from")
    versions = dedup.withColumn("valid_to", F.lead("valid_from").over(wv)).select(
        "o_custkey",
        F.col("valid_from").alias("ts"),
        "version_key",
        "valid_to",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("l_shipdate"),
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    facts = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .select(
            "o_custkey",
            F.col("l_shipdate").alias("ts"),
            F.lit(None).cast("long").alias("version_key"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(1).alias("tag"),
            "l_shipdate",
        )
    )
    merged = versions.unionByName(facts)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        merged.withColumn("cur_version", F.last("version_key", ignorenulls=True).over(w))
        .withColumn(
            # valid_to belongs to the matched version row; carry it beside the
            # key (struct so both NULL-able fields travel under one last())
            "cur_valid_to",
            F.last(
                F.when(
                    F.col("version_key").isNotNull(),
                    F.struct(F.col("valid_to").alias("vt")),
                ),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("tag") == 1)
    )
    status = (
        F.when(F.col("cur_version").isNull(), "before_history")
        .when(F.col("cur_valid_to.vt").isNull(), "current")
        .otherwise("historical")
    )
    return (
        attributed.select("o_custkey", status.alias("version_status"))
        .groupBy("version_status")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("version_status")
    )


@q(
    "agg_weighted_stats",
    """SELECT l_returnflag,
              round(sum((l_extendedprice * l_quantity)::DECIMAL(28,4))::DOUBLE
                    / sum(l_quantity::DECIMAL(20,2))::DOUBLE, 6)
                AS weighted_mean_price,
              sum(l_quantity::DECIMAL(20,2))::BIGINT AS total_weight,
              count(*) AS n
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""",
)
def agg_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the weighted
    aggregate every pricing/index pipeline needs. Σ(w·x) and Σw run as
    exact decimal partial sums (the w·x product is an identical double in
    both engines before the cast); the single division happens after both
    sums are cast to double, so the result is engine-exact. Same one-
    narrow-shuffle profile as any sum."""
    li = load_table(spark, sf_dir, "lineitem")
    swx = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(28,4)")
    ).cast("double")
    sw = F.sum(F.col("l_quantity").cast("decimal(20,2)"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(swx / sw.cast("double"), 6).alias("weighted_mean_price"),
            sw.cast("long").alias("total_weight"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "events_ab_lift",
    """WITH per_user AS (
         SELECT user_id, user_id % 2 AS cohort,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS converted
         FROM events GROUP BY user_id),
       agg AS (
         SELECT sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END)::DOUBLE AS n0,
                sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
                sum(CASE WHEN cohort = 0 THEN converted ELSE 0 END)::DOUBLE AS c0,
                sum(CASE WHEN cohort = 1 THEN converted ELSE 0 END)::DOUBLE AS c1
         FROM per_user)
       SELECT n0::BIGINT AS n_control, n1::BIGINT AS n_treatment,
              round(c0 / n0, 6) AS rate_control,
              round(c1 / n1, 6) AS rate_treatment,
              round(c1 / n1 - c0 / n0, 6) AS lift,
              round((c1 / n1 - c0 / n0)
                    / sqrt(((c0 + c1) / (n0 + n1))
                           * (1 - (c0 + c1) / (n0 + n1))
                           * (1 / n0 + 1 / n1)), 6) AS z_score
       FROM agg""",
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout (cohort = user parity standing in
    for an assignment column): per-cohort conversion, lift, and the
    pooled z-score — all from ONE conditional aggregation over per-user
    conversion flags. Counts are integers, every division/sqrt runs on
    identical double operands in both engines (IEEE sqrt is correctly
    rounded), so even the z-score hash-matches. At scale: one user-grain
    partial agg + a single-row reduce."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    ).withColumn("cohort", F.col("user_id") % 2)
    agg = per_user.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("double").alias("n0"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("double").alias("n1"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c0"),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0))
        .cast("double")
        .alias("c1"),
    )
    n0, n1, c0, c1 = (F.col(c) for c in ("n0", "n1", "c0", "c1"))
    pooled = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / F.sqrt(
        pooled * (1 - pooled) * (1 / n0 + 1 / n1)
    )
    return agg.select(
        n0.cast("long").alias("n_control"),
        n1.cast("long").alias("n_treatment"),
        F.round(c0 / n0, 6).alias("rate_control"),
        F.round(c1 / n1, 6).alias("rate_treatment"),
        F.round(c1 / n1 - c0 / n0, 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
    )
