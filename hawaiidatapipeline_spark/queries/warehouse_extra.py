"""Warehouse maintenance and QC operators — round-4 second batch.

Dynamic partition overwrite (the backfill primitive), partition-pruned
reads from a partitioned layout, per-key event rate limiting, corpus
per-dimension embedding statistics, and source-freshness monitoring.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_SCRATCH = os.path.join(tempfile.gettempdir(), "hdp_spark_warehouse")


def _scratch(name: str) -> str:
    path = os.path.join(_SCRATCH, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(_SCRATCH, exist_ok=True)
    return path


@q(
    "etl_partition_overwrite",
    """SELECT o_orderpriority,
              count(*) AS n,
              round(sum((CASE WHEN o_orderpriority = '1-URGENT'
                              THEN (o_totalprice::DECIMAL(18,2)
                                    * '1.1'::DECIMAL(2,1))::DOUBLE
                              ELSE o_totalprice END)::DECIMAL(20,4)),
                    2)::DOUBLE AS total
       FROM orders
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""",
)
def etl_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the backfill primitive: rewrite ONE
    priority partition (repriced 1-URGENT rows) into a table holding all
    five, with ``partitionOverwriteMode=dynamic`` so untouched partitions
    survive byte-identical. This is how a 100 TB date-partitioned fact
    takes a late-data restatement: the job writes only the partitions it
    produced, never truncating the table. The oracle states the expected
    post-backfill content per partition."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = _scratch("orders_by_priority")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    # reprice in exact decimal (double round() ties break differently across
    # engines), then back to double so the partition schema stays uniform
    repriced = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice",
        (
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.1").cast("decimal(2,1)")
        ).cast("double"),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        repriced.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(20,4)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "scan_partition_pruned_agg",
    """SELECT event_type, count(*) AS n, round(sum(value), 6) AS total_value
       FROM events
       WHERE event_type IN ('click', 'purchase')
       GROUP BY event_type
       ORDER BY event_type""",
)
def scan_partition_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning on a partitioned layout: events written
    partitioned by event_type, then read with a partition-key filter —
    the scan lists only the two matching directories (PartitionFilters
    in the plan, asserted by tools/explain_audit.py) and never opens the
    others' files. At 100 TB this is THE reason facts are date/key
    partitioned: pruning happens at planning time, before any I/O."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    path = _scratch("events_by_type")
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_type")
    )


@q(
    "events_rate_limit",
    """WITH ranked AS (
         SELECT user_id,
                row_number() OVER (
                  PARTITION BY user_id, date_trunc('hour', ts)
                  ORDER BY ts, event_id) AS rn
         FROM events)
       SELECT user_id,
              count(*) FILTER (WHERE rn <= 2) AS kept,
              count(*) FILTER (WHERE rn > 2) AS dropped
       FROM ranked GROUP BY user_id
       HAVING count(*) FILTER (WHERE rn > 2) > 0
       ORDER BY user_id""",
)
def events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key rate limiting (≤2 events per user-hour, deterministic
    (ts, event_id) order) — the ingestion-throttle / abuse-cap operator:
    one row_number window keyed on (user, hour) then a conditional
    aggregate of kept vs dropped. One shuffle; the hour truncation
    keeps window partitions small even for hot keys, which is exactly
    what makes this shape skew-safe at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    ranked = e.select("user_id", F.row_number().over(w).alias("rn"))
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.when(F.col("rn") <= 2, 1)).alias("kept"),
            F.count(F.when(F.col("rn") > 2, 1)).alias("dropped"),
        )
        .filter(F.col("dropped") > 0)
        .orderBy("user_id")
    )


@q(
    "emb_dim_stats",
    """WITH ex AS (
         SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim,
                unnest(embedding) AS x
         FROM embeddings)
       SELECT dim, count(*) AS n,
              round(sum(x::DECIMAL(18,9))::DOUBLE / count(*), 6) AS mean,
              round(sum((x::DOUBLE * x::DOUBLE)::DECIMAL(28,12))::DOUBLE / count(*)
                    - (sum(x::DECIMAL(18,9))::DOUBLE / count(*))
                      * (sum(x::DECIMAL(18,9))::DOUBLE / count(*)),
                    6) AS variance,
              round(min(x)::DOUBLE, 6) AS min_x,
              round(max(x)::DOUBLE, 6) AS max_x
       FROM ex GROUP BY dim""",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics of the embedding column (the
    drift/collapse monitor an index rebuild checks first: a dimension
    whose variance falls to ~0 signals a dead feature). posexplode + one
    partial-aggregated groupBy on dim — shuffle volume is |dims| rows,
    independent of corpus size. Sums run in exact DECIMAL (x² is an
    identical double product in both engines before the cast), so the
    variance is engine-exact like emb_label_centroids (x is squared
    in DOUBLE first — a float32 square would round differently)."""
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(F.posexplode("embedding").alias("dim", "x"))
    # decimal SUMS are exact; cast each to double BEFORE any division so
    # both engines run the same IEEE ops on identical operands (decimal
    # division scales differ between engines and shift the 6th digit)
    n = F.count(F.lit(1))
    mean = F.sum(F.col("x").cast("decimal(18,9)")).cast("double") / n
    mean_sq = (
        F.sum(
            (F.col("x").cast("double") * F.col("x").cast("double")).cast(
                "decimal(28,12)"
            )
        ).cast("double")
        / n
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(mean_sq - mean * mean, 6).alias("variance"),
        F.round(F.min("x").cast("double"), 6).alias("min_x"),
        F.round(F.max("x").cast("double"), 6).alias("max_x"),
    )


@q(
    "dq_freshness",
    """WITH per AS (SELECT event_type, max(ts) AS latest, count(*) AS n
                    FROM events GROUP BY event_type),
       g AS (SELECT max(latest) AS global_latest FROM per)
       SELECT p.event_type, p.n,
              round(epoch(g.global_latest) - epoch(p.latest), 6) AS lag_s,
              (epoch(g.global_latest) - epoch(p.latest) > 3600) AS stale
       FROM per p CROSS JOIN g
       ORDER BY p.event_type""",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-freshness monitor: per event type, how far its latest event
    lags the newest event anywhere, with a >1 h staleness flag — the
    first alert a feed outage trips. Two tiny aggregates (per-type max +
    global max broadcast back); at scale the per-type max partial-
    aggregates map-side so the shuffle is |types| rows."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.max("ts").alias("latest"), F.count(F.lit(1)).alias("n")
    )
    g = per.agg(F.max("latest").alias("global_latest"))
    lag = F.col("global_latest").cast("double") - F.col("latest").cast("double")
    return (
        per.join(F.broadcast(g))
        .select(
            "event_type",
            "n",
            F.round(lag, 6).alias("lag_s"),
            (lag > 3600).alias("stale"),
        )
        .orderBy("event_type")
    )


# Declared schema contract for the orders table, in Spark type vocabulary.
# "o_expected_only" exercises the 'missing' verdict deterministically.
_ORDERS_CONTRACT = (
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp_ntz"),
    ("o_orderpriority", "string"),
    ("o_expected_only", "date"),
)


def _schema_contract_oracle() -> str:
    # the contract report is deterministic given the fixture schema, so the
    # oracle is the literal expected table (Spark type names are the
    # contract vocabulary; DuckDB's own type names differ by design)
    rows = []
    actual = {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz", "o_orderpriority": "string",
    }
    for name, expected in _ORDERS_CONTRACT:
        act = actual.get(name)
        status = "ok" if act == expected else ("missing" if act is None else "type_mismatch")
        rows.append(f"('{name}', '{expected}', {repr(act) if act else 'NULL'}, '{status}')")
    return (
        "SELECT * FROM (VALUES " + ", ".join(rows) +
        ") t(column_name, expected_type, actual_type, status) ORDER BY column_name"
    )


@q("dq_schema_contract", _schema_contract_oracle())
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-contract validation — the governance gate a table must pass
    before a pipeline consumes it: every contract column checked for
    presence and exact Spark type, extra table columns reported as
    'unexpected'. Pure metadata (df.schema) — zero data scanned, so the
    gate costs nothing at any scale; the oracle pins the full expected
    report. Complements dq_expectations (row-level rules) and
    scan_schema_evolution (drift across file generations)."""
    o = load_table(spark, sf_dir, "orders")
    actual = {f.name: f.dataType.simpleString() for f in o.schema.fields}
    rows = []
    for name, expected in _ORDERS_CONTRACT:
        act = actual.get(name)
        status = (
            "ok" if act == expected
            else ("missing" if act is None else "type_mismatch")
        )
        rows.append((name, expected, act, status))
    for name, act in actual.items():
        if name not in {c for c, _ in _ORDERS_CONTRACT}:
            rows.append((name, None, act, "unexpected"))
    return spark.createDataFrame(
        rows,
        "column_name string, expected_type string, actual_type string, status string",
    ).orderBy("column_name")


@q(
    "llm_dataset_card",
    """SELECT count(*) AS n_docs,
              count(DISTINCT source) AS n_sources,
              count(DISTINCT lang) AS n_langs,
              sum(n_chars)::BIGINT AS total_chars,
              round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0
                    / count(*), 6) AS pct_en,
              round(quantile_cont(n_chars, 0.5), 6) AS median_len,
              round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6)
                AS exact_dup_rate
       FROM documents""",
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row dataset card a corpus release ships with: volume,
    source/language diversity, length median, and exact-duplicate rate —
    every number from ONE aggregation pass over the documents table
    (the md5-distinct doubles as the dedup-rate probe). This is the
    publishable artifact summarizing what the curation funnel
    (llm_quality_gate_report) produced."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("pct_en"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("median_len"),
        F.round(
            1.0 - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
        ).alias("exact_dup_rate"),
    )


@q(
    "etl_incremental_join_view",
    """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 5 <> 0),
       delta AS (SELECT * FROM orders WHERE o_orderkey % 5 = 0),
       full_view AS (
         SELECT c.c_mktsegment, count(*) AS n_orders,
                round(sum(o.o_totalprice::DECIMAL(20,4)), 2)::DOUBLE AS total
         FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         GROUP BY c.c_mktsegment)
       SELECT * FROM full_view ORDER BY c_mktsegment""",
)
def etl_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a join-view aggregate: the view over
    customer⋈orders is NOT recomputed when an orders delta lands —
    only Δorders⋈customer is joined and its partial aggregate MERGED into
    the stored base-view state (sums add, counts add). The oracle is the
    full recompute over base+delta, so the hash-match PROVES incremental
    == full — the invariant every materialized-view maintainer owes its
    users. At 100 TB the delta join touches |Δ| rows, not the fact
    history; merge cost is |groups|."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    base = o.filter(F.col("o_orderkey") % 5 != 0)
    delta = o.filter(F.col("o_orderkey") % 5 == 0)

    def view_partial(orders_part):
        return (
            c.join(orders_part, c.c_custkey == orders_part.o_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("_sum"),
            )
        )

    stored = view_partial(base)          # the persisted view state
    incr = view_partial(delta)           # the delta's partial aggregate
    merged = (
        stored.unionByName(incr)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("_sum").alias("_sum"),
        )
    )
    return merged.select(
        "c_mktsegment",
        "n_orders",
        F.round(F.col("_sum"), 2).cast("double").alias("total"),
    ).orderBy("c_mktsegment")


@q(
    "etl_cdc_apply",
    """WITH ops AS (
         SELECT o_orderkey AS key, 1 AS op_seq, 'I' AS op,
                o_totalprice AS price
         FROM orders
         UNION ALL
         SELECT o_orderkey, 2, 'U',
                (o_totalprice::DECIMAL(18,2) * '1.2'::DECIMAL(2,1))::DOUBLE
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey, 3, 'D', NULL
         FROM orders WHERE o_orderkey % 13 = 0),
       folded AS (
         SELECT key, op, price,
                row_number() OVER (PARTITION BY key ORDER BY op_seq DESC) AS rn
         FROM ops)
       SELECT count(*) AS n_live,
              sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END)::BIGINT AS n_updated,
              round(sum(price::DECIMAL(20,4)), 2)::DOUBLE AS total_price
       FROM folded WHERE rn = 1 AND op <> 'D'""",
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log application with tombstones: an insert/update/delete
    operation stream folds to final table state by last-writer-wins —
    one row_number window over (key, op_seq DESC), keep rank 1, drop
    tombstones. This is how a change feed (Debezium-style) materializes
    without MERGE round-trips per batch: one shuffle on the key,
    regardless of how many ops a key accumulated. The op stream here
    derives deterministically from orders (all inserted, every 7th
    repriced in exact decimal, every 13th deleted) so both engines fold
    the identical log."""
    o = load_table(spark, sf_dir, "orders")
    inserts = o.select(
        F.col("o_orderkey").alias("key"),
        F.lit(1).alias("op_seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("price"),
    )
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(2).alias("op_seq"),
        F.lit("U").alias("op"),
        (
            F.col("o_totalprice").cast("decimal(18,2)")
            * F.lit("1.2").cast("decimal(2,1)")
        ).cast("double").alias("price"),
    )
    deletes = o.filter(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(3).alias("op_seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("price"),
    )
    ops = inserts.unionByName(updates).unionByName(deletes)
    w = Window.partitionBy("key").orderBy(F.col("op_seq").desc())
    live = (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return live.agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("long").alias("n_updated"),
        F.round(F.sum(F.col("price").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@q(
    "dq_column_masking",
    """SELECT c_custkey,
              md5(c_name) AS name_pseudonym,
              CASE WHEN c_acctbal < 0 THEN 'negative'
                   WHEN c_acctbal < 5000 THEN 'low'
                   ELSE 'high' END AS acctbal_band,
              c_mktsegment
       FROM customer
       ORDER BY c_custkey
       LIMIT 30""",
)
def dq_column_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking view — the governance pattern for exposing a
    table to a lower-privilege audience: direct identifiers replaced by a
    deterministic pseudonym (md5 keeps joinability without revealing the
    value) and sensitive numerics coarsened to bands. Pure projection:
    zero join, zero shuffle, and the masked view composes with every
    other operator because it IS a DataFrame. The pseudonym being
    deterministic is what lets downstream aggregates still group
    correctly — the same property the dedup family relies on."""
    c = load_table(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        c.select(
            "c_custkey",
            F.md5("c_name").alias("name_pseudonym"),
            band.alias("acctbal_band"),
            "c_mktsegment",
        )
        .orderBy("c_custkey")
        .limit(30)
    )


@q(
    "sample_systematic",
    """WITH numbered AS (
         SELECT o_orderkey, o_totalprice,
                row_number() OVER (ORDER BY o_orderkey) AS rn
         FROM orders)
       SELECT count(*) AS n_sampled,
              round(sum(o_totalprice::DECIMAL(20,4)), 2)::DOUBLE AS sample_total,
              min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
       FROM numbered WHERE rn % 20 = 1""",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-Nth) sampling under a total order — the sampling
    family's fourth member beside Bernoulli/stratified/weighted: exact
    5% rate, perfectly even coverage of the keyspace, deterministic.
    The global row number is distributed via operators/ranks.py
    partitioned_row_number (range-partition on the unique key, local
    row_number per slice, broadcast per-partition-count offsets) — the
    zipWithIndex-style shape, exactly equivalent to the serial
    row_number() window because o_orderkey is a total order, but with
    no single-partition stage: the only serial pass sees one row per
    partition at any scale."""
    from hawaiidatapipeline_spark.operators.ranks import partitioned_row_number

    o = load_table(spark, sf_dir, "orders")
    numbered = partitioned_row_number(
        o.select("o_orderkey", "o_totalprice"), [F.col("o_orderkey")], out="rn"
    )
    return numbered.filter(F.col("rn") % 20 == 1).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("sample_total"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
    )


@q(
    "etl_data_vault_keys",
    """WITH ln AS (
         SELECT o.o_orderkey, o.o_custkey,
                md5('C|' || o.o_custkey::VARCHAR) AS hub_customer_key,
                md5('O|' || o.o_orderkey::VARCHAR) AS hub_order_key,
                md5('CO|' || o.o_custkey::VARCHAR || '|'
                    || o.o_orderkey::VARCHAR) AS link_key
         FROM orders o),
       summary AS (
         SELECT count(*)::BIGINT AS n_links,
                count(DISTINCT hub_customer_key)::BIGINT AS n_hub_customers,
                count(DISTINCT hub_order_key)::BIGINT AS n_hub_orders
         FROM ln),
       sample AS (
         SELECT o_custkey, o_orderkey, hub_customer_key, hub_order_key,
                link_key
         FROM ln ORDER BY link_key LIMIT 10)
       SELECT s.o_custkey AS custkey, s.o_orderkey AS orderkey,
              s.hub_customer_key, s.hub_order_key, s.link_key,
              m.n_links, m.n_hub_customers, m.n_hub_orders
       FROM sample s CROSS JOIN summary m
       ORDER BY s.link_key""",
)
def etl_data_vault_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Vault 2.0 key generation — the hash-key modeling layer a
    raw vault loads through: hub keys md5 over the prefixed business
    key ('C|custkey', 'O|orderkey') and the customer↔order link key
    over the concatenated pair (prefix + '|' delimiter = the standard
    collision-safe composition; md5 is bit-identical on both engines,
    so every key hash-checks). Emits the 10 lexicographically smallest
    link rows as the checkable sample plus the hub/link cardinality
    summary a vault-load audit compares against source counts. Shape:
    map-only key derivation (pure codegen md5/concat) + one count agg;
    the top-10-by-key is TakeOrdered, never a global sort. At 100 TB
    hash-key generation is exactly this scan-bound map — the point of
    DV2.0 keys is that they parallelize with no sequence/lookup
    coordination."""
    o = load_table(spark, sf_dir, "orders")
    ln = o.select(
        "o_custkey",
        "o_orderkey",
        F.md5(F.concat(F.lit("C|"), F.col("o_custkey").cast("string"))).alias(
            "hub_customer_key"
        ),
        F.md5(F.concat(F.lit("O|"), F.col("o_orderkey").cast("string"))).alias(
            "hub_order_key"
        ),
        F.md5(
            F.concat(
                F.lit("CO|"),
                F.col("o_custkey").cast("string"),
                F.lit("|"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("link_key"),
    )
    summary = ln.agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("hub_customer_key").cast("long").alias("n_hub_customers"),
        F.countDistinct("hub_order_key").cast("long").alias("n_hub_orders"),
    )
    sample = ln.orderBy("link_key").limit(10)
    return (
        sample.crossJoin(F.broadcast(summary))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            "hub_customer_key",
            "hub_order_key",
            "link_key",
            "n_links",
            "n_hub_customers",
            "n_hub_orders",
        )
        .orderBy("link_key")
    )


_ERASURE_MOD = 37  # deterministic delete-request set: user_id % 37 == 0


@q(
    "etl_erasure_plan",
    f"""WITH rows_tagged AS (
         SELECT date_trunc('day', ts)::DATE AS d,
                CASE WHEN user_id % {_ERASURE_MOD} = 0 THEN 1 ELSE 0 END
                  AS erase,
                (32 + strlen(event_type) + coalesce(strlen(props), 0))
                  ::BIGINT AS bytes_est
         FROM events),
       parts AS (
         SELECT d, count(*)::BIGINT AS n_rows,
                sum(erase)::BIGINT AS n_erase,
                sum(bytes_est)::BIGINT AS bytes_total,
                sum(CASE WHEN erase = 1 THEN bytes_est ELSE 0 END)::BIGINT
                  AS bytes_erased
         FROM rows_tagged GROUP BY d)
       SELECT d AS partition_day, n_rows, n_erase,
              (n_rows - n_erase)::BIGINT AS n_kept,
              bytes_total, bytes_erased,
              CASE WHEN n_erase > 0 THEN 1 ELSE 0 END AS rewrite_required,
              round(n_erase::DOUBLE * 100.0 / n_rows, 6) AS erase_pct
       FROM parts ORDER BY partition_day""",
)
def etl_erasure_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR/right-to-be-forgotten erasure planner: given a delete-request
    set (deterministic stand-in: user_id % 37 = 0), compute per
    day-partition how many rows and bytes the erasure touches and which
    partitions need a rewrite — the plan a lake compaction job executes
    as copy-without-matching-rows (plus manifest swap). The planner is
    the cheap half that runs on EVERY request batch; partitions with
    rewrite_required = 0 are skipped entirely, which at 100 TB is the
    difference between rewriting a day and rewriting a year. Exact
    integer row/byte accounting (same byte estimator as
    etl_compaction_plan so the two maintenance planners compose).
    Shape: one partial-aggregated scan to the day grain; the plan
    output is partition-table-sized, never data-sized — in production
    the request set joins in via broadcast instead of the modulus."""
    e = load_table(spark, sf_dir, "events")
    tagged = e.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        F.when(F.col("user_id") % _ERASURE_MOD == 0, 1)
        .otherwise(0)
        .alias("erase"),
        (
            F.lit(32)
            + F.octet_length("event_type")
            + F.coalesce(F.octet_length("props"), F.lit(0))
        )
        .cast("long")
        .alias("bytes_est"),
    )
    parts = tagged.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("erase").cast("long").alias("n_erase"),
        F.sum("bytes_est").cast("long").alias("bytes_total"),
        F.sum(F.when(F.col("erase") == 1, F.col("bytes_est")).otherwise(0))
        .cast("long")
        .alias("bytes_erased"),
    )
    return parts.select(
        F.col("d").alias("partition_day"),
        "n_rows",
        "n_erase",
        (F.col("n_rows") - F.col("n_erase")).cast("long").alias("n_kept"),
        "bytes_total",
        "bytes_erased",
        F.when(F.col("n_erase") > 0, 1).otherwise(0).alias("rewrite_required"),
        F.round(
            F.col("n_erase").cast("double") * 100.0 / F.col("n_rows"), 6
        ).alias("erase_pct"),
    ).orderBy("partition_day")


@q(
    "dq_inclusion_dependencies",
    """WITH pairs AS (
         SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS dependency,
                (SELECT count(DISTINCT l_orderkey) FROM lineitem)::BIGINT AS n_child,
                (SELECT count(*) FROM
                   (SELECT DISTINCT l_orderkey FROM lineitem) c
                 JOIN (SELECT DISTINCT o_orderkey FROM orders) p
                   ON p.o_orderkey = c.l_orderkey)::BIGINT AS n_contained
         UNION ALL
         SELECT 'orders.o_custkey->customer.c_custkey',
                (SELECT count(DISTINCT o_custkey) FROM orders)::BIGINT,
                (SELECT count(*) FROM
                   (SELECT DISTINCT o_custkey FROM orders) c
                 JOIN (SELECT DISTINCT c_custkey FROM customer) p
                   ON p.c_custkey = c.o_custkey)::BIGINT
         UNION ALL
         SELECT 'customer.c_nationkey->nation.n_nationkey',
                (SELECT count(DISTINCT c_nationkey) FROM customer)::BIGINT,
                (SELECT count(*) FROM
                   (SELECT DISTINCT c_nationkey FROM customer) c
                 JOIN (SELECT DISTINCT n_nationkey FROM nation) p
                   ON p.n_nationkey = c.c_nationkey)::BIGINT
         UNION ALL
         SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
                (SELECT count(DISTINCT l_suppkey) FROM lineitem)::BIGINT,
                (SELECT count(*) FROM
                   (SELECT DISTINCT l_suppkey FROM lineitem) c
                 JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
                   ON p.s_suppkey = c.l_suppkey)::BIGINT
         UNION ALL
         SELECT 'orders.o_orderkey->lineitem.l_orderkey',
                (SELECT count(DISTINCT o_orderkey) FROM orders)::BIGINT,
                (SELECT count(*) FROM
                   (SELECT DISTINCT o_orderkey FROM orders) c
                 JOIN (SELECT DISTINCT l_orderkey FROM lineitem) p
                   ON p.l_orderkey = c.o_orderkey)::BIGINT
         UNION ALL
         SELECT 'customer.c_custkey->orders.o_custkey',
                (SELECT count(DISTINCT c_custkey) FROM customer)::BIGINT,
                (SELECT count(*) FROM
                   (SELECT DISTINCT c_custkey FROM customer) c
                 JOIN (SELECT DISTINCT o_custkey FROM orders) p
                   ON p.o_custkey = c.c_custkey)::BIGINT)
       SELECT dependency, n_child, n_contained,
              round(n_contained::DOUBLE * 100.0 / n_child, 6)
                AS containment_pct,
              CASE WHEN n_contained = n_child THEN 1 ELSE 0 END
                AS fk_candidate
       FROM pairs ORDER BY dependency""",
)
def dq_inclusion_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency discovery — the FK-mining half of schema
    profiling (``dq_candidate_keys`` finds PKs; this finds which column
    VALUE SETS embed in which): for six candidate column pairs, the
    fraction of the child's distinct values contained in the parent.
    100% containment = a foreign-key candidate; the deliberately
    included reverse and orphan-side pairs (orders→lineitem,
    customer→orders) measure how far from total the containment is —
    exactly what distinguishes a true FK from coincidental overlap.
    All counts are exact distinct-grain integers. Shape: each pair is
    a distinct-project + one equi-join at DISTINCT-value grain (far
    below row counts), unioned into a 6-row report; at 100 TB each
    containment check is the classic semi-join-on-distinct shape, and
    the candidate pair list comes from schema metadata, not data."""
    results = []
    specs = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
    ]
    for ct, cc, pt, pc in specs:
        child = load_table(spark, sf_dir, ct).select(cc).distinct()
        parent = load_table(spark, sf_dir, pt).select(pc).distinct()
        contained = child.join(
            parent, child[cc] == parent[pc], "left_semi"
        )
        row = child.agg(
            F.lit(f"{ct}.{cc}->{pt}.{pc}").alias("dependency"),
            F.count(F.lit(1)).cast("long").alias("n_child"),
        ).crossJoin(
            F.broadcast(
                contained.agg(
                    F.count(F.lit(1)).cast("long").alias("n_contained")
                )
            )
        )
        results.append(row)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "dependency",
        "n_child",
        "n_contained",
        F.round(
            F.col("n_contained").cast("double") * 100.0 / F.col("n_child"), 6
        ).alias("containment_pct"),
        F.when(F.col("n_contained") == F.col("n_child"), 1)
        .otherwise(0)
        .alias("fk_candidate"),
    ).orderBy("dependency")


@q(
    "dq_wasserstein_drift",
    """WITH tagged AS (
         SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                     THEN 0 ELSE 1 END AS gen,
                (floor(o_totalprice))::BIGINT AS v
         FROM orders),
       tot AS (
         SELECT sum(CASE WHEN gen = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
                sum(CASE WHEN gen = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
         FROM tagged),
       vals AS (
         SELECT v,
                sum(CASE WHEN gen = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
                sum(CASE WHEN gen = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
         FROM tagged GROUP BY v),
       cum AS (
         SELECT v,
                sum(ca) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  ::BIGINT AS cum_a,
                sum(cb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  ::BIGINT AS cum_b,
                lead(v) OVER (ORDER BY v) AS next_v
         FROM vals),
       terms AS (
         SELECT (floor(abs(cum_a::DOUBLE * tot.nb - cum_b::DOUBLE * tot.na)
                       * (next_v - v) * 1000000.0
                       / (tot.na::DOUBLE * tot.nb)))::BIGINT AS t_micro
         FROM cum CROSS JOIN tot WHERE next_v IS NOT NULL)
       SELECT (SELECT na FROM tot) AS n_pre,
              (SELECT nb FROM tot) AS n_post,
              count(*)::BIGINT AS n_value_steps,
              round(sum(t_micro)::DOUBLE / 1000000.0, 6)
                AS wasserstein_1
       FROM terms""",
)
def dq_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-Wasserstein (earth-mover) drift between the pre-/post-1998
    order price distributions — the metric that reports HOW FAR the
    distribution moved in price units, complementing ``dq_ks_drift``
    (sup-norm: did it move) and ``dq_psi_drift`` (binned surprise):
    W₁ = ∫|F_A − F_B| dx evaluated exactly on the value grain as
    Σ |cumA·n_B − cumB·n_A|·gap/(n_A·n_B), each term micro-floored to
    an integer BEFORE the cross-value sum (the only summation of
    non-integers in the formula). Shape: one (value, gen) partial agg,
    cumulative + lead windows on the DISTINCT-VALUE frame (price
    cardinality, far below rows), 1-row reduce — the same
    distributed-ECDF discipline as the KS query; at 100 TB only the
    first aggregation sees data."""
    o = load_table(spark, sf_dir, "orders")
    tagged = o.select(
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("gen"),
        F.floor(F.col("o_totalprice")).cast("long").alias("v"),
    )
    tot = tagged.agg(
        F.sum(F.when(F.col("gen") == 0, 1).otherwise(0))
        .cast("long")
        .alias("na"),
        F.sum(F.when(F.col("gen") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nb"),
    )
    vals = tagged.groupBy("v").agg(
        F.sum(F.when(F.col("gen") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("gen") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_lead = Window.orderBy("v")
    cum = vals.select(
        "v",
        F.sum("ca").over(w_cum).cast("long").alias("cum_a"),
        F.sum("cb").over(w_cum).cast("long").alias("cum_b"),
        F.lead("v").over(w_lead).alias("next_v"),
    )
    terms = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("next_v").isNotNull())
        .select(
            F.floor(
                F.abs(
                    F.col("cum_a").cast("double") * F.col("nb")
                    - F.col("cum_b").cast("double") * F.col("na")
                )
                * (F.col("next_v") - F.col("v"))
                * 1000000.0
                / (F.col("na").cast("double") * F.col("nb"))
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    return terms.crossJoin(F.broadcast(tot)).agg(
        F.max("na").alias("n_pre"),
        F.max("nb").alias("n_post"),
        F.count(F.lit(1)).cast("long").alias("n_value_steps"),
        F.round(F.sum("t_micro").cast("double") / 1000000.0, 6).alias(
            "wasserstein_1"
        ),
    )
