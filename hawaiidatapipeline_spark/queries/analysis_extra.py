"""Temporal, graph, and statistical analysis operators — round-4 batch.

Batch gap-sessionization, the forward/nearest as-of join variants,
triangle counting over the co-purchase graph, SQL-standard regression
aggregates, and cross-document duplicated-span (word n-gram) detection.
Every query is pure DataFrame/codegen — no Python UDFs — and each SQL
oracle reproduces the exact semantics in DuckDB (forward/nearest as-of
via DuckDB's directional ASOF JOIN; n-grams via LATERAL range + list
slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_SESSION_GAP_S = 1800  # 30 min of inactivity starts a new session


@q(
    "events_sessionize_gap",
    f"""WITH t AS (
         SELECT user_id, ts, epoch(ts) AS es,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       s AS (
         SELECT user_id, es,
                (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING))::BIGINT AS session_seq
         FROM t)
       SELECT user_id, session_seq, count(*) AS n_events,
              round(max(es) - min(es), 6) AS duration_s
       FROM s GROUP BY user_id, session_seq
       ORDER BY user_id, session_seq""",
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (the batch twin of the
    streaming ``session_window`` query): lag over a per-user window flags
    gaps >30 min, a running sum numbers the sessions, and a second
    aggregate summarizes each session. Two window passes + one groupBy
    over the SAME (user_id) partitioning — one shuffle total; at scale
    this is the standard O(n log n) per-user sort, no state explosion."""
    e = load_table(spark, sf_dir, "events")
    es = F.col("ts").cast("double")
    w = Window.partitionBy("user_id").orderBy("ts")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | ((es - F.lag(es).over(w)) > _SESSION_GAP_S),
        1,
    ).otherwise(0)
    return (
        e.select("user_id", "ts", es.alias("es"))
        .withColumn("new_sess", new_sess)
        .withColumn("session_seq", F.sum("new_sess").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("es") - F.min("es"), 6).alias("duration_s"),
        )
        .orderBy("user_id", "session_seq")
    )


@q(
    "join_asof_forward",
    """SELECT p.event_id AS purchase_id, p.user_id,
              c.event_id AS next_click_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       ON p.user_id = c.user_id AND p.ts <= c.ts""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the user's EARLIEST click
    at-or-after it — the mirror of ``join_asof`` (queries/joins.py:247).
    Same union-then-window shape with the frame flipped to currentRow→
    unboundedFollowing and ``first(..., ignorenulls)``; purchases sort
    BEFORE equal-ts clicks (tag order) so at-or-after is inclusive.
    Still one shuffle on user_id — no pairwise explosion at scale."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(1).alias("tag"), F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(0).alias("tag"), F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases)
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.withColumn("next_click_id", F.first("click_id", ignorenulls=True).over(wf))
        .filter(F.col("purchase_id").isNotNull())
        .select("purchase_id", "user_id", "next_click_id")
    )


@q(
    "join_asof_nearest",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
            c AS (SELECT * FROM events WHERE event_type = 'click'),
       b AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts,
                    c.event_id AS b_id, c.ts AS b_ts
             FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.ts >= c.ts),
       f AS (SELECT p.event_id AS purchase_id,
                    c.event_id AS f_id, c.ts AS f_ts
             FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.ts <= c.ts)
       SELECT b.purchase_id, b.user_id,
              CASE WHEN b_id IS NULL THEN f_id
                   WHEN f_id IS NULL THEN b_id
                   WHEN epoch(b.ts) - epoch(b_ts)
                        <= epoch(f_ts) - epoch(b.ts) THEN b_id
                   ELSE f_id END AS nearest_click_id
       FROM b JOIN f ON b.purchase_id = f.purchase_id""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: the click closest in time to each purchase, in
    EITHER direction (ties prefer the earlier click). One tagged union,
    then backward-last and forward-first window columns over the same
    user_id partitioning (two sorts, one exchange — Catalyst reuses the
    shuffle), and a closest-wins CASE. The oracle states the same thing
    as two directional DuckDB ASOF joins stitched with the same CASE."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(1).alias("is_purchase"), F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(2).alias("is_purchase"), F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases).withColumn(
        "click_es", F.when(F.col("click_id").isNotNull(), F.col("ts").cast("double"))
    )
    # backward: equal-ts clicks sort before the purchase (1 < 2) → included
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: flip the tiebreak so equal-ts clicks sort after → included
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_purchase").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    es = F.col("ts").cast("double")
    out = (
        merged.withColumn("b_id", F.last("click_id", ignorenulls=True).over(wb))
        .withColumn("b_es", F.last("click_es", ignorenulls=True).over(wb))
        .withColumn("f_id", F.first("click_id", ignorenulls=True).over(wf))
        .withColumn("f_es", F.first("click_es", ignorenulls=True).over(wf))
        .filter(F.col("purchase_id").isNotNull())
    )
    nearest = (
        F.when(F.col("b_id").isNull(), F.col("f_id"))
        .when(F.col("f_id").isNull(), F.col("b_id"))
        .when((es - F.col("b_es")) <= (F.col("f_es") - es), F.col("b_id"))
        .otherwise(F.col("f_id"))
    )
    return out.select(
        "purchase_id", "user_id", nearest.alias("nearest_click_id")
    )


@q(
    "graph_triangle_count",
    """WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
       e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2),
       deg AS (SELECT node, count(*) AS deg FROM (SELECT u AS node FROM e0
               UNION ALL SELECT v AS node FROM e0) nn GROUP BY node),
       e AS (SELECT CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
                         THEN e0.u ELSE e0.v END AS u,
                    CASE WHEN (du.deg, e0.u) < (dv.deg, e0.v)
                         THEN e0.v ELSE e0.u END AS v
             FROM e0 JOIN deg du ON du.node = e0.u
                     JOIN deg dv ON dv.node = e0.v)
       SELECT (SELECT count(DISTINCT u) FROM (SELECT u FROM e
               UNION ALL SELECT v FROM e) nn(u)) AS n_nodes,
              (SELECT count(*) FROM e) AS n_edges,
              (SELECT count(*) FROM e e1
               JOIN e e2 ON e2.u = e1.v
               JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the undirected part co-purchase graph (edges =
    part pairs sharing ≥2 orders, same graph as graph_pagerank_copurchase).

    Edges are oriented LOW-DEGREE → HIGH-DEGREE (ties broken by key), a
    total order over nodes, so each triangle is enumerated exactly once by
    the wedge join e1(u,v)⋈e2(v,w) closed by e3(u,w). Degree orientation
    is the standard scale fix (Cohen 2009 / Suri-Vassilvitskii "Counting
    Triangles and the Curse of the Last Reducer"): every node's OUT-degree
    in the oriented graph is O(sqrt(m)) on any graph (and bounded by the
    arboricity), so the wedge fan-out per node — the e1⋈e2 blow-up — is
    bounded even when a raw-key orientation would leave a hub with millions
    of out-edges. The aggregate counts are orientation-invariant, so the
    oracle mirrors the same (degree, key) reorientation purely for plan
    parity. The wedge join itself is the standard two-hop equi-join that
    AQE handles with one shuffle per hop."""
    from hawaiidatapipeline_spark.operators.graph import (
        copurchase_edges,
        orient_edges_by_degree,
    )

    li = load_table(spark, sf_dir, "lineitem")
    # collect+expand edge build (ONE orderkey shuffle, ~2.5× the self-join
    # speed at sf0.1 — operators/graph.py); degree-reoriented, then
    # materialized once for the three wedge-join branches
    # materialize the raw edge set FIRST: the degree aggregation and both
    # orientation join inputs consume it (3 scans), and the oriented set
    # again for the three wedge-join branches
    e0 = materialize(copurchase_edges(li))
    edges = materialize(orient_edges_by_degree(e0))
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .agg(F.countDistinct("node").alias("n_nodes"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.join(n_edges).join(tri).select("n_nodes", "n_edges", "n_triangles")


@q(
    "agg_regression",
    """SELECT l_returnflag,
              round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
              round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
              round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
              round(corr(l_extendedprice, l_quantity), 6) AS pearson_r,
              count(*) AS n
       FROM lineitem
       GROUP BY l_returnflag
       ORDER BY l_returnflag""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard linear-regression aggregates (price ~ quantity per
    return flag): regr_slope / regr_intercept / regr_r2 / corr all reduce
    to the same five running sums (n, Σx, Σy, Σxy, Σx²) that Spark
    partial-aggregates map-side — a single narrow shuffle regardless of
    data volume, the cheapest possible distributed fit."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("pearson_r"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "llm_dupspan_ngram",
    """WITH g AS (
         SELECT d.doc_id, array_to_string(d.ws[t.i:t.i+3], ' ') AS gram
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
         LATERAL (SELECT unnest(range(1, greatest(len(d.ws) - 2, 1))) AS i) t)
       SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
       FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
       ORDER BY n_docs DESC, n_occurrences DESC, gram
       LIMIT 25""",
)
def llm_dupspan_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span detection — the shingle-table core
    of exact-substring training-data dedup (word 4-grams standing in for
    the suffix-array pass): every position's 4-gram, grouped corpus-wide,
    keeping spans seen in ≥2 documents. The gram expansion is pure
    codegen (``transform(sequence(...))`` + ``slice`` — no Python, no
    explode-then-window), so the only shuffle is the final two-phase
    aggregate on the gram hash. At 100 TB this is the linear inverted-
    index build; the top-k tail keeps the result bounded."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                # short-doc guard (ADVICE r11): sequence(1, 0) in Spark
                # steps -1 and yields [1, 0], making slice() throw on
                # docs under 4 tokens — the CASE mirrors the oracle's
                # empty-range semantics (zero grams)
                "CASE WHEN size(split(text, ' ')) >= 4"
                " THEN transform(sequence(1, size(split(text, ' ')) - 3),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 4)))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    # two-level aggregate instead of countDistinct+count in one pass: the
    # mixed form plans an Expand that doubles every gram row before the
    # shuffle, while (gram, doc_id) partial counts then a plain gram-level
    # count/sum carry the same information with half the shuffle input —
    # ~25% faster at sf0.1, identical result
    per_doc = grams.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_doc.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_c").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("n_occurrences").desc(), "gram")
        .limit(25)
    )


@q(
    "fn_struct_ops",
    """SELECT o_orderkey,
              struct_pack(status := o_orderstatus,
                          priority := o_orderpriority).status AS status_field,
              (struct_pack(a := o_orderstatus, b := o_orderpriority)
               = struct_pack(a := 'F', b := '1-URGENT')) AS is_urgent_f,
              struct_pack(lo := least(o_totalprice, 50000.0),
                          hi := greatest(o_totalprice, 50000.0)).lo AS lo_price
       FROM orders
       ORDER BY o_orderkey
       LIMIT 30""",
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, and whole-struct equality —
    the nested-type scalar surface (maps/arrays are covered by fn_map /
    fn_array). Struct equality compiles to field-wise codegen compares;
    field access after construction collapses at optimization time
    (Catalyst's SimplifyExtractValueOps), so none of this survives as
    actual nested-object allocation in the executed plan."""
    o = load_table(spark, sf_dir, "orders")
    st = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    eq = F.struct(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ) == F.struct(F.lit("F").alias("a"), F.lit("1-URGENT").alias("b"))
    rng = F.struct(
        F.least(F.col("o_totalprice"), F.lit(50000.0)).alias("lo"),
        F.greatest(F.col("o_totalprice"), F.lit(50000.0)).alias("hi"),
    )
    return (
        o.select(
            "o_orderkey",
            st.getField("status").alias("status_field"),
            eq.alias("is_urgent_f"),
            rng.getField("lo").alias("lo_price"),
        )
        .orderBy("o_orderkey")
        .limit(30)
    )


@q(
    "join_asof_tolerance",
    """SELECT p.event_id AS purchase_id, p.user_id,
              CASE WHEN epoch(p.ts) - epoch(c.ts) <= 3600
                   THEN c.event_id END AS recent_click_id
       FROM (SELECT * FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
       ON p.user_id = c.user_id AND p.ts >= c.ts""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match tolerance (pandas merge_asof's
    ``tolerance=``): the latest click at-or-before each purchase counts
    only when it is ≤1 h old — stale matches become NULL instead of
    silently attributing a day-old click. Same single-shuffle
    union+window shape as join_asof with the click timestamp carried
    beside its id; the tolerance is one codegen CASE at the end."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"),
        F.lit(0).alias("tag"), F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("tag"), F.col("event_id").alias("purchase_id"),
    )
    merged = clicks.unionByName(purchases).withColumn(
        "click_es",
        F.when(F.col("click_id").isNotNull(), F.col("ts").cast("double")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("b_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("b_es", F.last("click_es", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
    )
    within = (F.col("ts").cast("double") - F.col("b_es")) <= 3600
    return out.select(
        F.col("purchase_id"),
        "user_id",
        F.when(within, F.col("b_id")).alias("recent_click_id"),
    )


@q(
    "ts_outage_detection",
    """WITH gaps AS (
         SELECT event_type, ts,
                lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                  AS prev_ts
         FROM events)
       SELECT event_type, prev_ts AS outage_start, ts AS outage_end,
              round(epoch(ts) - epoch(prev_ts), 6) AS gap_s
       FROM gaps
       WHERE epoch(ts) - epoch(prev_ts) > 3600
       ORDER BY event_type, outage_start""",
)
def ts_outage_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-outage detection: gaps >1 h between consecutive events of the
    same type — the monitoring query behind dq_freshness's point-in-time
    flag (freshness says 'stale NOW'; this reconstructs every historical
    outage window with its duration). One lag over the per-type timeline;
    partitioning by event_type keeps the sort distributed — a single
    global timeline would need range repartitioning by time instead,
    which is the documented variant for one-series data."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = e.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev_ts")
    )
    gap_s = F.col("ts").cast("double") - F.col("prev_ts").cast("double")
    return (
        gaps.filter(gap_s > 3600)
        .select(
            "event_type",
            F.col("prev_ts").alias("outage_start"),
            F.col("ts").alias("outage_end"),
            F.round(gap_s, 6).alias("gap_s"),
        )
        .orderBy("event_type", "outage_start")
    )


@q(
    "llm_dupspan_removal_plan",
    """WITH g AS (
         SELECT d.doc_id, t.i AS start, t.i + 3 AS fin,
                array_to_string(d.ws[t.i:t.i+3], ' ') AS gram
         FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
         LATERAL (SELECT unnest(range(1, greatest(len(d.ws) - 2, 1))) AS i) t),
       pd AS (SELECT DISTINCT gram, doc_id FROM g),
       dup AS (SELECT gram FROM pd GROUP BY gram HAVING count(*) >= 2),
       m AS (SELECT g.doc_id, g.start, g.fin FROM g JOIN dup USING (gram)),
       c AS (SELECT doc_id, start, fin,
                    max(fin) OVER (PARTITION BY doc_id ORDER BY start, fin
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pmax
             FROM m),
       cov AS (SELECT doc_id, count(*)::BIGINT AS n_dup_spans,
                      sum(greatest(0, fin - greatest(coalesce(pmax, 0),
                                                     start - 1)))::BIGINT
                        AS tokens_covered
               FROM c GROUP BY 1),
       nt AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents)
       SELECT v.doc_id, n.n_tokens, v.n_dup_spans, v.tokens_covered,
              floor(1000.0 * (n.n_tokens - v.tokens_covered)
                    / n.n_tokens)::BIGINT AS retention_milli
       FROM cov v JOIN nt n USING (doc_id)
       ORDER BY v.tokens_covered DESC, v.doc_id LIMIT 100""",
)
def llm_dupspan_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of exact-substring dedup (Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better"):
    llm_dupspan_ngram finds the cross-document duplicated 4-gram spans;
    this plans the edit — per document, the UNION of covered token
    intervals (overlapping spans merged by a running-max window: each
    span contributes max(0, end − max(prev_max_end, start−1)) new
    tokens), yielding tokens-to-remove and the retention ratio the
    cleaned corpus would keep. Top-100 most-affected documents. Scale:
    gram table is the linear inverted-index build; the dup-gram join is
    gram-keyed; the interval union is one per-document ordered window
    (doc-length bounded). Integer milli-ratio, no float sums."""
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                # short-doc guard (ADVICE r11): sequence(1, 0) in Spark
                # steps -1 and yields [1, 0], making slice() throw on
                # docs under 4 tokens — the CASE mirrors the oracle's
                # empty-range semantics (zero grams)
                "CASE WHEN size(split(text, ' ')) >= 4"
                " THEN transform(sequence(1, size(split(text, ' ')) - 3),"
                " i -> concat_ws(' ', slice(split(text, ' '), i, 4)))"
                " ELSE array() END"
            )
        ).alias("p", "gram"),
    ).select("doc_id", (F.col("p") + 1).alias("start"), "gram")
    pd_ = spans.select("gram", "doc_id").distinct()
    dup = (
        pd_.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    m = spans.join(dup, "gram").select(
        "doc_id", "start", (F.col("start") + 3).alias("fin")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start", "fin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = m.withColumn("pmax", F.max("fin").over(w))
    cov = (
        c.select(
            "doc_id",
            F.greatest(
                F.lit(0),
                F.col("fin")
                - F.greatest(F.coalesce(F.col("pmax"), F.lit(0)), F.col("start") - 1),
            ).alias("contrib"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum("contrib").cast("long").alias("tokens_covered"),
        )
    )
    nt = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return (
        cov.join(nt, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "tokens_covered",
            F.floor(
                1000.0
                * (F.col("n_tokens") - F.col("tokens_covered"))
                / F.col("n_tokens")
            )
            .cast("long")
            .alias("retention_milli"),
        )
        .orderBy(F.col("tokens_covered").desc(), "doc_id")
        .limit(100)
    )
