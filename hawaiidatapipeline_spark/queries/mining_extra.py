"""Corpus-mining and dynamics extras (round 7).

Deeper LLM-corpus machinery and exact dynamical analyses: the BPE
training inner step (adjacent-pair counting), bigram language-model
scoring as an OOD gate, stopword profiling, exact single-changepoint
detection over daily rates, a fixed-point Markov stationary
distribution, and bounded k-core peeling of the co-purchase graph.
Every float follows the house determinism contract (SURVEY.md §7 risk
1): exact integer sums first; IEEE doubles only in final closed-form
expressions (÷ and × of exactly-representable ints are correctly
rounded, hence bit-identical across engines); ln terms floored to
integer micro-units before any aggregation (the llm_zipf_slope
pattern, residual libm note there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "llm_bpe_pair_counts",
    """WITH w AS (
         SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
       ws AS (SELECT w FROM w WHERE len(w) >= 2),
       p AS (
         SELECT substring(w, CAST(i AS INT), 2) AS pair
         FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM ws))
       SELECT pair, count(*)::BIGINT AS n
       FROM p GROUP BY pair
       ORDER BY n DESC, pair LIMIT 50""",
)
def llm_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner step: corpus-wide frequencies of adjacent
    character pairs within words — the argmax of this table is the next
    merge a byte-pair-encoding tokenizer learns. One explode per
    character position (O(total chars), pure codegen via
    transform/sequence — no Python), then a two-phase hash aggregate
    with map-side partial combine; top-50 under the total order
    (n DESC, pair). At 100 TB the pair table is ≤ alphabet² rows after
    the partial agg, so the shuffle is trivially small — the scan
    dominates, exactly as it should."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(50)
    )


@q(
    "llm_bigram_logprob",
    """WITH docs AS (
         SELECT doc_id, string_split(lower(text), ' ') AS a FROM documents),
       occ AS (
         SELECT doc_id, a[CAST(i AS INT)] AS w1,
                a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS bg
         FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 1)) AS i
               FROM docs)),
       bgc AS (SELECT bg, w1, count(*)::BIGINT AS cb FROM occ GROUP BY bg, w1),
       pfc AS (SELECT w1, count(*)::BIGINT AS cp FROM occ GROUP BY w1),
       vocab AS (
         SELECT count(DISTINCT t)::BIGINT AS v
         FROM (SELECT unnest(a) AS t FROM docs)),
       term AS (
         SELECT bgc.bg,
                (floor((ln(bgc.cb + 1) - ln(pfc.cp + vocab.v)) * 1000000))::BIGINT
                  AS t_micro
         FROM bgc JOIN pfc USING (w1) CROSS JOIN vocab),
       per_doc AS (
         SELECT o.doc_id, count(*)::BIGINT AS n_bigrams,
                sum(t.t_micro)::BIGINT AS total_micro
         FROM occ o JOIN term t USING (bg) GROUP BY o.doc_id)
       SELECT doc_id, n_bigrams, total_micro,
              round(total_micro::DOUBLE / n_bigrams / 1000000.0, 6) AS avg_logprob
       FROM per_doc ORDER BY avg_logprob, doc_id LIMIT 50""",
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring as an out-of-distribution gate: an
    add-one-smoothed bigram LM is fit on the corpus itself and every doc
    scored by its average log P(w_i | w_{i-1}); the bottom-50 (most
    surprising) docs are the OOD/garbage review queue. Each bigram
    type's log-term floor((ln(c_bg+1) − ln(c_prefix+V))·1e6) is an
    integer micro-unit, so the per-doc sum is exact 64-bit arithmetic at
    any parallelism; only the final avg division is floating point.
    Shape: one token explode, two hash aggregates for the model, one
    equi-join of occurrences to bigram terms (shuffle on the bigram
    string — linear), scalar vocab broadcast. Residual libm note:
    stats_extra.llm_zipf_slope."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("a"))
    occ = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(a, 1, greatest(size(a) - 1, 0)), "
                "(x, i) -> struct(x AS w1, "
                "concat(x, ' ', element_at(a, i + 2)) AS bg))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.bg")
    bgc = occ.groupBy("bg", "w1").agg(F.count(F.lit(1)).alias("cb"))
    pfc = occ.groupBy("w1").agg(F.count(F.lit(1)).alias("cp"))
    vocab = (
        docs.select(F.explode("a").alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    term = (
        bgc.join(pfc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                (F.log(F.col("cb") + 1) - F.log(F.col("cp") + F.col("v")))
                * F.lit(1000000.0)
            ).cast("bigint").alias("t_micro"),
        )
    )
    per_doc = (
        occ.join(term, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("t_micro").alias("total_micro"),
        )
    )
    avg = (
        F.col("total_micro").cast("double")
        / F.col("n_bigrams")
        / F.lit(1000000.0)
    )
    return (
        per_doc.select(
            "doc_id", "n_bigrams", "total_micro",
            F.round(avg, 6).alias("avg_logprob"),
        )
        .orderBy("avg_logprob", "doc_id")
        .limit(50)
    )


_STOPWORDS = ("a", "the", "of", "and", "in", "to", "is")
_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in _STOPWORDS) + ")"


@q(
    "llm_stopword_profile",
    f"""WITH tok AS (
         SELECT source, unnest(string_split(lower(text), ' ')) AS t
         FROM documents)
       SELECT source,
              count(*)::BIGINT AS n_tokens,
              count(*) FILTER (WHERE t IN {_STOP_SQL})::BIGINT AS n_stopwords,
              count(DISTINCT t) FILTER (WHERE t IN {_STOP_SQL})::BIGINT
                AS n_distinct_stopwords,
              round(count(*) FILTER (WHERE t IN {_STOP_SQL})::DOUBLE
                    / count(*), 6) AS stop_ratio
       FROM tok GROUP BY source ORDER BY source""",
)
def llm_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stopword profile — the cheap fluency signal corpus
    filters use (natural prose carries a stable stopword mass; keyword
    spam and tables carry almost none). One token explode + one hash
    aggregate with map-side combine; the ratio is an exact-int division
    (correctly-rounded IEEE, identical on both engines)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    is_stop = F.col("t").isin(*_STOPWORDS)
    return (
        tok.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(is_stop, 1)).alias("n_stopwords"),
            F.countDistinct(F.when(is_stop, F.col("t"))).alias(
                "n_distinct_stopwords"
            ),
            F.round(
                F.count(F.when(is_stop, 1)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("stop_ratio"),
        )
        .orderBy("source")
    )


@q(
    "ts_changepoint_binary",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       cum AS (
         SELECT event_type, d,
                (sum(n) OVER (PARTITION BY event_type ORDER BY d
                              ROWS UNBOUNDED PRECEDING))::BIGINT AS s1,
                (row_number() OVER (PARTITION BY event_type ORDER BY d))::BIGINT
                  AS k
         FROM daily),
       tot AS (
         SELECT event_type, sum(n)::BIGINT AS s, count(*)::BIGINT AS nd
         FROM daily GROUP BY event_type),
       scored AS (
         SELECT c.event_type, c.d, c.k, t.nd, c.s1, t.s - c.s1 AS s2,
                (c.s1::DOUBLE * c.s1::DOUBLE) / c.k::DOUBLE
                  + ((t.s - c.s1)::DOUBLE * (t.s - c.s1)::DOUBLE)
                    / (t.nd - c.k)::DOUBLE
                  - (t.s::DOUBLE * t.s::DOUBLE) / t.nd::DOUBLE AS gain
         FROM cum c JOIN tot t USING (event_type)
         WHERE c.k < t.nd),
       best AS (
         SELECT *, row_number() OVER (PARTITION BY event_type
                                      ORDER BY gain DESC, d) AS rnk
         FROM scored)
       SELECT event_type, d AS change_day, nd AS n_days,
              round(s1::DOUBLE / k, 6) AS mean_before,
              round(s2::DOUBLE / (nd - k), 6) AS mean_after,
              round(gain, 6) AS sse_gain
       FROM best WHERE rnk = 1 ORDER BY event_type""",
)
def ts_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact single-changepoint detection (binary-segmentation step 1)
    over each event type's daily rate: the split day maximizing the SSE
    reduction S1²/k + S2²/(n−k) − S²/n, computed from prefix sums. All
    inputs to the objective are exact integers (≪ 2⁵³, so their double
    images are exact; at 100 TB rescale counts before squaring);
    divisions and products of exact doubles are correctly rounded,
    hence bit-identical across engines, making the argmax + (gain DESC,
    day) tiebreak deterministic. One window cumsum + a broadcast join
    of per-type totals — no quadratic split scan."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("s1"),
        F.row_number().over(w).cast("bigint").alias("k"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("s"), F.count(F.lit(1)).alias("nd")
    )
    s1d, kd = F.col("s1").cast("double"), F.col("k").cast("double")
    s2 = F.col("s") - F.col("s1")
    s2d, nkd = s2.cast("double"), (F.col("nd") - F.col("k")).cast("double")
    sd, ndd = F.col("s").cast("double"), F.col("nd").cast("double")
    scored = (
        cum.join(F.broadcast(tot), "event_type")
        .filter(F.col("k") < F.col("nd"))
        .select(
            "event_type", "d", "k", "nd", "s1", s2.alias("s2"),
            (s1d * s1d / kd + s2d * s2d / nkd - sd * sd / ndd).alias("gain"),
        )
    )
    wb = Window.partitionBy("event_type").orderBy(F.col("gain").desc(), "d")
    return (
        scored.withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("d").alias("change_day"),
            F.col("nd").alias("n_days"),
            F.round(F.col("s1").cast("double") / F.col("k"), 6).alias(
                "mean_before"
            ),
            F.round(
                F.col("s2").cast("double") / (F.col("nd") - F.col("k")), 6
            ).alias("mean_after"),
            F.round("gain", 6).alias("sse_gain"),
        )
        .orderBy("event_type")
    )


@q(
    "events_markov_stationary",
    """WITH seq AS (
         SELECT user_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       tm AS (
         SELECT prev_type AS f, event_type AS t, count(*)::BIGINT AS n
         FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       rt AS (SELECT f, sum(n)::BIGINT AS tot FROM tm GROUP BY f),
       states AS (SELECT DISTINCT event_type AS s FROM events),
       p0 AS (SELECT s, 1000000 // (SELECT count(*) FROM states) AS p
              FROM states),
       p1 AS (SELECT tm.t AS s, sum((p0.p * tm.n) // rt.tot)::BIGINT AS p
              FROM p0 JOIN tm ON tm.f = p0.s JOIN rt ON rt.f = tm.f
              GROUP BY tm.t),
       p2 AS (SELECT tm.t AS s, sum((p1.p * tm.n) // rt.tot)::BIGINT AS p
              FROM p1 JOIN tm ON tm.f = p1.s JOIN rt ON rt.f = tm.f
              GROUP BY tm.t),
       p3 AS (SELECT tm.t AS s, sum((p2.p * tm.n) // rt.tot)::BIGINT AS p
              FROM p2 JOIN tm ON tm.f = p2.s JOIN rt ON rt.f = tm.f
              GROUP BY tm.t)
       SELECT states.s AS event_type,
              coalesce(p3.p, 0)::BIGINT AS p_micro,
              round(coalesce(p3.p, 0)::DOUBLE / 1000000.0, 6) AS p
       FROM states LEFT JOIN p3 ON p3.s = states.s
       ORDER BY event_type""",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain (where user
    journeys spend their time in the long run), by three synchronous
    power-iteration steps π′ = πP from the uniform start, entirely in
    integer micro-units with floor division — the pagerank_fixed_point
    recipe at matrix scale |types|² ≤ 25, so every join is a broadcast
    and each step's sum is exact 64-bit arithmetic. The transition
    counts reuse the events_transition_matrix convention (per-user
    (ts, event_id) order). Three steps are unrolled identically in both
    engines — no convergence action needed at this state-space size."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    tm = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("f"), F.col("event_type").alias("t"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rt = tm.groupBy("f").agg(F.sum("n").alias("tot"))
    states = e.select(F.col("event_type").alias("s")).distinct()
    n_states = states.agg(F.count(F.lit(1)).alias("ns"))
    p = states.crossJoin(F.broadcast(n_states)).select(
        "s", F.expr("div(1000000, ns)").alias("p")
    )
    tmr = F.broadcast(tm.join(rt, "f"))
    for _ in range(3):
        p = (
            p.join(tmr, p["s"] == tmr["f"])
            .select(
                F.col("t").alias("s"),
                F.expr("div(p * n, tot)").alias("contrib"),
            )
            .groupBy("s")
            .agg(F.sum("contrib").alias("p"))
        )
    return (
        states.join(p, "s", "left")
        .select(
            F.col("s").alias("event_type"),
            F.coalesce(F.col("p"), F.lit(0)).cast("bigint").alias("p_micro"),
            F.round(
                F.coalesce(F.col("p"), F.lit(0)).cast("double") / 1000000.0, 6
            ).alias("p"),
        )
        .orderBy("event_type")
    )


def _kcore_sql(k: int, rounds: int) -> str:
    ctes = [
        """e0 AS (
         WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64)
         SELECT a.l_partkey AS u, b.l_partkey AS v
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""k{r} AS (
         SELECT node FROM (
           SELECT node, count(*) AS deg
           FROM (SELECT u AS node FROM e{p} UNION ALL SELECT v FROM e{p})
           GROUP BY node)
         WHERE deg >= {k})"""
        )
        ctes.append(
            f"""e{r} AS (
         SELECT u, v FROM e{p}
         WHERE u IN (SELECT node FROM k{r})
           AND v IN (SELECT node FROM k{r}))"""
        )
    rows = " UNION ALL ".join(
        f"SELECT {r} AS round, (SELECT count(*) FROM k{r})::BIGINT AS n_nodes, "
        f"(SELECT count(*) FROM e{r})::BIGINT AS n_edges"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n       ".join(ctes) + f" {rows} ORDER BY round"


@q("graph_kcore_peel", _kcore_sql(3, 4))
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core peeling (k=3, 4 rounds) of the part co-purchase
    graph: each round simultaneously removes every node with current
    degree < k and reports the surviving (nodes, edges) — the curve that
    tells you whether the graph has a dense core worth mining or decays
    to nothing. Per round: one degree aggregate + two semi-joins against
    the survivor set, with the edge set reliably re-materialized
    (operators/materialize.py) so the plan stays flat; the fixed round
    count is unrolled identically in the oracle (full peel-to-fixpoint
    at 100 TB would iterate the same pair until the observed removal
    count hits zero, exactly the connected_components Observation
    pattern)."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))
    # r15 note: an Observation-based variant (counts riding per-round
    # keep/edge materializations) was built and MEASURED SLOWER at sf0.1
    # (3.18 vs 2.19 best-pass): the graph is tiny, the duplicated keep
    # subtrees below are already shared by AQE exchange reuse at runtime,
    # and the extra per-round checkpoint job + Observation polling cost
    # more than the recomputation they saved. Kept in the join form.
    out = None
    for r in range(1, 5):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 3).select("node")
        edges = materialize(
            edges.join(keep, edges["u"] == keep["node"], "left_semi").join(
                keep, edges["v"] == keep["node"], "left_semi"
            )
        )
        row = (
            keep.agg(F.count(F.lit(1)).alias("n_nodes"))
            .crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))
            .select(
                F.lit(r).cast("int").alias("round"), "n_nodes", "n_edges"
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("round")


@q(
    "dq_psi_drift",
    """WITH binned AS (
         SELECT lang, doc_id % 2 AS half, n_chars // 100 AS bin
         FROM documents),
       a AS (SELECT lang, bin, count(*)::BIGINT AS ca FROM binned
             WHERE half = 0 GROUP BY 1, 2),
       b AS (SELECT lang, bin, count(*)::BIGINT AS cb FROM binned
             WHERE half = 1 GROUP BY 1, 2),
       bins AS (SELECT lang, bin FROM a UNION SELECT lang, bin FROM b),
       tot AS (
         SELECT lang,
                sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
                sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
         FROM binned GROUP BY lang),
       terms AS (
         SELECT bins.lang,
                (floor(((coalesce(a.ca, 0) + 1)::DOUBLE / (t.na + 1)
                        - (coalesce(b.cb, 0) + 1)::DOUBLE / (t.nb + 1))
                       * ln(((coalesce(a.ca, 0) + 1)::DOUBLE * (t.nb + 1))
                            / ((coalesce(b.cb, 0) + 1)::DOUBLE * (t.na + 1)))
                       * 1000000))::BIGINT AS t_micro
         FROM bins
         LEFT JOIN a ON a.lang = bins.lang AND a.bin = bins.bin
         LEFT JOIN b ON b.lang = bins.lang AND b.bin = bins.bin
         JOIN tot t ON t.lang = bins.lang)
       SELECT lang, count(*)::BIGINT AS n_bins,
              sum(t_micro)::BIGINT AS psi_micro,
              round(sum(t_micro)::DOUBLE / 1000000.0, 6) AS psi
       FROM terms GROUP BY lang ORDER BY lang""",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability index (PSI) of the doc-length distribution
    between two deterministic corpus halves (doc_id parity) per lang —
    the standard drift gate between a training snapshot and a refresh
    (PSI < 0.1 stable, > 0.25 action). Lengths bin at 100 chars with
    add-one smoothing so empty bins stay finite. Each bin's term
    (Δp · ln ratio) is computed from exact integer counts via
    correctly-rounded IEEE ops, floored to integer micro-units, then
    summed exactly — partition order cannot move the result (the
    agg_entropy recipe; residual libm ln note in stats_extra). Two hash
    aggregates + a |langs × bins| join — shuffle independent of corpus
    size."""
    d = load_table(spark, sf_dir, "documents")
    binned = d.select(
        "lang",
        (F.col("doc_id") % 2).alias("half"),
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("bin"),
    )
    a = (
        binned.filter(F.col("half") == 0)
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        binned.filter(F.col("half") == 1)
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    bins = a.select("lang", "bin").union(b.select("lang", "bin")).distinct()
    tot = binned.groupBy("lang").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
    )
    ca1 = (F.coalesce(F.col("ca"), F.lit(0)) + 1).cast("double")
    cb1 = (F.coalesce(F.col("cb"), F.lit(0)) + 1).cast("double")
    na1, nb1 = (F.col("na") + 1).cast("double"), (F.col("nb") + 1).cast("double")
    t_micro = F.floor(
        (ca1 / na1 - cb1 / nb1)
        * F.log((ca1 * nb1) / (cb1 * na1))
        * F.lit(1000000.0)
    ).cast("bigint")
    terms = (
        bins.join(a, ["lang", "bin"], "left")
        .join(b, ["lang", "bin"], "left")
        .join(F.broadcast(tot), "lang")
        .select("lang", t_micro.alias("t_micro"))
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("t_micro").alias("psi_micro"),
            F.round(F.sum("t_micro").cast("double") / 1000000.0, 6).alias("psi"),
        )
        .orderBy("lang")
    )


@q(
    "llm_bigram_cond_entropy",
    """WITH docs AS (
         SELECT lang, string_split(lower(text), ' ') AS a FROM documents),
       occ AS (
         SELECT lang, a[CAST(i AS INT)] AS w1,
                a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS bg
         FROM (SELECT lang, a, unnest(generate_series(1, len(a) - 1)) AS i
               FROM docs)),
       bgc AS (SELECT lang, bg, w1, count(*)::BIGINT AS cb
               FROM occ GROUP BY 1, 2, 3),
       pfc AS (SELECT lang, w1, count(*)::BIGINT AS cp
               FROM occ GROUP BY 1, 2),
       terms AS (
         SELECT bgc.lang, bgc.cb,
                (floor((log2(pfc.cp) - log2(bgc.cb)) * 1000000))::BIGINT
                  AS t_micro
         FROM bgc JOIN pfc ON pfc.lang = bgc.lang AND pfc.w1 = bgc.w1)
       SELECT lang,
              sum(cb)::BIGINT AS n_bigrams,
              count(*)::BIGINT AS n_bigram_types,
              round((sum(cb * t_micro)::DOUBLE / sum(cb)) / 1000000.0, 6)
                AS cond_entropy_bits
       FROM terms GROUP BY lang ORDER BY lang""",
)
def llm_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next word | word) per language — the
    sequence-level diversity gate that agg_entropy (source mix) and
    llm_zipf_slope (unigram law) can't see: template spam shows near-zero
    next-word surprise even with a healthy vocabulary. Computed as the
    count-weighted mean of log2(c_prefix) − log2(c_bigram) per bigram
    type; each log term floors to integer micro-units so the weighted
    sum Σ c·t is exact 64-bit arithmetic at any parallelism (the
    llm_zipf_slope pattern — residual libm note there). One token
    explode, two hash aggregates, one equi-join on (lang, w1) — all
    linear, partial-aggregated."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("lang", F.split(F.lower(F.col("text")), " ").alias("a"))
    occ = docs.select(
        "lang",
        F.explode(
            F.expr(
                "transform(slice(a, 1, greatest(size(a) - 1, 0)), "
                "(x, i) -> struct(x AS w1, "
                "concat(x, ' ', element_at(a, i + 2)) AS bg))"
            )
        ).alias("p"),
    ).select("lang", "p.w1", "p.bg")
    bgc = occ.groupBy("lang", "bg", "w1").agg(F.count(F.lit(1)).alias("cb"))
    pfc = occ.groupBy("lang", "w1").agg(F.count(F.lit(1)).alias("cp"))
    terms = bgc.join(pfc, ["lang", "w1"]).select(
        "lang",
        "cb",
        F.floor(
            (F.log2(F.col("cp")) - F.log2(F.col("cb"))) * F.lit(1000000.0)
        ).cast("bigint").alias("t_micro"),
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.sum("cb").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_bigram_types"),
            F.round(
                (
                    F.sum(F.col("cb") * F.col("t_micro")).cast("double")
                    / F.sum("cb")
                )
                / F.lit(1000000.0),
                6,
            ).alias("cond_entropy_bits"),
        )
        .orderBy("lang")
    )


@q(
    "graph_degree_assortativity",
    """WITH e AS (
         WITH items AS (SELECT l_orderkey, l_partkey FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64)
         SELECT a.l_partkey AS u, b.l_partkey AS v
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= 2),
       deg AS (
         SELECT node, count(*)::BIGINT AS deg
         FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         GROUP BY node),
       de AS (
         SELECT du.deg AS x, dv.deg AS y
         FROM (SELECT u, v FROM e UNION ALL SELECT v, u FROM e) m
         JOIN deg du ON du.node = m.u
         JOIN deg dv ON dv.node = m.v),
       s AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
         FROM de)
       SELECT n AS n_edge_ends,
              round((n * sxy - sx * sy)::DOUBLE
                    / (sqrt((n * sxx - sx * sx)::DOUBLE)
                       * sqrt((n * syy - sy * sy)::DOUBLE)), 6)
                AS assortativity
       FROM s""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Pearson correlation
    of endpoint degrees over the symmetrized edge list) — positive means
    hubs attach to hubs (dedup/recommendation blow-up risk concentrates),
    negative means hub-leaf structure (the skew caps in
    operators/graph.py earn their keep). Pure agg_corr_deterministic
    template: exact integer co-moment sums, one closed-form double
    expression at the end (÷ and sqrt are correctly-rounded IEEE). One
    degree aggregate + two broadcast-able joins + one global fold."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.operators.materialize import materialize

    li = load_table(spark, sf_dir, "lineitem")
    e = materialize(copurchase_edges(li))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    m = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    de = (
        m.join(deg.alias("du"), F.col("du.node") == F.col("u"))
        .join(deg.alias("dv"), F.col("dv.node") == F.col("v"))
        .select(F.col("du.deg").alias("x"), F.col("dv.deg").alias("y"))
    )
    s = de.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = (n * F.col("sxy") - sx * sy).cast("double") / (
        F.sqrt((n * F.col("sxx") - sx * sx).cast("double"))
        * F.sqrt((n * F.col("syy") - sy * sy).cast("double"))
    )
    return s.select(
        F.col("n").alias("n_edge_ends"),
        F.round(r, 6).alias("assortativity"),
    )


@q(
    "events_seasonal_strength",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       dowg AS (
         SELECT event_type, date_part('isodow', d) - 1 AS dow,
                count(*)::BIGINT AS ng, sum(n)::BIGINT AS sx,
                sum(n * n)::BIGINT AS sxx
         FROM daily GROUP BY 1, 2),
       within AS (
         SELECT event_type,
                sum((floor((sxx::DOUBLE - (sx::DOUBLE * sx::DOUBLE) / ng)
                           * 1000000))::BIGINT)::BIGINT AS ss_within_micro
         FROM dowg GROUP BY event_type),
       total AS (
         SELECT event_type, count(*)::BIGINT AS n_days,
                (floor((sum(n * n)::DOUBLE
                        - (sum(n)::DOUBLE * sum(n)::DOUBLE) / count(*))
                       * 1000000))::BIGINT AS ss_total_micro
         FROM daily GROUP BY event_type)
       SELECT t.event_type, t.n_days, t.ss_total_micro, w.ss_within_micro,
              round(1.0 - w.ss_within_micro::DOUBLE / t.ss_total_micro, 6)
                AS seasonal_strength
       FROM total t JOIN within w USING (event_type)
       ORDER BY event_type""",
)
def events_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal strength per event type: 1 − SS_within/SS_total
    over daily counts grouped by weekday — the variance-explained dial
    (≈0: no weekly pattern; →1: rate is a pure weekday function) that
    decides whether a forecast or anomaly baseline needs a weekly
    component. Every sum is an exact integer; each group's sum-of-squares
    term (sxx − sx²/n, correctly-rounded IEEE over exact ints) floors to
    integer micro-units before the 7-group fold, so the result is
    partition-order-free on both engines. Two tiny hash aggregates —
    shuffle is |types|·7 rows regardless of corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    dowg = daily.groupBy("event_type", F.weekday("d").alias("dow")).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    term = F.floor(
        (
            F.col("sxx").cast("double")
            - (F.col("sx").cast("double") * F.col("sx").cast("double"))
            / F.col("ng")
        )
        * F.lit(1000000.0)
    ).cast("bigint")
    within = dowg.groupBy("event_type").agg(
        F.sum(term).alias("ss_within_micro")
    )
    total = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.floor(
            (
                F.sum(F.col("n") * F.col("n")).cast("double")
                - (F.sum("n").cast("double") * F.sum("n").cast("double"))
                / F.count(F.lit(1))
            )
            * F.lit(1000000.0)
        ).cast("bigint").alias("ss_total_micro"),
    )
    return (
        total.join(within, "event_type")
        .select(
            "event_type", "n_days", "ss_total_micro", "ss_within_micro",
            F.round(
                F.lit(1.0)
                - F.col("ss_within_micro").cast("double")
                / F.col("ss_total_micro"),
                6,
            ).alias("seasonal_strength"),
        )
        .orderBy("event_type")
    )


_PMI_MAX_DF_PCT = 90     # near-ubiquitous tokens carry no pair signal
_PMI_MIN_COOC = 5


@q(
    "llm_pmi_pairs",
    f"""WITH td AS (
         SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS t
         FROM documents),
       n AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM td),
       df AS (SELECT t, count(*)::BIGINT AS cx FROM td GROUP BY t),
       kept AS (
         SELECT df.t, df.cx FROM df CROSS JOIN n
         WHERE df.cx * 100 <= n.n_docs * {_PMI_MAX_DF_PCT}),
       tk AS (SELECT td.doc_id, td.t FROM td JOIN kept ON kept.t = td.t),
       cooc AS (
         SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS cxy
         FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.t < b.t
         GROUP BY 1, 2
         HAVING count(*) >= {_PMI_MIN_COOC}),
       scored AS (
         SELECT c.t1, c.t2, c.cxy, k1.cx AS cx1, k2.cx AS cx2,
                (floor(ln((c.cxy * n.n_docs)::DOUBLE / (k1.cx * k2.cx))
                       * 1000000))::BIGINT AS pmi_micro
         FROM cooc c
         JOIN kept k1 ON k1.t = c.t1
         JOIN kept k2 ON k2.t = c.t2
         CROSS JOIN n)
       SELECT t1, t2, cxy, cx1, cx2, pmi_micro,
              round(pmi_micro::DOUBLE / 1000000.0, 6) AS pmi
       FROM scored
       ORDER BY pmi_micro DESC, t1, t2 LIMIT 30""",
)
def llm_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 pointwise-mutual-information token pairs (document-level
    co-occurrence) — the collocation/phrase-mining primitive behind
    tokenizer merge candidates and topic seeds. Tokens in over 90% of
    the corpus are dropped BEFORE the pair join (a high-df token pairs
    with everything and carries ~0 PMI — the same principled cap as the
    containment stop-shingles, mirrored in the oracle), bounding per-doc
    pair fan-out; pairs need ≥5 co-occurrences. PMI = ln(c_xy·N /
    (c_x·c_y)) over exact integer counts — one correctly-rounded
    division, one libm ln, floored to micro-units, so the ranking key is
    an integer (ties broken by the pair itself)."""
    d = load_table(spark, sf_dir, "documents")
    td = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    ).distinct()
    n = td.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_t = td.groupBy("t").agg(F.count(F.lit(1)).alias("cx"))
    kept = (
        df_t.crossJoin(F.broadcast(n))
        .filter(F.col("cx") * 100 <= F.col("n_docs") * _PMI_MAX_DF_PCT)
        .select("t", "cx")
    )
    tk = td.join(F.broadcast(kept.select("t")), "t").select("doc_id", "t")
    cooc = (
        tk.alias("a")
        .join(
            tk.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.t").alias("t1"), F.col("b.t").alias("t2"))
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MIN_COOC)
    )
    kb = F.broadcast(kept)
    scored = (
        cooc.join(kb.select(F.col("t").alias("t1"), F.col("cx").alias("cx1")), "t1")
        .join(kb.select(F.col("t").alias("t2"), F.col("cx").alias("cx2")), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1", "t2", "cxy", "cx1", "cx2",
            F.floor(
                F.log(
                    (F.col("cxy") * F.col("n_docs")).cast("double")
                    / (F.col("cx1") * F.col("cx2"))
                )
                * F.lit(1000000.0)
            ).cast("bigint").alias("pmi_micro"),
        )
    )
    return (
        scored.select(
            "t1", "t2", "cxy", "cx1", "cx2", "pmi_micro",
            F.round(F.col("pmi_micro").cast("double") / 1000000.0, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi_micro").desc(), "t1", "t2")
        .limit(30)
    )


@q(
    "dq_benford_deviation",
    """WITH digits AS (
         SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
         FROM orders WHERE o_totalprice >= 1),
       n AS (SELECT count(*)::BIGINT AS total FROM digits),
       obs AS (SELECT digit, count(*)::BIGINT AS n_obs FROM digits GROUP BY digit),
       grid AS (SELECT unnest(generate_series(1, 9)) AS digit)
       SELECT g.digit,
              coalesce(o.n_obs, 0)::BIGINT AS n_obs,
              (coalesce(o.n_obs, 0) * 1000000 // n.total)::BIGINT
                AS p_obs_micro,
              (floor(log10(1.0 + 1.0 / g.digit) * 1000000))::BIGINT
                AS p_benford_micro,
              (coalesce(o.n_obs, 0) * 1000000 // n.total
               - floor(log10(1.0 + 1.0 / g.digit) * 1000000))::BIGINT
                AS deviation_micro
       FROM grid g LEFT JOIN obs o ON o.digit = g.digit CROSS JOIN n
       ORDER BY g.digit""",
)
def dq_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic DQ
    gate for fabricated or truncated monetary data (organic amounts
    follow P(d) = log10(1+1/d); a synthetic generator or a capped field
    shows up as a flat or spiked digit profile). The first digit is
    taken from the BIGINT floor of the amount (integer→string is
    bit-identical across engines — never format a float); observed
    shares use integer floor-division to micro-units and the Benford
    expectation is the same floored-micro constant on both sides. One
    scan + a 9-row aggregate — shuffle is 9 rows at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    digits = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1, 1,
            ).cast("bigint").alias("digit")
        )
    )
    n = digits.agg(F.count(F.lit(1)).alias("total"))
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    grid = spark.range(1, 10).select(F.col("id").alias("digit"))
    p_obs = F.expr("div(coalesce(n_obs, 0) * 1000000, total)")
    p_ben = F.floor(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")) * F.lit(1000000.0)
    ).cast("bigint")
    return (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
            p_obs.cast("bigint").alias("p_obs_micro"),
            p_ben.alias("p_benford_micro"),
            (p_obs - p_ben).cast("bigint").alias("deviation_micro"),
        )
        .orderBy("digit")
    )


@q(
    "llm_trigram_backoff",
    """WITH docs AS (
         SELECT doc_id, string_split(lower(text), ' ') AS a FROM documents),
       train AS (SELECT * FROM docs WHERE doc_id % 2 = 0),
       eval_docs AS (SELECT * FROM docs WHERE doc_id % 2 = 1),
       tr_tok AS (SELECT unnest(a) AS w FROM train),
       c1 AS (SELECT w, count(*)::BIGINT AS c FROM tr_tok GROUP BY w),
       tot AS (SELECT count(*)::BIGINT AS t,
                      count(DISTINCT w)::BIGINT AS v
               FROM tr_tok),
       tr_bg AS (
         SELECT a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS bg
         FROM (SELECT a, unnest(generate_series(1, len(a) - 1)) AS i
               FROM train)),
       c2 AS (SELECT bg, count(*)::BIGINT AS c FROM tr_bg GROUP BY bg),
       tr_tg AS (
         SELECT a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1]
                  || ' ' || a[CAST(i AS INT) + 2] AS tg
         FROM (SELECT a, unnest(generate_series(1, len(a) - 2)) AS i
               FROM train)),
       c3 AS (SELECT tg, count(*)::BIGINT AS c FROM tr_tg GROUP BY tg),
       occ AS (
         SELECT doc_id,
                a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1]
                  || ' ' || a[CAST(i AS INT) + 2] AS tg,
                a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS ctx,
                a[CAST(i AS INT) + 1] || ' ' || a[CAST(i AS INT) + 2] AS bg2,
                a[CAST(i AS INT) + 1] AS w2,
                a[CAST(i AS INT) + 2] AS w3
         FROM (SELECT doc_id, a, unnest(generate_series(1, len(a) - 2)) AS i
               FROM eval_docs)),
       scored AS (
         SELECT o.doc_id,
                (floor(ln(
                   CASE WHEN t3.c IS NOT NULL AND cx.c IS NOT NULL
                        THEN t3.c::DOUBLE / cx.c
                        WHEN b2.c IS NOT NULL AND u2.c IS NOT NULL
                        THEN 0.4 * b2.c::DOUBLE / u2.c
                        ELSE 0.16 * (coalesce(u3.c, 0) + 1)::DOUBLE
                             / (tot.t + tot.v)
                   END) * 1000000))::BIGINT AS t_micro
         FROM occ o
         LEFT JOIN c3 t3 ON t3.tg = o.tg
         LEFT JOIN c2 cx ON cx.bg = o.ctx
         LEFT JOIN c2 b2 ON b2.bg = o.bg2
         LEFT JOIN c1 u2 ON u2.w = o.w2
         LEFT JOIN c1 u3 ON u3.w = o.w3
         CROSS JOIN tot),
       per_doc AS (
         SELECT doc_id, count(*)::BIGINT AS n_trigrams,
                sum(t_micro)::BIGINT AS total_micro
         FROM scored GROUP BY doc_id)
       SELECT doc_id, n_trigrams,
              round(total_micro::DOUBLE / n_trigrams / 1000000.0, 6)
                AS avg_logscore
       FROM per_doc ORDER BY avg_logscore, doc_id LIMIT 30""",
)
def llm_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM scoring with a REAL train/eval split
    (train on even doc_ids, score odd ones — unlike
    ``llm_bigram_logprob``'s self-scoring, unseen n-grams actually
    occur and the backoff chain is exercised): S(w3|w1w2) = c3/c2(ctx),
    backing off to 0.4·c2(w2w3)/c1(w2), then to 0.4²·(c1(w3)+1)/(T+V)
    (add-one floor so OOV eval tokens score finitely). Bottom-30 eval
    docs by average log score = the most out-of-distribution review
    queue. Each occurrence's log term is floored to integer micro-units
    BEFORE the per-doc sum. Shape: three hash aggregates build the
    model (trigram/bigram/unigram tables — linear in train tokens),
    then the eval occurrence stream meets them through FIVE gram-keyed
    equi-joins (all linear shuffles on string keys; Spark's AQE picks
    broadcast when a model table is small) and one scalar totals
    broadcast. Nothing is quadratic; at 100 TB the model tables are
    vocabulary-sized, far below the corpus, and the joins are the
    standard skew-safe hash shape."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.split(F.lower(F.col("text")), " ").alias("a"))
    train = docs.filter(F.col("doc_id") % 2 == 0)
    eval_docs = docs.filter(F.col("doc_id") % 2 == 1)
    tr_tok = train.select(F.explode("a").alias("w"))
    c1 = tr_tok.groupBy("w").agg(F.count(F.lit(1)).alias("c1c"))
    tot = tr_tok.agg(
        F.count(F.lit(1)).alias("t"), F.countDistinct("w").alias("v")
    )
    tr_bg = train.select(
        F.explode(
            F.expr(
                "transform(slice(a, 1, greatest(size(a) - 1, 0)), "
                "(x, i) -> concat(x, ' ', element_at(a, i + 2)))"
            )
        ).alias("bg")
    )
    c2 = tr_bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2c"))

    def tri_occ(df: DataFrame, with_doc: bool) -> DataFrame:
        cols = ["doc_id"] if with_doc else []
        return df.select(
            *cols,
            F.explode(
                F.expr(
                    "transform(slice(a, 1, greatest(size(a) - 2, 0)), "
                    "(x, i) -> struct("
                    "concat(x, ' ', element_at(a, i + 2), ' ', "
                    "element_at(a, i + 3)) AS tg, "
                    "concat(x, ' ', element_at(a, i + 2)) AS ctx, "
                    "concat(element_at(a, i + 2), ' ', "
                    "element_at(a, i + 3)) AS bg2, "
                    "element_at(a, i + 2) AS w2, "
                    "element_at(a, i + 3) AS w3))"
                )
            ).alias("p"),
        ).select(*cols, "p.tg", "p.ctx", "p.bg2", "p.w2", "p.w3")

    c3 = (
        tri_occ(train, False)
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c3c"))
    )
    occ = tri_occ(eval_docs, True)
    scored = (
        occ.join(c3, "tg", "left")
        .join(c2.withColumnRenamed("bg", "ctx").withColumnRenamed("c2c", "cxc"), "ctx", "left")
        .join(c2.withColumnRenamed("bg", "bg2").withColumnRenamed("c2c", "b2c"), "bg2", "left")
        .join(c1.withColumnRenamed("w", "w2").withColumnRenamed("c1c", "u2c"), "w2", "left")
        .join(c1.withColumnRenamed("w", "w3").withColumnRenamed("c1c", "u3c"), "w3", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.floor(
                F.log(
                    F.when(
                        F.col("c3c").isNotNull() & F.col("cxc").isNotNull(),
                        F.col("c3c").cast("double") / F.col("cxc"),
                    )
                    .when(
                        F.col("b2c").isNotNull() & F.col("u2c").isNotNull(),
                        0.4 * F.col("b2c").cast("double") / F.col("u2c"),
                    )
                    .otherwise(
                        0.16
                        * (F.coalesce(F.col("u3c"), F.lit(0)) + 1).cast("double")
                        / (F.col("t") + F.col("v"))
                    )
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("t_micro").cast("long").alias("total_micro"),
    )
    return (
        per_doc.select(
            "doc_id",
            "n_trigrams",
            F.round(
                F.col("total_micro").cast("double")
                / F.col("n_trigrams")
                / 1000000.0,
                6,
            ).alias("avg_logscore"),
        )
        .orderBy("avg_logscore", "doc_id")
        .limit(30)
    )
