"""Round-14 additions: corpus-growth laws, routing/weighting for
training mixes, chunking economics, survey-sampling allocation, and
session/stream ergonomics (SURVEY.md §2.J/.L/.D).

Gaps a production training-data pipeline still hits after round 13:

- **Heaps' law curve**: vocabulary growth vs corpus position — the
  planning curve behind tokenizer-budget and dedup-rate extrapolation
  (``llm_vocab_coverage_curve`` ranks today's types; this tracks how
  fast NEW types keep arriving).
- **Term burstiness** (Church & Gale 1995): variance-to-mean (Fano
  factor) of per-doc term counts — separates topical terms (bursty)
  from function words (Poisson-ish); the signal behind df-based
  stop-shingle caps.
- **SoftDeDup weighting** (down-weight duplicates instead of dropping):
  the loss-reweighting alternative to hard dedup — per-cluster 1/n
  weights and the effective token mass they retain.
- **MoE router balance** (Switch Transformer aux loss, Fedus et al.
  2021): hash-routed expert loads and the load-balance loss term —
  the health check before expert-parallel training.
- **Context-window chunking**: sliding-window doc splitting (W tokens,
  stride S) — chunk counts and padding/overlap overhead per source,
  the cost table behind sequence-packing decisions.
- **Neyman allocation**: variance-proportional stratified sampling —
  the survey-statistics upgrade of ``sample_stratified``.

House determinism rules throughout: whitespace tokens, milli/micro
integer fixed point with floor after each transcendental (sqrt/ln on
exact ints are correctly-rounded IEEE, identical on both engines),
DECIMAL(38,0)/HUGEINT where int64 could wrap, truncating integer
division stated as ``div``/``//`` on both sides, aliases identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64
from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# ------------------------------------------------------------ Heaps' law

_HEAPS_CHECKPOINTS = 5


@q(
    "llm_heaps_law",
    f"""WITH dt AS (
  SELECT doc_id, len(string_split(lower(text), ' '))::BIGINT AS n
  FROM documents),
tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
fst AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
mx AS (SELECT max(doc_id)::BIGINT AS mxid FROM dt),
cps AS (SELECT unnest(generate_series(1, {_HEAPS_CHECKPOINTS}))::BIGINT AS k,
               mxid
        FROM mx),
docs AS (
  SELECT cps.k, count(*)::BIGINT AS docs_seen, sum(dt.n)::BIGINT AS tokens_seen
  FROM dt, cps
  WHERE dt.doc_id * {_HEAPS_CHECKPOINTS} < (cps.mxid + 1) * cps.k
  GROUP BY cps.k),
typ AS (
  SELECT cps.k, count(*)::BIGINT AS types_seen
  FROM fst, cps
  WHERE fst.fd * {_HEAPS_CHECKPOINTS} < (cps.mxid + 1) * cps.k
  GROUP BY cps.k)
SELECT d.k AS checkpoint, d.docs_seen, d.tokens_seen, t.types_seen,
       (t.types_seen * 1000000 // d.tokens_seen)::BIGINT AS ttr_micro
FROM docs d JOIN typ t ON t.k = d.k
ORDER BY checkpoint""",
)
def llm_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve: cumulative distinct types vs
    cumulative tokens at five doc-id checkpoints — the sub-linear
    V = K·n^beta curve tokenizer-budget and novelty planning extrapolate
    from (a corpus whose curve has flattened yields few new types per
    added shard; one still growing linearly is under-deduplicated).
    Exactness: a type counts at checkpoint k iff its FIRST doc lands in
    the prefix (min(doc_id) — one agg, no per-checkpoint distinct), and
    the prefix test is the integer cross-multiplication
    ``doc_id·K < (max_id+1)·k`` (no float quantiles). Type-token ratio
    in floored micro units. Scale: one token explode → (type) min-agg;
    the checkpoint frame is 5 broadcast rows joined by an inequality
    against type- and doc-grain tables — never a second pass over raw
    tokens; at 100 TB this is the classic two-agg profile."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n")
    )
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    fst = tok.groupBy("w").agg(F.min("doc_id").alias("fd"))
    cps = (
        dt.agg(F.max("doc_id").cast("long").alias("mxid"))
        .select(
            F.explode(
                F.sequence(F.lit(1), F.lit(_HEAPS_CHECKPOINTS))
            ).alias("k0"),
            "mxid",
        )
        .select(F.col("k0").cast("long").alias("k"), "mxid")
    )
    k = _HEAPS_CHECKPOINTS
    docs = (
        dt.crossJoin(F.broadcast(cps))
        .filter(F.col("doc_id") * k < (F.col("mxid") + 1) * F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_seen"),
            F.sum("n").cast("long").alias("tokens_seen"),
        )
    )
    typ = (
        fst.crossJoin(F.broadcast(cps))
        .filter(F.col("fd") * k < (F.col("mxid") + 1) * F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("types_seen"))
    )
    return (
        docs.join(typ, "k")
        .select(
            F.col("k").alias("checkpoint"),
            "docs_seen",
            "tokens_seen",
            "types_seen",
            F.expr("types_seen * 1000000 div tokens_seen")
            .cast("long")
            .alias("ttr_micro"),
        )
        .orderBy("checkpoint")
    )


# ------------------------------------------------------ term burstiness

_BURST_MIN_DF = 5
_BURST_TOPK = 30


@q(
    "llm_term_burstiness",
    f"""WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM documents),
dc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
tstats AS (
  SELECT w, count(*)::BIGINT AS df, sum(c)::BIGINT AS s,
         sum(c * c)::BIGINT AS qq
  FROM dc GROUP BY w)
SELECT w AS term, df, s AS total_count,
       ((nd.n::HUGEINT * qq - s::HUGEINT * s) * 1000
        // (s::HUGEINT * nd.n))::BIGINT AS vmr_milli
FROM tstats, nd
WHERE df >= {_BURST_MIN_DF}
ORDER BY vmr_milli DESC, term
LIMIT {_BURST_TOPK}""",
)
def llm_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale): the variance-to-mean ratio (Fano
    factor) of per-document term counts over ALL N docs (absent docs
    contribute zero through the N in the identity) — VMR ≈ 1 is
    Poisson-ish function-word behavior, VMR ≫ 1 is topical burst; the
    measured basis for the df-cap heuristics the dedup/PMI keys apply.
    Exactness: VMR·1000 = (N·Σc² − S²)·1000 // (S·N) — all integer, the
    numerator non-negative by Cauchy–Schwarz, products in
    HUGEINT/DECIMAL(38,0). Top-30 under the (vmr, term) total order
    among terms with df ≥ 5. Scale: token explode → (doc,term) partial
    agg → term-grain rollup (strictly shrinking), one broadcast 1-row N;
    the top-k is a distributed TakeOrdered, never a global window."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    dc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ts = dc.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("qq"),
    )
    wide = "decimal(38,0)"
    return (
        ts.filter(F.col("df") >= _BURST_MIN_DF)
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("term"),
            "df",
            F.col("s").alias("total_count"),
            # div (not /): DuckDB's // floors and the numerator is
            # non-negative, so truncating integral division matches
            F.expr(
                f"(cast(n as {wide}) * qq - cast(s as {wide}) * s) * 1000"
                f" div (cast(s as {wide}) * n)"
            )
            .cast("long")
            .alias("vmr_milli"),
        )
        .orderBy(F.desc("vmr_milli"), "term")
        .limit(_BURST_TOPK)
    )


# ---------------------------------------------------- SoftDeDup weights


@q(
    "llm_softdedup_weights",
    """WITH cl AS (
  SELECT doc_id, source, md5(text) AS h,
         len(string_split(text, ' '))::BIGINT AS tk
  FROM documents),
cnt AS (SELECT h, count(*)::BIGINT AS c FROM cl GROUP BY h)
SELECT cl.source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT cl.h)::BIGINT AS n_clusters,
       sum(cl.tk)::BIGINT AS raw_tokens,
       sum(cl.tk * 1000 // cnt.c)::BIGINT AS eff_tokens_milli,
       (sum(cl.tk * 1000 // cnt.c) // sum(cl.tk))::BIGINT AS retained_milli
FROM cl JOIN cnt ON cnt.h = cl.h
GROUP BY cl.source
ORDER BY cl.source""",
)
def llm_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of dropping exact duplicates
    (``llm_dedup_exact``), every copy in an md5-content cluster of size
    n keeps weight 1/n — the loss-reweighting scheme that preserves
    coverage while removing the duplicated-gradient bias. Per source:
    docs, clusters touched, raw token mass, and the EFFECTIVE token
    mass Σ tokens·1000/n (floored per doc, in token-milli) plus the
    retention ratio — the number that says how much of a source's
    apparent volume is real. Scale: one narrow (hash) shuffle for
    cluster sizes + one hash-keyed join back — identical shape to the
    exact-dedup path, no pairwise work ever."""
    d = load_table(spark, sf_dir, "documents")
    cl = d.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("tk"),
    )
    cnt = cl.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("c"))
    return (
        cl.join(cnt, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_clusters"),
            F.sum("tk").cast("long").alias("raw_tokens"),
            F.sum(F.expr("tk * 1000 div c")).cast("long").alias("eff_tokens_milli"),
            F.expr("sum(tk * 1000 div c) div sum(tk)")
            .cast("long")
            .alias("retained_milli"),
        )
        .orderBy("source")
    )


# ------------------------------------------------- MoE router balance

_MOE_EXPERTS = 8
_MOE_SEED = 21


@q(
    "llm_moe_router_balance",
    f"""WITH r AS (
  SELECT doc_id,
         ('0x' || substring(md5('{_MOE_SEED}:' || doc_id::VARCHAR), 1, 15))
           ::BIGINT % {_MOE_EXPERTS} AS expert,
         len(string_split(text, ' '))::BIGINT AS tk
  FROM documents),
tot AS (SELECT count(*)::BIGINT AS n, sum(tk)::BIGINT AS t FROM r),
pe AS (
  SELECT expert, count(*)::BIGINT AS n_docs, sum(tk)::BIGINT AS n_tokens
  FROM r GROUP BY expert)
SELECT pe.expert, pe.n_docs, pe.n_tokens,
       (pe.n_docs * 1000000 // tot.n)::BIGINT AS doc_share_micro,
       (pe.n_tokens * 1000000 // tot.t)::BIGINT AS tok_share_micro,
       ({_MOE_EXPERTS} * (pe.n_docs * 1000000 // tot.n)
        * (pe.n_tokens * 1000000 // tot.t) // 1000000)::BIGINT
         AS aux_term_micro
FROM pe, tot
ORDER BY pe.expert""",
)
def llm_moe_router_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-of-experts router load balance (Switch Transformer aux
    loss): documents hash-routed to E=8 experts by a portable 60-bit
    md5 hash; per expert the doc-fraction f_e and token-fraction P_e
    (standing in for mean router probability), and the aux-loss term
    E·f_e·P_e whose sum is the Switch load-balance loss (minimized =
    1 exactly at uniform load). Catches both doc-count skew and the
    subtler token-mass skew a doc-balanced router still suffers.
    Exactness: shares in floored micro units, the aux product floored
    after the micro-scale multiply — identical truncation order both
    engines. Scale: map-side hash + one E-row aggregate; the E-row
    frame does all the arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        "doc_id",
        (portable_hash64(F.col("doc_id").cast("string"), _MOE_SEED)
         % _MOE_EXPERTS).alias("expert"),
        F.size(F.split("text", " ")).cast("long").alias("tk"),
    )
    tot = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("tk").cast("long").alias("t"),
    )
    pe = r.groupBy("expert").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tk").cast("long").alias("n_tokens"),
    )
    return (
        pe.crossJoin(F.broadcast(tot))
        .select(
            "expert",
            "n_docs",
            "n_tokens",
            F.expr("n_docs * 1000000 div n").cast("long").alias("doc_share_micro"),
            F.expr("n_tokens * 1000000 div t").cast("long").alias("tok_share_micro"),
            F.expr(
                f"{_MOE_EXPERTS} * (n_docs * 1000000 div n)"
                " * (n_tokens * 1000000 div t) div 1000000"
            )
            .cast("long")
            .alias("aux_term_micro"),
        )
        .orderBy("expert")
    )


# ------------------------------------------- context-window chunking

_CHUNK_W = 256  # window (tokens per chunk)
_CHUNK_S = 192  # stride (overlap = W - S = 64)


@q(
    "llm_context_chunking",
    f"""WITH dt AS (
  SELECT doc_id, source, len(string_split(text, ' '))::BIGINT AS n
  FROM documents),
ch AS (
  SELECT doc_id, source, n,
         CASE WHEN n <= {_CHUNK_W} THEN 1
              ELSE 1 + (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}
         END::BIGINT AS n_chunks
  FROM dt)
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(n_chunks)::BIGINT AS n_chunks,
       sum(n)::BIGINT AS n_tokens,
       sum(n_chunks * {_CHUNK_W})::BIGINT AS emitted_tokens,
       ((sum(n_chunks * {_CHUNK_W}) - sum(n)) * 1000 // sum(n))::BIGINT
         AS overhead_milli,
       sum(CASE WHEN n_chunks > 1 THEN 1 ELSE 0 END)::BIGINT AS docs_split
FROM ch GROUP BY source ORDER BY source""",
)
def llm_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context chunking economics: docs split into
    W=256-token chunks at stride S=192 (64-token overlap, the
    long-document convention for pretraining and retrieval indexing).
    Per source: chunk counts, raw vs emitted token volume, and the
    overhead ratio (overlap + final-chunk padding) — the cost table
    that decides W/S against ``llm_sequence_packing``'s bin-packing
    alternative. Exactness: chunk count is the closed form
    1 + ceil((n−W)/S) in integer arithmetic (ceil via (x+S−1)//S);
    overhead in floored milli. Scale: map-only per-doc arithmetic +
    one source-grain aggregate — no explode, the chunk table itself is
    never materialized (counts suffice)."""
    d = load_table(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    ch = dt.withColumn(
        "n_chunks",
        F.when(F.col("n") <= _CHUNK_W, F.lit(1))
        .otherwise(
            1 + F.expr(f"(n - {_CHUNK_W} + {_CHUNK_S} - 1) div {_CHUNK_S}")
        )
        .cast("long"),
    )
    return (
        ch.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chunks").cast("long").alias("n_chunks"),
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.col("n_chunks") * _CHUNK_W)
            .cast("long")
            .alias("emitted_tokens"),
            F.expr(
                f"(sum(n_chunks * {_CHUNK_W}) - sum(n)) * 1000 div sum(n)"
            )
            .cast("long")
            .alias("overhead_milli"),
            F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0))
            .cast("long")
            .alias("docs_split"),
        )
        .orderBy("source")
    )


# --------------------------------------------------- Neyman allocation

_NEYMAN_BUDGET_DEN = 10  # sample budget = corpus docs / 10


@q(
    "sample_neyman_allocation",
    f"""WITH st AS (
  SELECT source, count(*)::BIGINT AS n_h,
         sum(n_chars)::BIGINT AS s, sum(n_chars * n_chars)::BIGINT AS qq
  FROM documents GROUP BY source),
v AS (
  SELECT source, n_h,
         ((n_h::HUGEINT * qq - s::HUGEINT * s)
          // (n_h::HUGEINT * (n_h - 1)))::BIGINT AS var_unit
  FROM st WHERE n_h >= 2),
w AS (
  SELECT source, n_h,
         floor(sqrt(var_unit) * 1000)::BIGINT AS s_milli,
         n_h * floor(sqrt(var_unit) * 1000)::BIGINT AS wt
  FROM v),
tot AS (SELECT sum(wt)::BIGINT AS tw, sum(n_h)::BIGINT AS nd FROM w),
b AS (SELECT (nd // {_NEYMAN_BUDGET_DEN})::BIGINT AS budget, tw FROM tot),
base AS (
  SELECT w.source, w.n_h, w.s_milli, w.wt, b.budget,
         (b.budget * w.wt // b.tw)::BIGINT AS alloc0,
         (b.budget * w.wt % b.tw)::BIGINT AS rem
  FROM w, b),
d AS (SELECT (max(budget) - sum(alloc0))::BIGINT AS deficit FROM base),
rk AS (
  SELECT base.*, row_number() OVER (ORDER BY rem DESC, source) AS rnk
  FROM base)
SELECT rk.source, rk.n_h, rk.s_milli,
       (rk.alloc0 + CASE WHEN rk.rnk <= d.deficit THEN 1 ELSE 0 END)::BIGINT
         AS alloc_docs,
       ((rk.alloc0 + CASE WHEN rk.rnk <= d.deficit THEN 1 ELSE 0 END)
        * 1000 // rk.budget)::BIGINT AS share_milli
FROM rk, d
ORDER BY rk.source""",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: each source stratum
    gets sample size ∝ N_h·S_h (size × doc-length standard deviation) —
    the survey-statistics allocation that minimizes estimator variance
    at fixed budget, upgrading ``sample_stratified``'s proportional
    rule (high-variance strata get oversampled). Budget = docs/10;
    allocations hit the budget EXACTLY via largest-remainder rounding
    under the (remainder, source) total order. Exactness: the variance
    numerator N·Σx²−S² is exact HUGEINT/DECIMAL; the single sqrt runs
    on the exact integer per-unit variance (correctly-rounded IEEE,
    floored to milli — the ``ts_changepoint_binary`` precedent). Scale:
    one source-grain aggregate; all allocation math on the |sources|
    frame (the rank window is source-grain, bounded)."""
    d = load_table(spark, sf_dir, "documents")
    wide = "decimal(38,0)"
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("qq"),
    )
    v = st.filter(F.col("n_h") >= 2).select(
        "source",
        "n_h",
        F.expr(
            f"(cast(n_h as {wide}) * qq - cast(s as {wide}) * s)"
            f" div (cast(n_h as {wide}) * (n_h - 1))"
        )
        .cast("long")
        .alias("var_unit"),
    )
    w = v.select(
        "source",
        "n_h",
        F.floor(F.sqrt("var_unit") * 1000).cast("long").alias("s_milli"),
    ).withColumn("wt", F.col("n_h") * F.col("s_milli"))
    tot = w.agg(
        F.sum("wt").cast("long").alias("tw"),
        F.sum("n_h").cast("long").alias("nd"),
    ).select(
        F.expr(f"nd div {_NEYMAN_BUDGET_DEN}").cast("long").alias("budget"),
        "tw",
    )
    base = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_h",
        "s_milli",
        "budget",
        F.expr("budget * wt div tw").cast("long").alias("alloc0"),
        F.expr("budget * wt % tw").cast("long").alias("rem"),
    )
    base = materialize(base)
    dd = base.agg(
        (F.max("budget") - F.sum("alloc0")).cast("long").alias("deficit")
    )
    wr = Window.orderBy(F.desc("rem"), "source")
    return (
        base.withColumn("rnk", F.row_number().over(wr))
        .crossJoin(F.broadcast(dd))
        .select(
            "source",
            "n_h",
            "s_milli",
            (
                F.col("alloc0")
                + F.when(F.col("rnk") <= F.col("deficit"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_docs"),
            F.expr(
                "(alloc0 + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END)"
                " * 1000 div budget"
            )
            .cast("long")
            .alias("share_milli"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ kNN-graph health

_KNNG_K = 3


@q(
    "emb_knn_graph_health",
    f"""WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
stride AS (SELECT greatest(8, ceil(count(*) / 64.0))::BIGINT AS st
           FROM embeddings),
probes AS (SELECT qv.* FROM qv, stride WHERE qv.vec_id % stride.st = 0),
dots AS (
  SELECT a.vec_id AS u, b.vec_id AS v,
         sum(a.q * b.q)::BIGINT AS dp
  FROM probes a JOIN probes b ON b.d = a.d AND b.vec_id <> a.vec_id
  GROUP BY 1, 2),
rk AS (
  SELECT u, v, row_number() OVER (PARTITION BY u
                                  ORDER BY dp DESC, v) AS rn
  FROM dots),
e AS (SELECT u, v FROM rk WHERE rn <= {_KNNG_K}),
recip AS (
  SELECT count(*)::BIGINT AS n_recip
  FROM e e1 JOIN e e2 ON e2.u = e1.v AND e2.v = e1.u),
indeg AS (SELECT v, count(*)::BIGINT AS ind FROM e GROUP BY v),
agg AS (
  SELECT (SELECT count(DISTINCT u) FROM e)::BIGINT AS n_nodes,
         (SELECT count(*) FROM e)::BIGINT AS n_edges,
         (SELECT n_recip FROM recip) AS n_reciprocal,
         (SELECT max(ind) FROM indeg)::BIGINT AS max_in_degree)
SELECT n_nodes, n_edges, n_reciprocal,
       (n_reciprocal * 1000 // n_edges)::BIGINT AS reciprocity_milli,
       max_in_degree
FROM agg""",
)
def emb_knn_graph_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph health audit over a corpus-scaled probe sample: build
    the directed k=3 nearest-neighbor graph (exact integer dots on
    milli-quantized vectors, (dp, id) total-ordered), then report edge
    reciprocity and the in-degree hub maximum — the graph-structure
    diagnostics (Jarman et al. / UMAP practice) that predict whether a
    kNN-based index or clustering will behave: low reciprocity or one
    giant hub means hubness pathology, and mutual-kNN methods will
    shatter. Probe-sampled like every recall audit (the ``_adc_stride``
    discipline, ~64 nodes at any corpus size — production runs the same
    audit on ANN candidates per cell); probes×probes dots are
    (64·d)-grain, never corpus². Oracle recomputes the identical graph
    in CTEs; reciprocity in floored milli."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select("vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q"))
    import math

    n = e.count()
    stride = max(8, math.ceil(n / 64.0))
    probes = materialize(qv.filter(F.col("vec_id") % stride == 0))
    dots = (
        probes.alias("a")
        .join(
            probes.alias("b"),
            (F.col("b.d") == F.col("a.d"))
            & (F.col("b.vec_id") != F.col("a.vec_id")),
        )
        .groupBy(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("v"))
        .agg(F.sum(F.col("a.q") * F.col("b.q")).cast("long").alias("dp"))
    )
    wk = Window.partitionBy("u").orderBy(F.desc("dp"), "v")
    edges = materialize(
        dots.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KNNG_K)
        .select("u", "v")
    )
    recip = (
        edges.alias("e1")
        .join(
            edges.alias("e2"),
            (F.col("e2.u") == F.col("e1.v")) & (F.col("e2.v") == F.col("e1.u")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    nodes = edges.agg(F.countDistinct("u").cast("long").alias("n_nodes"))
    ne = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    indeg = (
        edges.groupBy("v")
        .agg(F.count(F.lit(1)).alias("ind"))
        .agg(F.max("ind").cast("long").alias("max_in_degree"))
    )
    return (
        nodes.join(ne)
        .join(recip)
        .join(indeg)
        .select(
            "n_nodes",
            "n_edges",
            "n_reciprocal",
            F.expr("n_reciprocal * 1000 div n_edges")
            .cast("long")
            .alias("reciprocity_milli"),
            "max_in_degree",
        )
    )


# -------------------------------------------- audio clipping audit

_CLIP_THRESHOLD = 95  # int16 amplitude rail for the ±100 synthetic fixture


@q(
    "multimodal_audio_clipping",
    f"""WITH g AS (
  SELECT doc_id, source, (800 + 8 * (doc_id % 100))::BIGINT AS n
  FROM documents),
s AS (
  SELECT doc_id, source, n, unnest(generate_series(0, n - 1)) AS i
  FROM g),
h AS (
  SELECT doc_id, source, n,
         count(CASE WHEN (doc_id + i) % 200 <= 100 - {_CLIP_THRESHOLD}
                      OR (doc_id + i) % 200 >= 100 + {_CLIP_THRESHOLD}
                    THEN 1 END)::BIGINT AS hits
  FROM s GROUP BY 1, 2, 3)
SELECT source,
       count(*)::BIGINT AS n_clips,
       sum(CASE WHEN hits * 20 > n THEN 1 ELSE 0 END)::BIGINT
         AS clips_flagged,
       sum(hits)::BIGINT AS total_clipped,
       sum(n)::BIGINT AS total_samples,
       (sum(hits) * 1000 // sum(n))::BIGINT AS clip_share_milli
FROM h GROUP BY source ORDER BY source""",
)
def multimodal_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio clipping audit — the loudness-damage quality gate audio
    curation runs before transcription: REAL WAV decode (Arrow
    ``mapInPandas``, ``sources/multimodal.py audio_clipping_stats``)
    counts samples at or beyond the ±95 rail per clip; clips with >5 %
    clipped samples are flagged, rolled up per source. The oracle
    recomputes the counts CLOSED-FORM from the synthetic generator's
    sample law ((id+i) mod 200 − 100 — ``synthetic_audio_blobs``), so a
    decode that truncates frames, drops the header offset, or misreads
    endianness diverges immediately. Scale: decode is map-only (samples
    never shuffle — only per-clip counters), rollup is source-grain;
    the 5 %-flag is the integer cross-multiplication hits·20 > n."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        audio_clipping_stats,
        synthetic_audio_blobs,
    )

    d = load_table(spark, sf_dir, "documents")
    stats = audio_clipping_stats(
        synthetic_audio_blobs(d), threshold=_CLIP_THRESHOLD
    )
    return (
        stats.join(d.select(F.col("doc_id").alias("id"), "source"), "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clips"),
            F.sum(
                F.when(F.col("n_clipped") * 20 > F.col("n_samples"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("clips_flagged"),
            F.sum("n_clipped").cast("long").alias("total_clipped"),
            F.sum("n_samples").cast("long").alias("total_samples"),
            F.expr("sum(n_clipped) * 1000 div sum(n_samples)")
            .cast("long")
            .alias("clip_share_milli"),
        )
        .orderBy("source")
    )


# -------------------------------------------- uniqueness profile

_UNIQ_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey")


@q(
    "dq_uniqueness_profile",
    """WITH u AS (
  SELECT 'o_orderstatus' AS col_name, o_orderstatus::VARCHAR AS val
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders
  UNION ALL
  SELECT 'o_custkey', o_custkey::VARCHAR FROM orders),
vc AS (SELECT col_name, val, count(*)::BIGINT AS c FROM u GROUP BY 1, 2),
pc AS (
  SELECT col_name, count(*)::BIGINT AS n_distinct, sum(c)::BIGINT AS n,
         max(c)::BIGINT AS top_c,
         (floor(ln(sum(c)) * 1000000)::BIGINT
          - sum(c * floor(ln(c) * 1000000)::BIGINT)::BIGINT // sum(c))
           ::BIGINT AS entropy_micro
  FROM vc GROUP BY col_name)
SELECT col_name, n_distinct,
       (n_distinct * 1000000 // n)::BIGINT AS distinct_ratio_micro,
       (top_c * 1000 // n)::BIGINT AS top_share_milli,
       entropy_micro
FROM pc ORDER BY col_name""",
)
def dq_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column uniqueness/cardinality profile of ``orders``: per declared
    column the distinct count, distinct ratio, top-value share, and
    Shannon entropy of the value distribution — the profiling row a
    catalog shows per column and the input to join-strategy and
    encoding choices (a 3-value status column dictionary-encodes; a
    near-unique custkey does not). One UNPIVOT to (column, value) rows
    → ONE value-grain aggregate for every column together (scans never
    grow with the column count — the ``dq_completeness_matrix``
    discipline). Entropy in floored micro nats via the exact
    Σc·ln c identity, ratios in floored micro/milli."""
    o = load_table(spark, sf_dir, "orders")
    u = None
    for c in _UNIQ_COLS:
        part = o.select(
            F.lit(c).alias("col_name"), F.col(c).cast("string").alias("val")
        )
        u = part if u is None else u.unionAll(part)
    vc = u.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pc = vc.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("c").cast("long").alias("n"),
        F.max("c").cast("long").alias("top_c"),
        (
            F.floor(F.log(F.sum("c")) * 1000000)
            - F.expr("sum(c * cast(floor(ln(c) * 1000000) as bigint)) div sum(c)")
        )
        .cast("long")
        .alias("entropy_micro"),
    )
    return pc.select(
        "col_name",
        "n_distinct",
        F.expr("n_distinct * 1000000 div n").cast("long").alias("distinct_ratio_micro"),
        F.expr("top_c * 1000 div n").cast("long").alias("top_share_milli"),
        "entropy_micro",
    ).orderBy("col_name")


# ------------------------------------------------ graph reciprocity


@q(
    "graph_reciprocity",
    """WITH items AS (SELECT l_orderkey, l_partkey
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
  QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= 64),
e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
recip AS (
  SELECT count(*)::BIGINT AS n_recip
  FROM e e1 JOIN e e2 ON e2.src = e1.dst AND e2.dst = e1.src),
agg AS (
  SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
         (SELECT count(DISTINCT src) FROM e)::BIGINT AS n_sources,
         (SELECT n_recip FROM recip) AS n_reciprocal)
SELECT n_edges, n_sources, n_reciprocal,
       (n_reciprocal * 1000 // n_edges)::BIGINT AS reciprocity_milli
FROM agg""",
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity of the co-purchase graph — the
    Garlaschelli–Loffredo dial (what share of u→v edges have a v→u
    twin) that separates mutual-affinity structure from one-way
    accessory relationships, and calibrates whether the directed
    centralities (Katz, HITS, betweenness) will differ materially from
    their undirected twins. The co-purchase edge build is symmetric by
    construction ONLY when thresholds keep both directions — the ≥2
    shared-orders HAVING applies per direction, so reciprocity here is
    exactly 1000 unless the build drops a direction: the audit pins
    that invariant (and generalizes to any directed edge table).
    Scale: one orderkey-grain edge build + one (dst,src)-keyed
    self-equi-join at edge grain; counts only, no pair blowup."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    e = materialize(
        copurchase_edges(li, directed=True).select(
            F.col("src").alias("src"), F.col("dst").alias("dst")
        )
    )
    recip = (
        e.alias("e1")
        .join(
            e.alias("e2"),
            (F.col("e2.src") == F.col("e1.dst"))
            & (F.col("e2.dst") == F.col("e1.src")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    ns = e.agg(F.countDistinct("src").cast("long").alias("n_sources"))
    return (
        ne.join(ns)
        .join(recip)
        .select(
            "n_edges",
            "n_sources",
            "n_reciprocal",
            F.expr("n_reciprocal * 1000 div n_edges")
            .cast("long")
            .alias("reciprocity_milli"),
        )
    )


# -------------------------------------------- held-out perplexity


@q(
    "llm_heldout_perplexity",
    """WITH tr AS (
  SELECT unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE doc_id % 2 = 0),
freq AS (SELECT w, count(*)::BIGINT AS c FROM tr GROUP BY w),
tot AS (SELECT sum(c)::BIGINT AS t, count(*)::BIGINT AS v FROM freq),
ev AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS w
  FROM documents WHERE doc_id % 2 = 1),
scored AS (
  SELECT ev.source,
         floor(ln(tot.t + tot.v + 1) * 1000000)::BIGINT
           - floor(ln(coalesce(freq.c, 0) + 1) * 1000000)::BIGINT
           AS nll_micro,
         CASE WHEN freq.c IS NULL THEN 1 ELSE 0 END AS oov
  FROM ev LEFT JOIN freq ON freq.w = ev.w
  CROSS JOIN tot)
SELECT source,
       count(*)::BIGINT AS n_tokens,
       sum(oov)::BIGINT AS n_oov,
       (sum(oov) * 1000 // count(*))::BIGINT AS oov_milli,
       (sum(nll_micro) // count(*))::BIGINT AS nll_per_token_micro
FROM scored GROUP BY source ORDER BY source""",
)
def llm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT unigram perplexity — the generalization twin of
    ``llm_doc_ppl_percentiles`` (which scores the corpus with a model
    fit on itself): an add-one-smoothed unigram LM fit on the EVEN-doc
    half scores the ODD-doc half, per source — the standard
    train/held-out protocol LM-data papers report, and the honest
    quality dial (self-scored NLL rewards memorizable duplication;
    held-out NLL penalizes it). Also reports the OOV rate the training
    half fails to cover. Exactness: per-token nll term =
    floor(ln(T+V+1)·1e6) − floor(ln(c+1)·1e6) with c = 0 for OOV —
    difference of floored ln's on exact ints (no float ratio), final
    per-token division truncating. Scale: one train-half token agg +
    one vocab-keyed eval join (the ``llm_bigram_logprob`` shape) —
    linear, shuffles on the token hash."""
    d = load_table(spark, sf_dir, "documents")
    tr = d.filter(F.col("doc_id") % 2 == 0).select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    freq = tr.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = freq.agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    ev = d.filter(F.col("doc_id") % 2 == 1).select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    scored = (
        ev.join(freq, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            (
                F.floor(F.log(F.col("t") + F.col("v") + 1) * 1000000)
                - F.floor(
                    F.log(F.coalesce(F.col("c"), F.lit(0)) + 1) * 1000000
                )
            )
            .cast("long")
            .alias("nll_micro"),
            F.when(F.col("c").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("oov").cast("long").alias("n_oov"),
            F.expr("sum(oov) * 1000 div count(*)")
            .cast("long")
            .alias("oov_milli"),
            F.expr("sum(nll_micro) div count(*)")
            .cast("long")
            .alias("nll_per_token_micro"),
        )
        .orderBy("source")
    )


# -------------------------------------------- embedding centroid drift


@q(
    "emb_centroid_drift",
    """WITH qv AS (
  SELECT vec_id, label, vec_id % 2 AS half,
         unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
cent AS (
  SELECT label, half, d,
         (sum(q) // count(*))::BIGINT AS cq,
         count(*)::BIGINT AS n
  FROM qv GROUP BY 1, 2, 3),
a AS (SELECT label, d, cq AS c0, n AS n0 FROM cent WHERE half = 0),
b AS (SELECT label, d, cq AS c1, n AS n1 FROM cent WHERE half = 1)
SELECT label,
       max(n0)::BIGINT AS n_half0,
       max(n1)::BIGINT AS n_half1,
       sum((c0 - c1) * (c0 - c1))::BIGINT AS drift_d2,
       max(abs(c0 - c1))::BIGINT AS max_dim_gap
FROM a JOIN b USING (label, d)
GROUP BY label ORDER BY label""",
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between deterministic corpus
    halves (vec_id parity — standing in for two ingestion snapshots):
    squared L2 gap between half-centroids plus the worst single
    dimension — the embedding-space drift gate run before trusting a
    persisted ANN index against a re-encoded or re-crawled corpus
    (the ``dq_psi_drift`` idea lifted to vector space). Exactness:
    centroids are truncating integer means of milli coordinates; the
    gap is an exact integer quadratic. Scale: one (label, half, d)-grain
    partial agg (shuffle = labels × 2 × d rows, independent of N) and a
    d-grain self-join."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("d", "x"),
    ).select(
        "vec_id", "label", "half", "d",
        F.round(F.col("x") * 1000).cast("long").alias("q"),
    )
    cent = qv.groupBy("label", "half", "d").agg(
        F.expr("sum(q) div count(*)").cast("long").alias("cq"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "d", F.col("cq").alias("c0"), F.col("n").alias("n0")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "d", F.col("cq").alias("c1"), F.col("n").alias("n1")
    )
    return (
        a.join(b, ["label", "d"])
        .groupBy("label")
        .agg(
            F.max("n0").cast("long").alias("n_half0"),
            F.max("n1").cast("long").alias("n_half1"),
            F.sum((F.col("c0") - F.col("c1")) * (F.col("c0") - F.col("c1")))
            .cast("long")
            .alias("drift_d2"),
            F.max(F.abs(F.col("c0") - F.col("c1")))
            .cast("long")
            .alias("max_dim_gap"),
        )
        .orderBy("label")
    )


# ------------------------------------------------ Hurst exponent (R/S)

_HURST_WINDOWS = (8, 16, 32)
_LN4_MICRO = 1386294  # floor(ln(4) * 1e6) — the ln(32/8) denominator


@q(
    "ts_hurst_exponent",
    f"""WITH daily AS (
  SELECT event_type,
         (epoch(date_trunc('day', ts))::BIGINT // 86400) AS ed,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
mn AS (SELECT min(ed)::BIGINT AS m FROM daily),
idx AS (SELECT event_type, ed - mn.m AS di, x FROM daily, mn),
ws AS (SELECT unnest(ARRAY{list(_HURST_WINDOWS)})::BIGINT AS w),
blk AS (
  SELECT i.event_type, ws.w, i.di // ws.w AS b, i.di, i.x
  FROM idx i, ws),
bs AS (
  SELECT event_type, w, b, sum(x)::BIGINT AS s, sum(x * x)::BIGINT AS q,
         count(*)::BIGINT AS n
  FROM blk GROUP BY 1, 2, 3),
full_b AS (SELECT * FROM bs WHERE n = w),
dev AS (
  SELECT blk.event_type, blk.w, blk.b,
         blk.w * sum(blk.x) OVER (PARTITION BY blk.event_type, blk.w, blk.b
                                  ORDER BY blk.di
                                  ROWS UNBOUNDED PRECEDING)
           - row_number() OVER (PARTITION BY blk.event_type, blk.w, blk.b
                                ORDER BY blk.di) * f.s AS dv,
         f.s, f.q
  FROM blk JOIN full_b f
    ON f.event_type = blk.event_type AND f.w = blk.w AND f.b = blk.b),
rs AS (
  SELECT event_type, w, b,
         ((max(dv) - min(dv)) * 1000
          // floor(sqrt(max(w * q - s * s)))::BIGINT)::BIGINT AS rs_milli
  FROM dev
  WHERE w * q - s * s > 0
  GROUP BY 1, 2, 3),
mrs AS (
  SELECT event_type, w,
         count(*)::BIGINT AS n_blocks,
         (sum(rs_milli) // count(*))::BIGINT AS mean_rs
  FROM rs GROUP BY 1, 2)
SELECT event_type,
       max(CASE WHEN w = 8 THEN n_blocks END)::BIGINT AS blocks_w8,
       max(CASE WHEN w = 8 THEN mean_rs END)::BIGINT AS rs8_milli,
       max(CASE WHEN w = 16 THEN mean_rs END)::BIGINT AS rs16_milli,
       max(CASE WHEN w = 32 THEN mean_rs END)::BIGINT AS rs32_milli,
       ((floor(ln(max(CASE WHEN w = 32 THEN mean_rs END)) * 1000000)::BIGINT
         - floor(ln(max(CASE WHEN w = 8 THEN mean_rs END)) * 1000000)::BIGINT)
        * 1000 // {_LN4_MICRO})::BIGINT AS hurst_milli
FROM mrs
GROUP BY event_type
HAVING max(CASE WHEN w = 8 THEN mean_rs END) > 0
   AND max(CASE WHEN w = 32 THEN mean_rs END) > 0
ORDER BY event_type""",
)
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range (R/S) analysis of the daily
    event-count series per type — the long-range-dependence dial
    (H ≈ 0.5 memoryless, > 0.5 persistent/trending, < 0.5
    mean-reverting) behind capacity planning and anomaly-gate tuning
    (a persistent series needs wider control bands than an i.i.d. one).
    Per window size W ∈ {{8, 16, 32}} days: complete W-day blocks only;
    within a block the cumulative deviation is kept EXACT by scaling
    with W (dv_i = W·cumsum(x) − i·S, so no rational mean ever
    appears), R/S = range(dv) / floor(sqrt(W·Σx² − S²)) in floored
    milli (the single sqrt runs on an exact int — correctly-rounded
    IEEE). H = Δln(R/S)/ln(4) between W=32 and W=8 from floored-micro
    ln's. Scale: day-grain pre-agg is the only pass over raw rows;
    blocks/windows are (type × calendar)-bounded frames."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", "ts")).cast("long").alias("es"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x")).select(
        "event_type", F.expr("es div 86400").cast("long").alias("ed"), "x"
    )
    mn = daily.agg(F.min("ed").cast("long").alias("m"))
    idx = daily.crossJoin(F.broadcast(mn)).select(
        "event_type", (F.col("ed") - F.col("m")).alias("di"), "x"
    )
    ws = spark.range(1).select(
        F.explode(F.array(*[F.lit(w) for w in _HURST_WINDOWS])).alias("w0")
    ).select(F.col("w0").cast("long").alias("w"))
    blk = idx.crossJoin(F.broadcast(ws)).select(
        "event_type", "w", F.expr("di div w").alias("b"), "di", "x"
    )
    bs = blk.groupBy("event_type", "w", "b").agg(
        F.sum("x").cast("long").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("q"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    full_b = bs.filter(F.col("n") == F.col("w")).select(
        "event_type", "w", "b", "s", "q"
    )
    wcum = (
        Window.partitionBy("event_type", "w", "b")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy("event_type", "w", "b").orderBy("di")
    dev = blk.join(full_b, ["event_type", "w", "b"]).select(
        "event_type",
        "w",
        "b",
        (
            F.col("w") * F.sum("x").over(wcum)
            - F.row_number().over(wrn) * F.col("s")
        ).alias("dv"),
        "s",
        "q",
    )
    rs = (
        dev.filter(F.col("w") * F.col("q") - F.col("s") * F.col("s") > 0)
        .groupBy("event_type", "w", "b")
        .agg(
            F.expr(
                "(max(dv) - min(dv)) * 1000"
                " div cast(floor(sqrt(max(w * q - s * s))) as bigint)"
            )
            .cast("long")
            .alias("rs_milli")
        )
    )
    mrs = rs.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.expr("sum(rs_milli) div count(*)").cast("long").alias("mean_rs"),
    )
    out = mrs.groupBy("event_type").agg(
        F.max(F.when(F.col("w") == 8, F.col("n_blocks")))
        .cast("long")
        .alias("blocks_w8"),
        F.max(F.when(F.col("w") == 8, F.col("mean_rs")))
        .cast("long")
        .alias("rs8_milli"),
        F.max(F.when(F.col("w") == 16, F.col("mean_rs")))
        .cast("long")
        .alias("rs16_milli"),
        F.max(F.when(F.col("w") == 32, F.col("mean_rs")))
        .cast("long")
        .alias("rs32_milli"),
    )
    return (
        out.filter((F.col("rs8_milli") > 0) & (F.col("rs32_milli") > 0))
        .select(
            "event_type",
            "blocks_w8",
            "rs8_milli",
            "rs16_milli",
            "rs32_milli",
            F.expr(
                "(cast(floor(ln(rs32_milli) * 1000000) as bigint)"
                " - cast(floor(ln(rs8_milli) * 1000000) as bigint))"
                f" * 1000 div {_LN4_MICRO}"
            )
            .cast("long")
            .alias("hurst_milli"),
        )
        .orderBy("event_type")
    )
