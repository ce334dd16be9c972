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
