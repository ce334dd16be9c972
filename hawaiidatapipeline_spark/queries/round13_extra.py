"""Round-13 additions: data-mixing allocation, CCNet bucketing, semantic
decontamination, and embedding-geometry health (SURVEY.md §2.J).

Four gaps a production training-data pipeline hits that the registry did
not yet cover:

- **UniMax allocation** (Chung et al. 2023): the closed-form
  epoch-capped budget waterfill that replaced temperature sampling for
  multilingual mixes — distinct from ``llm_mixture_epochs`` (the
  sqrt-mixture repeat planner): UniMax maximizes uniformity subject to a
  per-source repeat cap instead of reweighting by a power of size.
- **CCNet buckets** (Wenzek et al. 2019): the head/middle/tail tercile
  split by corpus-LM perplexity, per language — the split CCNet-family
  pipelines SAMPLE from (head-heavy), where ``llm_doc_ppl_percentiles``
  only reports the percentile curve.
- **Semantic decontamination**: benchmark-leak detection in EMBEDDING
  space (cosine against a probe set), the complement of the n-gram
  ``llm_decontaminate`` — catches paraphrased leakage n-grams miss.
- **Embedding geometry**: TwoNN intrinsic dimension (Facco et al. 2017)
  and a per-dimension whitening audit — the health checks run before
  trusting an index or a whitening transform.

House determinism rules throughout: whitespace tokens, milli/micro
integer fixed point with floor after each transcendental, wide
DECIMAL(38,0)/HUGEINT intermediates where int64 could wrap, aliases
identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# ------------------------------------------------------------- UniMax

_UNIMAX_EPOCH_CAP = 4  # max repeats of any source
_UNIMAX_BUDGET_DEN = 2  # token budget = total corpus tokens / 2


@q(
    "llm_unimax_allocation",
    f"""WITH st AS (
  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS tokens
  FROM documents GROUP BY source),
b AS (SELECT (sum(tokens) // {_UNIMAX_BUDGET_DEN})::BIGINT AS budget,
             count(*)::BIGINT AS k
      FROM st),
r AS (
  SELECT source, tokens,
         row_number() OVER (ORDER BY tokens, source) AS i,
         sum(tokens * {_UNIMAX_EPOCH_CAP})
           OVER (ORDER BY tokens, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           ::BIGINT AS pcap
  FROM st),
ok AS (
  SELECT r.*, b.budget, b.k,
         CASE WHEN tokens * {_UNIMAX_EPOCH_CAP} * (b.k - i + 1)
                   <= b.budget - (pcap - tokens * {_UNIMAX_EPOCH_CAP})
              THEN 1 ELSE 0 END AS fits
  FROM r, b),
pf AS (
  SELECT ok.*,
         min(fits) OVER (ORDER BY i
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS prefix_ok
  FROM ok),
m AS (SELECT coalesce(sum(prefix_ok), 0)::BIGINT AS m,
             coalesce(sum(CASE WHEN prefix_ok = 1 THEN
                          tokens * {_UNIMAX_EPOCH_CAP} END), 0)::BIGINT AS pm
      FROM pf)
SELECT pf.source, pf.tokens,
       (CASE WHEN pf.prefix_ok = 1 THEN pf.tokens * {_UNIMAX_EPOCH_CAP}
             ELSE (pf.budget - m.pm) // (pf.k - m.m) END)::BIGINT
         AS alloc_tokens,
       (CASE WHEN pf.prefix_ok = 1 THEN pf.tokens * {_UNIMAX_EPOCH_CAP}
             ELSE (pf.budget - m.pm) // (pf.k - m.m) END) * 1000
         // pf.tokens AS epochs_milli,
       pf.prefix_ok AS capped
FROM pf, m ORDER BY pf.source""",
)
def llm_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, 'UniMax: Fairer and
    More Effective Language Sampling'): given a token budget (half the
    corpus here) and a per-source repeat cap E = 4, allocate the budget
    as uniformly as possible — process sources by ASCENDING size; a
    source whose full E-epoch allotment fits under the equal share of
    the remaining budget is CAPPED at E epochs, everything larger splits
    the remainder equally. The capped set is prefix-closed in size
    order, so the sequential waterfill collapses to window functions
    over the SOURCE-grain frame: a running cap prefix-sum, an integer
    fits test (E·n_i·(K−i+1) ≤ B − P_{i−1}), a running-min prefix AND,
    and one integer split of the leftover. Output per source: tokens,
    allocated tokens, achieved epochs (milli), capped flag. Scale: one
    linear token-count agg; everything after is K rows (sources) — the
    single-partition windows run on a constant-size frame, never the
    corpus."""
    d = load_table(spark, sf_dir, "documents")
    st = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tokens")
    )
    b = st.agg(
        F.expr(f"sum(tokens) div {_UNIMAX_BUDGET_DEN}").alias("budget"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    wasc = Window.orderBy("tokens", "source")
    r = st.select(
        "source",
        "tokens",
        F.row_number().over(wasc).alias("i"),
        F.sum(F.col("tokens") * _UNIMAX_EPOCH_CAP)
        .over(wasc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("pcap"),
    )
    ok = r.crossJoin(F.broadcast(b)).select(
        "*",
        F.when(
            F.col("tokens") * _UNIMAX_EPOCH_CAP * (F.col("k") - F.col("i") + 1)
            <= F.col("budget")
            - (F.col("pcap") - F.col("tokens") * _UNIMAX_EPOCH_CAP),
            1,
        )
        .otherwise(0)
        .alias("fits"),
    )
    wi = Window.orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pf = ok.select("*", F.min("fits").over(wi).alias("prefix_ok"))
    m = pf.agg(
        F.coalesce(F.sum("prefix_ok"), F.lit(0)).cast("long").alias("m"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("prefix_ok") == 1,
                    F.col("tokens") * _UNIMAX_EPOCH_CAP,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("pm"),
    )
    alloc = F.when(
        F.col("prefix_ok") == 1, F.col("tokens") * _UNIMAX_EPOCH_CAP
    ).otherwise(
        F.expr("(budget - pm) div (k - m)")
    )
    return (
        pf.crossJoin(F.broadcast(m))
        .select(
            "source",
            "tokens",
            alloc.cast("long").alias("alloc_tokens"),
            F.expr(
                f"""(CASE WHEN prefix_ok = 1 THEN tokens * {_UNIMAX_EPOCH_CAP}
                     ELSE (budget - pm) div (k - m) END) * 1000
                    div tokens"""
            ).alias("epochs_milli"),
            F.col("prefix_ok").cast("int").alias("capped"),
        )
        .orderBy("source")
    )


# ------------------------------------------------------ CCNet buckets

# Shared with llm_bigram_logprob (mining_extra): add-one-smoothed bigram
# LM fit on the corpus itself, per-doc mean NLL in micro units.
_CCNET_NLL_SQL = """docs AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS a FROM documents),
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
         ((-sum(t.t_micro)) // count(*))::BIGINT AS nll_micro
  FROM occ o JOIN term t USING (bg) GROUP BY o.doc_id)"""


@q(
    "llm_ccnet_buckets",
    f"""WITH {_CCNET_NLL_SQL},
scored AS (
  SELECT d.lang, p.doc_id, p.nll_micro,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY p.nll_micro, p.doc_id) AS rnk,
         count(*) OVER (PARTITION BY d.lang) AS n
  FROM per_doc p JOIN docs d USING (doc_id))
SELECT lang,
       (1 + (3 * (rnk - 1)) // n)::BIGINT AS bucket,
       count(*)::BIGINT AS n_docs,
       min(nll_micro)::BIGINT AS min_nll_micro,
       max(nll_micro)::BIGINT AS max_nll_micro,
       (sum(nll_micro) // count(*))::BIGINT AS mean_nll_micro
FROM scored GROUP BY 1, 2 ORDER BY lang, bucket""",
)
def llm_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): per
    language, documents split into head/middle/tail TERCILES (bucket
    1/2/3) of the corpus-LM per-doc mean NLL — the split the CCNet
    family samples from (head-heavy mixes, tail often dropped). The LM
    is the same add-one-smoothed bigram model as ``llm_bigram_logprob``
    (integer micro-unit log terms, exact per-doc sums); terciles are
    RANK-based under the (nll, doc_id) total order, so the assignment is
    deterministic — no percentile interpolation. Single-token documents
    have no bigrams and are out of scope of the LM screen (documented,
    both engines agree). Output: (lang, bucket) doc counts and min/max/
    mean NLL. Scale: model fit is two linear hash aggs; scoring is one
    bigram-keyed equi-join; the rank window is per-language over doc-
    grain rows — the same shape the existing percentile keys run."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), " ").alias("a")
    )
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
    vocab = docs.select(F.explode("a").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    term = (
        bgc.join(pfc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                (F.log(F.col("cb") + 1) - F.log(F.col("cp") + F.col("v")))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    per_doc = (
        occ.join(term, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(-sum(t_micro)) div count(*)").alias("nll_micro"),
        )
    )
    wl = Window.partitionBy("lang").orderBy("nll_micro", "doc_id")
    wn = Window.partitionBy("lang")
    scored = per_doc.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang",
        "nll_micro",
        F.row_number().over(wl).alias("rnk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        scored.select(
            "lang",
            (1 + F.expr("(3 * (rnk - 1)) div n")).cast("long").alias("bucket"),
            "nll_micro",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("nll_micro").cast("long").alias("min_nll_micro"),
            F.max("nll_micro").cast("long").alias("max_nll_micro"),
            F.expr("sum(nll_micro) div count(*)").alias("mean_nll_micro"),
        )
        .orderBy("lang", "bucket")
    )


# ------------------------------------------- semantic decontamination

_SEMDECON_TAU2_PCT = 81  # cos^2 threshold in percent: cos >= 0.9


@q(
    "llm_decontaminate_semantic",
    """WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
nrm AS (SELECT vec_id, sum(q * q)::BIGINT AS n2 FROM qv GROUP BY vec_id),
probes AS (
  SELECT * FROM qv
  WHERE vec_id % (SELECT greatest(31, ceil(count(*) / 65.0))::BIGINT
                  FROM embeddings) = 0),
dots AS (
  SELECT p.vec_id AS probe_id, v.vec_id, sum(p.q * v.q)::BIGINT AS dp
  FROM probes p JOIN qv v ON v.d = p.d
  WHERE v.vec_id <> p.vec_id
  GROUP BY 1, 2),
flagged AS (
  SELECT d.vec_id,
         max(CASE WHEN d.dp > 0
                  AND d.dp::HUGEINT * d.dp * 100
                      >= 81::HUGEINT * nv.n2 * np.n2
             THEN 1 ELSE 0 END) AS hit
  FROM dots d JOIN nrm nv ON nv.vec_id = d.vec_id
              JOIN nrm np ON np.vec_id = d.probe_id
  GROUP BY 1)
SELECT e.label::BIGINT AS label,
       count(*)::BIGINT AS n_scanned,
       coalesce(sum(f.hit), 0)::BIGINT AS n_contaminated
FROM embeddings e JOIN flagged f ON f.vec_id = e.vec_id
GROUP BY 1 ORDER BY 1""",
)
def llm_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination — the semantic complement of the
    n-gram ``llm_decontaminate``: a corpus-scaled probe set (the ~65-row
    ``_adc_stride`` sample, standing in for benchmark eval vectors)
    sweeps the corpus and every vector whose cosine to ANY probe clears
    0.9 is flagged as suspected leakage — paraphrased or re-encoded
    contamination that exact n-gram matching cannot see. Exactness: the
    cosine test is the INTEGER comparison dp² · 100 ≥ 81 · |v|² · |p|²
    (dp > 0) over milli-quantized vectors — no sqrt, no float; dp² can
    wrap int64 so both engines compare in DECIMAL(38,0)/HUGEINT. Output:
    per label, vectors scanned and vectors flagged. Scale: probes ×
    corpus exact sweep with the probe set held ~65 by the corpus-scaled
    stride (recall-audit discipline); the production path runs the same
    test per ANN cell against the real benchmark set (which is always
    probe-sized)."""
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    e = load_table(spark, sf_dir, "embeddings")
    qv = materialize(
        e.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
            "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
        )
    )
    nrm = qv.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).cast("long").alias("n2")
    )
    stride = _adc_stride(spark, sf_dir)
    probes = qv.filter(F.col("vec_id") % stride == 0)
    dots = (
        probes.alias("p")
        .join(qv.alias("v"), F.col("p.d") == F.col("v.d"))
        .filter(F.col("v.vec_id") != F.col("p.vec_id"))
        .groupBy(
            F.col("p.vec_id").alias("probe_id"),
            F.col("v.vec_id").alias("vec_id"),
        )
        .agg(F.sum(F.col("p.q") * F.col("v.q")).cast("long").alias("dp"))
    )
    dec = "decimal(38,0)"
    flagged = (
        dots.join(
            nrm.select(F.col("vec_id"), F.col("n2").alias("nv")), "vec_id"
        )
        .join(
            F.broadcast(
                nrm.select(
                    F.col("vec_id").alias("probe_id"), F.col("n2").alias("np")
                )
            ),
            "probe_id",
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.when(
                    (F.col("dp") > 0)
                    & (
                        F.col("dp").cast(dec) * F.col("dp") * 100
                        >= F.lit(_SEMDECON_TAU2_PCT).cast(dec)
                        * F.col("nv")
                        * F.col("np")
                    ),
                    1,
                ).otherwise(0)
            ).alias("hit")
        )
    )
    return (
        e.select("vec_id", F.col("label").cast("long").alias("label"))
        .join(flagged, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scanned"),
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .orderBy("label")
    )


# ---------------------------------------------- TwoNN intrinsic dimension


@q(
    "emb_intrinsic_dim_twonn",
    """WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
probes AS (
  SELECT * FROM qv
  WHERE vec_id % (SELECT greatest(31, ceil(count(*) / 65.0))::BIGINT
                  FROM embeddings) = 0),
d2 AS (
  SELECT p.vec_id AS probe_id, v.vec_id AS other_id,
         sum((p.q - v.q) * (p.q - v.q))::BIGINT AS d2
  FROM probes p JOIN qv v ON v.d = p.d
  WHERE v.vec_id <> p.vec_id
  GROUP BY 1, 2),
ranked AS (
  SELECT probe_id, d2,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY d2, other_id) AS rnk
  FROM d2 WHERE d2 > 0),
mu AS (
  SELECT probe_id,
         floor(ln(max(CASE WHEN rnk = 2 THEN d2 END)::DOUBLE
                  / max(CASE WHEN rnk = 1 THEN d2 END)) * 1000000)::BIGINT
           AS lnmu_micro
  FROM ranked WHERE rnk <= 2 GROUP BY probe_id
  HAVING max(CASE WHEN rnk = 2 THEN d2 END) IS NOT NULL)
SELECT count(*)::BIGINT AS n_probes,
       sum(lnmu_micro)::BIGINT AS sum_lnmu_micro,
       (count(*) * 2000000000 // nullif(sum(lnmu_micro), 0))::BIGINT
         AS id_milli
FROM mu""",
)
def emb_intrinsic_dim_twonn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017): for each
    corpus-scaled probe, μ = r₂/r₁ — the ratio of 2nd- to 1st-nearest-
    neighbor distance — and ID = n / Σ ln μ (the Pareto MLE). A LOW ID
    against the ambient dim means the embeddings live on a thin manifold
    (expected, healthy); ID ≈ ambient dim on random noise. Works on
    SQUARED exact int64 distances: ln(d₂²/d₁²) = 2·ln μ, so the
    estimator is n·2e9 // Σ floor(ln(d₂²/d₁²)·1e6) in milli units — ln
    of a ratio of two exact integers is the single transcendental,
    floored immediately (house rule). Zero-distance duplicates are
    excluded from the neighbor ranks (μ would be undefined); ranks are
    total-ordered by (d², id). Scale: the exact leg is probes × corpus
    with probes held ~65 by the corpus-scaled ``_adc_stride``; per-probe
    state after the distance agg is 2 rows."""
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    e = load_table(spark, sf_dir, "embeddings")
    qv = materialize(
        e.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
            "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
        )
    )
    stride = _adc_stride(spark, sf_dir)
    probes = qv.filter(F.col("vec_id") % stride == 0)
    d2 = (
        probes.alias("p")
        .join(qv.alias("v"), F.col("p.d") == F.col("v.d"))
        .filter(F.col("v.vec_id") != F.col("p.vec_id"))
        .groupBy(
            F.col("p.vec_id").alias("probe_id"),
            F.col("v.vec_id").alias("other_id"),
        )
        .agg(
            F.sum(
                (F.col("p.q") - F.col("v.q")) * (F.col("p.q") - F.col("v.q"))
            )
            .cast("long")
            .alias("d2")
        )
        .filter(F.col("d2") > 0)
    )
    wr = Window.partitionBy("probe_id").orderBy("d2", "other_id")
    ranked = d2.select("probe_id", "d2", F.row_number().over(wr).alias("rnk"))
    mu = (
        ranked.filter(F.col("rnk") <= 2)
        .groupBy("probe_id")
        .agg(
            F.max(F.when(F.col("rnk") == 1, F.col("d2"))).alias("d1"),
            F.max(F.when(F.col("rnk") == 2, F.col("d2"))).alias("d2n"),
        )
        .filter(F.col("d2n").isNotNull())
        .select(
            F.floor(
                F.log(F.col("d2n").cast("double") / F.col("d1"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("lnmu_micro")
        )
    )
    return mu.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("lnmu_micro").cast("long").alias("sum_lnmu_micro"),
        F.expr(
            "CAST(count(1) * 2000000000 div nullif(sum(lnmu_micro), 0) "
            "AS BIGINT)"
        ).alias("id_milli"),
    )


# ------------------------------------------------- whitening audit


@q(
    "emb_whitening_audit",
    """WITH qv AS (
  SELECT unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
mom AS (
  SELECT d, count(*)::BIGINT AS n, sum(q)::BIGINT AS sx,
         sum(q * q)::BIGINT AS sxx
  FROM qv GROUP BY d),
v AS (
  SELECT d, n,
         ((n::HUGEINT * sxx - sx::HUGEINT * sx) // (n::HUGEINT * n))::BIGINT
           AS var_mm2
  FROM mom),
s AS (
  SELECT d, n, var_mm2,
         CASE WHEN var_mm2 > 0
              THEN floor(1000000.0 / sqrt(var_mm2))::BIGINT END AS scale_micro
  FROM v)
SELECT d AS dim, n, var_mm2, scale_micro,
       CASE WHEN scale_micro IS NOT NULL
            THEN (var_mm2 * scale_micro * scale_micro) // 1000000 END
         ::BIGINT AS post_var_micro
FROM s ORDER BY dim""",
)
def emb_whitening_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension whitening audit — the health check before trusting
    a diagonal (PCA-free) whitening transform: per dim, the exact
    population variance of the milli-quantized coordinate (integer
    co-moments n·Σx² − (Σx)², widened to DECIMAL(38,0)/HUGEINT before
    the multiply — the emb_effective_rank envelope), the whitening scale
    floor(1e6/√var) (one sqrt, floored — house rule), and the POST-
    whitening variance the floored scale actually achieves (pure integer
    from var · scale², ≈ 1e6 micro = unit variance; the deviation IS the
    quantization cost of the fixed-point transform). A dim with var 0 is
    constant (scale NULL) — the degenerate-coordinate alarm. Scale: one
    explode + map-side-combined d-grain agg — the shuffle is d = 64
    groups regardless of N, the covariance-family discipline."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = e.select(F.posexplode("embedding").alias("d", "x")).select(
        "d", F.round(F.col("x") * 1000).cast("long").alias("q")
    )
    dec = "decimal(38,0)"
    mom = qv.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("sx"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sxx"),
    )
    v = mom.select(
        "d",
        "n",
        F.expr(
            f"CAST((CAST(n AS {dec}) * sxx - CAST(sx AS {dec}) * sx) "
            f"div (CAST(n AS {dec}) * n) AS BIGINT)"
        ).alias("var_mm2"),
    )
    s = v.select(
        "d",
        "n",
        "var_mm2",
        F.when(
            F.col("var_mm2") > 0,
            F.floor(F.lit(1000000.0) / F.sqrt(F.col("var_mm2"))).cast("long"),
        ).alias("scale_micro"),
    )
    return s.select(
        F.col("d").alias("dim"),
        "n",
        "var_mm2",
        "scale_micro",
        F.when(
            F.col("scale_micro").isNotNull(),
            F.expr(
                "(var_mm2 * scale_micro * scale_micro) div 1000000"
            ),
        )
        .cast("long")
        .alias("post_var_micro"),
    ).orderBy("dim")


# -------------------------------------------- cosine isotropy histogram


@q(
    "emb_cosine_histogram",
    """WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
nrm AS (SELECT vec_id, sum(q * q)::BIGINT AS n2 FROM qv GROUP BY vec_id),
probes AS (
  SELECT * FROM qv
  WHERE vec_id % (SELECT greatest(31, ceil(count(*) / 65.0))::BIGINT
                  FROM embeddings) = 0),
dots AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.q * b.q)::BIGINT AS dp
  FROM probes a JOIN probes b ON b.d = a.d AND b.vec_id > a.vec_id
  GROUP BY 1, 2),
buck AS (
  SELECT (CASE WHEN d.dp >= 0 THEN 1 ELSE -1 END
          * ((d.dp::HUGEINT * d.dp * 10) // (na.n2::HUGEINT * nb.n2)))
           ::BIGINT AS bucket
  FROM dots d JOIN nrm na ON na.vec_id = d.ia
              JOIN nrm nb ON nb.vec_id = d.ib)
SELECT bucket, count(*)::BIGINT AS n_pairs
FROM buck GROUP BY bucket ORDER BY bucket""",
)
def emb_cosine_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over the corpus-scaled probe sample —
    the ISOTROPY diagnostic that complements ``emb_effective_rank`` and
    ``emb_intrinsic_dim_twonn``: healthy embeddings concentrate near
    bucket 0 (near-orthogonal pairs); mass in high buckets means an
    anisotropic cone (every vector similar to every other — cosine
    ranking degenerates, the Ethayarajh 2019 failure mode). Bucket =
    sign(cos) · floor(10·cos²) computed INTEGER-only: sign(dp) ·
    (dp²·10 // |a|²|b|²) in DECIMAL(38,0)/HUGEINT — no sqrt, no float;
    bucket b covers |cos| in [√(b/10), √((b+1)/10)). Scale: probe-pair
    grain (~65²/2 ≈ 2k pairs at ANY corpus size — the stride holds the
    sample constant); one probe-side self-join on the dim key, then a
    ≤ 21-group agg."""
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
        "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
    )
    stride = _adc_stride(spark, sf_dir)
    probes = materialize(qv.filter(F.col("vec_id") % stride == 0))
    nrm = probes.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).cast("long").alias("n2")
    )
    dots = (
        probes.alias("a")
        .join(
            probes.alias("b"),
            (F.col("b.d") == F.col("a.d"))
            & (F.col("b.vec_id") > F.col("a.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib")
        )
        .agg(F.sum(F.col("a.q") * F.col("b.q")).cast("long").alias("dp"))
    )
    dec = "decimal(38,0)"
    buck = (
        dots.join(
            F.broadcast(nrm.select(F.col("vec_id").alias("ia"),
                                   F.col("n2").alias("na"))), "ia"
        )
        .join(
            F.broadcast(nrm.select(F.col("vec_id").alias("ib"),
                                   F.col("n2").alias("nb"))), "ib"
        )
        .select(
            (
                F.when(F.col("dp") >= 0, 1).otherwise(-1)
                * F.expr(
                    f"CAST((CAST(dp AS {dec}) * dp * 10) "
                    f"div (CAST(na AS {dec}) * nb) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("bucket")
        )
    )
    return (
        buck.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("bucket")
    )


# --------------------------------------------- domain cross-entropy


@q(
    "llm_domain_cross_entropy",
    f"""WITH {_CCNET_NLL_SQL},
docsrc AS (SELECT doc_id, source FROM documents),
srcagg AS (
  SELECT d.source, sum(p.n_bigrams)::BIGINT AS n_bigrams,
         sum(p.n_bigrams * p.nll_micro)::BIGINT AS tot
  FROM per_doc p JOIN docsrc d USING (doc_id)
  GROUP BY d.source),
corpus AS (
  SELECT (sum(tot) // sum(n_bigrams))::BIGINT AS corpus_ce FROM srcagg)
SELECT s.source, s.n_bigrams,
       (s.tot // s.n_bigrams)::BIGINT AS ce_micro,
       ((s.tot // s.n_bigrams) - c.corpus_ce)::BIGINT AS delta_micro
FROM srcagg s, corpus c ORDER BY delta_micro DESC, source""",
)
def llm_domain_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE cross-entropy under the corpus bigram LM — the
    domain-shift ranking a mixture designer reads before reweighting
    (DoReMi's excess-loss signal at domain grain): a source whose
    cross-entropy sits far above the corpus mean is out-of-distribution
    for the current mix (upweight candidate under DoReMi, downweight
    under quality-first). Same integer micro-unit LM terms as
    ``llm_ccnet_buckets``/``llm_bigram_logprob``; the per-source mean
    weights each doc by its bigram count (token-weighted, the
    information-theoretic convention), and delta = source CE − corpus
    CE in exact integer arithmetic. Scale: the model aggs and the
    bigram join are the linear legs; source grain after that."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "source", F.split(F.lower(F.col("text")), " ").alias("a")
    )
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
    vocab = docs.select(F.explode("a").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    term = (
        bgc.join(pfc, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.floor(
                (F.log(F.col("cb") + 1) - F.log(F.col("cp") + F.col("v")))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("t_micro"),
        )
    )
    per_doc = (
        occ.join(term, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(-sum(t_micro)) div count(*)").alias("nll_micro"),
        )
    )
    srcagg = (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum(F.col("n_bigrams") * F.col("nll_micro"))
            .cast("long")
            .alias("tot"),
        )
    )
    corpus = srcagg.agg(
        F.expr("sum(tot) div sum(n_bigrams)").alias("corpus_ce")
    )
    return (
        srcagg.crossJoin(F.broadcast(corpus))
        .select(
            "source",
            "n_bigrams",
            F.expr("tot div n_bigrams").alias("ce_micro"),
            F.expr("(tot div n_bigrams) - corpus_ce").alias("delta_micro"),
        )
        .orderBy(F.col("delta_micro").desc(), "source")
    )


# ------------------------------------------- sampled betweenness (Brandes)

_BETW_TOPK = 50


def _betw_sql() -> str:
    from hawaiidatapipeline_spark.queries.graph_demo import (
        _ADJ_SQL,
        _BFS_SEED_MOD_SQL,
    )

    return f"""WITH RECURSIVE {_ADJ_SQL},
seeds AS (
  SELECT DISTINCT node FROM adj WHERE node % {_BFS_SEED_MOD_SQL} = 0),
bfs (seed, node, dist) AS (
  SELECT node, node, 0 FROM seeds
  UNION
  SELECT bfs.seed, adj.nbr, bfs.dist + 1
  FROM bfs JOIN adj ON adj.node = bfs.node
  WHERE bfs.dist < 3),
lv AS (SELECT seed, node, min(dist) AS dist FROM bfs GROUP BY 1, 2),
s0 AS (SELECT node AS seed, node, 1::BIGINT AS sig FROM seeds),
s1 AS (
  SELECT s0.seed, a.nbr AS node, sum(s0.sig)::BIGINT AS sig
  FROM s0 JOIN adj a ON a.node = s0.node
  JOIN lv ON lv.seed = s0.seed AND lv.node = a.nbr AND lv.dist = 1
  GROUP BY 1, 2),
s2 AS (
  SELECT s1.seed, a.nbr AS node, sum(s1.sig)::BIGINT AS sig
  FROM s1 JOIN adj a ON a.node = s1.node
  JOIN lv ON lv.seed = s1.seed AND lv.node = a.nbr AND lv.dist = 2
  GROUP BY 1, 2),
s3 AS (
  SELECT s2.seed, a.nbr AS node, sum(s2.sig)::BIGINT AS sig
  FROM s2 JOIN adj a ON a.node = s2.node
  JOIN lv ON lv.seed = s2.seed AND lv.node = a.nbr AND lv.dist = 3
  GROUP BY 1, 2),
d2 AS (
  SELECT v.seed, v.node,
         sum((v.sig * 1000000) // w.sig)::BIGINT AS delta
  FROM s2 v JOIN adj a ON a.node = v.node
  JOIN s3 w ON w.seed = v.seed AND w.node = a.nbr
  GROUP BY 1, 2),
d1 AS (
  SELECT v.seed, v.node,
         sum((v.sig * (1000000 + coalesce(dd.delta, 0))) // w.sig)::BIGINT
           AS delta
  FROM s1 v JOIN adj a ON a.node = v.node
  JOIN s2 w ON w.seed = v.seed AND w.node = a.nbr
  LEFT JOIN d2 dd ON dd.seed = w.seed AND dd.node = w.node
  GROUP BY 1, 2),
betw AS (
  SELECT node, sum(delta)::BIGINT AS betw_micro
  FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2) u
  WHERE node NOT IN (SELECT node FROM seeds)
  GROUP BY node)
SELECT node AS part, betw_micro,
       (SELECT count(*) FROM seeds)::BIGINT AS n_seeds
FROM betw
ORDER BY betw_micro DESC, part LIMIT {_BETW_TOPK}"""


@q("graph_betweenness_sampled", None)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled betweenness centrality (Brandes 2001, source-sampled per
    Brandes-Pich 2007) over the co-purchase graph, hop horizon 3: for
    each corpus-scaled seed, the shortest-path DAG is built level-
    synchronously — σ(v) path counts by forward sweeps along edges that
    descend one BFS level — and the dependency δ(v) = Σ_{w∈succ(v)}
    σ_v/σ_w · (1 + δ(w)) accumulates BACKWARD from the horizon (δ = 0 at
    depth 3, the standard bounded-Brandes truncation). Each δ term is
    the integer (σ_v · (1e6 + δ_w)) // σ_w — one floor per DAG edge, so
    the sum is order-independent and hash-exact. Top-50 non-seed nodes
    by accumulated micro-dependency = the brokers whose removal
    disconnects the most sampled shortest paths — the bridge/chokepoint
    ranking PageRank and degree both miss. Scale: seeds held ~100 by the
    corpus-scaled ``_bfs_seeds`` modulus; per level one adjacency join
    keyed (seed, node) — the harmonic-centrality shuffle family, σ/δ
    frames materialized per level so the plan never deepens."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges
    from hawaiidatapipeline_spark.queries.graph_demo import _bfs_seeds

    li = load_table(spark, sf_dir, "lineitem")
    edges = materialize(copurchase_edges(li))
    adj = materialize(
        edges.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
            edges.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
    )
    seeds = materialize(_bfs_seeds(adj))
    n_seeds = seeds.count()
    # BFS best-dist per (seed, node), horizon 3 — the harmonic frontier
    dist = materialize(
        seeds.select(F.col("node").alias("seed"), "node", F.lit(0).alias("dist"))
    )
    for hop in range(1, 4):
        frontier = dist.filter(F.col("dist") == hop - 1)
        reached = frontier.join(adj, "node").select(
            "seed", F.col("nbr").alias("node"), F.lit(hop).alias("dist")
        )
        dist = materialize(
            dist.unionByName(reached)
            .groupBy("seed", "node")
            .agg(F.min("dist").alias("dist"))
        )
    lv = dist
    # forward sweep: sigma per level along DAG edges (level d -> d+1)
    sig = [
        materialize(
            seeds.select(
                F.col("node").alias("seed"),
                "node",
                F.lit(1).cast("long").alias("sig"),
            )
        )
    ]
    for d in range(1, 4):
        nxt = (
            sig[d - 1]
            .join(adj, "node")
            .select("seed", F.col("nbr").alias("node"), "sig")
            .join(
                lv.filter(F.col("dist") == d).select("seed", "node"),
                ["seed", "node"],
            )
            .groupBy("seed", "node")
            .agg(F.sum("sig").cast("long").alias("sig"))
        )
        sig.append(materialize(nxt))
    # backward sweep: delta from the horizon in, one floor per DAG edge
    def _delta(level_v, level_w, delta_w):
        w = level_w.select(
            "seed", F.col("node").alias("wnode"), F.col("sig").alias("wsig")
        )
        if delta_w is not None:
            w = w.join(
                delta_w.select(
                    "seed",
                    F.col("node").alias("wnode"),
                    F.col("delta").alias("wdelta"),
                ),
                ["seed", "wnode"],
                "left",
            ).select(
                "seed",
                "wnode",
                "wsig",
                F.coalesce(F.col("wdelta"), F.lit(0)).alias("wdelta"),
            )
        else:
            w = w.select(
                "seed", "wnode", "wsig", F.lit(0).cast("long").alias("wdelta")
            )
        return (
            level_v.join(adj, "node")
            .select("seed", "node", "sig", F.col("nbr").alias("wnode"))
            .join(w, ["seed", "wnode"])
            .groupBy("seed", "node")
            .agg(
                F.sum(
                    F.expr("(sig * (1000000 + wdelta)) div wsig")
                )
                .cast("long")
                .alias("delta")
            )
        )

    d2 = materialize(_delta(sig[2], sig[3], None))
    d1 = materialize(_delta(sig[1], sig[2], d2))
    betw = (
        d1.unionByName(d2)
        .join(seeds.select(F.col("node")), "node", "left_anti")
        .groupBy("node")
        .agg(F.sum("delta").cast("long").alias("betw_micro"))
    )
    return (
        betw.select(
            F.col("node").alias("part"),
            "betw_micro",
            F.lit(n_seeds).cast("long").alias("n_seeds"),
        )
        .orderBy(F.col("betw_micro").desc(), "part")
        .limit(_BETW_TOPK)
    )


ORACLES["graph_betweenness_sampled"] = _betw_sql()


# --------------------------------------------- RHO-loss selection

_RHO_REF_LANG = "en"
_RHO_TOPK = 30


@q(
    "llm_rho_loss_selection",
    f"""WITH docs AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS a FROM documents),
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
refocc AS (
  SELECT o.w1, o.bg FROM occ o JOIN docs d USING (doc_id)
  WHERE d.lang = '{_RHO_REF_LANG}'),
rbgc AS (SELECT bg, count(*)::BIGINT AS cb FROM refocc GROUP BY bg),
rpfc AS (SELECT w1, count(*)::BIGINT AS cp FROM refocc GROUP BY w1),
rvocab AS (
  SELECT count(DISTINCT t)::BIGINT AS v
  FROM (SELECT unnest(a) AS t FROM docs d WHERE lang = '{_RHO_REF_LANG}')),
term AS (
  SELECT b.bg,
         (floor((ln(b.cb + 1) - ln(p.cp + vocab.v)) * 1000000))::BIGINT
           AS tc_micro,
         (floor((ln(coalesce(rb.cb, 0) + 1)
                 - ln(coalesce(rp.cp, 0) + rvocab.v)) * 1000000))::BIGINT
           AS tr_micro
  FROM bgc b JOIN pfc p USING (w1)
  LEFT JOIN rbgc rb ON rb.bg = b.bg
  LEFT JOIN rpfc rp ON rp.w1 = b.w1
  CROSS JOIN vocab CROSS JOIN rvocab),
per_doc AS (
  SELECT o.doc_id, count(*)::BIGINT AS n_bigrams,
         ((-sum(t.tc_micro)) // count(*))::BIGINT AS nll_corpus_micro,
         ((-sum(t.tr_micro)) // count(*))::BIGINT AS nll_ref_micro
  FROM occ o JOIN term t USING (bg) GROUP BY o.doc_id)
SELECT p.doc_id, d.lang, p.n_bigrams, p.nll_corpus_micro, p.nll_ref_micro,
       (p.nll_corpus_micro - p.nll_ref_micro)::BIGINT AS excess_micro
FROM per_doc p JOIN docs d USING (doc_id)
ORDER BY excess_micro DESC, p.doc_id LIMIT {_RHO_TOPK}""",
)
def llm_rho_loss_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-loss data selection (Mindermann et al. 2022, 'Prioritized
    training on points that are learnable, worth learning, and not yet
    learnt'): score every document by REDUCIBLE loss — its NLL under the
    current (corpus) model minus its NLL under a reference model trained
    on the target slice (lang = 'en' here, standing in for the holdout).
    High excess = the corpus model finds the doc hard but the target
    model finds it easy: learnable and worth learning; low/negative =
    noise or already-learnt. Both are add-one-smoothed bigram LMs in the
    house integer micro-unit fixed point (one floor per distinct bigram
    term, exact per-doc sums); bigrams unseen by the reference model get
    the ln(1) - ln(cp + V_ref) backstop via LEFT joins with coalesce(0).
    Top-30 by (excess, doc_id). Scale: two model fits (linear hash
    aggs over corpus and slice), one bigram-keyed term join, doc-grain
    partial aggs — the llm_bigram_logprob shuffle family twice."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), " ").alias("a")
    )
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
    vocab = docs.select(F.explode("a").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    ref_ids = docs.filter(F.col("lang") == _RHO_REF_LANG).select("doc_id")
    refocc = occ.join(ref_ids, "doc_id")
    rbgc = refocc.groupBy("bg").agg(F.count(F.lit(1)).alias("rcb"))
    rpfc = refocc.groupBy("w1").agg(F.count(F.lit(1)).alias("rcp"))
    rvocab = (
        docs.filter(F.col("lang") == _RHO_REF_LANG)
        .select(F.explode("a").alias("t"))
        .agg(F.countDistinct("t").alias("rv"))
    )
    term = (
        bgc.join(pfc, "w1")
        .join(rbgc, "bg", "left")
        .join(rpfc, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(rvocab))
        .select(
            "bg",
            F.floor(
                (F.log(F.col("cb") + 1) - F.log(F.col("cp") + F.col("v")))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("tc_micro"),
            F.floor(
                (
                    F.log(F.coalesce(F.col("rcb"), F.lit(0)) + 1)
                    - F.log(
                        F.coalesce(F.col("rcp"), F.lit(0)) + F.col("rv")
                    )
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("tr_micro"),
        )
    )
    per_doc = (
        occ.join(term, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr("(-sum(tc_micro)) div count(*)").alias("nll_corpus_micro"),
            F.expr("(-sum(tr_micro)) div count(*)").alias("nll_ref_micro"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "nll_corpus_micro",
            "nll_ref_micro",
            (F.col("nll_corpus_micro") - F.col("nll_ref_micro"))
            .cast("long")
            .alias("excess_micro"),
        )
        .orderBy(F.col("excess_micro").desc(), "doc_id")
        .limit(_RHO_TOPK)
    )


# ------------------------------------------------ video scene cuts

_SCENE_CUT_PER_PX = 100  # cut when per-pixel |ΔR|+|ΔG|+|ΔB| clears this


@q(
    "multimodal_scene_cuts",
    f"""WITH dims AS (
  SELECT doc_id AS id, 3 + doc_id % 4 AS n FROM documents),
pairs AS (
  SELECT id, unnest(generate_series(1, n - 1)) AS f FROM dims),
deltas AS (
  SELECT id, f, 20::BIGINT AS n_pixels,
         (20 * (abs((id + 11 * f) % 256 - (id + 11 * (f - 1)) % 256)
              + abs((3 * id + 5 * f) % 256 - (3 * id + 5 * (f - 1)) % 256)
              + abs((7 * id + f) % 256 - (7 * id + (f - 1)) % 256)))::BIGINT
           AS delta_sum
  FROM pairs),
flagged AS (
  SELECT id, f, delta_sum,
         CASE WHEN delta_sum > {_SCENE_CUT_PER_PX} * n_pixels
              THEN 1 ELSE 0 END AS cut
  FROM deltas)
SELECT id, count(*)::BIGINT AS n_pairs, sum(cut)::BIGINT AS n_cuts,
       sum(delta_sum)::BIGINT AS total_delta,
       coalesce(min(CASE WHEN cut = 1 THEN f END), -1)::BIGINT
         AS first_cut_frame
FROM flagged GROUP BY id ORDER BY id""",
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection plumbing: REAL RAWV decode → consecutive-
    frame EXACT integer pixel deltas (|ΔR|+|ΔG|+|ΔB| summed over the
    frame, one row per frame pair out of the Arrow batch) → SQL-side
    cut threshold (per-pixel delta > 100 — the policy lives in the
    plan, so tuning re-runs metadata-sized work) → per-video cut
    profile with the first cut frame. This is the shot-segmentation
    front-end a video curation pipeline runs before sampling frames for
    captioning or training selection — cuts bound the segments
    frame-sampling must cover. The closed-form synthetic corpus (flat-color frames
    whose channels wrap mod 256) gives the oracle every delta exactly:
    a cut IS a channel wrap, so both the no-cut and the cut branch are
    exercised across ids. Shape: map-only decode+delta (linear in
    pixels), one (video, pair) partial agg to video grain — pixel I/O
    never shuffles (the multimodal discipline)."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        synthetic_video_blobs,
        video_scene_deltas,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    deltas = video_scene_deltas(synthetic_video_blobs(d))
    flagged = deltas.withColumn(
        "cut",
        F.when(
            F.col("delta_sum") > _SCENE_CUT_PER_PX * F.col("n_pixels"), 1
        ).otherwise(0),
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("cut").cast("long").alias("n_cuts"),
            F.sum("delta_sum").cast("long").alias("total_delta"),
            F.coalesce(
                F.min(F.when(F.col("cut") == 1, F.col("f"))), F.lit(-1)
            )
            .cast("long")
            .alias("first_cut_frame"),
        )
        .orderBy("id")
    )


# ------------------------------------------------ classifier AUC


@q(
    "llm_classifier_auc",
    None,  # oracle assigned below (shares the unrolled training CTEs)
)
def llm_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC of the trained quality classifier — the evaluation a
    gate ships with: AUC = P(score_pos > score_neg) computed from RANK
    statistics (AUC = (R_pos − n1(n1+1)/2) / (n1·n0), the Mann-Whitney
    identity), tie-aware via the doubled-average-rank trick
    (2·avg_rank = 2·#below + #tied + 1, always an integer) so the whole
    statistic is exact integer arithmetic; the final ratio floors to
    micro units in DECIMAL(38,0)/HUGEINT. Ranks come from
    ``operators/ranks.doubled_avg_rank_map`` — the distributed rank map,
    NO single-partition window over doc-grain rows (the spearman
    discipline). Gini = 2·AUC − 1 derives from the floored AUC on both
    engines. Output: one row (n_pos, n_neg, auc_micro, gini_micro)."""
    from hawaiidatapipeline_spark.operators.ranks import doubled_avg_rank_map
    from hawaiidatapipeline_spark.queries.round12_extra import _qc_train

    d = load_table(spark, sf_dir, "documents")
    dense, lab, _, w, _ = _qc_train(spark, d)
    sf = (
        dense.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v") * F.col("w")).cast("long").alias("s"))
    )
    scored = materialize(sf.join(lab.select("doc_id", "y"), "doc_id"))
    rmap = doubled_avg_rank_map(scored, "s", out="dbl")
    dec = "decimal(38,0)"
    agg = (
        scored.join(rmap, "s")
        .agg(
            F.sum(F.col("y")).cast("long").alias("n_pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg"),
            F.sum(F.when(F.col("y") == 1, F.col("dbl")).otherwise(0))
            .cast("long")
            .alias("r2"),
        )
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            f"CAST((CAST(r2 - n_pos * (n_pos + 1) AS {dec}) * 1000000) "
            f"div (CAST(2 AS {dec}) * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_micro"),
    ).select(
        "n_pos",
        "n_neg",
        "auc_micro",
        (2 * F.col("auc_micro") - 1000000).cast("long").alias("gini_micro"),
    )


def _auc_sql() -> str:
    from hawaiidatapipeline_spark.queries.round12_extra import _qc_sql_parts, _QC_ROUNDS

    return f"""WITH {_qc_sql_parts()},
sf AS (SELECT d.doc_id, sum(d.v * w.w)::BIGINT AS s
       FROM dense d JOIN w{_QC_ROUNDS} w ON w.f = d.f GROUP BY 1),
scored AS (SELECT s.doc_id, s.s, l.y FROM sf s JOIN lab l USING (doc_id)),
vals AS (SELECT s, count(*)::BIGINT AS n FROM scored GROUP BY s),
rmap AS (
  SELECT s, (2 * (sum(n) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
             + n + 1)::BIGINT AS dbl
  FROM vals),
agg AS (
  SELECT sum(sc.y)::BIGINT AS n_pos,
         sum(1 - sc.y)::BIGINT AS n_neg,
         sum(CASE WHEN sc.y = 1 THEN r.dbl ELSE 0 END)::BIGINT AS r2
  FROM scored sc JOIN rmap r USING (s)),
auc AS (
  SELECT n_pos, n_neg,
         (((r2 - n_pos * (n_pos + 1))::HUGEINT * 1000000)
          // (2::HUGEINT * n_pos * n_neg))::BIGINT AS auc_micro
  FROM agg)
SELECT n_pos, n_neg, auc_micro,
       (2 * auc_micro - 1000000)::BIGINT AS gini_micro
FROM auc"""


ORACLES["llm_classifier_auc"] = _auc_sql()


# ------------------------------------------- cluster pruning plan

_CP_SRP_BITS = 16
_CP_TARGET = 128  # ~docs per SRP cluster at any corpus size
_CP_PRUNE_DEN = 4  # prune the bottom quarter of clusters by mean quality


@q(
    "llm_cluster_prune_plan",
    f"""WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
nrm AS (SELECT count(*)::BIGINT AS n FROM embeddings),
mp AS (SELECT greatest(1, ceil(n / {_CP_TARGET}.0))::BIGINT AS m FROM nrm),
sproj AS (
  SELECT j.j, d.d,
         CASE WHEN ('0x' || substring(md5('srp:' || j.j::VARCHAR
                     || ':' || d.d::VARCHAR), 1, 15))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS r
  FROM (SELECT unnest(generate_series(0, {_CP_SRP_BITS - 1})) AS j) j,
       (SELECT unnest(generate_series(0, 63)) AS d) d),
sdots AS (SELECT v.vec_id, p.j, sum(v.q * p.r)::BIGINT AS dot
          FROM qv v JOIN sproj p ON p.d = v.d GROUP BY 1, 2),
ssig AS (SELECT vec_id,
                sum(CASE WHEN dot > 0
                         THEN power(2, j)::BIGINT ELSE 0 END)::BIGINT AS sig
         FROM sdots GROUP BY 1),
clus AS (SELECT vec_id, sig % (SELECT m FROM mp) AS cluster FROM ssig),
docq AS (
  SELECT doc_id,
         (1000 * len(list_distinct(string_split(lower(text), ' ')))
          // len(string_split(text, ' ')))::BIGINT AS q_milli
  FROM documents),
cq AS (
  SELECT c.cluster, count(*)::BIGINT AS n_docs,
         (sum(d.q_milli) // count(*))::BIGINT AS mean_q_milli
  FROM clus c JOIN docq d ON d.doc_id = c.vec_id
  GROUP BY c.cluster),
k AS (SELECT greatest(1, count(*) // {_CP_PRUNE_DEN})::BIGINT AS k FROM cq),
ranked AS (
  SELECT cluster, n_docs, mean_q_milli,
         row_number() OVER (ORDER BY mean_q_milli, cluster) AS rn
  FROM cq)
SELECT cluster, n_docs, mean_q_milli
FROM ranked, k WHERE rn <= k.k
ORDER BY mean_q_milli, cluster""",
)
def llm_cluster_prune_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level corpus pruning (the MiniPile / SSL-prototypes
    recipe, Sorscher et al.'s beyond-neural-scaling pruning at cluster
    grain): embeddings cluster by a corpus-scaled SRP signature
    (16-bit cosine-LSH mod m = ceil(N/128) — the SemDeDup bucketing
    family, ~128 docs per cluster at ANY corpus size); each cluster's
    mean document quality (distinct-token ratio, exact milli) ranks it,
    and the bottom quarter of clusters is the PRUNE PLAN — dropping
    whole low-quality clusters removes boilerplate/spam neighborhoods
    that per-document gates see only one doc at a time. Spark avoids
    any global window: the pruned set IS the TakeOrdered bottom-k under
    the (mean_q, cluster) total order with k computed from the
    cluster count (constant-grain scalar). Scale: SRP signatures are
    one 16×d broadcast + per-vector fold; cluster grain is N/128
    rows."""
    import math

    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    n = e.count()
    m = max(1, math.ceil(n / _CP_TARGET))
    qv = e.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
        "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
    )
    spark_proj = (
        spark.range(_CP_SRP_BITS)
        .select(F.col("id").alias("j"))
        .crossJoin(spark.range(64).select(F.col("id").alias("d")))
        .select(
            "j",
            "d",
            F.when(
                portable_hash64(
                    F.concat(
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("d").cast("string"),
                    ),
                    "srp",
                )
                % 2
                == 0,
                1,
            )
            .otherwise(-1)
            .alias("r"),
        )
    )
    sdots = (
        qv.join(F.broadcast(spark_proj), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("q") * F.col("r")).cast("long").alias("dot"))
    )
    ssig = sdots.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("dot") > 0, F.pow(F.lit(2.0), F.col("j")).cast("long"))
            .otherwise(0)
        )
        .cast("long")
        .alias("sig")
    )
    clus = ssig.select("vec_id", (F.col("sig") % m).alias("cluster"))
    docq = d.select(
        F.col("doc_id"),
        F.expr(
            "CAST(1000 * size(array_distinct(split(lower(text), ' '))) "
            "div size(split(text, ' ')) AS BIGINT)"
        ).alias("q_milli"),
    )
    cq = materialize(
        clus.join(docq, clus["vec_id"] == docq["doc_id"])
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr("sum(q_milli) div count(*)").alias("mean_q_milli"),
        )
    )
    k = max(1, cq.count() // _CP_PRUNE_DEN)
    return (
        cq.orderBy("mean_q_milli", "cluster")
        .limit(k)
        .select("cluster", "n_docs", "mean_q_milli")
        .orderBy("mean_q_milli", "cluster")
    )
