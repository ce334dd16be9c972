"""Data selection via importance resampling — DSIR (SURVEY.md §2.J
curation family; Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

The curation surface already filters by shape (llm_quality_score), by
content surprisal (llm_unigram_logprob) and reweights domains
(llm_domain_reweight_step / llm_mixture_*); DSIR is the missing
TARGET-DISTRIBUTION selector: score every raw document by how much its
hashed n-gram profile looks like a target corpus slice, then resample
with probability proportional to the importance weight (Gumbel-top-k on
the log weights — the paper's exact sampling procedure, made
deterministic here by hashing the Gumbel uniforms from doc_id).

Determinism discipline (house integer lane): the per-bucket log ratio
λ(f) = ln(p_target(f)/p_raw(f)) under add-1 smoothing is floored to
MICRO-UNITS once per bucket (B buckets total), so every per-document
weight is an exact INTEGER dot product — no float partial-sum order to
disagree across partitionings or engines. The only float ops are one ln
per bucket and one -ln(-ln(u)) per doc, on bit-identical double inputs.

Scale shape (100 TB): the λ table is B rows (broadcast — the whole
point of HASHED n-grams is that the model size is fixed no matter the
corpus); feature extraction is a linear explode; the weight is one
doc_id-keyed partial agg; the resample is a TakeOrdered top-N, never a
global row_number. Nothing grows super-linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import portable_hash64
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_DSIR_B = 256  # hashed feature buckets — λ model is B rows, broadcastable
_DSIR_SEED = 777  # feature-hash seed
_DSIR_GSEED = 778  # Gumbel-uniform seed (independent of the feature hash)
_DSIR_N = 64  # resample size
_DSIR_TARGET_LANG = "en"  # target slice: look-like-English selection
# Gumbel uniform: u = (h % (2^50-1) + 1) / 2^50 — 50 bits keeps the
# integer exactly representable in a double, +1 keeps u in (0,1)
_DSIR_UMOD = (1 << 50) - 1
_DSIR_UDEN = float(1 << 50)


def _dsir_weights_sql(src: str = "documents") -> str:
    """DSIR weights CTE chain ending in ``w`` (doc_id, lang, n_feats,
    weight_micro); ``src`` is any in-scope relation with (doc_id, lang,
    text) — the v7 pipeline points it at the funnel's survivors."""
    return f"""WITH toks AS (
         SELECT doc_id, lang,
                unnest(string_split(text, ' ')) AS tok,
                generate_subscripts(string_split(text, ' '), 1) AS pos
         FROM {src}),
       bi AS (
         SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS feat
         FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
       feats AS (
         SELECT doc_id, lang, tok AS feat FROM toks
         UNION ALL SELECT doc_id, lang, feat FROM bi),
       hashed AS (
         SELECT doc_id, lang,
                ('0x' || substring(md5('{_DSIR_SEED}:' || feat), 1, 15))::BIGINT
                  % {_DSIR_B} AS f
         FROM feats),
       docf AS (SELECT doc_id, lang, f, count(*)::BIGINT AS c
                FROM hashed GROUP BY 1, 2, 3),
       raw AS (SELECT f, sum(c)::BIGINT AS cr FROM docf GROUP BY 1),
       tgt AS (SELECT f, sum(c)::BIGINT AS ct FROM docf
               WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
       tot AS (SELECT (SELECT sum(cr) FROM raw)::BIGINT AS tr,
                      (SELECT coalesce(sum(ct), 0) FROM tgt)::BIGINT AS tt),
       lam AS (
         SELECT r.f,
                floor(ln(((coalesce(t.ct, 0) + 1)::DOUBLE * (tot.tr + {_DSIR_B}))
                         / ((r.cr + 1)::DOUBLE * (tot.tt + {_DSIR_B})))
                      * 1000000)::BIGINT AS lam_micro
         FROM raw r LEFT JOIN tgt t ON t.f = r.f, tot),
       w AS (
         SELECT d.doc_id, d.lang, sum(d.c)::BIGINT AS n_feats,
                sum(d.c * l.lam_micro)::BIGINT AS weight_micro
         FROM docf d JOIN lam l ON l.f = d.f GROUP BY 1, 2)"""


def _dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_feats, weight_micro) — Spark twin of the ``w``
    CTE in ``_dsir_weights_sql``."""
    return _dsir_weights_for(load_table(spark, sf_dir, "documents"))


def _dsir_doc_buckets(d: DataFrame) -> DataFrame:
    """(doc_id, lang, f, c): per-document hashed uni+bigram bucket counts
    — the featurizer shared by the batch weights and the streaming
    λ-model sink (streaming/runtime.py run_dsir_model_sink), so both
    paths see bit-identical features."""
    # Bigrams built IN-ARRAY (zip each token with its successor; the
    # null-padded tail pair filters out) so the featurizer is one explode
    # of unigrams++bigrams followed by the (doc, f) partial agg — the only
    # shuffle is the map-side-combined <= B-groups-per-doc aggregate.
    # VERDICT r12 #5: the previous lead()-window bigram builder shuffled
    # EVERY exploded token row on doc_id first (alpha10 0.54 on
    # llm_dsir_weights); same feature multiset, hashes unchanged.
    feats = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(split(text, ' '), "
                "filter(zip_with(split(text, ' '), "
                "               slice(split(text, ' '), 2, size(split(text, ' '))), "
                "               (a, b) -> CASE WHEN b IS NULL THEN NULL "
                "                              ELSE concat(a, ' ', b) END), "
                "       x -> x IS NOT NULL))"
            )
        ).alias("feat"),
    )
    hashed = feats.select(
        "doc_id",
        "lang",
        (portable_hash64(F.col("feat"), _DSIR_SEED) % _DSIR_B).alias("f"),
    )
    return hashed.groupBy("doc_id", "lang", "f").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _dsir_bucket_model(docf: DataFrame) -> DataFrame:
    """(f, cr, ct): raw-corpus and target-slice bucket counters — the
    ENTIRE λ-model state (≤ B rows). Pure sums, so partial models from
    disjoint document batches merge by adding counters: the mergeability
    the streaming sink leans on (same discipline as the KMV/CMS sinks)."""
    return docf.groupBy("f").agg(
        F.sum("c").alias("cr"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("c")).otherwise(0)
        ).alias("ct"),
    )


def _dsir_lambda(model: DataFrame) -> DataFrame:
    """(f, lam_micro): add-1-smoothed micro-unit log ratio
    λ(f) = ln(p_target(f)/p_raw(f)) from the bucket counters."""
    tot = model.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    return model.crossJoin(F.broadcast(tot)).select(
        "f",
        F.floor(
            F.log(
                ((F.col("ct") + 1).cast("double") * (F.col("tr") + _DSIR_B))
                / ((F.col("cr") + 1).cast("double") * (F.col("tt") + _DSIR_B))
            )
            * 1000000
        )
        .cast("long")
        .alias("lam_micro"),
    )


def _dsir_score(docf: DataFrame, lam: DataFrame) -> DataFrame:
    """(doc_id, lang, n_feats, weight_micro): integer dot product of the
    document bucket counts with a (possibly externally maintained) λ."""
    return docf.join(F.broadcast(lam), "f").groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_feats"),
        F.sum(F.col("c") * F.col("lam_micro")).alias("weight_micro"),
    )


def _dsir_weights_for(d: DataFrame) -> DataFrame:
    """DSIR weights over an arbitrary (doc_id, lang, text) frame."""
    docf = _dsir_doc_buckets(d)
    return _dsir_score(docf, _dsir_lambda(_dsir_bucket_model(docf)))


@q(
    "llm_dsir_weights",
    _dsir_weights_sql()
    + """
       SELECT doc_id, lang, n_feats, weight_micro,
              round(weight_micro / 1000000.0, 6) AS weight
       FROM w ORDER BY weight_micro DESC, doc_id LIMIT 100""",
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: hashed uni+bigram bag-of-n-grams models of
    the target slice (lang = 'en') and the raw corpus, add-1 smoothed
    over B = 256 buckets; each document's log importance weight is the
    integer dot product of its bucket counts with the micro-unit per-
    bucket log ratio λ(f) = ln(p_target(f)/p_raw(f)). Top-100 by weight —
    the documents whose n-gram profile most resembles the target. Plan:
    two linear feature aggs, a B-row broadcast λ join, one doc-keyed
    partial agg — the hashed model is fixed-size at any corpus scale."""
    w = _dsir_weights(spark, sf_dir)
    return (
        w.select(
            "doc_id",
            "lang",
            "n_feats",
            "weight_micro",
            F.round(F.col("weight_micro") / 1000000.0, 6).alias("weight"),
        )
        .orderBy(F.col("weight_micro").desc(), "doc_id")
        .limit(100)
    )


@q(
    "llm_dsir_sample",
    _dsir_weights_sql()
    + f""",
       keyed AS (
         SELECT doc_id, lang, weight_micro,
                floor(-ln(-ln(((('0x' || substring(md5('{_DSIR_GSEED}:'
                                || doc_id::VARCHAR), 1, 15))::BIGINT
                               % {_DSIR_UMOD}) + 1) / {_DSIR_UDEN}))
                      * 1000000)::BIGINT AS gumbel_micro
         FROM w)
       SELECT doc_id, lang, weight_micro, gumbel_micro,
              weight_micro + gumbel_micro AS key_micro
       FROM keyed
       ORDER BY key_micro DESC, doc_id LIMIT {_DSIR_N}""",
)
def llm_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR resampling step: Gumbel-top-k over the log importance weights
    — adding an independent Gumbel(0,1) to each log weight and taking the
    top N draws an exact weighted sample WITHOUT replacement with
    p(doc) ∝ exp(log weight) (the paper's procedure). The Gumbel uniform
    is hashed from doc_id (50-bit mantissa-exact), so the "randomness" is
    reproducible bit-for-bit in any engine — the property a 100 TB rerun
    needs anyway. Plan: weights as in llm_dsir_weights, then a map-side
    key and a TakeOrdered top-N — no global sort, no single-partition
    window."""
    w = _dsir_weights(spark, sf_dir)
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), _DSIR_GSEED) % _DSIR_UMOD)
        + 1
    ) / F.lit(_DSIR_UDEN)
    keyed = w.select(
        "doc_id",
        "lang",
        "weight_micro",
        F.floor(-F.log(-F.log(u)) * 1000000).cast("long").alias("gumbel_micro"),
    )
    return (
        keyed.select(
            "doc_id",
            "lang",
            "weight_micro",
            "gumbel_micro",
            (F.col("weight_micro") + F.col("gumbel_micro")).alias("key_micro"),
        )
        .orderBy(F.col("key_micro").desc(), "doc_id")
        .limit(_DSIR_N)
    )


@q(
    "llm_dsir_eval",
    _dsir_weights_sql()
    + f""",
       keyed AS (
         SELECT w.doc_id, d.source, w.weight_micro,
                floor(-ln(-ln(((('0x' || substring(md5('{_DSIR_GSEED}:'
                                || w.doc_id::VARCHAR), 1, 15))::BIGINT
                               % {_DSIR_UMOD}) + 1) / {_DSIR_UDEN}))
                      * 1000000)::BIGINT AS gumbel_micro
         FROM w JOIN documents d ON d.doc_id = w.doc_id),
       sel AS (SELECT doc_id, source FROM keyed
               ORDER BY weight_micro + gumbel_micro DESC, doc_id
               LIMIT {_DSIR_N}),
       raw_s AS (SELECT source, count(*)::BIGINT AS n_raw FROM documents
                 GROUP BY 1),
       tgt_s AS (SELECT source, count(*)::BIGINT AS n_tgt FROM documents
                 WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
       sel_s AS (SELECT source, count(*)::BIGINT AS n_sel FROM sel
                 GROUP BY 1),
       tots AS (SELECT (SELECT sum(n_raw) FROM raw_s)::BIGINT AS t_raw,
                       (SELECT sum(n_tgt) FROM tgt_s)::BIGINT AS t_tgt,
                       (SELECT sum(n_sel) FROM sel_s)::BIGINT AS t_sel)
       SELECT r.source,
              r.n_raw,
              coalesce(t.n_tgt, 0)::BIGINT AS n_tgt,
              coalesce(s.n_sel, 0)::BIGINT AS n_sel,
              floor(1000 * r.n_raw / tots.t_raw)::BIGINT AS raw_share_milli,
              floor(1000 * coalesce(t.n_tgt, 0) / tots.t_tgt)::BIGINT
                AS tgt_share_milli,
              floor(1000 * coalesce(s.n_sel, 0) / tots.t_sel)::BIGINT
                AS sel_share_milli,
              (abs(floor(1000 * coalesce(s.n_sel, 0) / tots.t_sel)
                   - floor(1000 * coalesce(t.n_tgt, 0) / tots.t_tgt))
               - abs(floor(1000 * r.n_raw / tots.t_raw)
                     - floor(1000 * coalesce(t.n_tgt, 0) / tots.t_tgt)))::BIGINT
                AS gap_change_milli
       FROM raw_s r
       LEFT JOIN tgt_s t ON t.source = r.source
       LEFT JOIN sel_s s ON s.source = r.source, tots
       ORDER BY r.source""",
)
def llm_dsir_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection audit — the paper's own evaluation question: did
    importance resampling move the SELECTED mix toward the TARGET mix?
    Per source: raw / target / selected counts and milli-shares, plus
    gap_change_milli = |sel − tgt| − |raw − tgt| (negative = the sample
    sits closer to the target's source profile than the raw corpus does).
    Integer truncating-division shares, so both engines agree exactly.
    Plan: the weights plan + a TakeOrdered top-N, then three source-grain
    partial aggs (source cardinality output) and broadcast totals —
    nothing corpus-sized past the aggs."""
    d = load_table(spark, sf_dir, "documents")
    w = _dsir_weights(spark, sf_dir)
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), _DSIR_GSEED) % _DSIR_UMOD)
        + 1
    ) / F.lit(_DSIR_UDEN)
    keyed = (
        w.join(d.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "weight_micro",
            F.floor(-F.log(-F.log(u)) * 1000000).cast("long").alias("gumbel_micro"),
        )
    )
    sel = (
        keyed.orderBy(
            (F.col("weight_micro") + F.col("gumbel_micro")).desc(), "doc_id"
        )
        .limit(_DSIR_N)
        .select("doc_id", "source")
    )
    raw_s = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    tgt_s = (
        d.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tgt"))
    )
    sel_s = sel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sel")
    )
    tots = (
        raw_s.agg(F.sum("n_raw").alias("t_raw"))
        .crossJoin(tgt_s.agg(F.sum("n_tgt").alias("t_tgt")))
        .crossJoin(sel_s.agg(F.sum("n_sel").alias("t_sel")))
    )
    nt = F.coalesce(F.col("n_tgt"), F.lit(0))
    ns = F.coalesce(F.col("n_sel"), F.lit(0))
    raw_sh = (1000 * F.col("n_raw")).cast("long") / F.col("t_raw")
    tgt_sh = (1000 * nt).cast("long") / F.col("t_tgt")
    sel_sh = (1000 * ns).cast("long") / F.col("t_sel")
    out = (
        raw_s.join(tgt_s, "source", "left")
        .join(sel_s, "source", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "source",
            "n_raw",
            nt.cast("long").alias("n_tgt"),
            ns.cast("long").alias("n_sel"),
            F.floor(raw_sh).cast("long").alias("raw_share_milli"),
            F.floor(tgt_sh).cast("long").alias("tgt_share_milli"),
            F.floor(sel_sh).cast("long").alias("sel_share_milli"),
            (
                F.abs(F.floor(sel_sh) - F.floor(tgt_sh))
                - F.abs(F.floor(raw_sh) - F.floor(tgt_sh))
            )
            .cast("long")
            .alias("gap_change_milli"),
        )
        .orderBy("source")
    )
    return out
