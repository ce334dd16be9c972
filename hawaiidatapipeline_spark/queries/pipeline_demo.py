"""The training-corpus pipeline, end to end ([NS] north star).

One checked query that runs the whole LLM-data workflow through the
Pipeline DAG (plans/pipeline.py): language-ID → quality gate → exact
dedup (keep-first) → per-language corpus profile. Each stage is the same
operator the standalone queries check individually; this entry proves they
compose — the reference's fetch→munge→cache chain reborn as a staged,
lineage-tracked DAG whose oracle is one nested SQL statement.

At 100 TB each stage boundary is a natural parquet checkpoint
(``checkpoint=True`` + a checkpoint_dir): lineage cut, AQE re-stats, and
restartability between the expensive dedup shuffle and downstream profiling.
Here the DAG runs un-checkpointed so the whole thing stays one Catalyst plan
— stages fuse into two shuffles (dedup window + final agg), which is the
point: orchestration adds structure, not materialization cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.functions.text import lang_id, quality_score
from hawaiidatapipeline_spark.plans.pipeline import Pipeline
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.queries.textanalysis import _BEST_SQL, _PRED_SQL
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_QUALITY_SQL = (
    "round(least(len(string_split(text, ' ')) / 64.0, 1.0)"
    " * (len(list_distinct(string_split(text, ' ')))::DOUBLE"
    " / len(string_split(text, ' '))), 6)"
)

_CORPUS_SQL = f"""
WITH scored AS (
  SELECT doc_id, text, source,
         {_PRED_SQL} AS pred_lang,
         {_QUALITY_SQL} AS quality
  FROM documents
),
gated AS (SELECT * FROM scored WHERE quality >= 0.3),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                 ORDER BY doc_id) AS rn
    FROM gated) WHERE rn = 1
)
SELECT pred_lang, source,
       count(*) AS n_docs,
       round(sum(quality::DECIMAL(18,6))::DOUBLE / count(*), 6) AS avg_quality,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
FROM deduped GROUP BY pred_lang, source
"""


@q("llm_corpus_pipeline", _CORPUS_SQL)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → lang-ID → quality ≥ 0.3 → exact dedup → per-lang profile,
    composed as a Pipeline DAG. Stays lazy end-to-end: the DAG wires stages,
    Catalyst plans them as one query.

    avg_quality uses an exact DECIMAL sum with one final double division:
    quality values are exact 6-dp numbers, and a float avg of them can land
    exactly on a rounding boundary where summation ORDER flips the 6th digit
    between engines (observed flake). The decimal sum makes both engines
    divide identical operands — bit-identical result."""
    p = Pipeline(spark, "corpus")
    p.stage("docs", lambda c: load_table(spark, sf_dir, "documents"))
    p.stage(
        "scored",
        lambda c: c.get("docs").select(
            "doc_id",
            "text",
            "source",
            lang_id(F.col("text")).alias("pred_lang"),
            quality_score(F.col("text")).alias("quality"),
        ),
        depends=("docs",),
    )
    p.stage(
        "gated",
        lambda c: c.get("scored").filter(F.col("quality") >= 0.3),
        depends=("scored",),
    )

    def dedup(c):
        w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
        return (
            c.get("gated")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    p.stage("deduped", dedup, depends=("gated",))
    p.stage(
        "profile",
        lambda c: c.get("deduped")
        .groupBy("pred_lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("quality").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        ),
        depends=("deduped",),
    )
    return p.run()["profile"]


_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

_CORPUS_V2_SQL = f"""
WITH scrubbed AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                        '{_PHONE_RE}', '<PHONE>', 'g') AS text
  FROM documents
),
words AS (
  SELECT doc_id, source, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM scrubbed
),
chunked AS (
  SELECT doc_id, source, n, w,
         unnest(generate_series(0, greatest(1, ceil((n - 8) / 24.0))::BIGINT - 1)) AS chunk_id
  FROM words
),
ctext AS (
  SELECT doc_id, source, chunk_id,
         array_to_string(w[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text,
         least(32, n - chunk_id * 24) AS n_tokens
  FROM chunked
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(chunk_text)
                                 ORDER BY doc_id, chunk_id) AS rn
    FROM ctext) WHERE rn = 1
)
SELECT source,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_chunks,
       sum(n_tokens)::BIGINT AS total_tokens
FROM deduped GROUP BY source
"""


@q("llm_corpus_pipeline_v2", _CORPUS_V2_SQL)
def llm_corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 operator set composed as one Pipeline DAG: PII scrub →
    context-window chunking → chunk-level exact dedup (keep first) →
    per-source corpus profile. Each stage is individually oracle-checked
    elsewhere (llm_pii_scrub, llm_chunk_documents, llm_dedup_exact); this
    proves the composition stays ONE Catalyst plan with the same nested-CTE
    oracle discipline as llm_corpus_pipeline."""
    from hawaiidatapipeline_spark.operators.curation import chunk_documents, scrub_pii

    p = Pipeline(spark, "corpus_v2")
    p.stage("docs", lambda c: load_table(spark, sf_dir, "documents"))
    p.stage("scrubbed", lambda c: scrub_pii(c.get("docs")), depends=("docs",))
    p.stage(
        "chunks",
        lambda c: chunk_documents(c.get("scrubbed"), chunk_tokens=32, overlap=8),
        depends=("scrubbed",),
    )

    def dedup(c):
        w = Window.partitionBy(F.md5(F.col("chunk_text"))).orderBy("doc_id", "chunk_id")
        return (
            c.get("chunks")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    p.stage("deduped", dedup, depends=("chunks",))
    p.stage(
        "profile",
        lambda c: c.get("deduped")
        .join(c.get("docs").select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ),
        depends=("deduped", "docs"),
    )
    return p.run()["profile"]


_PH42 = "('0x' || substring(md5('42:' || doc_id::VARCHAR), 1, 15))::BIGINT"
_PH11 = "('0x' || substring(md5('11:' || doc_id::VARCHAR), 1, 15))::BIGINT"

_CORPUS_V3_SQL = f"""
WITH sampled AS (
  SELECT doc_id, text, source FROM documents
  WHERE {_PH11} % 10000 < 9000
),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                 ORDER BY doc_id) AS rn
    FROM sampled) WHERE rn = 1
),
assigned AS (
  SELECT doc_id, source, text,
         CASE WHEN {_PH42} % 100 < 90 THEN 'train'
              WHEN {_PH42} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM deduped
)
SELECT split, count(*) AS n_docs,
       count(DISTINCT source) AS n_sources,
       sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
FROM assigned GROUP BY split
"""


@q("llm_corpus_pipeline_v3", _CORPUS_V3_SQL)
def llm_corpus_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2-session operators composed end to end: deterministic 90%
    Bernoulli sample (reproducible corpus freeze) → exact dedup →
    hash-bucket train/val/test assignment → per-split profile — one
    Pipeline DAG, one Catalyst plan, every stage hash-derived so the full
    composition is engine-reproducible (the oracle recomputes sample
    membership, dedup survivors, AND split assignment exactly). The
    production shape of "cut a training snapshot": nothing here depends
    on row order, partitioning, or a random seed living outside the
    data."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.operators.sampling import bernoulli_sample

    p = Pipeline(spark, "corpus_v3")
    p.stage("docs", lambda c: load_table(spark, sf_dir, "documents"))
    p.stage(
        "sampled",
        lambda c: bernoulli_sample(c.get("docs"), "doc_id", fraction_bp=9000, seed=11),
        depends=("docs",),
    )

    def dedup(c):
        w = Window.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
        return (
            c.get("sampled")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    p.stage("deduped", dedup, depends=("sampled",))

    def assign(c):
        h = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 42), F.lit(100))
        return c.get("deduped").withColumn(
            "split",
            F.when(h < 90, "train").when(h < 95, "val").otherwise("test"),
        )

    p.stage("assigned", assign, depends=("deduped",))
    p.stage(
        "profile",
        lambda c: c.get("assigned")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        ),
        depends=("assigned",),
    )
    return p.run()["profile"]


_CRAWL_V4_SQL = """
WITH urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://site' || (doc_id // 2 % 20)
                   || '.example.com/p/' || (doc_id // 2 % 50)
                   || '?ref=' || (doc_id // 2 % 3)
              WHEN doc_id % 4 = 1
              THEN 'https://Site' || (doc_id // 2 % 20)
                   || '.Example.COM/p/' || (doc_id // 2 % 50)
                   || '?ref=' || (doc_id // 2 % 3)
                   || '&utm_source=feed&utm_campaign=spring#frag'
              ELSE 'https://Site' || (doc_id // 2 % 20)
                   || '.Example.COM/p/' || (doc_id // 2 % 50)
                   || '?utm_campaign=spring&ref=' || (doc_id // 2 % 3)
                   || '&utm_source=feed#frag'
         END AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(lower(url), '#.*$', ''),
               '[?&]utm_[a-z_]+=[^&#]*', '', 'g'),
             '^([^?&]*)&', '\\1?'),
           '\\?$', '') AS cu
  FROM urls
),
keep AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY cu),
survivors AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
content AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM survivors
),
final AS (SELECT * FROM content WHERE rn = 1)
SELECT length(bin(n_chars)) AS log2_bucket, source,
       count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM final GROUP BY log2_bucket, source
"""


@q("llm_corpus_pipeline_v4", _CRAWL_V4_SQL)
def llm_corpus_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-refresh pipeline composing the round-3 curation operators:
    URL-canonicalization dedup (surface forms of the same page) → exact
    content dedup among survivors → length-bucket × source profile of the
    final corpus. Same Pipeline-DAG shape as v1–v3: three shuffles total
    (canonical-url group, content-hash window, final agg), one Catalyst
    plan, every stage individually oracle-checked by its standalone query
    (llm_dedup_url, llm_dedup_exact, llm_length_histogram)."""
    from hawaiidatapipeline_spark.queries.curation_extra import (
        _synth_urls,
        canonicalize_url,
    )

    p = Pipeline(spark, "crawl_refresh")
    p.stage("docs", lambda c: load_table(spark, sf_dir, "documents"))
    p.stage(
        "url_keep",
        lambda c: _synth_urls(c.get("docs"))
        .select("doc_id", canonicalize_url(F.col("url")).alias("cu"))
        .groupBy("cu")
        .agg(F.min("doc_id").alias("doc_id")),
        depends=("docs",),
    )
    p.stage(
        "survivors",
        lambda c: c.get("docs").join(c.get("url_keep").select("doc_id"), "doc_id"),
        depends=("docs", "url_keep"),
    )

    def content_dedup(c):
        w = Window.partitionBy(F.md5(F.encode("text", "utf-8"))).orderBy("doc_id")
        return (
            c.get("survivors")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    p.stage("final", content_dedup, depends=("survivors",))
    p.stage(
        "profile",
        lambda c: c.get("final")
        .groupBy(
            F.length(F.bin("n_chars")).alias("log2_bucket"), "source"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        ),
        depends=("final",),
    )
    return p.run()["profile"]


_CORPUS_V5_SQL = """
WITH pfx AS (
  SELECT doc_id, n_chars, text,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
           AS prefix_md5
  FROM documents),
pfx_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY prefix_md5) AS canon
    FROM pfx) t
  WHERE doc_id = canon),
exact_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM pfx_kept) t
  WHERE doc_id = canon),
sized AS (
  SELECT doc_id, text FROM exact_kept WHERE n_chars BETWEEN 50 AND 2000),
shards AS (
  SELECT ('0x' || substring(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT % 8
           AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM sized)
SELECT shard, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
FROM shards GROUP BY shard ORDER BY shard
"""


@q("llm_corpus_pipeline_v5", _CORPUS_V5_SQL)
def llm_corpus_pipeline_v5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-preparation pipeline composing the round-4 curation gates:
    prefix-duplication gate (keep the canonical member of each
    first-8-token cluster — the cheap boilerplate cut that runs BEFORE
    anything expensive) → exact content dedup among survivors → length
    window → deterministic 8-way shard manifest. Every stage is a window
    or hash over the SAME narrowing stream, so Catalyst fuses the whole
    funnel into one plan with three window/agg shuffles total — the
    funnel's per-stage attrition is the quality_gate_report's job; this
    emits the final dataloader artifact."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    prefix = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)))
    # the prefix rides as a REAL column so both dedup windows key on the
    # same attribute: the exact-dedup window partitions by
    # (_pfx, md5(text)) — identical groups to md5(text) alone, since
    # equal text implies an equal 8-token prefix — and the existing
    # hashpartitioning(_pfx) already satisfies that clustering, so the
    # second window reuses the first's exchange (guide §2.4): ONE corpus
    # shuffle for both dedup stages instead of two.
    w_pfx = Window.partitionBy("_pfx")
    pfx_kept = (
        d.withColumn("_pfx", prefix)
        .withColumn("_canon", F.min("doc_id").over(w_pfx))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    w_md5 = Window.partitionBy("_pfx", F.md5("text"))
    exact_kept = (
        pfx_kept.withColumn("_canon", F.min("doc_id").over(w_md5))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon", "_pfx")
    )
    sized = exact_kept.filter(F.col("n_chars").between(50, 2000))
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 7), F.lit(8))
    return (
        sized.select(
            shard.alias("shard"), F.size(F.split("text", " ")).alias("n_tokens")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard")
    )


def _v6_sem_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v6 funnel through the SemDeDup anti-join: prefix gate -> exact
    content dedup -> length window -> semantic drop-list anti-join.
    Returns the surviving full document rows (incl. lang, for v7's DSIR
    stage). Shared by llm_corpus_pipeline_v6 and _v7."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.queries.round11_extra import semdedup_drop_set

    d = load_table(spark, sf_dir, "documents")
    prefix = F.md5(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8)))
    # prefix as a REAL shared column; the exact-dedup window keys on
    # (_pfx, md5(text)) — identical groups, equal text implies equal
    # prefix — so it reuses the prefix window's exchange (guide §2.4):
    # one corpus shuffle for both dedup stages.
    w_pfx = Window.partitionBy("_pfx")
    pfx_kept = (
        d.withColumn("_pfx", prefix)
        .withColumn("_canon", F.min("doc_id").over(w_pfx))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon")
    )
    w_md5 = Window.partitionBy("_pfx", F.md5("text"))
    exact_kept = (
        pfx_kept.withColumn("_canon", F.min("doc_id").over(w_md5))
        .filter(F.col("doc_id") == F.col("_canon"))
        .drop("_canon", "_pfx")
    )
    sized = exact_kept.filter(F.col("n_chars").between(50, 2000))
    drops = semdedup_drop_set(spark, sf_dir).withColumnRenamed(
        "vec_id", "doc_id"
    )
    return sized.join(F.broadcast(drops), "doc_id", "left_anti")


def _corpus_v6_sql() -> str:
    from hawaiidatapipeline_spark.queries.emb_extra import _kmeans_ctes
    from hawaiidatapipeline_spark.queries.round11_extra import _semdedup_cc_ctes

    return f"""WITH RECURSIVE km0 AS (SELECT 1),
{_kmeans_ctes()},
{_semdedup_cc_ctes()},
sem_drop AS (
  SELECT m.vec_id FROM m
  JOIN sel s ON s.cluster_id = m.cluster_id
  WHERE m.vec_id <> s.survivor_id),
pfx AS (
  SELECT doc_id, n_chars, text,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
           AS prefix_md5
  FROM documents),
pfx_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY prefix_md5) AS canon
    FROM pfx) t
  WHERE doc_id = canon),
exact_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM pfx_kept) t
  WHERE doc_id = canon),
sized AS (
  SELECT doc_id, text FROM exact_kept WHERE n_chars BETWEEN 50 AND 2000),
sem_kept AS (
  SELECT doc_id, text FROM sized
  WHERE doc_id NOT IN (SELECT vec_id FROM sem_drop)),
shards AS (
  SELECT ('0x' || substring(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT % 8
           AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM sem_kept)
SELECT shard, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
FROM shards GROUP BY shard ORDER BY shard"""


@q("llm_corpus_pipeline_v6", _corpus_v6_sql())
def llm_corpus_pipeline_v6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v5's release funnel with SEMANTIC dedup composed in — the full
    modern curation stack in one checked plan: prefix gate → exact
    content dedup → length window → SemDeDup (drop non-survivor members
    of within-cell embedding-duplicate clusters, keep-rule = farthest
    from cell centroid; queries/round11_extra.semdedup_drop_set) →
    deterministic 8-way shard manifest. The syntactic gates run FIRST
    (cheap, no embedding needed); the semantic drop list comes from the
    corpus-wide cell-pruned pass and is duplicate-member-sized, so it
    broadcasts into a left-anti join against the already-narrowed
    stream. Scale: v5's three window/agg shuffles + one cell-key shuffle
    for the edges + O(diameter) CC rounds on the (tiny) duplicate edge
    set — nothing corpus-pair-sized. Oracle composes the proven v5 CTEs
    with the unrolled k-means + recursive-CC survivor CTEs."""
    sem_kept = _v6_sem_kept(spark, sf_dir)
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 7), F.lit(8))
    return (
        sem_kept.select(
            shard.alias("shard"), F.size(F.split("text", " ")).alias("n_tokens")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard")
    )


_V7_DSIR_N = 128  # DSIR selection size out of the funnel survivors


def _corpus_v7_sql() -> str:
    from hawaiidatapipeline_spark.queries.emb_extra import _kmeans_ctes
    from hawaiidatapipeline_spark.queries.round11_extra import _semdedup_cc_ctes
    from hawaiidatapipeline_spark.queries.selection_extra import (
        _DSIR_GSEED,
        _DSIR_UDEN,
        _DSIR_UMOD,
        _dsir_weights_sql,
    )

    dsir = _dsir_weights_sql("sem_docs")
    assert dsir.startswith("WITH ")
    return f"""WITH RECURSIVE km0 AS (SELECT 1),
{_kmeans_ctes()},
{_semdedup_cc_ctes()},
sem_drop AS (
  SELECT m.vec_id FROM m
  JOIN sel s ON s.cluster_id = m.cluster_id
  WHERE m.vec_id <> s.survivor_id),
pfx AS (
  SELECT doc_id, n_chars, text,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
           AS prefix_md5
  FROM documents),
pfx_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY prefix_md5) AS canon
    FROM pfx) t
  WHERE doc_id = canon),
exact_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM pfx_kept) t
  WHERE doc_id = canon),
sized AS (
  SELECT doc_id, text FROM exact_kept WHERE n_chars BETWEEN 50 AND 2000),
sem_kept AS (
  SELECT doc_id, text FROM sized
  WHERE doc_id NOT IN (SELECT vec_id FROM sem_drop)),
sem_docs AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d
  JOIN sem_kept k ON k.doc_id = d.doc_id),
{dsir.removeprefix("WITH ")},
keyed AS (
  SELECT w.doc_id,
         w.weight_micro
         + floor(-ln(-ln(((('0x' || substring(md5('{_DSIR_GSEED}:'
                           || w.doc_id::VARCHAR), 1, 15))::BIGINT
                          % {_DSIR_UMOD}) + 1) / {_DSIR_UDEN}))
                 * 1000000)::BIGINT AS key_micro
  FROM w),
picked AS (SELECT doc_id FROM keyed
           ORDER BY key_micro DESC, doc_id LIMIT {_V7_DSIR_N}),
shards AS (
  SELECT ('0x' || substring(md5('7:' || s.doc_id::VARCHAR), 1, 15))::BIGINT % 8
           AS shard,
         len(string_split(s.text, ' ')) AS n_tokens
  FROM sem_docs s JOIN picked p ON p.doc_id = s.doc_id)
SELECT shard, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens
FROM shards GROUP BY shard ORDER BY shard"""


@q("llm_corpus_pipeline_v7", _corpus_v7_sql())
def llm_corpus_pipeline_v7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v6's funnel with DSIR TARGET-DISTRIBUTION SELECTION as the final
    stage — the complete modern curation stack: prefix gate → exact
    content dedup → length window → SemDeDup drop-list anti-join →
    DSIR importance weights fit ON THE SURVIVORS (target slice
    lang = 'en', hashed uni+bigram models) → Gumbel-top-128 weighted
    resample → deterministic 8-way shard manifest of the selection.
    Fitting the n-gram models on the post-dedup corpus is the order the
    DSIR paper prescribes (dedup first, or duplicate mass distorts the
    raw model). Scale: the funnel's window/agg shuffles + the B-row λ
    broadcast + one TakeOrdered — the selection stage adds nothing
    corpus-pair-sized. Oracle composes the proven v6 CTEs with the
    parametrized DSIR CTE chain (src = survivors)."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.queries.selection_extra import (
        _DSIR_GSEED,
        _DSIR_UDEN,
        _DSIR_UMOD,
        _dsir_weights_for,
    )

    sem_kept = _v6_sem_kept(spark, sf_dir)
    w = _dsir_weights_for(sem_kept.select("doc_id", "lang", "text"))
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), _DSIR_GSEED) % _DSIR_UMOD)
        + 1
    ) / F.lit(_DSIR_UDEN)
    keyed = w.select(
        "doc_id",
        (
            F.col("weight_micro")
            + F.floor(-F.log(-F.log(u)) * 1000000).cast("long")
        ).alias("key_micro"),
    )
    picked = (
        keyed.orderBy(F.col("key_micro").desc(), "doc_id")
        .limit(_V7_DSIR_N)
        .select("doc_id")
    )
    shard = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 7), F.lit(8))
    return (
        sem_kept.join(F.broadcast(picked), "doc_id")
        .select(
            shard.alias("shard"), F.size(F.split("text", " ")).alias("n_tokens")
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("shard")
    )


_V8_CTX = 512  # packing context window (llm_sequence_packing's budget)


def _corpus_v8_sql() -> str:
    from hawaiidatapipeline_spark.queries.emb_extra import _kmeans_ctes
    from hawaiidatapipeline_spark.queries.round11_extra import _semdedup_cc_ctes
    from hawaiidatapipeline_spark.queries.round12_extra import (
        _QC_ROUNDS,
        _qc_sql_parts,
    )
    from hawaiidatapipeline_spark.queries.selection_extra import (
        _DSIR_GSEED,
        _DSIR_UDEN,
        _DSIR_UMOD,
        _dsir_weights_sql,
    )

    dsir = _dsir_weights_sql("sem_docs")
    assert dsir.startswith("WITH ")
    return f"""WITH RECURSIVE km0 AS (SELECT 1),
{_kmeans_ctes()},
{_semdedup_cc_ctes()},
sem_drop AS (
  SELECT m.vec_id FROM m
  JOIN sel s ON s.cluster_id = m.cluster_id
  WHERE m.vec_id <> s.survivor_id),
pfx AS (
  SELECT doc_id, n_chars, text,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '))
           AS prefix_md5
  FROM documents),
pfx_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY prefix_md5) AS canon
    FROM pfx) t
  WHERE doc_id = canon),
exact_kept AS (
  SELECT doc_id, n_chars, text FROM (
    SELECT doc_id, n_chars, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
    FROM pfx_kept) t
  WHERE doc_id = canon),
sized AS (
  SELECT doc_id, text FROM exact_kept WHERE n_chars BETWEEN 50 AND 2000),
sem_kept AS (
  SELECT doc_id, text FROM sized
  WHERE doc_id NOT IN (SELECT vec_id FROM sem_drop)),
sem_docs AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d
  JOIN sem_kept k ON k.doc_id = d.doc_id),
{dsir.removeprefix("WITH ")},
keyed AS (
  SELECT w.doc_id,
         w.weight_micro
         + floor(-ln(-ln(((('0x' || substring(md5('{_DSIR_GSEED}:'
                           || w.doc_id::VARCHAR), 1, 15))::BIGINT
                          % {_DSIR_UMOD}) + 1) / {_DSIR_UDEN}))
                 * 1000000)::BIGINT AS key_micro
  FROM w),
picked AS (SELECT doc_id FROM keyed
           ORDER BY key_micro DESC, doc_id LIMIT {_V7_DSIR_N}),
{_qc_sql_parts("qc_")},
qc_scores AS (
  SELECT d.doc_id, sum(d.v * w.w)::BIGINT AS s
  FROM qc_dense d JOIN qc_w{_QC_ROUNDS} w ON w.f = d.f GROUP BY 1),
kept AS (
  SELECT p.doc_id FROM picked p
  JOIN qc_scores q ON q.doc_id = p.doc_id
  WHERE q.s >= 0),
laid AS (
  SELECT k.doc_id,
         ('0x' || substring(md5('7:' || k.doc_id::VARCHAR), 1, 15))::BIGINT % 8
           AS shard,
         ('0x' || substring(md5('903:' || k.doc_id::VARCHAR), 1, 15))::BIGINT
           AS sh,
         len(string_split(s.text, ' '))::BIGINT AS tok
  FROM kept k JOIN sem_docs s ON s.doc_id = k.doc_id),
packed AS (
  SELECT shard, tok,
         sum(tok) OVER (PARTITION BY shard ORDER BY sh, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
  FROM laid)
SELECT shard, count(*)::BIGINT AS n_docs,
       sum(tok)::BIGINT AS total_tokens,
       ((sum(tok) + {_V8_CTX - 1}) // {_V8_CTX})::BIGINT AS n_chunks,
       sum(CASE WHEN (cum - 1) // {_V8_CTX}
                 <> (cum - tok) // {_V8_CTX} THEN 1 ELSE 0 END)::BIGINT
         AS frag_docs
FROM packed GROUP BY shard ORDER BY shard"""


@q("llm_corpus_pipeline_v8", _corpus_v8_sql())
def llm_corpus_pipeline_v8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v7's funnel with the TRAINED QUALITY GATE and the PACKING MANIFEST
    as final stages — the full modern curation-to-training handoff in
    one Catalyst plan: prefix gate → exact dedup → length window →
    SemDeDup anti-join → DSIR Gumbel-top-128 selection → the round-12
    logistic classifier's logit >= 0 gate (trained on the full corpus,
    scoring = one B+1-row model broadcast) → per-shard
    concatenate-and-chunk packing stats over the reproducible shuffle
    order (chunk budget {_V8_CTX} tokens): docs, tokens, chunk count,
    and boundary-fragmented docs per shard — the numbers a training
    launcher reads off the manifest. Scale: everything the component
    keys already proved — the classifier gate adds one broadcast join,
    the packing adds per-shard prefix sums (shard count is a manifest
    parameter that scales with corpus; within-shard order is the hash
    shuffle). Oracle composes the proven v7 CTEs with the prefixed
    classifier chain (qc_*) and the packing window."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.queries.round12_extra import _qc_train
    from hawaiidatapipeline_spark.queries.selection_extra import (
        _DSIR_GSEED,
        _DSIR_UDEN,
        _DSIR_UMOD,
        _dsir_weights_for,
    )

    sem_kept = _v6_sem_kept(spark, sf_dir)
    w = _dsir_weights_for(sem_kept.select("doc_id", "lang", "text"))
    u = (
        (portable_hash64(F.col("doc_id").cast("string"), _DSIR_GSEED) % _DSIR_UMOD)
        + 1
    ) / F.lit(_DSIR_UDEN)
    keyed = w.select(
        "doc_id",
        (
            F.col("weight_micro")
            + F.floor(-F.log(-F.log(u)) * 1000000).cast("long")
        ).alias("key_micro"),
    )
    picked = (
        keyed.orderBy(F.col("key_micro").desc(), "doc_id")
        .limit(_V7_DSIR_N)
        .select("doc_id")
    )
    d = load_table(spark, sf_dir, "documents")
    dense, _, _, wq, _ = _qc_train(spark, d)
    scores = (
        dense.join(F.broadcast(wq), "f")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v") * F.col("w")).cast("long").alias("s"))
    )
    kept = picked.join(scores, "doc_id").filter(F.col("s") >= 0).select("doc_id")
    laid = (
        sem_kept.join(F.broadcast(kept), "doc_id")
        .select(
            "doc_id",
            F.pmod(
                portable_hash64(F.col("doc_id").cast("string"), 7), F.lit(8)
            ).alias("shard"),
            portable_hash64(F.col("doc_id").cast("string"), 903).alias("sh"),
            F.size(F.split("text", " ")).cast("long").alias("tok"),
        )
    )
    from pyspark.sql import Window as W

    w_pack = (
        W.partitionBy("shard")
        .orderBy("sh", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = laid.withColumn("cum", F.sum("tok").over(w_pack))
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.floor((F.sum("tok") + _V8_CTX - 1) / _V8_CTX)
            .cast("long")
            .alias("n_chunks"),
            F.sum(
                F.when(
                    F.floor((F.col("cum") - 1) / _V8_CTX)
                    != F.floor((F.col("cum") - F.col("tok")) / _V8_CTX),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("frag_docs"),
        )
        .orderBy("shard")
    )
