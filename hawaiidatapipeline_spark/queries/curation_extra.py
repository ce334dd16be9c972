"""Corpus-curation extras: URL-canonicalization dedup, incremental
ingestion dedup, and length profiling.

These fill the remaining gaps a production pretraining-data pipeline hits
between the sketch dedups (queries/llm.py, operators/dedup.py) and the
curation chain (queries/training.py): crawl URLs arrive in dozens of
surface forms per page (case, tracking params, fragments), every nightly
batch must dedup against the ALREADY-INGESTED corpus without rescanning
it, and length histograms drive the truncation/packing decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# Deterministic crawl-URL synthesis (fixtures carry no URL column): docs
# 2g and 2g+1 are the same page fetched twice — once clean, once with
# mixed case, utm tracking params, and a fragment. Canonicalization must
# collapse each pair. Same int-arithmetic convention as fn_url_parse.
_URL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0
            THEN 'https://site' || (doc_id // 2 % 20)
                 || '.example.com/p/' || (doc_id // 2 % 50)
                 || '?ref=' || (doc_id // 2 % 3)
            ELSE 'https://Site' || (doc_id // 2 % 20)
                 || '.Example.COM/p/' || (doc_id // 2 % 50)
                 || '?ref=' || (doc_id // 2 % 3)
                 || '&utm_source=feed&utm_campaign=spring#frag'
       END AS url
FROM documents
"""


def _synth_urls(d: DataFrame) -> DataFrame:
    g = (F.col("doc_id") / 2).cast("long")
    clean = F.concat(
        F.lit("https://site"), (g % 20).cast("string"),
        F.lit(".example.com/p/"), (g % 50).cast("string"),
        F.lit("?ref="), (g % 3).cast("string"),
    )
    messy = F.concat(
        F.lit("https://Site"), (g % 20).cast("string"),
        F.lit(".Example.COM/p/"), (g % 50).cast("string"),
        F.lit("?ref="), (g % 3).cast("string"),
        F.lit("&utm_source=feed&utm_campaign=spring#frag"),
    )
    return d.select(
        "doc_id", F.when(F.col("doc_id") % 2 == 0, clean).otherwise(messy).alias("url")
    )


def canonicalize_url(col):
    """Crawl-URL canonical form: lowercase, strip the fragment, strip
    utm_* tracking params. Pure regex (Java ∩ RE2, same dialect rule as
    fn_regex) so it runs JVM-side in whole-stage codegen — no UDF in what
    is a per-row transform over every crawled page at 100 TB."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"#.*$", "")
    return F.regexp_replace(c, r"[&]utm_[a-z_]+=[^&#]*", "")


@q(
    "llm_dedup_url",
    f"""WITH urls AS ({_URL_SQL}),
       canon AS (
         SELECT doc_id,
                regexp_replace(
                  regexp_replace(lower(url), '#.*$', ''),
                  '[&]utm_[a-z_]+=[^&#]*', '', 'g') AS canonical_url
         FROM urls
       )
       SELECT canonical_url,
              count(*) AS n_dups,
              min(doc_id) AS keep_doc_id
       FROM canon GROUP BY canonical_url""",
)
def llm_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the first dedup stage of a crawl
    pipeline (CommonCrawl-style): the same page surfaces under case
    variants, tracking params, and fragments; canonicalize then group.
    One shuffle on the canonical key, survivor = min doc_id (same
    first-wins rule as llm_dedup_exact). The canonicalizer is pure
    codegen'd regex, so at 100 TB this is scan + one exchange."""
    d = load_table(spark, sf_dir, "documents")
    canon = _synth_urls(d).select(
        "doc_id", canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.min("doc_id").alias("keep_doc_id"),
    )


@q(
    "etl_dedup_incremental",
    """WITH k AS (
         SELECT doc_id, source,
                md5(array_to_string((string_split(text, ' '))[1:2], ' ')) AS h
         FROM documents
       ),
       stored AS (SELECT DISTINCT h FROM k WHERE doc_id % 10 <> 0),
       batch AS (SELECT doc_id, h, source FROM k WHERE doc_id % 10 = 0),
       fresh AS (
         SELECT b.doc_id, b.h, b.source FROM batch b
         WHERE NOT EXISTS (SELECT 1 FROM stored s WHERE s.h = b.h)
       ),
       first_per_hash AS (
         SELECT h, min(doc_id) AS doc_id FROM fresh GROUP BY h
       )
       SELECT f.doc_id, fr.source
       FROM first_per_hash f JOIN fresh fr ON f.doc_id = fr.doc_id""",
)
def etl_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a new batch (doc_id%10=0) is admitted
    only where its fingerprint is absent from the stored corpus
    (doc_id%10≠0) AND unseen within the batch (first doc_id wins). The
    fingerprint is an md5 of the normalized head of the document (first
    two tokens — the title/URL-key normalization of a crawl pipeline;
    exact-content md5 is llm_dedup_exact) so both elimination paths are
    genuinely exercised by the fixtures: half the batch collides with
    stored docs, and intra-batch collisions hit the first-wins rule.
    The corpus side reduces to a DISTINCT 16-byte hash column before the
    anti-join — documents are never shipped; at 100 TB the stored side
    is a pre-materialized hash index (bucketed by hash), making the
    anti-join co-located and the per-night cost ∝ batch size, not
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.encode(F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2)), "utf-8")
    ).alias("h")
    k = d.select("doc_id", "source", fp)
    stored = k.filter(F.col("doc_id") % 10 != 0).select("h").distinct()
    batch = k.filter(F.col("doc_id") % 10 == 0)
    fresh = batch.join(stored, "h", "left_anti")
    first = fresh.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return first.join(fresh, ["h", "doc_id"]).select("doc_id", "source")


@q(
    "llm_length_histogram",
    """SELECT length(bin(n_chars)) AS log2_bucket,
              count(*) AS n_docs,
              sum(n_chars)::BIGINT AS total_chars,
              min(n_chars) AS min_chars,
              max(n_chars) AS max_chars
       FROM documents GROUP BY log2_bucket""",
)
def llm_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two length histogram — the profile behind truncation and
    sequence-packing budgets. The bucket is ``length(bin(n))`` =
    floor(log2(n))+1 computed with INTEGER arithmetic on both engines:
    float log2 rounds differently at exact powers of two across libm
    implementations, which would hash-mismatch on bucket boundaries."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.length(F.bin("n_chars")).alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
