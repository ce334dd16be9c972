"""Corpus indexing/statistics extras: inverted index, bigram counts.

Complements queries/textanalysis.py (lang-id, quality, BPE counting,
fingerprints) with the index-construction side of a text pipeline: the
posting lists behind full-text search and the n-gram frequency tables
behind LM-style corpus analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "llm_inverted_index",
    """WITH tok AS (
         SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents
       )
       SELECT token,
              count(*) AS df,
              array_to_string((list(doc_id ORDER BY doc_id))[1:10], '|') AS postings_head
       FROM tok GROUP BY token""",
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: token → document frequency + the first 10
    postings (doc_ids). The distributed shape of full-text indexing:
    explode + distinct + one groupBy shuffle on token; posting lists are
    produced pre-sorted per token. At 100 TB you cap or stop-list
    high-df tokens exactly as the head-truncation here does — hot tokens
    otherwise concentrate their whole posting list in one task. The head
    is serialized (sorted, '|'-joined) so the gate hash-checks list
    contents, not just counts."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).distinct()
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            "|",
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10),
                lambda x: x.cast("string"),
            ),
        ).alias("postings_head"),
    )


@q(
    "llm_ngram_counts",
    """WITH toks AS (
         SELECT string_split(text, ' ') AS t FROM documents
         WHERE len(string_split(text, ' ')) >= 2
       ),
       idx AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
       big AS (SELECT t[i] || ' ' || t[i + 1] AS bigram FROM idx),
       counts AS (SELECT bigram, count(*) AS n FROM big GROUP BY bigram),
       ranked AS (
         SELECT bigram, n, row_number() OVER (ORDER BY n DESC, bigram) AS rnk
         FROM counts
       )
       SELECT bigram, n, rnk FROM ranked WHERE rnk <= 100""",
)
def llm_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram frequency table — the corpus statistic behind LM
    data analysis (repetition, boilerplate, n-gram LM training). Bigrams
    are generated inside the row (array transform, no self-join), then
    one groupBy shuffle; only the global top slice crosses the final
    single-partition ranking window. At 100 TB pre-filter with a count
    threshold (or a count-min pass, agg_heavy_hitters_cms) so the ranking
    window sees thousands of rows, not the full bigram vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
            )
        ).alias("bigram")
    )
    counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 100)
