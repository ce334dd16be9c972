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


_CHI2_MIN_DF = 5
_CHI2_TOPK = 5


@q(
    "llm_topic_words_chi2",
    f"""WITH tok AS (
         SELECT DISTINCT doc_id, source,
                unnest(string_split(text, ' ')) AS token
         FROM documents),
       ns AS (SELECT source, count(DISTINCT doc_id) AS n_s
              FROM documents GROUP BY 1),
       nn AS (SELECT count(*) AS n FROM documents),
       tf AS (SELECT token, source, count(*) AS a FROM tok GROUP BY 1, 2),
       tt AS (SELECT token, sum(a) AS t FROM tf GROUP BY 1),
       x AS (SELECT f.source, f.token, f.a,
                    ns.n_s - f.a AS b, tt.t - f.a AS c,
                    nn.n - ns.n_s - (tt.t - f.a) AS d, nn.n AS n
             FROM tf f
             JOIN ns ON ns.source = f.source
             JOIN tt ON tt.token = f.token, nn
             WHERE tt.t >= {_CHI2_MIN_DF}),
       chi AS (SELECT source, token, a,
                      round(n * (a * d - b * c) * (a * d - b * c)
                            / (((a + b) * (c + d))::DOUBLE
                               * ((a + c) * (b + d))), 6) AS chi2
               FROM x
               WHERE (a + b) > 0 AND (c + d) > 0
                 AND (a + c) > 0 AND (b + d) > 0)
       SELECT source, token, a AS df_in_source, chi2 FROM (
         SELECT *, row_number() OVER (PARTITION BY source
                                      ORDER BY chi2 DESC, token) AS rn
         FROM chi) r
       WHERE rn <= {_CHI2_TOPK}
       ORDER BY source, chi2 DESC, token""",
)
def llm_topic_words_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared keyword extraction per source: for each (source, token)
    the 2x2 document-frequency contingency table (in source / elsewhere x
    contains / doesn't) scores how strongly the token characterizes the
    source — the supervised complement of llm_tfidf_topterms (tf-idf finds
    rare-anywhere terms; chi2 finds terms that SEPARATE sources, the
    feature-selection primitive behind domain classifiers and
    mixture-weight audits). All four cells are exact integer document
    counts, chi2 is one float expression (numerator exact int64 under the
    fixture bounds), rare tokens (corpus df < {_CHI2_MIN_DF}) pruned, and
    the per-source top-5 ranks by the ROUNDED score with token
    tie-breaks. Scale: DISTINCT (doc, token) explode + two partial-agg
    shuffles keyed by token — the same budget as the tf-idf lane."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    ns = d.groupBy("source").agg(F.countDistinct("doc_id").alias("n_s"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    tf = tok.groupBy("token", "source").agg(F.count(F.lit(1)).alias("a"))
    tt = tf.groupBy("token").agg(F.sum("a").alias("t"))
    x = (
        tf.join(F.broadcast(ns), "source")
        .join(tt, "token")
        .crossJoin(F.broadcast(nn))
        .filter(F.col("t") >= _CHI2_MIN_DF)
        .select(
            "source",
            "token",
            "a",
            (F.col("n_s") - F.col("a")).alias("b"),
            (F.col("t") - F.col("a")).alias("c"),
            (F.col("n") - F.col("n_s") - (F.col("t") - F.col("a"))).alias("d"),
            "n",
        )
    )
    chi = x.filter(
        ((F.col("a") + F.col("b")) > 0)
        & ((F.col("c") + F.col("d")) > 0)
        & ((F.col("a") + F.col("c")) > 0)
        & ((F.col("b") + F.col("d")) > 0)
    ).select(
        "source",
        "token",
        "a",
        F.round(
            F.col("n")
            * (F.col("a") * F.col("d") - F.col("b") * F.col("c"))
            * (F.col("a") * F.col("d") - F.col("b") * F.col("c"))
            / (
                ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d"))).cast(
                    "double"
                )
                * ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d")))
            ),
            6,
        ).alias("chi2"),
    )
    w = Window.partitionBy("source").orderBy(F.col("chi2").desc(), "token")
    return (
        chi.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CHI2_TOPK)
        .select("source", "token", F.col("a").alias("df_in_source"), "chi2")
        .orderBy("source", F.col("chi2").desc(), "token")
    )


@q(
    "llm_readability",
    """WITH per_doc AS (
         SELECT doc_id,
                len(string_split(text, ' '))::BIGINT AS words,
                greatest(1,
                  (length(text) - length(replace(text, '.', '')))
                  + (length(text) - length(replace(text, '!', '')))
                  + (length(text) - length(replace(text, '?', ''))))::BIGINT
                  AS sentences,
                len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT
                  AS syllables
         FROM documents),
       scored AS (
         SELECT doc_id, words, sentences, syllables,
                (floor((206.835
                        - 1.015 * (words::DOUBLE / sentences)
                        - 84.6 * (syllables::DOUBLE / words))
                       * 1000000))::BIGINT AS score_micro
         FROM per_doc WHERE words > 0),
       banded AS (
         SELECT (floor(score_micro / 10000000.0) * 10)::BIGINT AS band,
                doc_id, score_micro
         FROM scored)
       SELECT band, count(*)::BIGINT AS n_docs,
              round(sum(score_micro)::DOUBLE / count(*) / 1000000.0, 6)
                AS avg_score,
              min(doc_id)::BIGINT AS sample_doc
       FROM banded GROUP BY band ORDER BY band""",
)
def llm_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability scoring with a deterministic syllable
    heuristic (count of [aeiouy]+ vowel groups — the standard cheap
    proxy; both engines evaluate the same character-class regex, which
    has identical semantics in RE2 and Java regex for plain classes):
    score = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word),
    sentences counted by terminal punctuation via pure length/replace
    arithmetic (no regex divergence risk on the splitter). Per-doc
    scores are floored to MICRO-units before any cross-doc aggregation,
    then docs bucket into 10-point bands with exact counts and
    micro-sum means — the corpus readability profile a curation
    pipeline thresholds against (very negative bands = run-on garbage,
    very high = fragment spam). Shape: map-only per-doc arithmetic
    (pure codegen, no UDF) + ONE small-key partial agg; at 100 TB this
    is scan-bound, exactly like ``llm_quality_score``."""
    d = load_table(spark, sf_dir, "documents")

    def n_char(ch: str) -> F.Column:
        return F.length("text") - F.length(F.replace(F.col("text"), F.lit(ch)))

    per_doc = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("words"),
        F.greatest(
            F.lit(1), (n_char(".") + n_char("!") + n_char("?"))
        )
        .cast("long")
        .alias("sentences"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("syllables"),
    )
    scored = per_doc.filter(F.col("words") > 0).select(
        "doc_id",
        F.floor(
            (
                F.lit(206.835)
                - 1.015 * (F.col("words").cast("double") / F.col("sentences"))
                - 84.6 * (F.col("syllables").cast("double") / F.col("words"))
            )
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("score_micro"),
    )
    banded = scored.select(
        (F.floor(F.col("score_micro") / 10000000.0) * 10)
        .cast("long")
        .alias("band"),
        "doc_id",
        "score_micro",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("score_micro").cast("double")
                / F.count(F.lit(1))
                / 1000000.0,
                6,
            ).alias("avg_score"),
            F.min("doc_id").cast("long").alias("sample_doc"),
        )
        .orderBy("band")
    )
