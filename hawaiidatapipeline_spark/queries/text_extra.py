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
    # top slice FIRST via orderBy+limit (plans as distributed
    # TakeOrderedAndProject), then the rank window runs over 100 rows —
    # never the full bigram vocabulary (plan_smell global-window audit)
    top = counts.orderBy(F.col("n").desc(), "bigram").limit(100)
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return top.withColumn("rnk", F.row_number().over(w))


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


_BM25_TERMS = ("merge", "window", "hash")  # multi-term retrieval query
_BM25_K1_X10 = 12  # k1 = 1.2, scaled x10 so the scoring stays integral
_BM25_B_X100 = 75  # b = 0.75


@q(
    "fulltext_bm25",
    f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
       nn AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS t FROM dl),
       terms AS (SELECT unnest(['merge', 'window', 'hash']) AS term),
       tf AS (SELECT t.doc_id, t.tok AS term, count(*)::BIGINT AS tf
              FROM toks t JOIN terms q ON q.term = t.tok GROUP BY 1, 2),
       df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       idf AS (SELECT term,
                      floor(ln((((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
                               + 1) * 1000)::BIGINT AS idf_milli
               FROM df),
       sc AS (SELECT f.doc_id,
                     floor((i.idf_milli * 22.0 * nn.t * f.tf)
                           / (10 * nn.t * f.tf + 3 * nn.t
                              + 9 * d.dl * nn.n))::BIGINT AS s_milli
              FROM tf f
              JOIN idf i ON i.term = f.term
              JOIN dl d ON d.doc_id = f.doc_id, nn),
       agg AS (SELECT doc_id, count(*)::BIGINT AS n_terms,
                      sum(s_milli)::BIGINT AS score_milli
               FROM sc GROUP BY 1)
       SELECT a.doc_id, d2.lang, a.n_terms, a.score_milli,
              round(a.score_milli / 1000.0, 6) AS bm25
       FROM agg a JOIN documents d2 ON d2.doc_id = a.doc_id
       ORDER BY a.score_milli DESC, a.doc_id LIMIT 50""",
)
def fulltext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1 = 1.2, b = 0.75, Lucene +1 IDF) —
    the scoring fulltext_ranked's raw term frequency approximates: IDF
    damps stop-ish terms and the dl/avgdl factor stops long documents
    from winning on volume alone. Integer lane: with T = total corpus
    tokens and N = docs, the per-term contribution
    idf·tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) is multiplied through by
    10·T, making the denominator the exact integer
    10·T·tf + 3·T + 9·dl·N — one IEEE division + floor per (doc, term)
    in milli-units, then an exact integer sum per doc, so both engines
    rank identically. Plan: one token explode, a 3-row broadcast term
    join (the posting-list read of an inverted index — at 100 TB this
    join IS the index lookup, touching only matching postings), doc-
    grain aggs, TakeOrdered top-50. The df/idf tables are term-count
    sized; nothing corpus-quadratic."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    nn = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("t"),
    )
    terms = spark.createDataFrame([(t,) for t in _BM25_TERMS], "term string")
    tf = (
        toks.join(F.broadcast(terms), toks["tok"] == terms["term"])
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = (
        df_.crossJoin(F.broadcast(nn))
        .select(
            "term",
            F.floor(
                F.log(
                    ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)) + 1
                )
                * 1000
            )
            .cast("long")
            .alias("idf_milli"),
        )
    )
    sc = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.floor(
                (F.col("idf_milli") * 22.0 * F.col("t") * F.col("tf"))
                / (
                    10 * F.col("t") * F.col("tf")
                    + 3 * F.col("t")
                    + 9 * F.col("dl") * F.col("n")
                )
            )
            .cast("long")
            .alias("s_milli"),
        )
    )
    agg = sc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("s_milli").cast("long").alias("score_milli"),
    )
    return (
        agg.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_terms",
            "score_milli",
            F.round(F.col("score_milli") / 1000.0, 6).alias("bm25"),
        )
        .orderBy(F.col("score_milli").desc(), "doc_id")
        .limit(50)
    )


_NDCG_TERMS = ("merge", "window", "hash", "scan", "sort")
_NDCG_K = 10


@q(
    "fulltext_eval_ndcg",
    f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         FROM documents),
       dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
       nn AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS t FROM dl),
       terms AS (SELECT unnest(['merge', 'window', 'hash', 'scan', 'sort'])
                   AS term),
       tf AS (SELECT t.doc_id, t.tok AS term, count(*)::BIGINT AS tf
              FROM toks t JOIN terms q ON q.term = t.tok GROUP BY 1, 2),
       df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       idf AS (SELECT term,
                      floor(ln((((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
                               + 1) * 1000)::BIGINT AS idf_milli
               FROM df),
       scored AS (
         SELECT f.term, f.doc_id, f.tf,
                least(f.tf, 3)::BIGINT AS rel,
                floor((i.idf_milli * 22.0 * nn.t * f.tf)
                      / (10 * nn.t * f.tf + 3 * nn.t
                         + 9 * d.dl * nn.n))::BIGINT AS s_milli
         FROM tf f
         JOIN idf i ON i.term = f.term
         JOIN dl d ON d.doc_id = f.doc_id, nn),
       ranked AS (
         SELECT term, doc_id, tf, rel,
                CASE rel WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END AS gain,
                row_number() OVER (PARTITION BY term
                                   ORDER BY s_milli DESC, doc_id) AS rn_sys,
                row_number() OVER (PARTITION BY term
                                   ORDER BY rel DESC, doc_id) AS rn_ideal
         FROM scored),
       disc AS (SELECT i,
                       floor(1000000 / log2(i + 1))::BIGINT AS disc_micro
                FROM (SELECT unnest(generate_series(1, {_NDCG_K})) AS i)),
       agg AS (
         SELECT r.term,
                count(*)::BIGINT AS n_matched,
                sum(CASE WHEN r.rn_sys <= {_NDCG_K}
                         THEN r.gain * ds.disc_micro ELSE 0 END)::BIGINT
                  AS dcg_micro,
                sum(CASE WHEN r.rn_ideal <= {_NDCG_K}
                         THEN r.gain * di.disc_micro ELSE 0 END)::BIGINT
                  AS idcg_micro,
                min(CASE WHEN r.tf >= 2 THEN r.rn_sys END)::BIGINT
                  AS first_rel_rank
         FROM ranked r
         LEFT JOIN disc ds ON ds.i = r.rn_sys
         LEFT JOIN disc di ON di.i = r.rn_ideal
         GROUP BY 1)
       SELECT term, n_matched, dcg_micro, idcg_micro,
              round(dcg_micro::DOUBLE / idcg_micro, 6) AS ndcg_at_{_NDCG_K},
              round(coalesce(1.0 / first_rel_rank, 0), 6) AS mrr
       FROM agg ORDER BY term""",
)
def fulltext_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of BM25 retrieval: nDCG@10 and MRR per
    query term, with graded relevance = min(tf, 3) (the raw term-count
    signal BM25's length normalization deliberately reorders — nDCG < 1
    here measures exactly that reorder) and "highly relevant" = tf >= 2
    for MRR. Integer lane: gains are the exact integers 2^rel − 1; the
    position discount 1/log2(i+1) is pre-floored to MICRO-UNITS in a
    10-row broadcast table, so each DCG is an exact integer dot product
    and the only per-term floats are the final two divisions. Plan: the
    BM25 scoring plan (term-join = posting-list read), then rank windows
    PER TERM partition (posting-list sized, the win_topk_per_group
    bound) and a 10-row broadcast discount join — metric output is
    #terms rows, nothing corpus-sized survives the agg."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    nn = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("t"),
    )
    terms = spark.createDataFrame([(t,) for t in _NDCG_TERMS], "term string")
    tf = (
        toks.join(F.broadcast(terms), toks["tok"] == terms["term"])
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = df_.crossJoin(F.broadcast(nn)).select(
        "term",
        F.floor(
            F.log(((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)) + 1)
            * 1000
        )
        .cast("long")
        .alias("idf_milli"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(nn))
        .select(
            "term",
            "doc_id",
            "tf",
            F.least(F.col("tf"), F.lit(3)).cast("long").alias("rel"),
            F.floor(
                (F.col("idf_milli") * 22.0 * F.col("t") * F.col("tf"))
                / (
                    10 * F.col("t") * F.col("tf")
                    + 3 * F.col("t")
                    + 9 * F.col("dl") * F.col("n")
                )
            )
            .cast("long")
            .alias("s_milli"),
        )
    )
    w_sys = Window.partitionBy("term").orderBy(F.col("s_milli").desc(), "doc_id")
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), "doc_id")
    ranked = scored.select(
        "term",
        "doc_id",
        "tf",
        "rel",
        F.when(F.col("rel") == 1, 1)
        .when(F.col("rel") == 2, 3)
        .otherwise(7)
        .cast("long")
        .alias("gain"),
        F.row_number().over(w_sys).alias("rn_sys"),
        F.row_number().over(w_ideal).alias("rn_ideal"),
    )
    disc = spark.range(1, _NDCG_K + 1).select(
        F.col("id").alias("i"),
        F.floor(1000000 / F.log2(F.col("id") + 1)).cast("long").alias("disc_micro"),
    )
    ds = disc.select(F.col("i").alias("rn_sys"), F.col("disc_micro").alias("dm_s"))
    di = disc.select(
        F.col("i").alias("rn_ideal"), F.col("disc_micro").alias("dm_i")
    )
    agg = (
        ranked.join(F.broadcast(ds), "rn_sys", "left")
        .join(F.broadcast(di), "rn_ideal", "left")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(
                F.when(
                    F.col("rn_sys") <= _NDCG_K, F.col("gain") * F.col("dm_s")
                ).otherwise(0)
            )
            .cast("long")
            .alias("dcg_micro"),
            F.sum(
                F.when(
                    F.col("rn_ideal") <= _NDCG_K, F.col("gain") * F.col("dm_i")
                ).otherwise(0)
            )
            .cast("long")
            .alias("idcg_micro"),
            F.min(F.when(F.col("tf") >= 2, F.col("rn_sys")))
            .cast("long")
            .alias("first_rel_rank"),
        )
    )
    return agg.select(
        "term",
        "n_matched",
        "dcg_micro",
        "idcg_micro",
        F.round(F.col("dcg_micro").cast("double") / F.col("idcg_micro"), 6).alias(
            f"ndcg_at_{_NDCG_K}"
        ),
        F.round(F.coalesce(1.0 / F.col("first_rel_rank"), F.lit(0.0)), 6).alias(
            "mrr"
        ),
    ).orderBy("term")


_BPE_ROUNDS = 3


def _bpe_round_ctes(r: int) -> str:
    """One unrolled BPE merge round (consumes ``s{r-1}``: word, wcount,
    pos, sym with CONSECUTIVE pos per word; produces ``s{r}`` + ``st{r}``
    stats row). Greedy left-to-right merging is set-expressible: matches
    of an (a,b) pair with a != b can never overlap (the next start would
    need s[i+1] = a but s[i+1] = b), and within a run of a == b matches
    (gaps-and-islands on pos) greedy keeps exactly the even-offset ones."""
    prev = r - 1
    return f"""p{r} AS (
         SELECT word, wcount, pos, sym,
                lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         FROM s{prev}),
       pc{r} AS (SELECT sym AS a, nxt AS b, sum(wcount)::BIGINT AS total
                 FROM p{r} WHERE nxt IS NOT NULL GROUP BY 1, 2),
       best{r} AS (SELECT a, b, total FROM pc{r}
                   ORDER BY total DESC, a, b LIMIT 1),
       mt{r} AS (SELECT p.word, p.pos,
                        row_number() OVER (PARTITION BY p.word
                                           ORDER BY p.pos) AS rn
                 FROM p{r} p, best{r} bb
                 WHERE p.sym = bb.a AND p.nxt = bb.b),
       mg{r} AS (SELECT word, pos FROM (
                   SELECT word, pos,
                          row_number() OVER (PARTITION BY word, pos - rn
                                             ORDER BY pos) AS k
                   FROM mt{r}) x WHERE (k - 1) % 2 = 0),
       sp{r} AS (
         SELECT p.word, p.wcount, p.pos,
                CASE WHEN m.pos IS NOT NULL THEN p.sym || p.nxt
                     ELSE p.sym END AS sym,
                c.pos AS consumed
         FROM p{r} p
         LEFT JOIN mg{r} m ON m.word = p.word AND m.pos = p.pos
         LEFT JOIN mg{r} c ON c.word = p.word AND c.pos = p.pos - 1),
       s{r} AS (
         SELECT word, wcount,
                row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
                sym
         FROM sp{r} WHERE consumed IS NULL),
       st{r} AS (
         SELECT {r} AS round, bb.a AS sym_a, bb.b AS sym_b,
                bb.total AS pair_total,
                (SELECT sum(wcount) FROM s{r})::BIGINT AS n_symbols_after,
                (SELECT count(DISTINCT sym) FROM s{r})::BIGINT AS vocab_after
         FROM best{r} bb)"""


def _bpe_merge_sql() -> str:
    rounds = ",\n       ".join(_bpe_round_ctes(r) for r in range(1, _BPE_ROUNDS + 1))
    union = "\n       UNION ALL ".join(
        f"SELECT * FROM st{r}" for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""WITH toks AS (
         SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       words AS (SELECT word, count(*)::BIGINT AS wcount
                 FROM toks GROUP BY 1),
       chars AS (SELECT word, wcount,
                        unnest(generate_series(1, length(word))) AS i
                 FROM words),
       s0 AS (SELECT word, wcount, i - 1 AS pos,
                     substring(word, i, 1) AS sym
              FROM chars),
       {rounds}
       {union}
       ORDER BY round"""


def _bpe_one_round(spark, syms: DataFrame, r: int):
    """Spark twin of ``_bpe_round_ctes``: returns (new_syms, stats_df)."""
    wl = Window.partitionBy("word").orderBy("pos")
    p = syms.withColumn("nxt", F.lead("sym").over(wl))
    pc = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("wcount").cast("long").alias("total"))
    )
    best = pc.orderBy(F.col("total").desc(), "a", "b").limit(1)
    mt = (
        p.crossJoin(F.broadcast(best))
        .filter((F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b")))
        .select("word", "pos", F.row_number().over(wl).alias("rn"))
    )
    wi = Window.partitionBy("word", F.col("pos") - F.col("rn")).orderBy("pos")
    mg = (
        mt.withColumn("k", F.row_number().over(wi))
        .filter((F.col("k") - 1) % 2 == 0)
        .select("word", F.col("pos").alias("mpos"))
    )
    merged = mg.withColumnRenamed("mpos", "pos").withColumn("m", F.lit(1))
    consumed = mg.select(
        "word", (F.col("mpos") + 1).alias("pos"), F.lit(1).alias("c")
    )
    sp = (
        p.join(merged, ["word", "pos"], "left")
        .join(consumed, ["word", "pos"], "left")
        .filter(F.col("c").isNull())
        .select(
            "word",
            "wcount",
            "pos",
            F.when(F.col("m").isNotNull(), F.concat("sym", "nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    from hawaiidatapipeline_spark.operators.materialize import materialize

    new_syms = materialize(
        sp.select(
            "word",
            "wcount",
            (F.row_number().over(wl) - 1).alias("pos"),
            "sym",
        )
    )
    stats = new_syms.agg(
        F.sum("wcount").cast("long").alias("n_symbols_after"),
        F.countDistinct("sym").cast("long").alias("vocab_after"),
    )
    st = best.crossJoin(stats).select(
        F.lit(r).alias("round"),
        F.col("a").alias("sym_a"),
        F.col("b").alias("sym_b"),
        F.col("total").alias("pair_total"),
        "n_symbols_after",
        "vocab_after",
    )
    return new_syms, st


@q("llm_bpe_merge_steps", _bpe_merge_sql())
def llm_bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, three unrolled merge rounds — the iterative
    half llm_bpe_pair_counts stops short of: per round, pick the highest-
    count adjacent symbol pair (ties → lexicographic) and apply the greedy
    left-to-right merge everywhere, exactly Sennrich et al.'s algorithm.
    The merge is set-expressible without any per-row Python: an (a,b)
    match with a != b can never overlap the next one, and runs of an
    a == b pair reduce to gaps-and-islands parity (keep even offsets), so
    three window functions per round do it. Scale: after ONE linear
    corpus pass (the word-frequency agg), every round operates on the
    WORD table — vocabulary-bounded, not corpus-bounded, which is why
    word-level BPE training is tractable at 100 TB; windows partition by
    word (≤ word-length rows). Pure integer counts end to end; outputs
    the learned merge per round plus corpus symbol count and symbol
    vocabulary after each round."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
    )
    syms = words.select(
        "word",
        "wcount",
        F.posexplode(F.sequence(F.lit(1), F.length("word"))).alias("_j", "i"),
    ).select(
        "word",
        "wcount",
        (F.col("i") - 1).alias("pos"),
        F.expr("substring(word, i, 1)").alias("sym"),
    )
    stats = []
    for r in range(1, _BPE_ROUNDS + 1):
        syms, st = _bpe_one_round(spark, syms, r)
        stats.append(st)
    out = stats[0]
    for st in stats[1:]:
        out = out.unionByName(st)
    return out.orderBy("round")
