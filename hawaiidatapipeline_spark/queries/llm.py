"""LLM-training-data pipeline operators (SURVEY.md §2.J, [NS] mandate):
deduplication, similarity search, text analysis, corpus profiling.

Scale design notes (the part the fixtures can't show):
- Exact dedup is hash-groupBy — embarrassingly parallel at any scale.
- Pairwise Jaccard / brute-force cosine are the CORRECTNESS baselines,
  quadratic by construction and only run at fixture scale. The 100 TB paths
  are ``llm_dedup_minhash`` (banded MinHash-LSH: candidate generation via
  equality join on band signatures — linear shuffle volume) and the IVF-style
  bucketed cosine in operators/similarity.py.
- Everything is built from JVM-side primitives (explode/groupBy/higher-order
  array functions); no Python UDF in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


# ------------------------------------------------------------------ dedup


@q(
    "llm_dedup_exact",
    """WITH hashed AS (
         SELECT doc_id, md5(lower(trim(text))) AS content_md5,
                row_number() OVER (PARTITION BY md5(lower(trim(text)))
                                   ORDER BY doc_id) AS rn,
                count(*)    OVER (PARTITION BY md5(lower(trim(text)))) AS n_copies
         FROM documents)
       SELECT doc_id, content_md5, n_copies FROM hashed WHERE rn = 1""",
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash, keep lowest doc_id.
    At 100 TB: same plan — one shuffle on the 128-bit hash; group state is
    O(1) per duplicate cluster."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))))
    wp = Window.partitionBy("content_md5")
    return (
        d.withColumn("content_md5", h)
        .withColumn("rn", F.row_number().over(wp.orderBy("doc_id")))
        .withColumn("n_copies", F.count(F.lit(1)).over(wp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "content_md5", "n_copies")
    )


_JACCARD_TAU = 0.6

_JACCARD_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / (sa.n_tok + sb.n_tok - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n_tok + sb.n_tok - n_common) >= {_JACCARD_TAU}
"""


@q("llm_dedup_jaccard", _JACCARD_SQL)
def llm_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact token-set Jaccard ≥ τ.

    Inverted-index self-join (token → doc list) rather than doc×doc cross
    join: pairs are only generated for docs sharing ≥1 token. Still
    worst-case quadratic — this is the exact baseline; the scale path is
    ``llm_dedup_minhash`` below.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token")).distinct()
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_common"))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


@q("llm_dedup_minhash")  # W: xxhash64-seeded MinHash — engine-specific hashes
def llm_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates — the 100 TB replacement for pairwise
    Jaccard (operators/dedup.py). Candidate pairs come from an equality join
    on banded signatures (linear shuffle); Jaccard is estimated from the
    signatures themselves, so nothing quadratic ever runs. Rows-only check
    (hash seeds are Spark-specific); recall is validated against
    ``llm_dedup_jaccard`` in the pytest suite."""
    from hawaiidatapipeline_spark.operators.dedup import minhash_candidate_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(d, tau=_JACCARD_TAU, n_hashes=32, n_bands=8)
    return pairs.select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


_NGRAM_TAU = 0.5

_NGRAM_JACCARD_SQL = f"""
WITH words AS (
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
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM tok a JOIN tok b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common::DOUBLE / (sa.n + sb.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {_NGRAM_TAU}
"""


@q("llm_dedup_jaccard_ngram", _NGRAM_JACCARD_SQL)
def llm_dedup_jaccard_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact TRIGRAM-shingle Jaccard ≥ τ — the
    discriminative variant (shared trigrams ⇒ shared phrasing, where 1-gram
    token sets saturate on a small vocabulary). Exact ground truth for the
    MinHash estimate below; shingling from operators/dedup.py."""
    from hawaiidatapipeline_spark.operators.dedup import shingles_distinct

    d = load_table(spark, sf_dir, "documents")
    tok = shingles_distinct(d, 3)
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_common"))
    return (
        inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _NGRAM_TAU)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_EMB_TAU = 0.45


@q(
    "llm_dedup_embedding",
    f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {_EMB_TAU}""",
)
def llm_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: semantic duplicate pairs above a cosine
    threshold — catches paraphrases that shingle/token methods miss. Exact
    JVM pair computation at fixture scale; at 100 TB candidates come from
    ``cosine_topk_lsh`` buckets instead of all pairs."""
    from hawaiidatapipeline_spark.operators.similarity import as_double_vec, cosine_pairs_exact

    e = as_double_vec(load_table(spark, sf_dir, "embeddings"))
    pairs = cosine_pairs_exact(e)
    return pairs.filter(F.col("cos_sim") >= _EMB_TAU).select(
        "vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim")
    )


@q("llm_simhash_buckets")  # W: xxhash64-based SimHash — engine-specific
def llm_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints: 64-bit signature per doc + its dedup bucket
    (top 16 bits) — the Hamming-distance near-dup path (operators/dedup.py)."""
    from hawaiidatapipeline_spark.operators.dedup import simhash_signatures

    d = load_table(spark, sf_dir, "documents")
    sig = simhash_signatures(d)
    return sig.select(
        "doc_id", "simhash", F.shiftright("simhash", 47).alias("bucket")
    )


# ------------------------------------------------------- similarity search


@q(
    "llm_cosine_topk",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       ORDER BY cos_sim DESC, vec_a, vec_b
       LIMIT 20""",
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs by cosine, exact.

    Runs the blocked-GEMM operator (operators/similarity.py): normalized
    candidate matrix broadcast once, each Arrow batch of probes does one
    numpy matmul and emits only local winners — exact results with n·k
    (never n²) shuffle volume. The zip_with/aggregate pair variant in the
    same module is the pure-JVM semantics oracle, and ``cosine_topk_lsh``
    the sub-quadratic 100 TB path.
    """
    from hawaiidatapipeline_spark.operators.similarity import cosine_topk_gemm

    # Raw array<float> goes straight over Arrow; the GEMM kernel upcasts to
    # f64 on the numpy side (cheaper than a JVM-side transform cast).
    e = load_table(spark, sf_dir, "embeddings")
    top = cosine_topk_gemm(e, k=20, vec_col="embedding")
    return top.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))


@q("llm_cosine_ivf")  # W: k-means cell assignment — seed/engine specific
def llm_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-quantized approximate cosine top-k (operators/similarity.py
    cosine_topk_ivf): k-means cells bound the candidate join, so pair
    generation is linear in rows × cell size. Rows-only check; recall vs the
    exact GEMM result is asserted in tests/test_similarity.py."""
    from hawaiidatapipeline_spark.operators.similarity import as_double_vec, cosine_topk_ivf

    e = as_double_vec(load_table(spark, sf_dir, "embeddings"))
    top = cosine_topk_ivf(e, k=20)
    return top.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))


@q(
    "llm_knn_label",
    """WITH sims AS (
         SELECT q.vec_id AS query_id, n.label,
                list_cosine_similarity(q.embedding::DOUBLE[], n.embedding::DOUBLE[]) AS s,
                n.vec_id AS neighbor_id
         FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 100
       ),
       topk AS (
         SELECT query_id, label FROM (
           SELECT query_id, label,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id) AS rn
           FROM sims) WHERE rn <= 5
       ),
       votes AS (
         SELECT query_id, label, count(*) AS n_votes FROM topk GROUP BY 1, 2
       )
       SELECT query_id, label AS predicted_label FROM (
         SELECT query_id, label,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_votes DESC, label) AS rn
         FROM votes) WHERE rn = 1""",
)
def llm_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-label classification for the first 100 vectors.
    Ties broken by (votes desc, label asc) — fully deterministic.

    Routed through ``knn_join_gemm`` (operators/similarity.py): probes flow
    as Arrow batches against the broadcast normalized index and each batch
    emits only its exact top-5 — no probe×corpus nested-loop join in the
    plan (VERDICT r3 item 2), shuffle volume is 5 rows per probe."""
    from hawaiidatapipeline_spark.operators.similarity import as_double_vec, knn_join_gemm

    e = as_double_vec(load_table(spark, sf_dir, "embeddings")).select("vec_id", "label", "emb")
    probes = e.filter(F.col("vec_id") < 100)
    topk = knn_join_gemm(probes, e, k=5, payload=("label",), exclude_self=True)
    votes = topk.groupBy("query_id", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    w_vote = Window.partitionBy("query_id").orderBy(F.col("n_votes").desc(), "label")
    return (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"))
    )


# ------------------------------------------------------------ text analysis


@q(
    "llm_tfidf_topterms",
    """WITH tf AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS term
         FROM documents
       ),
       tf_counts AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
       df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
       n AS (SELECT count(*) AS n_docs FROM documents),
       scored AS (
         SELECT doc_id, term,
                tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS score
         FROM tf_counts JOIN df USING (term) CROSS JOIN n
       )
       SELECT doc_id, term, round(score, 6) AS tfidf FROM (
         SELECT doc_id, term, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
         FROM scored) WHERE rn <= 5""",
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per doc. Explicit counts (never HashingTF) keep it
    deterministic and oracle-checkable; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    sklearn-style). df is a broadcast-sized side table at any corpus size.
    The corpus size N rides along as a broadcast 1-row crossJoin (same
    pattern as the vocabulary-coverage query) instead of a driver-side
    d.count() — one plan, one pass over documents, no extra job or driver
    sync barrier before the real work starts."""
    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf rows are unique per (doc_id, term) by construction (the groupBy
    # above), so document frequency is a PLAIN count — countDistinct here
    # would re-plan the two-phase distinct aggregate for nothing
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (F.log((F.col("_n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", F.round("score", 6).alias("tfidf"))
    )


@q(
    "llm_text_stats",
    """SELECT doc_id, lang, source,
              len(string_split(text, ' '))::BIGINT AS n_tokens,
              round(length(replace(text, ' ', ''))::DOUBLE
                    / len(string_split(text, ' ')), 6) AS avg_token_len,
              (n_chars = length(text))             AS chars_ok
       FROM documents""",
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics: token count, mean token length, metadata
    validation — the filter inputs of a training-data quality gate."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks), 6
        ).alias("avg_token_len"),
        (F.col("n_chars") == F.length("text")).alias("chars_ok"),
    )


@q(
    "llm_lang_source_matrix",
    """SELECT lang, source, count(*) AS n_docs,
              sum(n_chars)::BIGINT AS total_chars
       FROM documents GROUP BY CUBE (lang, source)""",
)
def llm_lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling: docs × lang × source contingency with all-margins
    (CUBE) — the corpus-composition dashboard query."""
    d = load_table(spark, sf_dir, "documents")
    return d.cube("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


@q(
    "llm_unigram_logprob",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       ),
       counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       total AS (SELECT sum(c) AS t FROM counts),
       scored AS (
         SELECT toks.doc_id,
                floor(ln(counts.c::DOUBLE / total.t) * 1000000)::BIGINT AS lp_micro
         FROM toks JOIN counts USING (tok) CROSS JOIN total
       )
       SELECT doc_id,
              count(*)::BIGINT AS n_tokens,
              round(-sum(lp_micro) / count(*) / 1000000.0, 6) AS avg_neg_logprob
       FROM scored GROUP BY doc_id
       ORDER BY avg_neg_logprob DESC, doc_id LIMIT 100""",
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model surprisal per document — the perplexity-proxy
    quality gate (the KenLM score of CCNet-style curation, with the corpus
    itself as the LM): avg over a doc's tokens of −ln p(token), p from
    corpus-wide counts. High scores flag gibberish / vocabulary outliers;
    the real pipeline thresholds or buckets on this exactly like the
    heuristic ``llm_quality_score``, but content-driven instead of
    shape-driven.

    Determinism discipline (same as integer PageRank): each token's log
    probability is floored to MICRO-UNITS (ln·1e6 → bigint) so the per-doc
    aggregation is an exact INTEGER sum — no float partial-sum order to
    disagree across partitionings or engines; the only float ops are one
    ln per distinct count ratio and the final division, identical IEEE on
    both sides. Two linear shuffles (corpus counts, per-doc sum); the
    count table broadcasts at any corpus size (bounded by vocabulary)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    scored = (
        toks.join(F.broadcast(counts), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.floor(F.log(F.col("c") / F.col("t")) * 1000000)
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(-F.sum("lp_micro") / F.count(F.lit(1)) / 1000000.0, 6).alias(
                "avg_neg_logprob"
            ),
        )
        .orderBy(F.col("avg_neg_logprob").desc(), "doc_id")
        .limit(100)
    )


@q(
    "llm_dedup_threshold_curve",
    """WITH tok_all AS (
         SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents),
       df AS (SELECT token, count(*)::BIGINT AS df
              FROM tok_all GROUP BY token),
       tok AS (
         SELECT t.doc_id, t.token
         FROM tok_all t JOIN df ON df.token = t.token
         WHERE df.df <= 64),
       sizes AS (SELECT doc_id, count(*)::BIGINT AS n_tok
                 FROM tok GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                count(*)::BIGINT AS n_common
         FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
       pairs AS (
         SELECT doc_a, doc_b, n_common,
                (sa.n_tok + sb.n_tok - n_common)::BIGINT AS n_union
         FROM inter
         JOIN sizes sa ON sa.doc_id = doc_a
         JOIN sizes sb ON sb.doc_id = doc_b),
       taus AS (SELECT unnest(ARRAY[500, 600, 700, 800, 900]) AS tau_milli),
       qual AS (
         SELECT t.tau_milli, p.doc_a, p.doc_b
         FROM taus t JOIN pairs p
           ON p.n_common * 1000 >= t.tau_milli * p.n_union),
       docs_hit AS (
         SELECT tau_milli, count(DISTINCT d)::BIGINT AS n_docs
         FROM (SELECT tau_milli, doc_a AS d FROM qual
               UNION ALL SELECT tau_milli, doc_b FROM qual)
         GROUP BY tau_milli),
       pair_counts AS (
         SELECT tau_milli, count(*)::BIGINT AS n_pairs
         FROM qual GROUP BY tau_milli),
       total AS (SELECT count(*)::BIGINT AS n_total FROM documents)
       SELECT t.tau_milli,
              coalesce(pc.n_pairs, 0)::BIGINT AS n_pairs,
              coalesce(dh.n_docs, 0)::BIGINT AS n_docs_affected,
              round(coalesce(dh.n_docs, 0)::DOUBLE * 100.0 / tt.n_total, 6)
                AS pct_docs_affected
       FROM taus t
       LEFT JOIN pair_counts pc ON pc.tau_milli = t.tau_milli
       LEFT JOIN docs_hit dh ON dh.tau_milli = t.tau_milli
       CROSS JOIN total tt
       ORDER BY t.tau_milli""",
)
def llm_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield-vs-threshold curve: for τ ∈ {0.5 … 0.9}, how many
    near-dup pairs qualify and what fraction of the corpus they touch —
    the tuning curve a curation owner reads BEFORE committing a
    threshold (too low deletes paraphrases, too high keeps templates).
    Thresholding is the exact integer cross-multiplication
    n_common·1000 ≥ τ_milli·n_union — no float comparison anywhere, so
    boundary pairs land identically on both engines. Jaccard here is
    over INFORMATIVE tokens only (document frequency ≤ 64, mirrored in
    the oracle): stop-words inflate overlap without carrying dedup
    signal, and — the scale point — they are exactly what makes the
    inverted-index self-join quadratic (the df cap is the stop-shingle
    discipline of llm_containment_pairs applied here; without it this
    pass measured 134 s at sf0.1, with it ~2 s). Shape: ONE df-capped
    inverted-index pair pass shared across all thresholds — the sweep
    is a 5-row broadcast join against the pair frame, not 5 recomputes
    — + per-τ aggregates. At 100 TB the same curve is computed off the
    MinHash estimated-jaccard candidate table instead — one banded
    pass, same sweep arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    tok_all = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    df_tbl = tok_all.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    tok = tok_all.join(
        df_tbl.filter(F.col("df") <= 64).select("token"), "token"
    )
    sizes = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    pairs = (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("sa")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("sb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("sa") + F.col("sb") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
        )
    )
    from hawaiidatapipeline_spark.operators.materialize import materialize

    pairs = materialize(pairs)
    taus = spark.createDataFrame(
        [(t,) for t in (500, 600, 700, 800, 900)], "tau_milli bigint"
    )
    qual = F.broadcast(taus).join(
        pairs,
        F.col("n_common") * 1000 >= F.col("tau_milli") * F.col("n_union"),
    )
    pair_counts = qual.groupBy("tau_milli").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    docs_hit = (
        qual.select("tau_milli", F.col("doc_a").alias("d"))
        .unionAll(qual.select("tau_milli", F.col("doc_b").alias("d")))
        .groupBy("tau_milli")
        .agg(F.countDistinct("d").cast("long").alias("n_docs"))
    )
    total = d.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        taus.join(pair_counts, "tau_milli", "left")
        .join(docs_hit, "tau_milli", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "tau_milli",
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("long")
            .alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0))
            .cast("long")
            .alias("n_docs_affected"),
            F.round(
                F.coalesce(F.col("n_docs"), F.lit(0)).cast("double")
                * 100.0
                / F.col("n_total"),
                6,
            ).alias("pct_docs_affected"),
        )
        .orderBy("tau_milli")
    )
