"""Text-analysis + multimodal checked queries ([NS] mandate; SURVEY.md §2.J
extensions): language-ID, quality scoring, BPE-ish token counting, winnowing
fingerprints, multimodal feature extraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.functions.text import (
    BPE_SPLIT_RE,
    LANG_MARKERS,
    bpe_token_count,
    lang_id,
    lang_scores,
    quality_score,
    winnowing_fingerprints,
)
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


_LANG_SCORE_SQL = {
    lang: f"len(list_intersect(list_distinct(string_split(text, ' ')), {_markers_sql(lang)}))"
    for lang in sorted(LANG_MARKERS)
}
_BEST_SQL = "greatest(" + ", ".join(_LANG_SCORE_SQL.values()) + ")"
_PRED_SQL = "CASE " + " ".join(
    f"WHEN {s} = {_BEST_SQL} THEN '{lang}'" for lang, s in _LANG_SCORE_SQL.items()
) + " END"


@q(
    "llm_lang_id",
    f"""SELECT doc_id, lang AS labeled_lang,
               {_PRED_SQL} AS predicted_lang,
               {_BEST_SQL}::INT AS marker_hits
        FROM documents""",
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (functions/text.py). On this
    synthetic corpus predictions are exercised for determinism, not accuracy
    — the operator is the deployable shape (stopword-overlap argmax)."""
    d = load_table(spark, sf_dir, "documents")
    best = F.greatest(*[s for _, s in lang_scores(F.col("text"))])
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
        best.cast("int").alias("marker_hits"),
    )


@q(
    "llm_quality_score",
    """SELECT doc_id,
              round(least(len(string_split(text, ' ')) / 64.0, 1.0)
                    * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                       / len(string_split(text, ' '))), 6) AS quality
       FROM documents""",
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-quality gate: length saturation × lexical diversity
    (functions/text.py quality_score)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


@q(
    "llm_token_count_bpe",
    f"""SELECT doc_id,
               len(string_split(text, ' '))::BIGINT AS n_whitespace_tokens,
               len(regexp_extract_all(text, '{BPE_SPLIT_RE}'))::BIGINT AS n_bpe_pieces
        FROM documents""",
)
def llm_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: whitespace tokens vs BPE-style pre-tokenizer pieces
    (letter runs / digit runs / punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_whitespace_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_pieces"),
    )


@q("llm_fingerprint")  # W: xxhash64-based winnowing — engine-specific hashes
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary per doc: fingerprint-set size + extrema
    (functions/text.py winnowing_fingerprints). Overlap of fingerprint sets
    localizes partial duplication; rows-only check (hash-seed specific)."""
    d = load_table(spark, sf_dir, "documents")
    fp = winnowing_fingerprints(d)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fingerprint").alias("fp_min"),
        F.max("fingerprint").alias("fp_max"),
    )


@q(
    "multimodal_features",
    """SELECT doc_id AS id,
              'text' AS modality,
              octet_length(encode(text))::BIGINT AS byte_len,
              md5(text) AS content_md5,
              round(ascii(substring(text, 1, 1)) / 255.0, 6) AS f0,
              round(ascii(substring(text, 2, 1)) / 255.0, 6) AS f1
       FROM documents""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → binary payload column
    (sources/multimodal.py schema) → Arrow-batched mapInPandas feature
    extraction (stubbed decoder, real batch flow). Oracle checks byte
    length, content hash, and the first two fake-feature dims (= first two
    payload bytes / 255; ASCII corpus ⇒ equals codepoints)."""
    from hawaiidatapipeline_spark.sources.multimodal import (
        documents_as_blobs,
        extract_features,
    )

    d = load_table(spark, sf_dir, "documents")
    feats = extract_features(documents_as_blobs(d))
    return feats.select(
        "id",
        "modality",
        "byte_len",
        "content_md5",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    )


@q(
    "llm_code_detect",
    """WITH feats AS (
         SELECT doc_id,
                length(text)::BIGINT AS n_chars,
                (length(text) - length(replace(text, '{', '')))::BIGINT
                + (length(text) - length(replace(text, '}', '')))::BIGINT
                + (length(text) - length(replace(text, ';', '')))::BIGINT
                + (length(text) - length(replace(text, '=', '')))::BIGINT
                + (length(text) - length(replace(text, '(', '')))::BIGINT
                  AS n_symbols,
                len(regexp_extract_all(text,
                    '\\b(def|return|import|class|function|var|const|if|else|for|while)\\b'))
                  ::BIGINT AS n_keywords,
                len(string_split(text, ' '))::BIGINT AS n_words
         FROM documents),
       scored AS (
         SELECT doc_id, n_chars, n_symbols, n_keywords,
                (n_symbols * 1000 // greatest(n_chars, 1)
                 + n_keywords * 10000 // greatest(n_words, 1))::BIGINT
                  AS code_score_milli
         FROM feats)
       SELECT doc_id, n_symbols, n_keywords, code_score_milli,
              CASE WHEN code_score_milli >= 60 THEN 1 ELSE 0 END
                AS looks_like_code
       FROM scored
       ORDER BY code_score_milli DESC, doc_id LIMIT 50""",
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection heuristic — the curation router that
    decides whether a document goes to the code pipeline (different
    dedup granularity, different quality gates) or the text one:
    symbol density ({};=( per char) plus programming-keyword density
    per word, combined as an exact integer milli-score (floor-divides,
    no floats), top-50 most code-like with the binary routing flag.
    The keyword regex is a plain alternation of word-anchored literals
    — identical semantics in RE2 and Java regex. Shape: map-only
    length/replace arithmetic + one regexp count per doc, then
    TakeOrdered(50); scan-bound at any scale, exactly like
    llm_quality_score."""
    d = load_table(spark, sf_dir, "documents")

    def n_char(ch: str) -> F.Column:
        return F.length("text") - F.length(
            F.replace(F.col("text"), F.lit(ch))
        )

    kw = (
        r"\b(def|return|import|class|function|var|const|if|else|for|while)\b"
    )
    feats = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        (
            n_char("{") + n_char("}") + n_char(";") + n_char("=") + n_char("(")
        )
        .cast("long")
        .alias("n_symbols"),
        F.regexp_count(F.col("text"), F.lit(kw)).cast("long").alias(
            "n_keywords"
        ),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
    )
    score = (
        F.floor(
            F.col("n_symbols") * 1000 / F.greatest(F.col("n_chars"), F.lit(1))
        )
        + F.floor(
            F.col("n_keywords")
            * 10000
            / F.greatest(F.col("n_words"), F.lit(1))
        )
    ).cast("long")
    return (
        feats.select(
            "doc_id",
            "n_symbols",
            "n_keywords",
            score.alias("code_score_milli"),
        )
        .withColumn(
            "looks_like_code",
            F.when(F.col("code_score_milli") >= 60, 1).otherwise(0),
        )
        .orderBy(F.col("code_score_milli").desc(), "doc_id")
        .limit(50)
    )


@q(
    "llm_lang_id_eval",
    f"""WITH pred AS (
         SELECT lang AS labeled_lang, {_PRED_SQL} AS predicted_lang
         FROM documents),
       cells AS (
         SELECT labeled_lang, predicted_lang, count(*)::BIGINT AS n
         FROM pred GROUP BY 1, 2),
       totals AS (
         SELECT labeled_lang, sum(n)::BIGINT AS label_total
         FROM cells GROUP BY labeled_lang)
       SELECT c.labeled_lang, c.predicted_lang, c.n,
              t.label_total,
              round(c.n::DOUBLE / t.label_total, 6) AS row_share
       FROM cells c JOIN totals t USING (labeled_lang)
       ORDER BY c.labeled_lang, c.predicted_lang""",
)
def llm_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the marker-token language-ID heuristic —
    the classifier-eval companion to llm_lang_id's per-doc predictions:
    per (labeled, predicted) cell, counts and the row share (per-label
    recall on the diagonal, confusion mass off it). This is the table a
    data curator reads before trusting heuristic lang tags for mixture
    weights — a systematically confused pair (share bleeding to one
    neighbor) means the downstream per-lang statistics are biased.
    Scale: prediction is a pure map over markers (no vocabulary
    broadcast), the matrix grain is langs², calendar-small."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("predicted_lang"),
    )
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = cells.groupBy("labeled_lang").agg(
        F.sum("n").cast("long").alias("label_total")
    )
    return (
        cells.join(F.broadcast(totals), "labeled_lang")
        .select(
            "labeled_lang",
            "predicted_lang",
            "n",
            "label_total",
            F.round(F.col("n").cast("double") / F.col("label_total"), 6).alias(
                "row_share"
            ),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )
