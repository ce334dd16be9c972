"""Text-analysis functions for training-data pipelines ([NS] mandate):
language-ID heuristic, quality scoring, tokenization, fingerprinting.

All pure Column expressions (codegen'd, no UDFs): at 100 TB these run as a
single scan-project stage per document partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Marker-token lists for the n-gram/stopword language-ID heuristic. Real
# deployments load per-language stopword tables; these fixed literals keep
# the operator deterministic and oracle-checkable on the synthetic corpus.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht"],
    "en": ["the", "and", "fast", "slow", "value"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks —
# the shape GPT-style tokenizers split on before merges.
BPE_SPLIT_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column | str) -> Column:
    return F.split(text, " ")


def bpe_token_count(text: Column | str) -> Column:
    """Pre-tokenizer piece count — the cheap proxy for LLM token budgets."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), 0)).cast("long")


def lang_scores(text: Column | str) -> list[tuple[str, Column]]:
    """(lang, overlap-count) per language: |tokens ∩ markers|."""
    toks = F.array_distinct(tokens(text))
    return [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in marks]))))
        for lang, marks in sorted(LANG_MARKERS.items())
    ]


def lang_id(text: Column | str) -> Column:
    """Argmax language by marker overlap, ties → lexicographically smallest
    lang (deterministic). Pure CASE/array expression."""
    scores = lang_scores(text)
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit(None).cast("string")
    for lang, s in reversed(scores):  # earlier langs win ties
        expr = F.when(s == best, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(text: Column | str) -> Column:
    """[0,1] doc-quality heuristic: length saturation × lexical diversity.

    - length: saturates at 64 tokens (too-short docs score low);
    - diversity: distinct/total tokens (boilerplate repetition scores low).
    Real pipelines add punct/stopword ratios; same expression shape.
    """
    toks = tokens(text)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    diversity = F.when(n > 0, n_distinct / n).otherwise(F.lit(0.0))
    return F.round(len_score * diversity, 6)


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): hash every k-word
    shingle, keep the min hash of each sliding window of ``window``
    positions, dedup — a position-robust fingerprint set whose overlap
    detects partial/reordered plagiarism-style duplication.

    Implementation: posexplode shingles → hash → min over a ROWS window
    → distinct. One shuffle on doc_id. Returns (id, fingerprint) rows.
    ``hash_fn="md5"`` uses the portable 60-bit hash so an external engine
    can recompute the fingerprint set exactly.
    """
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    def _shingle_hash(fn: str):
        if fn == "xxhash64":
            return F.xxhash64("shingle")
        if fn == "md5":
            return portable_hash64(F.col("shingle"), 0)
        raise ValueError(f"unknown hash_fn {fn!r} (use 'xxhash64' or 'md5')")

    toks = F.split(F.col(text_col), " ")
    shingled = (
        df.select(id_col, toks.alias("_t"))
        .filter(F.size("_t") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - k),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(F.col("_t"), i + 1 + j) for j in range(k)]
                    ),
                )
            ).alias("pos", "shingle"),
        )
        .withColumn("h", _shingle_hash(hash_fn))
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    return (
        shingled.withColumn("fingerprint", F.min("h").over(w))
        .select(id_col, "fingerprint")
        .distinct()
    )
