"""Training-corpus curation operators ([NS] north star: the operations a
large-scale training-data pipeline needs beyond generic SQL).

All four are pure DataFrame compositions — whole-stage codegen, no UDFs, no
driver materialization — so they scale with the shuffle, not with Python:

- ``scrub_pii``: regex redaction (emails, phone-shaped numbers) with
  per-doc match counts. Patterns are kept to the portable common subset of
  Java regex (Spark) and RE2 (DuckDB/Go) so behavior is engine-checkable.
- ``decontaminate``: drop/flag training docs sharing any word n-gram with a
  benchmark probe set — the standard n-gram-overlap decontamination step.
  Implemented as shingle-join (probe side broadcast: benchmark sets are
  tiny next to the corpus) + left-anti/left-semi, so cost is one linear
  scan of corpus shingles.
- ``repetition_stats``: Gopher/C4-style repetition signal — the fraction of
  duplicate n-grams per doc. One explode + two aggregates; the filter
  threshold is the caller's policy.
- ``pack_sequences``: deterministic greedy packing of docs into fixed-size
  token bins (sequential first-fit in doc_id order per stream) via a
  running-sum window — the batch-construction step before tokenizer
  sharding. Window is per-source so packing parallelizes across streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import shingles_distinct

EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails and phone-shaped tokens; adds ``n_pii`` (matches
    removed) and replaces ``text_col`` with the scrubbed text."""
    raw = F.col(text_col)
    n_pii = (
        F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(raw, F.lit(PHONE_RE), F.lit(0)))
    ).cast("long")
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.withColumn("n_pii", n_pii).withColumn(text_col, scrubbed)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_clean: bool = True,
) -> DataFrame:
    """Remove (or keep only) corpus docs sharing ≥1 word n-gram with the
    benchmark. The benchmark shingle set is broadcast — at 100 TB the eval
    suites are MBs against TBs of corpus, so the corpus is never shuffled."""
    corpus_sh = shingles_distinct(corpus, n, id_col, text_col)
    bench_sh = shingles_distinct(benchmark, n, id_col, text_col).select("token").distinct()
    # Contaminated = doc has >=1 shingle IN the benchmark set. (Selecting on
    # "has >=1 shingle NOT in the benchmark" — the round-1 bug — kept any
    # partially-contaminated doc and silently dropped docs shorter than n
    # words, which have no shingles at all.)
    contaminated_ids = (
        corpus_sh.join(F.broadcast(bench_sh), "token", "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if keep_clean else "left_semi"
    return corpus.join(contaminated_ids, id_col, how)


def repetition_stats(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc n-gram repetition: total shingles, distinct shingles, and
    ``dup_frac`` = 1 - distinct/total (0 = no repetition)."""
    toks = F.split(F.col(text_col), " ")
    sh_all = (
        df.select(id_col, toks.alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(id_col, F.explode(F.sequence(F.lit(0), F.size("_toks") - n)).alias("i"), "_toks")
        .select(
            id_col,
            F.concat_ws(
                " ", *[F.element_at(F.col("_toks"), F.col("i") + 1 + k) for k in range(n)]
            ).alias("sh"),
        )
    )
    return sh_all.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count_distinct("sh").alias("n_distinct"),
        F.round(1.0 - F.count_distinct("sh") / F.count(F.lit(1)), 6).alias("dup_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split long docs into overlapping fixed-size token chunks — the
    context-window preparation step (RAG indexing / pretraining with
    overlap). Chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap; the final chunk may be short. Pure
    higher-order functions (sequence → explode → slice), whole-stage
    codegen, no UDF; output grows ~n_tokens/step per doc — linear."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(step)))
    return (
        df.select(id_col, toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc"))
        .select(
            id_col,
            "_toks",
            "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("_toks"), F.col("chunk_id") * step + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens), F.col("_n") - F.col("chunk_id") * step
            ).cast("long").alias("n_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    bin_tokens: int = 512,
    stream_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc a ``bin_id`` by sequential greedy packing (docs in
    ``id_col`` order per stream; a doc opens a new bin when the running
    token total before it has crossed the bin boundary). Deterministic,
    window-based, one shuffle on the stream key."""
    w = Window.partitionBy(stream_col).orderBy(id_col)
    n_tok = F.size(F.split(F.col(text_col), " "))
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
        )
        .withColumn("bin_id", F.floor(F.col("tokens_before") / bin_tokens).cast("long"))
        .drop("tokens_before")
    )
