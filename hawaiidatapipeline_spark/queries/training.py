"""Training-corpus curation checked queries ([NS] north star) — the
operators/curation.py surface: PII scrubbing, benchmark decontamination,
repetition filtering, sequence packing. All pure-codegen DataFrame plans
with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_stats,
    scrub_pii,
)
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# Fixtures carry no real PII, so the scrub query PLANTS deterministic
# address/phone strings from doc_id (identically on both engines) and
# proves they are found and removed.
_PII_PLANT_SQL = (
    "text || ' contact user' || doc_id || '@example.com tel 808-555-' "
    "|| lpad((doc_id % 10000)::VARCHAR, 4, '0')"
)
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"


@q(
    "llm_pii_scrub",
    f"""WITH planted AS (
         SELECT doc_id, {_PII_PLANT_SQL} AS text FROM documents
       )
       SELECT doc_id,
              (len(regexp_extract_all(text, '{_EMAIL_RE}'))
               + len(regexp_extract_all(text, '{_PHONE_RE}')))::BIGINT AS n_pii,
              md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
       FROM planted""",
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/curation.py scrub_pii): regex patterns kept
    to the Java-regex ∩ RE2 common subset so the oracle is exact; output
    compares the scrubbed text by md5."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 808-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return scrub_pii(planted).select(
        "doc_id", "n_pii", F.md5("text").alias("scrubbed_md5")
    )


_SHINGLE8_SQL = """
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 7)) AS i FROM words),
sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+7], ' ') AS sh FROM idx)
"""


@q(
    "llm_decontaminate",
    f"""WITH {_SHINGLE8_SQL},
       bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
       hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.sh = b.sh)
       SELECT d.doc_id, d.lang, d.source FROM documents d
       JOIN hit h ON d.doc_id = h.doc_id""",
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/curation.py): every doc sharing
    an 8-gram with the probe set (doc_id % 50 = 0 stands in for an eval
    suite) is flagged. Probe shingles broadcast; the corpus never shuffles.
    ``keep_clean=False`` returns the contaminated docs so the checked result
    is the small, interesting side."""
    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    flagged = decontaminate(d, bench, n=8, keep_clean=False)
    return flagged.select("doc_id", "lang", "source")


@q(
    "llm_repetition_filter",
    f"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
       sh AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS sh FROM idx)
       SELECT doc_id,
              count(*) AS n_shingles,
              count(DISTINCT sh) AS n_distinct,
              round(1.0 - count(DISTINCT sh) / count(*), 6) AS dup_frac
       FROM sh GROUP BY doc_id""",
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition signal (operators/curation.py
    repetition_stats, n=3): duplicate-trigram fraction per doc; the
    downstream gate (drop docs with dup_frac above a policy threshold) is a
    plain filter on this result."""
    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d, n=3)


@q(
    "llm_pack_sequences",
    """WITH sized AS (
         SELECT doc_id, source,
                len(string_split(text, ' '))::BIGINT AS n_tokens
         FROM documents
       )
       SELECT doc_id, source, n_tokens,
              (floor(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     / 512.0))::BIGINT AS bin_id
       FROM sized""",
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/curation.py pack_sequences): greedy
    sequential assignment of docs to 512-token training bins per source
    stream — a running-sum window, one shuffle, deterministic."""
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, bin_tokens=512).select(
        "doc_id", "source", "n_tokens", "bin_id"
    )


@q(
    "llm_mixture_sample",
    """WITH ranked AS (
         SELECT doc_id, source,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
                CASE WHEN substr(source, 4)::INT % 3 = 0 THEN 4
                     WHEN substr(source, 4)::INT % 3 = 1 THEN 2
                     ELSE 1 END AS keep_every
         FROM documents
       )
       SELECT doc_id, source FROM ranked WHERE rn % keep_every = 1 OR keep_every = 1""",
)
def llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture construction: systematic per-source downsampling (keep
    every k-th doc in doc_id order; k encodes the per-source mixture weight —
    1/4, 1/2 or 1/1 keyed off the source id). Deterministic unlike Bernoulli
    ``sample()`` (whose seeded RNG is engine-specific, so it could only be a
    weak check) — at 100 TB the same plan is one window per source stream.
    The stable doc_id order stands in for position in the source shard."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    src_n = F.substring("source", 4, 10).cast("int")
    keep_every = F.when(src_n % 3 == 0, 4).when(src_n % 3 == 1, 2).otherwise(1)
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"),
                 keep_every.alias("keep_every"))
        .filter((F.col("rn") % F.col("keep_every") == 1) | (F.col("keep_every") == 1))
        .select("doc_id", "source")
    )


_PLANT_UNICODE_SQL = (
    "text || ' caf' || chr(101) || chr(769) || ' ' || chr(233) || 'clair U'"
    " || chr(117) || chr(776) || 'ber'"
)


@q(
    "llm_text_normalize",
    f"""WITH planted AS (
         SELECT doc_id, {_PLANT_UNICODE_SQL} AS t FROM documents
       )
       SELECT doc_id,
              length(t)::BIGINT AS n_chars_raw,
              length(nfc_normalize(t))::BIGINT AS n_chars_nfc,
              md5(strip_accents(lower(nfc_normalize(t)))) AS norm_md5
       FROM planted""",
)
def llm_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization for corpus cleaning: NFC composition →
    casefold → accent stripping, the canonical text-canonicalization step
    before dedup/tokenization (decomposed 'e'+U+0301 and precomposed 'é'
    must collide). Fixtures are ASCII, so each doc gets a deterministic
    suffix mixing decomposed and precomposed accents; Arrow-batched pandas
    UDF over stdlib unicodedata (no built-in Spark NFC), md5-compared
    against DuckDB's nfc_normalize/strip_accents."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" caf" + chr(101) + chr(769) + " " + chr(233) + "clair U"
                  + chr(117) + chr(776) + "ber"),
        ).alias("t"),
    )

    def normalize(batches):
        import hashlib
        import unicodedata

        def norm(s: str) -> str:
            nfc = unicodedata.normalize("NFC", s).lower()
            return "".join(
                c for c in unicodedata.normalize("NFD", nfc)
                if not unicodedata.combining(c)
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            nfc = pdf["t"].map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_raw": pdf["t"].map(len).astype("int64"),
                    "n_chars_nfc": nfc.map(len).astype("int64"),
                    "norm_md5": pdf["t"].map(
                        lambda s: hashlib.md5(norm(s).encode()).hexdigest()
                    ),
                }
            )

    return planted.mapInPandas(
        normalize,
        "doc_id bigint, n_chars_raw bigint, n_chars_nfc bigint, norm_md5 string",
    )


@q(
    "llm_chunk_documents",
    """WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w,
                len(string_split(text, ' ')) AS n
         FROM documents
       ),
       chunks AS (
         SELECT doc_id, n, w,
                unnest(generate_series(
                    0, greatest(1, ceil((n - 8) / 24.0))::BIGINT - 1)) AS chunk_id
         FROM words
       )
       SELECT doc_id, chunk_id,
              array_to_string(w[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ')
                  AS chunk_text,
              least(32, n - chunk_id * 24)::BIGINT AS n_tokens
       FROM chunks""",
)
def llm_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/curation.py chunk_documents):
    32-token chunks with 8-token overlap (step 24) — the RAG-indexing /
    packing preparation step, pure sequence→explode→slice codegen."""
    from hawaiidatapipeline_spark.operators.curation import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=32, overlap=8)


@q(
    "llm_vocab_coverage",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
       total AS (SELECT sum(n) AS t FROM counts),
       ranked AS (
         SELECT token, n,
                row_number() OVER (ORDER BY n DESC, token) AS rnk,
                sum(n) OVER (ORDER BY n DESC, token
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
         FROM counts
       )
       SELECT token, n, rnk,
              round(cum_n::DOUBLE / (SELECT t FROM total), 6) AS coverage
       FROM ranked WHERE rnk <= 200""",
)
def llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction signal for tokenizer training: top-200 tokens
    by corpus frequency with cumulative coverage fraction (what share of all
    token occurrences the first k vocabulary entries explain). Counts and
    the total are distributed aggregates; the window input is pre-bounded
    by a distributed TakeOrdered under the same (count DESC, token) total
    order — same discipline as llm_vocab_coverage_curve — so the ranking
    window provably sees ≤ 200 rows regardless of vocabulary size."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(200)
    w = Window.orderBy(F.col("n").desc(), "token")
    ranked = top.withColumn("rnk", F.row_number().over(w)).withColumn(
        "cum_n", F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        ranked.filter(F.col("rnk") <= 200)
        .crossJoin(F.broadcast(total))
        .select(
            "token", "n", "rnk",
            F.round(F.col("cum_n") / F.col("t"), 6).alias("coverage"),
        )
    )


# --- exact-oracle MinHash: portable md5-derived hashes on BOTH engines ---
_MH_N, _MH_BANDS = 16, 4
_MH_RPB = _MH_N // _MH_BANDS


def _ph(expr: str, seed) -> str:
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def _minhash_exact_sql() -> str:
    sig_cols = ",\n                ".join(
        f"min({_ph('sh', i)}) AS h{i}" for i in range(_MH_N)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {sig} AS sig FROM sig".format(
            b=b,
            sig=_ph(
                " || ',' || ".join(
                    f"h{b * _MH_RPB + r}::VARCHAR" for r in range(_MH_RPB)
                ),
                9999,
            ),
        )
        for b in range(_MH_BANDS)
    )
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(_MH_N)
    )
    return f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       bands AS ({band_rows}),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       scored AS (SELECT c.doc_a, c.doc_b, ({agree}) AS agree
                  FROM cand c
                  JOIN sig a ON a.doc_id = c.doc_a
                  JOIN sig b ON b.doc_id = c.doc_b)
       SELECT doc_a, doc_b, round(agree / {_MH_N}.0, 6) AS est_jaccard
       FROM scored WHERE agree / {_MH_N}.0 >= 0.6"""


@q("llm_dedup_minhash_exact", _minhash_exact_sql())
def llm_dedup_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded MinHash-LSH pipeline under an EXACT oracle: every hash
    (token min-hashes AND band signatures) uses the portable md5-derived
    form (operators/dedup.py portable_hash64), so DuckDB recomputes
    signatures → bands → candidates → estimator bit-for-bit. This upgrades
    the LSH algorithm itself from rows-only-checked to hash-verified; the
    production twin (llm_dedup_minhash) keeps codegen xxhash64 for speed
    and stays recall-tested instead."""
    from hawaiidatapipeline_spark.operators.dedup import minhash_candidate_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(
        d, tau=0.6, n_hashes=_MH_N, n_bands=_MH_BANDS, hash_fn="md5"
    )
    return pairs.select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))


@q(
    "llm_simhash_exact",
    f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       hashed AS (SELECT doc_id, {_ph('sh', 0)} AS th FROM shingle),
       bits AS (SELECT doc_id, unnest(generate_series(0, 58)) AS i, th FROM hashed),
       bitsum AS (SELECT doc_id, i,
                         sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
                  FROM bits GROUP BY doc_id, i)
       SELECT doc_id,
              sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS simhash
       FROM bitsum GROUP BY doc_id""",
)
def llm_simhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash under an EXACT oracle: portable md5-derived shingle hashes
    (operators/dedup.py) let DuckDB recompute the per-bit ±1 sums and the
    recomposed 59-bit signature integer exactly — upgrading the SimHash
    construction from rows-only-checked to hash-verified (the production
    twin llm_simhash_buckets keeps codegen xxhash64)."""
    from hawaiidatapipeline_spark.operators.dedup import simhash_signatures

    d = load_table(spark, sf_dir, "documents")
    return simhash_signatures(d, n_bits=60, hash_fn="md5")


@q(
    "llm_fingerprint_exact",
    f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       pos AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words WHERE len(w) >= 3),
       hashed AS (SELECT doc_id, i,
                         {_ph("array_to_string(w[i:i+2], ' ')", 0)} AS h
                  FROM pos)
       SELECT DISTINCT doc_id,
              min(h) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
       FROM hashed""",
)
def llm_fingerprint_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints under an EXACT oracle (functions/text.py with
    portable hashes): DuckDB recomputes shingle hashes, the sliding-window
    min, and the distinct fingerprint set bit-for-bit. With this, every
    engine-internal approximate operator in the inventory has a
    hash-verified counterpart (minhash, simhash, quantile, distinct count,
    fingerprints)."""
    from hawaiidatapipeline_spark.functions.text import winnowing_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(d, hash_fn="md5")


@q(
    "llm_train_val_split",
    f"""WITH assigned AS (
         SELECT doc_id, source,
                CASE WHEN {_ph('doc_id::VARCHAR', 42)} % 100 < 90 THEN 'train'
                     WHEN {_ph('doc_id::VARCHAR', 42)} % 100 < 95 THEN 'val'
                     ELSE 'test' END AS split
         FROM documents
       )
       SELECT split, count(*) AS n_docs, count(DISTINCT source) AS n_sources
       FROM assigned GROUP BY split""",
)
def llm_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by portable content
    hash of the stable id — reproducible across engines, runs, and data
    re-orderings (the property random `sample()` lacks), and stable under
    incremental appends: a doc's split never changes when new data arrives.
    Companion of llm_mixture_sample (which covers per-source rates)."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(portable_hash64(F.col("doc_id").cast("string"), 42), F.lit(100))
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
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
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common::DOUBLE / (sa.n_tok + sb.n_tok - n_common) >= 0.6
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.node
)
SELECT node AS doc_id,
       min(r) AS cluster_id,
       node = min(r) AS is_kept
FROM reach GROUP BY node
"""


@q("llm_dedup_clusters", _CLUSTERS_SQL)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING (operators/dedup.py connected_components): exact
    Jaccard pairs (tau=0.6, same edge set as llm_dedup_jaccard) grouped into
    duplicate clusters by hash-min label propagation; cluster_id = min doc_id
    in the cluster, is_kept marks the canonical survivor — the artifact a
    dedup pass actually applies. Oracle computes the same components via a
    recursive transitive-closure CTE (fixture-scale; the Spark path is the
    O(diameter)-iteration 100 TB shape)."""
    from hawaiidatapipeline_spark.operators.dedup import connected_components
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_jaccard

    pairs = llm_dedup_jaccard(spark, sf_dir)
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_kept"),
    )


@q(
    "llm_contamination_report",
    f"""WITH {_SHINGLE8_SQL},
       bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
       hits AS (
         SELECT s.doc_id, count(*) AS n_overlapping
         FROM sh s JOIN bench b ON s.sh = b.sh
         WHERE s.doc_id % 50 != 0
         GROUP BY s.doc_id
       )
       SELECT h.doc_id, d.source, h.n_overlapping,
              len(string_split(d.text, ' '))::BIGINT AS n_tokens
       FROM hits h JOIN documents d ON h.doc_id = d.doc_id""",
)
def llm_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination REPORTING (the review artifact behind the drop
    decision): per contaminated doc, how many distinct 8-grams overlap the
    benchmark probe set — severity ranking for manual audit, where
    llm_decontaminate only partitions keep/drop. Probe shingles broadcast;
    one linear corpus scan."""
    from hawaiidatapipeline_spark.operators.dedup import shingles_distinct

    d = load_table(spark, sf_dir, "documents")
    bench_sh = (
        shingles_distinct(d.filter(F.col("doc_id") % 50 == 0), 8)
        .select("token")
        .distinct()
    )
    corpus_sh = shingles_distinct(d.filter(F.col("doc_id") % 50 != 0), 8)
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )
    return hits.join(d, "doc_id").select(
        "doc_id",
        "source",
        "n_overlapping",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )


@q(
    "llm_dedup_fuzzy",
    """WITH heads AS (
         SELECT doc_id,
                string_split(text, ' ')[1] AS first_tok,
                substr(text, 1, 40) AS head
         FROM documents
       )
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              levenshtein(a.head, b.head) AS edit_dist
       FROM heads a JOIN heads b
         ON a.first_tok = b.first_tok AND a.doc_id < b.doc_id
       WHERE levenshtein(a.head, b.head) <= 10""",
)
def llm_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup by edit distance on the document head (first 40
    chars), blocked on the first token so the quadratic Levenshtein only
    runs inside small candidate blocks — the classic blocking+distance shape
    of record linkage. Both engines implement the same Levenshtein metric,
    so the oracle is exact. At 100 TB the blocking key becomes a coarser
    signature (e.g. simhash band) but the join shape is identical."""
    d = load_table(spark, sf_dir, "documents")
    heads = d.select(
        "doc_id",
        F.split("text", " ").getItem(0).alias("first_tok"),
        F.substring("text", 1, 40).alias("head"),
    )
    a, b = heads.alias("a"), heads.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.first_tok") == F.col("b.first_tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= 10)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
    )


def _linkage_exact_sql() -> str:
    sig_cols = ",\n                ".join(
        f"min({_ph('sh', i)}) AS h{i}" for i in range(_MH_N)
    )

    def band_rows(src: str) -> str:
        return " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, {sig} AS sig FROM {src}".format(
                b=b,
                src=src,
                sig=_ph(
                    " || ',' || ".join(
                        f"h{b * _MH_RPB + r}::VARCHAR" for r in range(_MH_RPB)
                    ),
                    9999,
                ),
            )
            for b in range(_MH_BANDS)
        )

    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(_MH_N)
    )
    return f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       sig_l AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
       sig_r AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
       bands_l AS ({band_rows('sig_l')}),
       bands_r AS ({band_rows('sig_r')}),
       cand AS (SELECT DISTINCT x.doc_id AS left_id, y.doc_id AS right_id
                FROM bands_l x JOIN bands_r y
                  ON x.band = y.band AND x.sig = y.sig),
       scored AS (SELECT c.left_id, c.right_id, ({agree}) AS agree
                  FROM cand c
                  JOIN sig_l a ON a.doc_id = c.left_id
                  JOIN sig_r b ON b.doc_id = c.right_id)
       SELECT left_id, right_id, round(agree / {_MH_N}.0, 6) AS est_jaccard
       FROM scored WHERE agree / {_MH_N}.0 >= 0.6"""


@q("llm_linkage_minhash", _linkage_exact_sql())
def llm_linkage_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus record linkage (entity resolution across snapshots):
    near-dup pairs BETWEEN two datasets — here the even-id and odd-id
    halves of `documents` — via banded MinHash-LSH
    (operators/dedup.py minhash_linkage_pairs). Unlike self-dedup, the
    candidate step is an equi-join of two independent (id, band, sig)
    tables — never a cross product; sides may differ in size arbitrarily
    and the smaller side's band table broadcasts. Portable md5 hashes →
    DuckDB recomputes the whole pipeline exactly (hash-verified LSH
    linkage)."""
    from hawaiidatapipeline_spark.operators.dedup import minhash_linkage_pairs

    d = load_table(spark, sf_dir, "documents")
    left = d.filter(F.col("doc_id") % 2 == 0)
    right = d.filter(F.col("doc_id") % 2 == 1)
    pairs = minhash_linkage_pairs(
        left, right, tau=0.6, n_hashes=_MH_N, n_bands=_MH_BANDS, hash_fn="md5"
    )
    return pairs.select(
        "left_id", "right_id", F.round("est_jaccard", 6).alias("est_jaccard")
    )


_SURVIVOR_SQL = _CLUSTERS_SQL.replace(
    """SELECT node AS doc_id,
       min(r) AS cluster_id,
       node = min(r) AS is_kept
FROM reach GROUP BY node
""",
    """, comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
quality AS (
  SELECT doc_id,
         round(least(len(string_split(text, ' ')) / 64.0, 1.0)
               * (len(list_distinct(string_split(text, ' ')))::DOUBLE
                  / len(string_split(text, ' '))), 6) AS q
  FROM documents
),
ranked AS (
  SELECT c.doc_id, c.cluster_id, q.q,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.q DESC, c.doc_id) AS rn
  FROM comp c JOIN quality q USING (doc_id)
)
SELECT cluster_id, doc_id AS survivor_id, q AS quality
FROM ranked WHERE rn = 1
""",
)
assert "survivor_id" in _SURVIVOR_SQL  # replace() must have matched


@q("llm_dedup_survivors", _SURVIVOR_SQL)
def llm_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship POLICY on top of duplicate clustering: instead of the
    arbitrary min-id canonical (llm_dedup_clusters), keep the
    highest-QUALITY document of each near-dup cluster (deterministic
    tiebreak on doc_id) — what a real corpus dedup applies, since dup
    clusters often mix a clean original with truncated/boilerplate
    copies. One extra broadcast-sized join + per-cluster rank over the
    clustering output; the quality score is the same deterministic
    signal the corpus pipeline gates on."""
    from hawaiidatapipeline_spark.functions.text import quality_score
    from hawaiidatapipeline_spark.operators.dedup import connected_components
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_jaccard

    d = load_table(spark, sf_dir, "documents")
    labels = connected_components(llm_dedup_jaccard(spark, sf_dir))
    quality = d.select("doc_id", quality_score(F.col("text")).alias("q"))
    joined = labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    ).join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.col("q").desc(), "doc_id")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("survivor_id"), F.col("q").alias("quality"))
    )


_SEMANTIC_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.node
)
SELECT node AS vec_id,
       min(r) AS cluster_id,
       node = min(r) AS is_kept
FROM reach GROUP BY node
"""


@q("llm_semantic_clusters", _SEMANTIC_CLUSTERS_SQL)
def llm_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup clustering: cosine near-dup pairs (same edge set as
    llm_dedup_embedding, τ=0.45) grouped into duplicate clusters by the
    same hash-min label propagation the MinHash path uses — completing
    the pairs→clusters→survivors symmetry for the embedding modality.
    Paraphrased near-copies that share no shingles cluster here and
    nowhere else. At 100 TB the edge set comes from the LSH/IVF
    candidate stage instead of exact pairwise cosine; the clustering
    itself is unchanged (O(diameter) iterations of narrow joins)."""
    from hawaiidatapipeline_spark.operators.dedup import connected_components
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_embedding

    pairs = llm_dedup_embedding(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).alias("is_kept"),
    )


def _lsh_recall_sql() -> str:
    from hawaiidatapipeline_spark.queries.llm import _NGRAM_TAU

    sig_cols = ",\n                ".join(
        f"min({_ph('sh', i)}) AS h{i}" for i in range(_MH_N)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {sig} AS sig FROM sig".format(
            b=b,
            sig=_ph(
                " || ',' || ".join(
                    f"h{b * _MH_RPB + r}::VARCHAR" for r in range(_MH_RPB)
                ),
                9999,
            ),
        )
        for b in range(_MH_BANDS)
    )
    return f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
                 FROM shingle a JOIN shingle b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       truth AS (SELECT doc_a, doc_b FROM inter
                 JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
                 WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {_NGRAM_TAU}),
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       bands AS ({band_rows}),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       hit AS (SELECT t.doc_a FROM truth t
               JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
       SELECT (SELECT count(*) FROM truth) AS n_true,
              (SELECT count(*) FROM cand) AS n_candidates,
              (SELECT count(*) FROM hit) AS n_hit,
              round((SELECT count(*) FROM hit)::DOUBLE
                    / (SELECT count(*) FROM truth), 6) AS recall"""


@q("llm_lsh_recall_report", _lsh_recall_sql())
def llm_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality audit AS a checked query: recall of banded-MinHash
    candidate generation (md5-portable hashes, no estimator threshold)
    against exact trigram-shingle Jaccard ≥ τ ground truth — the number a
    dedup operator owes its users before anyone trusts the sub-quadratic
    path. Both sides are deterministic, so even the recall fraction
    hash-matches DuckDB. At 100 TB the truth side is infeasible (that is
    the point of LSH) — this report runs on a sampled audit slice; the
    banding math (recall ≈ 1-(1-j^r)^b) extrapolates."""
    from hawaiidatapipeline_spark.operators.dedup import minhash_candidate_pairs
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_jaccard_ngram

    d = load_table(spark, sf_dir, "documents")
    truth = llm_dedup_jaccard_ngram(spark, sf_dir).select("doc_a", "doc_b")
    cand = minhash_candidate_pairs(
        d, tau=0.0, n_hashes=_MH_N, n_bands=_MH_BANDS, hash_fn="md5"
    ).select("doc_a", "doc_b")
    hit = truth.join(cand, ["doc_a", "doc_b"])
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_true"), 6).alias("recall"),
        )
    )


_CLUSTER_SIZES_SQL = _CLUSTERS_SQL.replace(
    """SELECT node AS doc_id,
       min(r) AS cluster_id,
       node = min(r) AS is_kept
FROM reach GROUP BY node""",
    """SELECT n_members, count(*) AS n_clusters
FROM (SELECT cluster_id, count(*) AS n_members
      FROM (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node) l
      GROUP BY cluster_id) s
GROUP BY n_members ORDER BY n_members""",
)


@q("llm_dedup_cluster_sizes", _CLUSTER_SIZES_SQL)
def llm_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the observability readout of a
    dedup pass (a long tail of giant clusters means boilerplate is
    swamping the corpus; all-pairs means the threshold is too loose).
    Same connected components as llm_dedup_clusters, two more narrow
    aggregates on top; the oracle reuses the transitive-closure CTE."""
    from hawaiidatapipeline_spark.operators.dedup import connected_components
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_jaccard

    labels = connected_components(llm_dedup_jaccard(spark, sf_dir))
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .groupBy("n_members")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("n_members")
    )


def _lsh_pr_sql() -> str:
    from hawaiidatapipeline_spark.queries.llm import _NGRAM_TAU

    sig_cols = ",\n                ".join(
        f"min({_ph('sh', i)}) AS h{i}" for i in range(_MH_N)
    )

    def band_rows(nb: int) -> str:
        rpb = _MH_N // nb
        return " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, {sig} AS sig FROM sig".format(
                b=b,
                sig=_ph(
                    " || ',' || ".join(
                        f"h{b * rpb + r}::VARCHAR" for r in range(rpb)
                    ),
                    9999,
                ),
            )
            for b in range(nb)
        )

    def config(nb: int) -> str:
        return f"""bands{nb} AS ({band_rows(nb)}),
       cand{nb} AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM bands{nb} x JOIN bands{nb} y
                  ON x.band = y.band AND x.sig = y.sig
                 AND x.doc_id < y.doc_id),
       hit{nb} AS (SELECT t.doc_a FROM truth t
               JOIN cand{nb} c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)"""

    def row(nb: int) -> str:
        rpb = _MH_N // nb
        return f"""SELECT {nb} AS n_bands, {rpb} AS rows_per_band,
              (SELECT count(*) FROM truth) AS n_true,
              (SELECT count(*) FROM cand{nb}) AS n_candidates,
              (SELECT count(*) FROM hit{nb}) AS n_hit,
              round((SELECT count(*) FROM hit{nb})::DOUBLE
                    / (SELECT count(*) FROM truth), 6) AS recall,
              round((SELECT count(*) FROM hit{nb})::DOUBLE
                    / (SELECT count(*) FROM cand{nb}), 6) AS precision"""

    return f"""WITH words AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ),
       idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
               FROM words),
       shingle AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
                   FROM idx),
       sizes AS (SELECT doc_id, count(*) AS n FROM shingle GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
                 FROM shingle a JOIN shingle b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       truth AS (SELECT doc_a, doc_b FROM inter
                 JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb ON sb.doc_id = doc_b
                 WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {_NGRAM_TAU}),
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       {config(4)},
       {config(8)}
       {row(4)} UNION ALL {row(8)} ORDER BY n_bands"""


@q("llm_lsh_pr_tradeoff", _lsh_pr_sql())
def llm_lsh_pr_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-parameter tuning table: recall AND precision of LSH
    candidate generation against exact trigram-Jaccard ≥ τ ground truth,
    for two band layouts of the SAME 16-hash signature — 4 bands × 4
    rows (tight: high precision) vs 8 bands × 2 rows (loose: high
    recall). This is the table an operator reads before re-banding a
    100 TB dedup pass, and the measured counterpart of the analytic
    S-curve 1−(1−j^r)^b. The signature table is built ONCE
    (materialized) and both layouts derive band columns from it — the
    knob changes grouping, not hashing. Truth side is the sampled-slice
    audit (quadratic, fixture/audit-scale only), the same discipline as
    llm_lsh_recall_report; md5-portable hashes keep every candidate set
    oracle-recomputable."""
    from hawaiidatapipeline_spark.operators.dedup import (
        _band_columns,
        _band_rows,
        minhash_signatures,
        shingles_distinct,
    )
    from hawaiidatapipeline_spark.operators.materialize import materialize
    from hawaiidatapipeline_spark.queries.llm import llm_dedup_jaccard_ngram

    d = load_table(spark, sf_dir, "documents")
    truth = materialize(
        llm_dedup_jaccard_ngram(spark, sf_dir).select("doc_a", "doc_b")
    )
    tok = shingles_distinct(d, 3, "doc_id", "text")
    sig = materialize(minhash_signatures(tok, _MH_N, "doc_id", "md5"))
    out = None
    for nb in (4, 8):
        bands = _band_rows(
            _band_columns(sig, _MH_N, nb, "md5"), nb, "doc_id", "doc_id"
        )
        cand = (
            bands.alias("x")
            .join(
                bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.sig") == F.col("y.sig"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        cand = materialize(cand)
        hit = truth.join(cand, ["doc_a", "doc_b"])
        row = (
            truth.agg(F.count(F.lit(1)).alias("n_true"))
            .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
            .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
            .select(
                F.lit(nb).cast("int").alias("n_bands"),
                F.lit(_MH_N // nb).cast("int").alias("rows_per_band"),
                "n_true",
                "n_candidates",
                "n_hit",
                F.round(F.col("n_hit") / F.col("n_true"), 6).alias("recall"),
                F.round(F.col("n_hit") / F.col("n_candidates"), 6).alias(
                    "precision"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("n_bands")
