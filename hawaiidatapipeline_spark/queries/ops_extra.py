"""Operational-health extras: LSH bucket auditing, drift curves,
conversion latency, tokenizer fertility.

The round-6 batch that instruments the pipeline itself: is the LSH
banding healthy, is a feed drifting from its baseline rate, how long do
users take to convert, and how hard does the tokenizer fragment each
source. All exact-oracle (integer sums / portable hashes only; floats
confined to final closed-form expressions, rounded to 6 dp both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# Mirrors queries/training.py llm_dedup_minhash_exact: 16 hashes / 4 bands,
# word-trigram shingles, portable md5-derived hashes on both engines.
_MH_N, _MH_BANDS = 16, 4
_MH_RPB = _MH_N // _MH_BANDS


def _ph(expr: str, seed) -> str:
    return f"('0x' || substring(md5('{seed}:' || {expr}), 1, 15))::BIGINT"


def _band_stats_sql() -> str:
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
       sig AS (SELECT doc_id,
                {sig_cols}
               FROM shingle GROUP BY doc_id),
       bands AS ({band_rows}),
       buckets AS (SELECT band, sig, count(*) AS s FROM bands GROUP BY 1, 2)
       SELECT band,
              count(*)::BIGINT AS n_buckets,
              count(*) FILTER (WHERE s >= 2)::BIGINT AS n_buckets_multi,
              max(s)::BIGINT AS max_bucket,
              sum(s * (s - 1) // 2)::BIGINT AS candidate_pairs
       FROM buckets GROUP BY band ORDER BY band"""


@q("llm_lsh_band_stats", _band_stats_sql())
def llm_lsh_band_stats(
    spark: SparkSession, sf_dir: str, bands: DataFrame | None = None
) -> DataFrame:
    """LSH bucket-health audit: per band, the bucket count, multi-doc
    bucket count, largest bucket, and the number of candidate pairs the
    band will emit (Σ s·(s−1)/2). THE pre-flight check before a dedup
    join at 100 TB — a boilerplate-collapsed band shows up here as one
    giant bucket (quadratic pending pairs) while the join can still be
    re-planned (tighter bands, stop-shingles, salting). The stats fold
    is ``operators/dedup.py band_health``: one (band, sig) groupBy —
    the candidate self-join never runs.

    Cost note: the dominant cost HERE is the md5-portable signature
    build (16 hashes/doc), kept md5 only so the DuckDB oracle can
    recompute every bucket bit-for-bit. A production pipeline must NOT
    pay that second build: pass ``bands=`` with the dedup pass's own
    persisted band table (``band_assignments`` /
    ``minhash_candidate_pairs``'s fused band columns, xxhash64) and the
    audit reduces to the linear groupBy —
    ``tests/test_ops_extra.py::test_band_stats_reuses_dedup_band_table``
    exercises exactly that one-build dedup+audit path."""
    from hawaiidatapipeline_spark.operators.dedup import (
        band_assignments,
        band_health,
    )

    if bands is None:
        d = load_table(spark, sf_dir, "documents")
        bands = band_assignments(
            d, n_hashes=_MH_N, n_bands=_MH_BANDS, hash_fn="md5"
        )
    return band_health(bands)


@q(
    "ts_cum_deviation",
    """WITH daily AS (
         SELECT event_type, ts::DATE AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type, sum(n)::BIGINT AS sx, count(*)::BIGINT AS nd
         FROM daily GROUP BY event_type),
       curve AS (
         SELECT d.event_type, d.d,
                (sum(d.n) OVER (PARTITION BY d.event_type ORDER BY d.d
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_n,
                (row_number() OVER (PARTITION BY d.event_type ORDER BY d.d))::BIGINT AS rn,
                s.sx, s.nd
         FROM daily d JOIN stats s USING (event_type)),
       dev AS (
         SELECT event_type, d,
                cum_n - rn * (sx::DOUBLE / nd) AS drift,
                row_number() OVER (
                  PARTITION BY event_type
                  ORDER BY abs(cum_n - rn * (sx::DOUBLE / nd)) DESC, d) AS rk
         FROM curve)
       SELECT event_type, d AS peak_day, round(drift, 6) AS peak_drift
       FROM dev WHERE rk = 1
       ORDER BY event_type""",
)
def ts_cum_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-deviation drift curve (CUSUM without reset): running
    event count minus the expected count at the series' own mean rate;
    the peak |deviation| day marks where a feed's rate broke from
    baseline. Every drift value is computed INDEPENDENTLY per row
    (exact integer cumsum − rank × exact-ratio mean) — no running float
    state — so the curve and its argmax are bit-identical across
    engines and partitionings. One agg + one per-type window + a
    broadcast of per-type totals."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("sx"), F.count(F.lit(1)).alias("nd")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type").orderBy("d")
    curve = (
        daily.join(F.broadcast(stats), "event_type")
        .withColumn("cum_n", F.sum("n").over(w_cum))
        .withColumn("rn", F.row_number().over(w_rn).cast("long"))
    )
    drift = F.col("cum_n") - F.col("rn") * (F.col("sx").cast("double") / F.col("nd"))
    w_pk = Window.partitionBy("event_type").orderBy(F.abs(drift).desc(), "d")
    return (
        curve.withColumn("rk", F.row_number().over(w_pk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").alias("peak_day"),
            F.round(drift, 6).alias("peak_drift"),
        )
        .orderBy("event_type")
    )


@q(
    "events_conversion_latency",
    """WITH firsts AS (
         SELECT user_id,
                min(epoch_us(ts)) AS first_us,
                min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS first_buy_us
         FROM events GROUP BY user_id)
       SELECT ((first_buy_us - first_us) // 86400000000)::BIGINT AS latency_days,
              count(*) AS n_users,
              min(user_id) AS example_user
       FROM firsts WHERE first_buy_us IS NOT NULL
       GROUP BY latency_days
       ORDER BY latency_days""",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-first-purchase histogram: days between each converting
    user's first event ever and their first purchase, bucketed by whole
    days (exact integer microsecond arithmetic — no float time math).
    One user-grain aggregate (min + conditional min in the same pass —
    no self-join, no window), then a tiny histogram agg; the funnel
    latency readout at any scale."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    firsts = e.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_buy_us"),
    )
    return (
        firsts.filter(F.col("first_buy_us").isNotNull())
        .groupBy(
            F.expr("(first_buy_us - first_us) DIV 86400000000").alias("latency_days")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("user_id").alias("example_user"),
        )
        .orderBy("latency_days")
    )


@q(
    "llm_tokenizer_fertility",
    """WITH t AS (
         SELECT source,
                len(text) AS n_chars_txt,
                len(string_split(text, ' ')) AS n_words,
                len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_pieces
         FROM documents)
       SELECT source,
              sum(n_chars_txt)::BIGINT AS total_chars,
              sum(n_words)::BIGINT AS total_words,
              sum(n_pieces)::BIGINT AS total_pieces,
              round(sum(n_pieces)::DOUBLE / sum(n_words), 6) AS pieces_per_word,
              round(sum(n_chars_txt)::DOUBLE / sum(n_pieces), 6) AS chars_per_piece
       FROM t GROUP BY source ORDER BY source""",
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source: BPE-ish pieces per whitespace word
    and characters per piece — the compression-ratio readout that decides
    how many TRAINING tokens a source actually contributes per byte (and
    flags sources the tokenizer fragments badly). Pure map-side counting
    with the shared BPE_SPLIT_RE (functions/text.py) + one small agg;
    ratios come from exact integer sums."""
    from hawaiidatapipeline_spark.functions.text import BPE_SPLIT_RE, bpe_token_count

    d = load_table(spark, sf_dir, "documents")
    assert BPE_SPLIT_RE == r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"  # oracle mirrors it
    t = d.select(
        "source",
        F.length("text").alias("n_chars_txt"),
        F.size(F.split("text", " ")).alias("n_words"),
        bpe_token_count(F.col("text")).alias("n_pieces"),
    )
    s = t.groupBy("source").agg(
        F.sum("n_chars_txt").alias("total_chars"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_pieces").alias("total_pieces"),
    )
    return s.select(
        "source",
        "total_chars",
        "total_words",
        "total_pieces",
        F.round(F.col("total_pieces").cast("double") / F.col("total_words"), 6).alias(
            "pieces_per_word"
        ),
        F.round(F.col("total_chars").cast("double") / F.col("total_pieces"), 6).alias(
            "chars_per_piece"
        ),
    ).orderBy("source")
