"""Independent-reference tests for queries/ops_extra.py — each query
recomputed with plain Python/pandas (no Spark, no SQL) on sf0.001."""

import hashlib
import re

import pandas as pd
import pytest

from hawaiidatapipeline_spark.queries import ops_extra

SF = "/root/testdata/sf0.001"


def _ph(s: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def test_lsh_band_stats_match_python_minhash(spark):
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    n, bands, rpb = ops_extra._MH_N, ops_extra._MH_BANDS, ops_extra._MH_RPB
    buckets: dict[tuple[int, int], int] = {}
    for _, row in pdf.iterrows():
        w = row["text"].split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if not sh:
            continue
        sig = [min(_ph(s, i) for s in sh) for i in range(n)]
        for b in range(bands):
            bs = _ph(",".join(str(sig[b * rpb + r]) for r in range(rpb)), 9999)
            buckets[(b, bs)] = buckets.get((b, bs), 0) + 1
    want = {}
    for (b, _), s in buckets.items():
        st = want.setdefault(b, [0, 0, 0, 0])  # n, multi, max, pairs
        st[0] += 1
        st[1] += s >= 2
        st[2] = max(st[2], s)
        st[3] += s * (s - 1) // 2
    got = ops_extra.QUERIES["llm_lsh_band_stats"](spark, SF).collect()
    assert len(got) == bands
    for r in got:
        n_b, multi, mx, pairs = want[r["band"]]
        assert (r["n_buckets"], r["n_buckets_multi"], r["max_bucket"],
                r["candidate_pairs"]) == (n_b, multi, mx, pairs)


def test_band_stats_reuses_dedup_band_table(spark):
    """Production path: the dedup pass's xxhash64 band table is built ONCE
    (materialized) and feeds BOTH the candidate self-join and the
    band-health audit — no second signature build. The audit's
    candidate_pairs must equal the pair count the self-join on the SAME
    table actually emits, per band."""
    from hawaiidatapipeline_spark.operators.dedup import band_assignments
    from hawaiidatapipeline_spark.operators.materialize import materialize
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bands = materialize(
        band_assignments(d, n_hashes=16, n_bands=4, hash_fn="xxhash64")
    )
    # audit lane: precomputed table in, no rebuild
    audit = {
        r["band"]: r["candidate_pairs"]
        for r in ops_extra.QUERIES["llm_lsh_band_stats"](
            spark, SF, bands=bands
        ).collect()
    }
    # dedup lane: the candidate join over the SAME materialized table
    joined = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )
    emitted = {r["band"]: r["pairs"] for r in joined.collect()}
    for band, pending in audit.items():
        assert emitted.get(band, 0) == pending


def test_cum_deviation_matches_pandas(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    pdf["d"] = pdf["ts"].dt.date
    got = {
        r["event_type"]: (r["peak_day"], r["peak_drift"])
        for r in ops_extra.QUERIES["ts_cum_deviation"](spark, SF).collect()
    }
    for et, grp in pdf.groupby("event_type"):
        daily = grp.groupby("d").size().sort_index()
        mean = daily.sum() / len(daily)
        drift = daily.cumsum() - mean * range(1, len(daily) + 1)
        peak = drift.abs().sort_values(kind="stable", ascending=False)
        # tiebreak on earliest day among equal |drift| values
        top = drift[drift.abs() == peak.iloc[0]].index.min()
        assert got[et][0] == top
        assert got[et][1] == pytest.approx(drift[top], abs=1e-6)


def test_conversion_latency_matches_pandas(spark):
    pdf = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    first = pdf.groupby("user_id")["ts"].min()
    buy = pdf[pdf["event_type"] == "purchase"].groupby("user_id")["ts"].min()
    days = ((buy - first[buy.index]).dt.total_seconds() * 1e6 // 86400000000).astype(int)
    want = days.value_counts().sort_index()
    out = ops_extra.QUERIES["events_conversion_latency"](spark, SF).toPandas()
    assert out.set_index("latency_days")["n_users"].to_dict() == want.to_dict()
    assert int(out["n_users"].sum()) == buy.index.nunique()


def test_tokenizer_fertility_matches_re(spark):
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    rx = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")
    out = ops_extra.QUERIES["llm_tokenizer_fertility"](spark, SF).toPandas()
    for _, r in out.iterrows():
        grp = pdf[pdf["source"] == r["source"]]
        chars = int(grp["text"].str.len().sum())
        words = int(grp["text"].str.split(" ").map(len).sum())
        pieces = int(grp["text"].map(lambda t: len(rx.findall(t))).sum())
        assert (r["total_chars"], r["total_words"], r["total_pieces"]) == (
            chars, words, pieces,
        )
        assert r["pieces_per_word"] == pytest.approx(pieces / words, abs=1e-6)
