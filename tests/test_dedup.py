"""Dedup operator unit tests: shingling edges + MinHash recall vs exact
trigram Jaccard on the sf0.001 fixture corpus."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.dedup import (
    minhash_candidate_pairs,
    shingles_distinct,
    simhash_signatures,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_shingles_basic(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x"), (4, "a b c a b c")],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_id, r.token) for r in shingles_distinct(df, 3).collect()
    }
    assert got == {
        (1, "a b c"),
        (1, "b c d"),
        (4, "a b c"),
        (4, "b c a"),
        (4, "c a b"),
    }  # docs shorter than n emit nothing; duplicates collapse


def _exact_trigram_jaccard_pairs(spark, docs, tau):
    tok = shingles_distinct(docs, 3)
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("sa.n") + F.col("sb.n") - F.col("common"))
    return {
        (r.doc_a, r.doc_b)
        for r in inter.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= tau)
        .select("doc_a", "doc_b")
        .collect()
    }


def test_minhash_recall_against_exact(spark):
    docs = load_table(spark, SF0001, "documents")
    exact = _exact_trigram_jaccard_pairs(spark, docs, tau=0.6)
    approx = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(docs, tau=0.5).select("doc_a", "doc_b").collect()
    }
    assert exact, "fixture corpus should contain trigram near-dups"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"minhash recall too low: {recall:.2f}"


def test_simhash_near_dups_close(spark):
    docs = load_table(spark, SF0001, "documents")
    sig = simhash_signatures(docs)
    exact = _exact_trigram_jaccard_pairs(spark, docs, tau=0.8)
    if not exact:
        return
    sig_map = {r.doc_id: r.simhash for r in sig.collect()}
    # high-jaccard pairs should have small hamming distance
    close = sum(
        1 for a, b in exact if bin(sig_map[a] ^ sig_map[b]).count("1") <= 16
    )
    assert close / len(exact) >= 0.9
