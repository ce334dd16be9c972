"""Unit tests for queries/curation_extra.py beyond the oracle gate:
URL-canonicalization edge cases and containment-vs-jaccard asymmetry."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.curation_extra import canonicalize_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]


def test_canonicalize_url_cases(spark):
    got = _canon(
        spark,
        [
            "https://Site3.Example.COM/p/7?ref=1&utm_source=feed&utm_campaign=x#frag",
            "https://site3.example.com/p/7?ref=1",
            "https://a.b/p?ref=2&utm_medium=email",
            "https://a.b/p#only-fragment",
            "https://a.b/p",  # nothing to strip
        ],
    )
    assert got[0] == got[1] == "https://site3.example.com/p/7?ref=1"
    assert got[2] == "https://a.b/p?ref=2"
    assert got[3] == "https://a.b/p"
    assert got[4] == "https://a.b/p"


def test_containment_detects_embedded_doc(spark, tmp_path):
    """A short doc fully embedded in a long one must reach containment 1.0
    in the short→long direction while Jaccard would stay low — the
    asymmetry that motivates the operator."""
    import pyspark.sql.functions as F  # noqa: F811

    from hawaiidatapipeline_spark.queries import curation_extra

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i} x{i} y{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, short, "en", "a", len(short)), (2, long, "en", "b", len(long))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in curation_extra.llm_containment_pairs(spark, sf).collect()
    }
    assert out[(1, 2)] == 1.0  # short fully contained in long
    # long in short is far below tau (only 3 of its ~62 shingles shared)
    assert (2, 1) not in out
