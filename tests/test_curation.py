"""Curation operator edge cases (operators/curation.py)."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.curation import (
    decontaminate,
    pack_sequences,
    repetition_stats,
    scrub_pii,
)


def test_scrub_pii_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org tel 808-555-1234"),
            (2, "no pii here 12-34-56"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert rows[1].n_pii == 3
    assert rows[1].text == "mail <EMAIL> and <EMAIL> tel <PHONE>"
    assert rows[2].n_pii == 0 and rows[2].text == "no pii here 12-34-56"
    assert rows[3].n_pii == 0


def test_decontaminate_both_directions(spark):
    # doc 4 is PARTIALLY contaminated (shares "a b c" but also has clean
    # shingles) — the round-1 inversion kept it; doc 5 is shorter than n
    # (no shingles at all) and must count as clean, not vanish.
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "v w x y z"),
            (3, "p q r s t"),
            (4, "a b c m n o p"),
            (5, "a b"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "z z a b c d e")], "doc_id long, text string")
    clean = decontaminate(corpus, bench, n=3, keep_clean=True)
    dirty = decontaminate(corpus, bench, n=3, keep_clean=False)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3, 5]
    assert sorted(r.doc_id for r in dirty.collect()) == [1, 4]
    # clean/dirty partition the corpus: no overlap, nothing lost
    assert clean.count() + dirty.count() == corpus.count()


def test_repetition_stats_exact(spark):
    # "a b a b a b" trigrams: [a b a, b a b, a b a, b a b] -> 4 total, 2 distinct
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    assert out[1].n_shingles == 4 and out[1].n_distinct == 2
    assert abs(out[1].dup_frac - 0.5) < 1e-9
    assert 2 not in out  # shorter than n -> no shingles, no row


def test_chunk_documents_reconstruction(spark):
    """Chunking invariants: stripping each chunk's leading overlap and
    concatenating reconstructs the doc exactly; every chunk except the last
    is full-size; short docs yield one chunk."""
    from hawaiidatapipeline_spark.operators.curation import chunk_documents

    texts = [
        (1, " ".join(f"t{i}" for i in range(100))),
        (2, " ".join(f"u{i}" for i in range(32))),   # exactly one chunk
        (3, " ".join(f"v{i}" for i in range(33))),   # spills into a second
        (4, "solo"),
        (5, " ".join(f"w{i}" for i in range(24))),   # == step, single chunk
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=32, overlap=8)
    rows = sorted((r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens) for r in out.collect())
    by_doc = {}
    for doc_id, chunk_id, chunk_text, n_tokens in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, chunk_text, n_tokens))
    for doc_id, text in texts:
        chunks = by_doc[doc_id]
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        rebuilt = chunks[0][1].split(" ")
        for _, chunk_text, _ in chunks[1:]:
            rebuilt.extend(chunk_text.split(" ")[8:])  # drop the overlap
        assert rebuilt == text.split(" "), doc_id
        for _, chunk_text, n_tokens in chunks[:-1]:
            assert len(chunk_text.split(" ")) == 32 == n_tokens
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 2 and len(by_doc[4]) == 1
    assert len(by_doc[5]) == 1


def test_pack_sequences_bins(spark):
    df = spark.createDataFrame(
        [(i, "s", " ".join(["t"] * 30)) for i in range(1, 6)],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r.bin_id for r in pack_sequences(df, bin_tokens=64).collect()}
    # cumulative before: 0,30,60,90,120 -> bins 0,0,0,1,1
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}
    # packing never splits a doc and bins are monotone in doc order
    assert sorted(out.values()) == list(out[k] for k in sorted(out))


def test_lsh_pr_tradeoff_monotone(spark):
    """One 16-hash signature, two band layouts: the looser 8x2 layout must
    dominate 4x4 on candidates and recall and be dominated on precision
    (ties allowed); recall/precision are exact count ratios."""
    from hawaiidatapipeline_spark.queries import training

    rows = {
        r["n_bands"]: r
        for r in training.QUERIES["llm_lsh_pr_tradeoff"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    r4, r8 = rows[4], rows[8]
    assert r4["rows_per_band"] == 4 and r8["rows_per_band"] == 2
    assert r4["n_true"] == r8["n_true"]
    assert r8["n_candidates"] >= r4["n_candidates"]
    assert r8["n_hit"] >= r4["n_hit"]
    assert r8["recall"] >= r4["recall"]
    assert r8["precision"] <= r4["precision"] or r8["n_candidates"] == r4["n_candidates"]
    for r in (r4, r8):
        assert r["recall"] == round(r["n_hit"] / r["n_true"], 6)
        assert r["precision"] == round(r["n_hit"] / r["n_candidates"], 6)
