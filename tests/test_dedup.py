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


def test_minhash_planted_adversarial_near_dups(spark):
    """Adversarial planting keeps the weak (rows-only) minhash check honest:
    true near-dups (2 words edited → trigram Jaccard ≈ 0.8) MUST surface;
    word-scrambled copies (identical token MULTISET, trigram Jaccard ≈ 0 —
    the case that fools 1-gram dedup) must NOT pass the tau=0.6 gate."""
    base = (
        load_table(spark, SF0001, "documents")
        .filter(F.size(F.split("text", " ")) >= 30)
        .limit(25)
        .collect()
    )
    assert len(base) == 25
    rows = []
    for r in base:
        words = r.text.split(" ")
        near = list(words)
        near[5], near[len(near) // 2] = "qqq", "zzz"  # 2 edits -> J ~ 0.8
        scrambled = list(reversed(words))  # same multiset, J ~ 0
        rows.append((int(r.doc_id), r.text))
        rows.append((int(r.doc_id) + 100_000, " ".join(near)))
        rows.append((int(r.doc_id) + 200_000, " ".join(scrambled)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(docs, tau=0.6).select("doc_a", "doc_b").collect()
    }
    planted = {(int(r.doc_id), int(r.doc_id) + 100_000) for r in base}
    scrambles = {(int(r.doc_id), int(r.doc_id) + 200_000) for r in base}
    recall = len(planted & got) / len(planted)
    assert recall >= 0.9, f"planted near-dup recall too low: {recall:.2f}"
    assert not (scrambles & got), "word-scrambled docs must not pass trigram LSH"


def test_winnowing_fingerprints_position_robust(spark):
    """Winnowing's defining property: inserting words at the FRONT of a doc
    (shifting every downstream position) must preserve most fingerprints —
    positional k-gram hashing would share none. Unrelated docs share few."""
    from hawaiidatapipeline_spark.functions.text import winnowing_fingerprints

    base = (
        load_table(spark, SF0001, "documents")
        .filter(F.size(F.split("text", " ")) >= 40)
        .limit(15)
        .collect()
    )
    rows = []
    for r in base:
        rows.append((int(r.doc_id), r.text))
        rows.append((int(r.doc_id) + 100_000, "xxx yyy zzz " + r.text))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = winnowing_fingerprints(docs).collect()
    sets: dict[int, set] = {}
    for r in fp:
        sets.setdefault(r.doc_id, set()).add(r.fingerprint)
    overlaps = []
    for r in base:
        a, b = sets[int(r.doc_id)], sets[int(r.doc_id) + 100_000]
        overlaps.append(len(a & b) / len(a | b))
    assert sum(o >= 0.5 for o in overlaps) >= 0.8 * len(overlaps), overlaps
    # unrelated docs: fingerprint overlap stays low
    ids = [int(r.doc_id) for r in base]
    cross = [
        len(sets[ids[i]] & sets[ids[i + 1]]) / len(sets[ids[i]] | sets[ids[i + 1]])
        for i in range(0, len(ids) - 1, 2)
    ]
    assert all(c < 0.5 for c in cross), cross


def test_connected_components_known_graph(spark):
    """Path graph 1-2-3-4 (diameter 3 — needs real propagation, not one
    hop), clique {10,11,12}, isolated pair {20,21}."""
    from hawaiidatapipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_empty(spark):
    from hawaiidatapipeline_spark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert connected_components(empty).count() == 0


def test_connected_components_observed_convergence_single_job_per_round(
    spark, tmp_path, monkeypatch
):
    """The convergence test rides the round's materialization action as an
    Observation metric — one Spark action per round instead of a label
    update + a separate count() probe. Prove the probe is gone by making
    DataFrame.count() raise for the duration of the call (the old loop
    ran limit(1).count() every round); then check the reliable-checkpoint
    path returns identical labels (the observation must fire under BOTH
    materialize paths)."""
    from pyspark.sql import DataFrame

    from hawaiidatapipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    sc = spark.sparkContext
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def _no_count(self):
        raise AssertionError("convergence must not submit a count() action")

    monkeypatch.setattr(DataFrame, "count", _no_count)
    labels = connected_components(pairs)
    monkeypatch.undo()
    local = {r.node: r.comp for r in labels.collect()}
    assert local == want

    assert sc.getCheckpointDir() is None  # precondition for the swap below
    sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        reliable = {r.node: r.comp for r in connected_components(pairs).collect()}
    finally:
        # (py4j: the Scala setter is `checkpointDir_=`, mangled to `_$eq`)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert reliable == want


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


def test_linkage_pairs_equal_cross_parity_selfdedup_pairs(spark):
    """Linking the even-id and odd-id halves must find exactly the
    cross-parity subset of the self-dedup candidates (same hash family,
    same banding) — the two pipelines are the same algorithm."""
    from hawaiidatapipeline_spark.operators.dedup import (
        minhash_candidate_pairs,
        minhash_linkage_pairs,
    )
    from hawaiidatapipeline_spark.registry import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, SF0001, "documents")
    self_pairs = minhash_candidate_pairs(d, tau=0.6, n_hashes=16, n_bands=4)
    cross = {
        frozenset((r["doc_a"], r["doc_b"]))
        for r in self_pairs.collect()
        if r["doc_a"] % 2 != r["doc_b"] % 2
    }
    linked = minhash_linkage_pairs(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        tau=0.6,
        n_hashes=16,
        n_bands=4,
    )
    got = {frozenset((r["left_id"], r["right_id"])) for r in linked.collect()}
    assert got == cross
    assert got, "fixture must contain cross-parity near-dups"


def test_incremental_recrawl_prefers_batch_signature(spark):
    """ADVICE r8: a doc_id present in BOTH the persisted corpus signatures
    and the new batch (the re-crawl case) must contribute exactly one
    signature row — the batch's fresher one — so scoring emits ONE row per
    candidate pair, and pair_kind is derived deterministically from batch
    membership rather than whichever union leg dropDuplicates kept."""
    from hawaiidatapipeline_spark.operators.dedup import (
        incremental_minhash_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    # corpus had doc 1 with OLD text (near-identical to doc 2); the batch
    # re-crawls doc 1 with text that now matches doc 10 instead
    corpus = spark.createDataFrame(
        [(1, base + " old tail"), (2, base + " old tail words")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(1, base + " fresh tail"), (10, base + " fresh tail words")],
        "doc_id bigint, text string",
    )
    out = incremental_minhash_candidates(
        corpus, batch, tau=0.3, n_hashes=16, n_bands=8
    ).collect()
    rows = {(r["doc_a"], r["doc_b"]): r for r in out}
    # exactly one row per pair — no old/new signature fan-out duplicates
    assert len(out) == len(rows)
    # (1, 10): both ends in the batch -> new_vs_new, scored on FRESH text
    assert (1, 10) in rows
    assert rows[(1, 10)]["pair_kind"] == "new_vs_new"
    assert rows[(1, 10)]["est_jaccard"] > 0.5
    # (1, 2) may survive banding via shared prefix; if present its kind is
    # new_vs_corpus (1 is in the batch, 2 only in the corpus) and its score
    # reflects the FRESH doc-1 signature (< the (1,10) fresh-pair score)
    if (1, 2) in rows:
        assert rows[(1, 2)]["pair_kind"] == "new_vs_corpus"
        assert rows[(1, 2)]["est_jaccard"] < rows[(1, 10)]["est_jaccard"]
