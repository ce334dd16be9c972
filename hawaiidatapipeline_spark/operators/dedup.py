"""Near-duplicate detection operators (SURVEY.md §2.J).

- ``minhash_candidate_pairs``: banded MinHash-LSH. Signature building is one
  explode + groupBy (linear); candidate generation is an equality join on
  (band, band-signature) — shuffle volume linear in docs × bands. Jaccard is
  then ESTIMATED from the signatures themselves (fraction of agreeing
  min-hashes), so the whole pipeline never touches token sets again: no
  quadratic explode-join, bounded per-pair work. At 100 TB this is the only
  viable shape; the exact pairwise operator in queries/llm.py is its
  fixture-scale recall oracle.
- ``simhash_signatures``: 64-bit SimHash per doc from token hashes — Hamming-
  distance bucketing for the "same idea, few words changed" regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.materialize import materialize, observed_metric


def tokenize_distinct(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) pairs, distinct — whitespace tokens as 1-shingles."""
    return df.select(id_col, F.explode(F.split(text_col, " ")).alias("token")).distinct()


def _shingles_raw(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    return (
        df.select(id_col, F.split(F.col(text_col), " ").alias("_toks"))
        .filter(F.size("_toks") >= n)
        .select(id_col, "_toks", F.explode(F.sequence(F.lit(0), F.size("_toks") - n)).alias("i"))
        .select(
            id_col,
            F.concat_ws(
                " ", *[F.element_at(F.col("_toks"), F.col("i") + 1 + k) for k in range(n)]
            ).alias("token"),
        )
    )


def shingles_distinct(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
) -> DataFrame:
    """(id, shingle) pairs, distinct — n-word shingles built entirely with
    JVM higher-order functions (transform over sequence). Word n-grams are
    the discriminative unit for near-dup detection: over a small vocabulary,
    1-gram token SETS of unrelated docs overlap heavily, while shared
    n-grams imply shared phrasing.

    ``distinct=False`` skips the dedup shuffle — correct for any
    duplicate-insensitive consumer, notably min-hashing, where repeated
    shingles can never change a min. Which setting is faster is a
    corpus-shape tradeoff, measured both ways at sf0.1: on REPETITIVE
    text (this fixture's ~30-word vocabulary) distinct collapses most
    occurrences before the 32-way hash work and wins ~1.4×; on natural
    corpora, where a document's n-grams are nearly all unique, distinct
    removes almost nothing and its full-width string exchange is pure
    cost — prefer distinct=False there."""
    out = _shingles_raw(df, n, id_col, text_col)
    return out.distinct() if distinct else out


def shingle_base_hashes(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, _bh) pairs, distinct — shingles reduced to their xxhash64 base
    hash BEFORE the dedup shuffle. For the engine-native minhash path the
    shingle string itself is never needed (only its hash feeds the
    permutations), so deduping on the 8-byte hash instead of the full
    string cuts the distinct exchange to fixed-width rows — measured ~25%
    off the signature build at sf0.1, with IDENTICAL signatures (a base-
    hash collision collapses the same way in both formulations; see the
    scheme-tag note above minhash_signatures)."""
    return (
        _shingles_raw(df, n, id_col, text_col)
        .select(id_col, F.xxhash64("token").alias("_bh"))
        .distinct()
    )


def portable_hash64(col, seed: int):
    """60-bit integer hash identical across engines: the first 15 hex
    digits of md5('<seed>:' || value), parsed base-16. Slower than
    xxhash64 (production path) but lets an external engine recompute the
    EXACT same LSH pipeline — the basis of the exact minhash oracle."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


# Signature-scheme tags. Persisted signatures MUST record the scheme they
# were built under — signatures from different schemes are mutually
# incompatible and any cross-scheme comparison is silently meaningless.
# v2 (current xxhash64 path) derives all permutations from ONE 64-bit base
# hash of the token: ~32× cheaper per token than v1's per-token string
# hashes, but a format break vs v1 artifacts, and two tokens colliding in
# the base hash collide in EVERY permutation (probability ~n_tokens²/2⁶⁵ —
# negligible, but a correlated failure mode v1 did not have). The md5 path
# is unchanged and remains bit-reproducible by external engines.
MINHASH_SCHEME_XXHASH = "xxhash64-base-rehash-v2"
MINHASH_SCHEME_MD5 = "md5-per-token-v1"


def minhash_scheme(hash_fn: str) -> str:
    """Scheme tag for persisted-signature consumers (see constants above)."""
    return MINHASH_SCHEME_XXHASH if hash_fn == "xxhash64" else MINHASH_SCHEME_MD5


def minhash_signatures(
    tok: DataFrame, n_hashes: int = 32, id_col: str = "doc_id", hash_fn: str = "xxhash64"
) -> DataFrame:
    """One row per doc with n_hashes min-hash columns h0..h{n-1}.
    hash_fn="xxhash64" (default): engine-native, fully codegen — the
    production path, scheme ``MINHASH_SCHEME_XXHASH`` (v2: permutations
    derived from a single base hash; incompatible with v1 artifacts —
    see the scheme-tag comment above). hash_fn="md5":
    ``portable_hash64`` so another engine can recompute signatures
    bit-for-bit (scheme ``MINHASH_SCHEME_MD5``). Either way the groupBy
    is a partial-aggregated min — one linear shuffle."""
    if hash_fn == "xxhash64":
        # hash the variable-length token string ONCE, then derive the
        # n_hashes permutations from the fixed-width base hash — xxhash64
        # over (long, int) is length-independent, so the per-token hash
        # cost drops from 32 string traversals to 1 + 32 word mixes.
        # Input may already carry _bh (shingle_base_hashes pre-hashes
        # before its distinct so the dedup exchange is fixed-width).
        if "_bh" not in tok.columns:
            tok = tok.withColumn("_bh", F.xxhash64("token"))
        cols = [
            F.min(F.xxhash64("_bh", F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
        ]
    elif hash_fn == "md5":
        cols = [
            F.min(portable_hash64(F.col("token"), i)).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return tok.groupBy(id_col).agg(*cols)


def _band_columns(sig: DataFrame, n_hashes: int, n_bands: int, hash_fn: str) -> DataFrame:
    """Append banded-LSH signature columns b0..b{n_bands-1} to a signature
    table — computed in the same projection as (and checkpointed with) the
    min-hash aggregation, so downstream band explodes are pure column
    selects instead of re-hashing per plan branch."""
    rows_per_band = n_hashes // n_bands

    def band_sig(cols):
        if hash_fn == "md5":
            return portable_hash64(
                F.concat_ws(",", *[c.cast("string") for c in cols]), 9999
            )
        return F.xxhash64(*cols)

    return sig.select(
        "*",
        *[
            band_sig(
                [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias(f"b{b}")
            for b in range(n_bands)
        ],
    )


def _band_rows(sig: DataFrame, n_bands: int, id_col: str, out_id: str) -> DataFrame:
    """Explode precomputed band columns to narrow (id, band, sig) rows."""
    return sig.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("sig"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select(out_id, "bs.band", "bs.sig")


def band_assignments(
    df: DataFrame,
    n_hashes: int = 32,
    n_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Narrow (id, band, sig) LSH band assignments — the table
    ``minhash_candidate_pairs`` self-joins, exposed on its own so bucket
    health can be audited WITHOUT generating candidates: group by
    (band, sig) and a bucket of size s is s·(s−1)/2 pending pairs. The
    monitor that catches a degenerate band (boilerplate-heavy corpora
    collapse many docs into one signature) before the join explodes.
    Same hash_fn contract as minhash_signatures."""
    tok = (
        shingle_base_hashes(df, shingle_n, id_col, text_col)
        if hash_fn == "xxhash64"
        else shingles_distinct(df, shingle_n, id_col, text_col)
    )
    sig = _band_columns(
        minhash_signatures(tok, n_hashes, id_col, hash_fn),
        n_hashes,
        n_bands,
        hash_fn,
    )
    return _band_rows(sig, n_bands, id_col, id_col)


def band_health(bands: DataFrame) -> DataFrame:
    """Per-band bucket-health stats over a (id, band, sig) band table:
    bucket count, multi-doc bucket count, largest bucket, and the exact
    number of candidate pairs the band's self-join would emit
    (Σ s·(s−1)/2). One (band, sig) groupBy + one band groupBy — linear,
    map-side-combinable, never touches the quadratic join.

    Production contract: run this on the SAME band table the dedup pass
    built (``band_assignments`` / the fused band columns inside
    ``minhash_candidate_pairs``, xxhash64 by default) — auditing must
    not pay a second signature build. The ``llm_lsh_band_stats``
    registry query rebuilds with md5 only so its DuckDB oracle can
    recompute every bucket bit-for-bit; pass its ``bands=`` parameter
    to audit a precomputed table instead."""
    buckets = bands.groupBy("band", "sig").agg(F.count(F.lit(1)).alias("s"))
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.count(F.when(F.col("s") >= 2, 1)).alias("n_buckets_multi"),
            F.max("s").alias("max_bucket"),
            F.sum(F.expr("s * (s - 1) DIV 2")).alias("candidate_pairs"),
        )
        .orderBy("band")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    tau: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b, est_jaccard ≥ tau) via banded LSH over
    word n-gram shingles (default trigrams).

    est_jaccard = fraction of the n_hashes min-hashes that agree — the
    standard unbiased MinHash estimator. Returns (doc_a, doc_b, est_jaccard).
    ``hash_fn="md5"`` switches every hash (token AND band signature) to the
    portable md5-derived form so an external engine can recompute the whole
    pipeline exactly.
    """
    # The signature table feeds FOUR plan branches (band self-join ×2,
    # signature re-join ×2); Catalyst does not reuse the exchange across
    # them, so without materialization the shingle-explode + 32-way min
    # aggregation — the expensive linear pass — runs four times.
    # materialize() computes it once (executor blocks, or reliable
    # checkpoint storage when a dir is configured). Band
    # signatures are FUSED into the same pass (VERDICT r3 item 6): the
    # checkpoint carries b0..b{n_bands-1} precomputed, so neither self-join
    # side re-hashes the signature columns downstream.
    tok = (
        shingle_base_hashes(df, shingle_n, id_col, text_col)
        if hash_fn == "xxhash64"  # md5 needs the strings (portable hashes)
        else shingles_distinct(df, shingle_n, id_col, text_col)
    )
    sig = _band_columns(
        minhash_signatures(tok, n_hashes, id_col, hash_fn),
        n_hashes,
        n_bands,
        hash_fn,
    )
    sig = materialize(sig)

    # Candidate generation over NARROW rows only — (doc_id, band, sig) is
    # ~24 B/row where carrying all n_hashes signature columns through the
    # band-exploded self-join would be ~8·n_hashes B/row × n_bands replicas.
    # The wide signatures re-join per UNIQUE candidate pair afterwards.
    bands = _band_rows(sig, n_bands, id_col, id_col)

    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )

    sig_a = sig.select(
        F.col(id_col).alias("doc_a"), *[F.col(f"h{i}").alias(f"_a{i}") for i in range(n_hashes)]
    )
    sig_b = sig.select(
        F.col(id_col).alias("doc_b"), *[F.col(f"h{i}").alias(f"_b{i}") for i in range(n_hashes)]
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select("doc_a", "doc_b", (agree / F.lit(float(n_hashes))).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= tau)
    )


def minhash_linkage_pairs(
    left: DataFrame,
    right: DataFrame,
    tau: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Cross-corpus record linkage: (left_id, right_id, est_jaccard ≥ tau)
    pairs between TWO datasets — entity resolution / near-dup linking
    across snapshots, as opposed to self-dedup (minhash_candidate_pairs).

    Same LSH shape and scale behavior: each side is signed independently
    (linear), candidates come from an equi-join of the two narrow
    (id, band, sig) tables — never a cross product — and similarity is
    estimated from signatures. Sides can differ in size arbitrarily; if
    one is small its band table broadcasts. ``hash_fn="md5"`` makes the
    whole pipeline portable-hash-reproducible (exact oracle)."""
    def sign(df: DataFrame) -> DataFrame:
        # band columns fused into the checkpointed pass, as in
        # minhash_candidate_pairs
        tok = (
            shingle_base_hashes(df, shingle_n, id_col, text_col)
            if hash_fn == "xxhash64"
            else shingles_distinct(df, shingle_n, id_col, text_col)
        )
        return materialize(
            _band_columns(
                minhash_signatures(tok, n_hashes, id_col, hash_fn),
                n_hashes,
                n_bands,
                hash_fn,
            )
        )

    sig_l, sig_r = sign(left), sign(right)
    cand = (
        _band_rows(sig_l, n_bands, id_col, "left_id")
        .join(_band_rows(sig_r, n_bands, id_col, "right_id"), ["band", "sig"])
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    wide_l = sig_l.select(
        F.col(id_col).alias("left_id"), *[F.col(f"h{i}").alias(f"_a{i}") for i in range(n_hashes)]
    )
    wide_r = sig_r.select(
        F.col(id_col).alias("right_id"), *[F.col(f"h{i}").alias(f"_b{i}") for i in range(n_hashes)]
    )
    agree = sum(
        F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return (
        cand.join(wide_l, "left_id")
        .join(wide_r, "right_id")
        .select(
            "left_id", "right_id", (agree / F.lit(float(n_hashes))).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= tau)
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Group near-dup candidate pairs into clusters: (node, comp) where comp
    is the minimum node id reachable — the step between pair generation and
    "keep one doc per duplicate cluster".

    Hash-min label propagation: each iteration every node takes the min of
    its own label and its neighbors' labels (one join + one groupBy-min),
    converging in O(graph diameter) rounds — near-dup clusters are
    star/clique-shaped, so diameter is tiny in practice. The driver-side
    loop is inherent to iterative graph algorithms on Spark (GraphFrames'
    CC has the same shape), but the convergence check is FREE: the
    changed-label count rides the round's own materialization action as an
    ``Observation`` metric (old labels joined in, ``sum(changed)``
    observed), so each round submits exactly ONE job — no separate
    ``count()`` probe — while still testing exact convergence every round.
    Per-round materialization (reliable ``checkpoint()`` when a dir is
    configured, else ``localCheckpoint`` — operators/materialize.py)
    truncates lineage so plans don't grow per round and rounds survive
    executor loss on a cluster; both paths populate the observation (see
    tests/test_dedup.py).
    """
    from pyspark.sql import Observation

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    edges = materialize(edges)
    labels = (
        edges.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "comp")
        )
        fold = (
            labels.unionByName(nbr_min).groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # every node appears in the previous labels, so the inner join is
        # row-preserving; the observed metric folds the convergence test
        # into the materialization job below.
        obs = Observation()
        new_labels = (
            fold.alias("n")
            .join(labels.alias("o"), "node")
            .select(
                "node",
                F.col("n.comp").alias("comp"),
                (F.col("n.comp") != F.col("o.comp")).cast("int").alias("_chg"),
            )
            .observe(obs, F.coalesce(F.sum("_chg"), F.lit(0)).alias("changed"))
            .drop("_chg")
        )
        labels = materialize(new_labels)
        # bounded wait (ADVICE r7): fails loudly instead of hanging if
        # materialize() ever stops running a listener-visible action
        if int(observed_metric(obs, "changed")) == 0:
            break
    return labels


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc: sign of the per-bit sum of ±1 contributions from
    each distinct trigram-shingle's hash bits. Near-dups differ in few
    bits → bucket by bit-ranges, compare Hamming distance within buckets.
    ``hash_fn="md5"`` uses the 60-bit portable hash (pass n_bits=60) so an
    external engine can recompute signatures exactly."""
    if hash_fn == "md5":
        tok = shingles_distinct(df, 3, id_col, text_col).withColumn(
            "th", portable_hash64(F.col("token"), 0)
        )
    else:
        tok = shingles_distinct(df, 3, id_col, text_col).withColumn("th", F.xxhash64("token"))
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(n_bits)
        ]
    )
    sig = bit_sums.select(
        id_col,
        sum(
            (F.when(F.col(f"b{i}") > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << i))
            for i in range(n_bits - 1)  # top bit left clear: keep the long positive
        ).alias("simhash"),
    )
    return sig


def incremental_minhash_candidates(
    corpus: DataFrame,
    batch: DataFrame,
    tau: float = 0.6,
    n_hashes: int = 32,
    n_bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    corpus_sig: DataFrame | None = None,
    batch_sig: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental LSH dedup: near-dup candidates TOUCHING A NEW BATCH —
    batch×corpus plus batch-internal pairs — without ever re-pairing the
    existing corpus against itself. This is the arrival-time shape of
    ``minhash_candidate_pairs``: a full pass is O(corpus) once, then each
    new batch costs O(batch) signature work plus a band equi-join whose
    output is proportional to the batch's collisions, never corpus².

    ``corpus_sig``: the PERSISTED signature+band table from the last full
    pass (the ``bands=`` reuse idiom of band_health) — pass it in
    production so corpus signatures are never recomputed; when None (the
    fixture path, no state store) it is rebuilt here. Signatures must
    share the scheme tag (see MINHASH_SCHEME_*).

    ``max_bucket``: the HOT-BAND guard (the stop-hub/stop-shingle cap
    applied to LSH): a band bucket collapsed by boilerplate (thousands of
    docs sharing one band signature) fans the candidate join out to
    |batch∩bucket|·|bucket| pairs that carry ~no per-pair signal — true
    near-dups still collide in their other, non-degenerate bands. When
    set, buckets whose corpus+batch population exceeds the cap are
    dropped from candidate generation on BOTH join legs (hot buckets are
    few, so the drop list broadcasts). Default None keeps exact
    uncapped semantics (the oracle-checked path);
    tools/skew_stress.py measures the fan-out reduction under a planted
    hot band.

    Returns (doc_a, doc_b, est_jaccard, pair_kind) with doc_a < doc_b and
    pair_kind ∈ {'new_vs_corpus', 'new_vs_new'}.
    """
    def sigs(df: DataFrame) -> DataFrame:
        tok = (
            shingle_base_hashes(df, shingle_n, id_col, text_col)
            if hash_fn == "xxhash64"
            else shingles_distinct(df, shingle_n, id_col, text_col)
        )
        return materialize(
            _band_columns(
                minhash_signatures(tok, n_hashes, id_col, hash_fn),
                n_hashes,
                n_bands,
                hash_fn,
            )
        )

    sig_c = corpus_sig if corpus_sig is not None else sigs(corpus)
    # ``batch_sig``: same reuse idiom as corpus_sig for callers that
    # already hold the batch's signature+band rows (e.g. one shared
    # signature build split by membership) — signatures are a pure
    # per-document function, so a slice of a shared build is identical
    # to a fresh build over the slice.
    sig_b = batch_sig if batch_sig is not None else sigs(batch)
    bands_c = _band_rows(sig_c, n_bands, id_col, id_col)
    bands_b = _band_rows(sig_b, n_bands, id_col, id_col)

    if max_bucket is not None:
        hot = (
            bands_b.select("band", "sig")
            .unionByName(bands_c.select("band", "sig"))
            .groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("s"))
            .filter(F.col("s") > max_bucket)
            .select("band", "sig")
        )
        bands_b = bands_b.join(F.broadcast(hot), ["band", "sig"], "left_anti")
        bands_c = bands_c.join(F.broadcast(hot), ["band", "sig"], "left_anti")

    nb, cb = bands_b.alias("nb"), bands_c.alias("cb")
    cand_nc = (
        nb.join(
            cb,
            (F.col("nb.band") == F.col("cb.band"))
            & (F.col("nb.sig") == F.col("cb.sig")),
        )
        .select(
            F.least(F.col(f"nb.{id_col}"), F.col(f"cb.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"nb.{id_col}"), F.col(f"cb.{id_col}")).alias("doc_b"),
            F.lit("new_vs_corpus").alias("pair_kind"),
        )
    )
    x, y = bands_b.alias("x"), bands_b.alias("y")
    cand_nn = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.lit("new_vs_new").alias("pair_kind"),
        )
    )
    # Deterministic pair_kind: a pair that arises under BOTH join legs (a
    # re-crawled id sits in the batch and the persisted corpus) must not let
    # dropDuplicates pick the kind nondeterministically — dedup the bare
    # pairs first, then derive the kind from batch-id membership: both ends
    # in the batch => new_vs_new, else new_vs_corpus.
    batch_ids = sig_b.select(id_col).distinct()
    cand = (
        cand_nc.unionByName(cand_nn)
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .join(
            batch_ids.select(F.col(id_col).alias("_ba")),
            F.col("doc_a") == F.col("_ba"),
            "left",
        )
        .join(
            batch_ids.select(F.col(id_col).alias("_bb")),
            F.col("doc_b") == F.col("_bb"),
            "left",
        )
        .select(
            "doc_a",
            "doc_b",
            F.when(
                F.col("_ba").isNotNull() & F.col("_bb").isNotNull(),
                F.lit("new_vs_new"),
            )
            .otherwise(F.lit("new_vs_corpus"))
            .alias("pair_kind"),
        )
    )

    # One signature row per id, preferring the batch's (fresher) signature:
    # a re-crawled id present on both sides would otherwise fan the scoring
    # joins out to duplicate (doc_a, doc_b) rows with mixed old/new scores.
    sig_all = sig_b.unionByName(sig_c.join(batch_ids, id_col, "left_anti"))
    agree = sum(
        F.when(F.col(f"a.h{i}") == F.col(f"b.h{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    scored = (
        cand.join(sig_all.alias("a"), F.col("doc_a") == F.col(f"a.{id_col}"))
        .join(sig_all.alias("b"), F.col("doc_b") == F.col(f"b.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            "pair_kind",
            (agree / F.lit(float(n_hashes))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= tau)
    )
    return scored
