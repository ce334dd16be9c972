"""Round-12 additions: trained quality classifier (SURVEY.md §2.J
curation family).

The curation stack's quality gates so far are heuristic (length/stopword
ratios, LM NLL) or generative (DSIR's importance ratio). Production
pipelines (CCNet, the GPT-3 WebText filter, FineWeb) add a DISCRIMINATIVE
stage: a linear classifier on hashed n-gram features trained to separate
a curated slice from the crawl, whose scores gate or re-weight documents.
These keys train exactly that — batch gradient descent on logistic loss,
3 synchronous rounds in integer fixed point (the pagerank/kmeans idiom:
floor after the one transcendental per round), so the DuckDB oracle
unrolls the training as CTEs and every weight, score and accuracy
hash-matches bit-for-bit.

Two modelling choices carry the scale story:

- Features are hashed uni+bigram counts over B = 256 buckets (the DSIR
  featurizer) CENTERED by the per-bucket corpus mean. Raw counts share a
  document-length common mode — every bucket correlates with length, the
  batch gradient points down that one axis, and training crawls (measured:
  stuck within 0.07 of the base rate after 10 sweeps). Centering removes
  the common mode for the cost of ONE extra B-row aggregate; accuracy then
  climbs 0.50 → 0.74 → 0.86 in three sweeps.
- The checked label is a marker-DENSITY gate (documents whose marker-token
  count crosses a threshold, the keyword/boilerplate-density special case
  of a quality filter) because the fixture corpus is synthetic i.i.d. text
  over one shared 31-token vocabulary — there is no latent style signal
  for ANY text classifier to find (measured: language labels sit exactly
  at the base rate at every step size). The training machinery is
  label-agnostic; a real deployment feeds curated-vs-crawl labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.materialize import materialize
from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.queries.selection_extra import (
    _DSIR_B,
    _DSIR_SEED,
    _dsir_doc_buckets,
)
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

_QC_ROUNDS = 3
# step = floor(grad_sum / (n_docs * _QC_LR_DEN)); 500 keeps the 3-sweep
# curve monotone (smaller denominators overshoot into oscillation)
_QC_LR_DEN = 500
_QC_MARKER = "data"  # marker token; label = count(marker) >= _QC_MIN_HITS
_QC_MIN_HITS = 2  # ~50% of fixture docs — a balanced target


def _qc_sql_parts(pfx: str = "") -> str:
    """Shared training CTEs, mirroring the Spark loop step for step:
    docf (hashed bucket counts), means (per-bucket corpus mean, milli),
    dense (centered milli features + bias row per doc), lab, n,
    w0..w{R} (unrolled GD rounds; nano-unit logits = milli features x
    micro weights). The only transcendental is exp() inside the sigmoid,
    floored to micro units immediately (house determinism rule).
    ``pfx`` prefixes every CTE name so the chain can compose into a WITH
    that already binds bi/feats/docf (the v8 pipeline oracle)."""
    p = pfx
    steps = []
    for r in range(1, _QC_ROUNDS + 1):
        steps.append(f"""
{p}s{r} AS (SELECT d.doc_id, sum(d.v * w.w)::BIGINT AS s
         FROM {p}dense d JOIN {p}w{r - 1} w ON w.f = d.f GROUP BY 1),
{p}p{r} AS (SELECT s.doc_id,
                (l.y * 1000000
                 - floor(1000000.0
                         / (1.0 + exp(-(s.s / 1000000000.0)))))::BIGINT
                  AS resid
         FROM {p}s{r} s JOIN {p}lab l ON l.doc_id = s.doc_id),
{p}g{r} AS (SELECT d.f, sum(p.resid * d.v)::BIGINT AS g
         FROM {p}dense d JOIN {p}p{r} p ON p.doc_id = d.doc_id GROUP BY 1),
{p}w{r} AS (SELECT w.f,
                (w.w + floor(coalesce(g.g, 0)
                             / ((SELECT n FROM {p}n) * {_QC_LR_DEN}.0)))::BIGINT
                  AS w
         FROM {p}w{r - 1} w LEFT JOIN {p}g{r} g ON g.f = w.f)""")
    rounds = ",".join(steps)
    return f"""{pfx}words AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
{pfx}bi AS (
  SELECT a.doc_id, a.tok || ' ' || b.tok AS feat
  FROM {pfx}words a JOIN {pfx}words b
    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
{pfx}feats AS (
  SELECT doc_id, tok AS feat FROM {pfx}words
  UNION ALL SELECT doc_id, feat FROM {pfx}bi),
{pfx}docf AS (
  SELECT doc_id,
         ('0x' || substring(md5('{_DSIR_SEED}:' || feat), 1, 15))::BIGINT
           % {_DSIR_B} AS f,
         count(*)::BIGINT AS c
  FROM {pfx}feats GROUP BY 1, 2),
{pfx}n AS (SELECT count(*)::BIGINT AS n FROM documents),
{pfx}means AS (SELECT f, floor(sum(c) * 1000.0 / (SELECT n FROM {pfx}n))::BIGINT AS m
          FROM {pfx}docf GROUP BY 1),
{pfx}dense AS (
  SELECT d.doc_id, mn.f,
         (coalesce(df.c, 0) * 1000 - mn.m)::BIGINT AS v
  FROM documents d
  CROSS JOIN {pfx}means mn
  LEFT JOIN {pfx}docf df ON df.doc_id = d.doc_id AND df.f = mn.f
  UNION ALL
  SELECT doc_id, -1::BIGINT AS f, 1000::BIGINT AS v FROM documents),
{pfx}lab AS (SELECT doc_id, source,
               CASE WHEN len(list_filter(string_split(text, ' '),
                                         x -> x = '{_QC_MARKER}'))
                         >= {_QC_MIN_HITS}
                    THEN 1 ELSE 0 END AS y
        FROM documents),
{pfx}w0 AS (SELECT f, 0::BIGINT AS w FROM {pfx}means
       UNION ALL SELECT -1::BIGINT, 0::BIGINT),
{rounds}"""


def _qc_featurize(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Featurizer stage shared by the batch trainer and the streaming
    feature sink (streaming/runtime.run_classifier_model_sink): hashed
    uni+bigram bucket counts (doc_id, f, c) plus the marker-density label
    frame (doc_id, source, y). Pure per-document map — no cross-document
    state — so disjoint micro-batches featurized independently union to
    exactly the one-pass result."""
    docf = _dsir_doc_buckets(d).select("doc_id", "f", "c")
    lab = d.select(
        "doc_id",
        "source",
        F.when(
            F.size(
                F.filter(
                    F.split("text", " "), lambda x: x == F.lit(_QC_MARKER)
                )
            )
            >= _QC_MIN_HITS,
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    return docf, lab


def _qc_train(spark: SparkSession, d: DataFrame):
    """Shared trainer: returns (dense, lab, n, weights, per-round scores).
    Composition of :func:`_qc_featurize` and :func:`_qc_train_from` so the
    streaming feature-store path trains with bit-identical arithmetic."""
    docf, lab = _qc_featurize(d)
    return _qc_train_from(spark, docf, lab)


def _qc_score_frame(darr: DataFrame, w_list) -> DataFrame:
    """Map-only model scoring over the per-doc feature vectors: one
    exact int64 dot per document against the closure-held weight
    vector — no join, no shuffle (guide §4.2)."""
    import numpy as np

    from hawaiidatapipeline_spark.queries.emb_extra import _np_stack

    spark = darr.sparkSession
    bc = spark.sparkContext.broadcast(np.array(w_list, dtype=np.int64))

    def part(it):
        import pandas as pd

        w = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            V = _np_stack(pdf["varr"])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "s": V @ w}
            )

    return darr.select("doc_id", "varr").mapInPandas(
        part, "doc_id bigint, s bigint"
    )


def _qc_train_from(spark: SparkSession, docf: DataFrame, lab: DataFrame):
    """Trainer over featurized inputs: returns (dense, lab, n, weights,
    per-round scores). The docs x (B + 1) centered milli feature rows
    live as ONE (doc_id, y, varr) vector frame, materialized once from
    the sparse featurizer output with a single doc-keyed exchange; each
    GD round is then ONE map-only ArrowEval job — per task an exact
    int64 matmul scores the batch, the libm sigmoid residual is floored
    to micro units per doc, and only the <= B + 1 per-task gradient
    partials cross an exchange before the driver takes the floor-of-
    double step (guide §4.2/§5; the old form paid a docs x B join +
    doc-keyed aggregate + f-keyed aggregate shuffle per round). The
    weight vector round-trips as a <= B + 1-row local relation — the
    same rows F.broadcast(w) always pulled through the driver. ``dense``
    and the per-round score frames are map-only projections of the
    vector frame with bit-identical rows, so every consumer (scores
    key, AUC, the v8 gate, the streaming curve) reads the exact values
    the old join form produced. The sigmoid is the single
    transcendental, evaluated with C libm ``math.exp`` per doc — the
    same libm the DuckDB oracle calls (numpy's SIMD exp is deliberately
    NOT used: it can differ by 1 ulp)."""
    import math

    import numpy as np

    docf = materialize(docf)
    lab = materialize(lab)
    n = lab.count()
    # per-bucket corpus means: B rows — collected once, reused for the
    # vector build, the w0 feature list, and the returned dense mapping
    means_rows = sorted(
        (int(r["f"]), math.floor(int(r["s"]) * 1000.0 / float(n)))
        for r in docf.groupBy("f")
        .agg(F.sum("c").cast("long").alias("s"))
        .collect()
    )
    feats = [f for f, _ in means_rows] + [-1]
    f_pos = {f: i for i, f in enumerate(feats)}
    base_vec = np.array(
        [-m for _, m in means_rows] + [1000], dtype=np.int64
    )  # v(f) = 0*1000 - m; bias slot fixed at 1000
    pos_bc = spark.sparkContext.broadcast((dict(f_pos), base_vec))

    def build(it):
        import pandas as pd

        f_pos_l, base = pos_bc.value
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for fs, cs in zip(pdf["_fs"], pdf["_cs"]):
                v = base.copy()
                if fs is not None and len(fs):
                    for f, c in zip(fs, cs):
                        v[f_pos_l[int(f)]] += int(c) * 1000
                rows.append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "y": pdf["y"].values,
                    "varr": rows,
                }
            )

    sparse = docf.groupBy("doc_id").agg(
        F.collect_list("f").alias("_fs"), F.collect_list("c").alias("_cs")
    )
    darr = materialize(
        lab.select("doc_id", "y")
        .join(sparse, "doc_id", "left")
        .mapInPandas(build, "doc_id bigint, y bigint, varr array<bigint>")
    )
    # returned dense: the exploded (doc_id, f, v) projection of the
    # vector frame — map-only per consumer, bit-identical rows
    feats_lit = F.array(*[F.lit(int(f)).cast("long") for f in feats])
    dense = (
        darr.select("doc_id", F.posexplode("varr").alias("_i", "v"))
        .select(
            "doc_id",
            F.element_at(feats_lit, F.col("_i") + 1).alias("f"),
            "v",
        )
    )
    w_np = np.zeros(len(feats), dtype=np.int64)
    den = float(n * _QC_LR_DEN)
    scores = []
    for _ in range(_QC_ROUNDS):
        scores.append(_qc_score_frame(darr, list(w_np)))
        w_bc = spark.sparkContext.broadcast(w_np.copy())

        def grad_part(it):
            import pandas as pd

            w = w_bc.value
            acc = None
            for pdf in it:
                if not len(pdf):
                    continue
                from hawaiidatapipeline_spark.queries.emb_extra import (
                    _np_stack,
                )

                V = _np_stack(pdf["varr"])
                s = V @ w
                # per-doc libm sigmoid, floored to micro units — the
                # expression F.floor(1e6 / (1 + exp(-(s/1e9)))) verbatim
                sig = np.fromiter(
                    (
                        math.floor(
                            1000000.0 / (1.0 + math.exp(-(x / 1000000000.0)))
                        )
                        for x in s
                    ),
                    dtype=np.int64,
                    count=len(s),
                )
                resid = pdf["y"].values * 1000000 - sig
                g = resid @ V
                acc = g if acc is None else acc + g
            if acc is not None:
                yield pd.DataFrame(
                    {"i": np.arange(len(acc), dtype=np.int64), "g": acc}
                )

        grad_rows = (
            darr.select("y", "varr")
            .mapInPandas(grad_part, "i bigint, g bigint")
            .groupBy("i")
            .agg(F.sum("g").cast("long").alias("g"))
            .collect()
        )
        grads = {int(r["i"]): int(r["g"]) for r in grad_rows}
        w_np = w_np + np.array(
            [math.floor(grads.get(i, 0) / den) for i in range(len(feats))],
            dtype=np.int64,
        )
    w = spark.createDataFrame(
        [(int(f), int(w_np[i])) for i, f in enumerate(feats)],
        "f bigint, w bigint",
    )
    return dense, lab, n, w, scores


@q(
    "llm_quality_classifier_train",
    f"""WITH {_qc_sql_parts()},
       acc AS (
         {" UNION ALL ".join(
             f'''SELECT {r} AS round,
                 sum(CASE WHEN (s.s >= 0) = (l.y = 1) THEN 1 ELSE 0 END)::BIGINT
                   AS n_correct,
                 count(*)::BIGINT AS n_docs,
                 floor(sum(CASE WHEN (s.s >= 0) = (l.y = 1) THEN 1 ELSE 0 END)
                       * 1000000.0 / count(*))::BIGINT AS accuracy_micro
             FROM s{r} s JOIN lab l ON l.doc_id = s.doc_id'''
             for r in range(1, _QC_ROUNDS + 1))}
       )
       SELECT round, n_correct, n_docs, accuracy_micro
       FROM acc ORDER BY round""",
)
def llm_quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier training curve: logistic regression on hashed
    uni+bigram features (the DSIR featurizer, B = 256 buckets, CENTERED
    by the per-bucket corpus mean — see the module docstring for why raw
    counts stall) with a bias term, trained with 3 synchronous batch-GD
    rounds in exact integer fixed point. The label is the marker-density
    gate (count(marker) >= 2, ~50% of the fixture). Reports per round
    the training-set accuracy at threshold 0.5 (equivalently logit >= 0,
    so the eval needs NO transcendental); the round-r score uses the
    round-(r-1) weights, so round 1 is the all-zero model (base rate)
    and the curve shows what each sweep buys — 0.50 -> 0.74 -> 0.86 on
    the fixture. Per round: one broadcast of the <= B+1-row weight
    vector against the docs x B dense frame, one doc-keyed logit agg,
    one f-keyed gradient agg — two linear passes, the distributed
    batch-GD shape at any corpus size. The sigmoid is the single
    transcendental, floored to micro units immediately (both engines
    share libm — the DSIR lam_micro precedent), so the oracle unrolls
    the rounds as CTEs and hash-matches every weight and count."""
    d = load_table(spark, sf_dir, "documents")
    _, lab, _, _, scores = _qc_train(spark, d)
    return _qc_curve(lab, scores)


def _qc_curve(lab: DataFrame, scores: list[DataFrame]) -> DataFrame:
    """Per-round training-set accuracy frame (round, n_correct, n_docs,
    accuracy_micro) — shared by the batch key and the streaming
    feature-store twin (streaming/runtime.classifier_training_curve)."""
    out = None
    for r, s in enumerate(scores, start=1):
        leg = (
            s.join(lab, "doc_id")
            .agg(
                F.sum(
                    F.when((F.col("s") >= 0) == (F.col("y") == 1), 1).otherwise(
                        0
                    )
                )
                .cast("long")
                .alias("n_correct"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
            )
            .select(
                F.lit(r).alias("round"),
                "n_correct",
                "n_docs",
                F.floor(F.col("n_correct") * 1000000.0 / F.col("n_docs"))
                .cast("long")
                .alias("accuracy_micro"),
            )
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("round")


@q(
    "llm_quality_classifier_scores",
    f"""WITH {_qc_sql_parts()},
       sf AS (SELECT d.doc_id, sum(d.v * w.w)::BIGINT AS s
              FROM dense d JOIN w{_QC_ROUNDS} w ON w.f = d.f GROUP BY 1)
       SELECT s.doc_id, l.source, l.y AS label, s.s AS score_nano,
              floor(1000000.0 / (1.0 + exp(-(s.s / 1000000000.0))))::BIGINT
                AS prob_micro
       FROM sf s JOIN lab l ON l.doc_id = s.doc_id
       ORDER BY s.s DESC, s.doc_id LIMIT 30""",
)
def llm_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final-model document scores — the gate the classifier actually
    runs in a pipeline: top-30 documents by the trained (3-round) model's
    logit, with the micro-unit sigmoid probability. Scoring is the
    broadcast-join + doc-agg read path (model <= B+1 rows at any corpus
    size); thresholding this score IS the CCNet-style quality gate, and
    the label column makes precision-at-top inspectable. Shares the
    unrolled training CTEs with llm_quality_classifier_train."""
    d = load_table(spark, sf_dir, "documents")
    dense, lab, _, w, _ = _qc_train(spark, d)
    sf = (
        dense.join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v") * F.col("w")).cast("long").alias("score_nano"))
    )
    return (
        sf.join(lab, "doc_id")
        .select(
            "doc_id",
            "source",
            F.col("y").alias("label"),
            "score_nano",
            F.floor(
                1000000.0
                / (1.0 + F.exp(-(F.col("score_nano") / 1000000000.0)))
            )
            .cast("long")
            .alias("prob_micro"),
        )
        .orderBy(F.col("score_nano").desc(), "doc_id")
        .limit(30)
    )


# ---------------------------------------------------------------- k-means||

_KSC_L = 8  # oversampling factor per round (expected new candidates)
_KSC_ROUNDS = 2
_KSC_SEED = 900  # per-round u = portable_hash64(vec_id, _KSC_SEED + r) % 2^50
_KSC_K = 4  # final centers (matches the fixture coarse-quantizer floor)
_P50 = 1 << 50


def _ksc_sql() -> str:
    """Unrolled k-means|| CTEs: per round r, phi{r-1} = Σ min-d², the
    hashed-Bernoulli candidate draw n{r} (kept iff u·φ < l·d²·2^50 —
    HUGEINT products, exact), and the min-distance fold m{r}; then the
    weighted candidate-grain reclustering p1..p{K} (greedy weighted
    farthest-first, ties → min id)."""
    parts = [f"""qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
c0 AS (SELECT min(vec_id)::BIGINT AS cid FROM qv),
m0 AS (SELECT v.vec_id, sum((v.q - c.q) * (v.q - c.q))::BIGINT AS m
       FROM qv v JOIN qv c ON c.d = v.d AND c.vec_id = (SELECT cid FROM c0)
       GROUP BY 1)"""]
    for r in range(1, _KSC_ROUNDS + 1):
        parts.append(f"""phi{r - 1} AS (SELECT sum(m)::BIGINT AS phi FROM m{r - 1}),
n{r} AS (SELECT vec_id FROM m{r - 1}
         WHERE (('0x' || substring(md5('{_KSC_SEED + r}:' || vec_id::VARCHAR),
                                   1, 15))::BIGINT % {_P50})::HUGEINT
                 * (SELECT phi FROM phi{r - 1})
               < {_KSC_L}::HUGEINT * m * {_P50}),
d{r} AS (SELECT p.vec_id, min(x.d2) AS dn FROM (
           SELECT p.vec_id AS pv, c.vec_id AS cv,
                  sum((p.q - c.q) * (p.q - c.q))::BIGINT AS d2
           FROM qv p JOIN qv c ON c.d = p.d
           JOIN n{r} s ON s.vec_id = c.vec_id
           GROUP BY 1, 2) x
         JOIN m{r - 1} p ON p.vec_id = x.pv GROUP BY 1),
m{r} AS (SELECT m.vec_id, least(m.m, coalesce(d.dn, m.m))::BIGINT AS m
         FROM m{r - 1} m LEFT JOIN d{r} d ON d.vec_id = m.vec_id)""")
    union_n = " UNION SELECT vec_id FROM ".join(
        f"n{r}" for r in range(1, _KSC_ROUNDS + 1)
    )
    parts.append(f"""cand AS (SELECT cid FROM c0
        UNION SELECT vec_id FROM {union_n}),
xd AS (SELECT v.vec_id, c.vec_id AS cid,
              sum((v.q - c.q) * (v.q - c.q))::BIGINT AS d2
       FROM qv v JOIN qv c ON c.d = v.d
       JOIN cand x ON x.cid = c.vec_id GROUP BY 1, 2),
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY d2, cid) AS rn
          FROM xd) t WHERE rn = 1),
wts AS (SELECT cid, count(*)::BIGINT AS w FROM asg GROUP BY 1),
cd AS (SELECT a.vec_id AS ca, b.vec_id AS cb,
              sum((a.q - b.q) * (a.q - b.q))::BIGINT AS d2
       FROM qv a JOIN qv b ON b.d = a.d
       JOIN cand x ON x.cid = a.vec_id
       JOIN cand y ON y.cid = b.vec_id GROUP BY 1, 2),
p1 AS (SELECT cid, w FROM wts ORDER BY w DESC, cid LIMIT 1),
md1 AS (SELECT w.cid, w.w, cd.d2 AS mind
        FROM wts w JOIN cd ON cd.ca = w.cid
                          AND cd.cb = (SELECT cid FROM p1))""")
    for k in range(2, _KSC_K + 1):
        excl = " AND ".join(
            f"cid <> (SELECT cid FROM p{j})" for j in range(1, k)
        )
        parts.append(f"""p{k} AS (SELECT cid, w, mind FROM md{k - 1}
        WHERE {excl}
        ORDER BY w * mind DESC, cid LIMIT 1),
md{k} AS (SELECT m.cid, m.w, least(m.mind, cd.d2) AS mind
          FROM md{k - 1} m JOIN cd ON cd.ca = m.cid
                                  AND cd.cb = (SELECT cid FROM p{k}))""")
    legs = ["SELECT 0 AS pick, cid AS vec_id, w AS weight, 0::BIGINT AS wd2 FROM p1"]
    legs += [
        f"SELECT {k - 1}, cid, w, (w * mind)::BIGINT FROM p{k}"
        for k in range(2, _KSC_K + 1)
    ]
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL ".join(legs) + "\nORDER BY pick"
    )


@q("emb_kmeans_scalable_init", _ksc_sql())
def emb_kmeans_scalable_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means|| seeding (Bahmani et al. 2012) — the DISTRIBUTED init a
    production coarse-quantizer trainer runs at 10⁹ vectors, completing
    the seeding family next to emb_kmeanspp_init's sequential
    farthest-first: instead of K dependent corpus passes, each of
    {_KSC_ROUNDS} rounds draws ~l = {_KSC_L} candidates IN PARALLEL
    (point x kept iff u_x·φ < l·d²(x,C)·2^50, u_x a per-round 50-bit
    portable hash — the llm_dsir_sample reproducible-randomness idiom;
    the product comparison runs in DECIMAL(38,0)/HUGEINT so it is exact),
    folds the min-distance state with one candidate-set join, and
    finally RECLUSTERS the ~1+l·R candidates to K = {_KSC_K} centers at
    the candidate grain: weights = assignment counts, then greedy
    weighted farthest-first (argmax w·min-d², ties → min id) unrolled
    {_KSC_K} picks. Output: (pick, vec_id, weight, wd2). Scale: per
    round one broadcast of ~l candidate vectors against the corpus +
    one partial-agg fold — O(R) passes instead of k-means++'s O(K);
    the recluster is candidate-grain (tiny). All integer milli-unit
    arithmetic; the oracle unrolls rounds and picks as CTEs and
    matches bit-for-bit."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.queries.emb_extra import (
        _fold_d2,
        _quant_arrays,
    )

    qarr = _quant_arrays(spark, sf_dir)

    def dist_to_set(ids: DataFrame) -> DataFrame:
        # map-only fold against the broadcast candidate vectors (r14,
        # guide §2.4) — was a d-keyed join + (vec, cid) hash aggregate;
        # self-pairs (d2 = 0) are kept, exactly like the old join.
        row = F.broadcast(
            qarr.join(
                F.broadcast(ids.select(F.col("vec_id").alias("cid"))),
                F.col("vec_id") == F.col("cid"),
            ).agg(
                F.collect_list(
                    F.struct("cid", F.col("qarr").alias("carr"))
                ).alias("_cs")
            )
        )
        dex = (
            "transform(_cs, c -> struct(c.cid AS cid, "
            + _fold_d2("qarr", "c.carr")
            + " AS d2))"
        )
        return (
            qarr.crossJoin(row)
            .select("vec_id", F.explode(F.expr(dex)).alias("_s"))
            .select(
                "vec_id",
                F.col("_s.cid").alias("cid"),
                F.col("_s.d2").cast("long").alias("d2"),
            )
        )

    c0 = materialize(qarr.agg(F.min("vec_id").cast("long").alias("vec_id")))
    m = materialize(
        dist_to_set(c0).select("vec_id", F.col("d2").alias("m"))
    )
    cand_ids = c0
    for r in range(1, _KSC_ROUNDS + 1):
        phi = m.agg(F.sum("m").cast("long").alias("phi"))
        u = portable_hash64(F.col("vec_id").cast("string"), _KSC_SEED + r) % _P50
        new = materialize(
            m.crossJoin(F.broadcast(phi))
            .filter(
                u.cast("decimal(20,0)") * F.col("phi")
                < F.lit(_KSC_L).cast("decimal(20,0)") * F.col("m") * F.lit(_P50)
            )
            .select("vec_id")
        )
        dn = dist_to_set(new).groupBy("vec_id").agg(F.min("d2").alias("dn"))
        m = materialize(
            m.join(dn, "vec_id", "left").select(
                "vec_id",
                F.least(F.col("m"), F.coalesce("dn", "m")).cast("long").alias("m"),
            )
        )
        cand_ids = cand_ids.unionByName(new)
    cand_ids = materialize(cand_ids.distinct())
    # assignment counts: min_by struct argmin (one shuffle — was a
    # (vec, cid) window + a second groupBy exchange)
    xd = dist_to_set(cand_ids)
    wts_rows = (
        xd.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cid")).alias("_mn"))
        .groupBy(F.col("_mn.cid").alias("cid"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .collect()
    )
    # The recluster is candidate-grain (~1 + l·R ≈ 17 rows at ANY corpus
    # size) — the greedy weighted-farthest-first picks run on the driver
    # in exact Python ints (r14: was cd + 2·(K-1) + 2 more materialize
    # jobs over constant-sized frames). Same (w·mind DESC, cid) order.
    cvecs = {
        r["cid"]: list(r["qarr"])
        for r in qarr.join(
            F.broadcast(cand_ids.select(F.col("vec_id").alias("cid"))),
            F.col("vec_id") == F.col("cid"),
        )
        .select("cid", "qarr")
        .collect()
    }

    def d2(a: int, b: int) -> int:
        va, vb = cvecs[a], cvecs[b]
        return sum((x - y) * (x - y) for x, y in zip(va, vb))

    wts = {r["cid"]: r["w"] for r in wts_rows}
    p1 = min(wts, key=lambda c: (-wts[c], c))
    out_rows = [(0, p1, wts[p1], 0)]
    mind = {c: d2(c, p1) for c in wts if c != p1}
    for k in range(1, _KSC_K):
        if not mind:  # fewer weighted candidates than K: emit what exists
            break
        nxt = min(mind, key=lambda c: (-(wts[c] * mind[c]), c))
        out_rows.append((k, nxt, wts[nxt], wts[nxt] * mind[nxt]))
        del mind[nxt]
        for c in mind:
            mind[c] = min(mind[c], d2(c, nxt))
    return spark.createDataFrame(
        out_rows, "pick int, vec_id bigint, weight bigint, wd2 bigint"
    ).orderBy("pick")


# ------------------------------------------------------------------ DoReMi

_DM_ETA = 20.0  # multiplicative-weights step (exp(eta * excess_nats))
_DM_ROUNDS = 3


def _dm_sql() -> str:
    """Unrolled DoReMi CTEs: cnt/tokd (one linear pass), ceo (per-domain
    CE under its OWN add-1 unigram model — the static baseline), then per
    round: the weight-blended shared model (num/den), per-domain CE under
    it, excess = max(0, shared - own), exponentiated update + integer
    renormalize. ln/exp floored to micro units immediately."""
    parts = ["""cnt AS (
  SELECT source, tok, count(*)::BIGINT AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents) GROUP BY 1, 2),
tokd AS (SELECT source, sum(c)::BIGINT AS tokd FROM cnt GROUP BY 1),
v AS (SELECT count(DISTINCT tok)::BIGINT AS v FROM cnt),
dc AS (SELECT count(*)::BIGINT AS d FROM tokd),
ceo AS (
  SELECT c.source,
         floor(-sum(c.c * floor(ln((c.c + 1.0)
                                   / (t.tokd + (SELECT v FROM v)))
                                * 1000000)) * 1.0 / t.tokd)::BIGINT AS ceo
  FROM cnt c JOIN tokd t USING (source) GROUP BY c.source, t.tokd),
w0 AS (SELECT source,
              (1000000 // (SELECT d FROM dc))::BIGINT AS w FROM tokd)"""]
    for r in range(1, _DM_ROUNDS + 1):
        parts.append(f"""num{r} AS (
  SELECT c.tok, sum(w.w * c.c)::BIGINT AS num
  FROM cnt c JOIN w{r - 1} w USING (source) GROUP BY 1),
den{r} AS (SELECT sum(w.w * t.tokd)::BIGINT AS den
           FROM tokd t JOIN w{r - 1} w USING (source)),
lnp{r} AS (SELECT tok,
                  floor(ln((num + 1.0)
                           / ((SELECT den FROM den{r}) + (SELECT v FROM v)))
                        * 1000000)::BIGINT AS lnp
           FROM num{r}),
ces{r} AS (
  SELECT c.source,
         floor(-sum(c.c * l.lnp) * 1.0 / t.tokd)::BIGINT AS ces
  FROM cnt c JOIN lnp{r} l USING (tok) JOIN tokd t USING (source)
  GROUP BY c.source, t.tokd),
ex{r} AS (SELECT s.source, greatest(0, s.ces - o.ceo)::BIGINT AS ex
          FROM ces{r} s JOIN ceo o USING (source)),
wp{r} AS (SELECT w.source,
                 floor(w.w * exp({_DM_ETA} * e.ex / 1000000.0))::BIGINT AS wp
          FROM w{r - 1} w JOIN ex{r} e USING (source)),
sw{r} AS (SELECT sum(wp)::BIGINT AS s FROM wp{r}),
w{r} AS (SELECT source,
                floor(wp * 1000000.0
                      / (SELECT s FROM sw{r}))::BIGINT AS w
         FROM wp{r})""")
    R = _DM_ROUNDS
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT w.source, w.w AS weight_micro, s.ces AS ce_shared_micro,
       o.ceo AS ce_own_micro, e.ex AS excess_micro
FROM w{R} w
JOIN ces{R} s USING (source)
JOIN ceo o USING (source)
JOIN ex{R} e USING (source)
ORDER BY w.w DESC, w.source"""
    )


@q("llm_doremi_mixture", _dm_sql())
def llm_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain mixture reweighting (Xie et al. 2023, the
    multiplicative-weights skeleton): domains = sources; per round the
    SHARED reference unigram model is refit as the current-weight blend
    of the per-domain token counts, each domain's excess loss = max(0,
    CE under the shared model − CE under its own model) is measured, and
    weights update w ∝ w·exp(η·excess) with an integer renormalize — so
    domains the blended model underserves get upweighted, and rounds
    genuinely interact through the refit (a static reference would make
    the loop one closed-form step). 3 unrolled rounds; output = final
    per-domain weight + the last round's CE/excess diagnostics. Scale:
    ONE linear token pass builds the (domain, token) count matrix;
    every round after that is domain/token-grain (D·V rows — constant in
    corpus size, broadcastable). Integer micro-unit fixed point; ln/exp
    floored immediately (lam_micro precedent), so the oracle unrolls the
    rounds and matches bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    cnt = materialize(
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tokd = materialize(
        cnt.groupBy("source").agg(F.sum("c").cast("long").alias("tokd"))
    )
    V = cnt.select("tok").distinct().count()
    D = tokd.count()
    ceo = materialize(
        cnt.join(tokd, "source")
        .withColumn(
            "lnp",
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("tokd") + F.lit(V)))
                * 1000000
            ).cast("long"),
        )
        .groupBy("source", "tokd")
        .agg(F.sum(F.col("c") * F.col("lnp")).alias("slnp"))
        .select(
            "source",
            F.floor(-F.col("slnp") * 1.0 / F.col("tokd"))
            .cast("long")
            .alias("ceo"),
        )
    )
    w = materialize(
        tokd.select("source").withColumn(
            "w", F.lit(10**6 // D).cast("long")
        )
    )
    ces = ex = None
    for _ in range(_DM_ROUNDS):
        num = cnt.join(F.broadcast(w), "source").groupBy("tok").agg(
            F.sum(F.col("w") * F.col("c")).cast("long").alias("num")
        )
        den = tokd.join(F.broadcast(w), "source").agg(
            F.sum(F.col("w") * F.col("tokd")).cast("long").alias("den")
        )
        lnp = num.crossJoin(F.broadcast(den)).select(
            "tok",
            F.floor(
                F.log((F.col("num") + 1.0) / (F.col("den") + F.lit(V)))
                * 1000000
            )
            .cast("long")
            .alias("lnp"),
        )
        ces = materialize(
            cnt.join(F.broadcast(lnp), "tok")
            .join(tokd, "source")
            .groupBy("source", "tokd")
            .agg(F.sum(F.col("c") * F.col("lnp")).alias("slnp"))
            .select(
                "source",
                F.floor(-F.col("slnp") * 1.0 / F.col("tokd"))
                .cast("long")
                .alias("ces"),
            )
        )
        ex = materialize(
            ces.join(ceo, "source").select(
                "source",
                F.greatest(F.lit(0), F.col("ces") - F.col("ceo"))
                .cast("long")
                .alias("ex"),
            )
        )
        wp = w.join(ex, "source").select(
            "source",
            F.floor(
                F.col("w") * F.exp(F.lit(_DM_ETA) * F.col("ex") / 1000000.0)
            )
            .cast("long")
            .alias("wp"),
        )
        sw = wp.agg(F.sum("wp").cast("long").alias("s"))
        w = materialize(
            wp.crossJoin(F.broadcast(sw)).select(
                "source",
                F.floor(F.col("wp") * 1000000.0 / F.col("s"))
                .cast("long")
                .alias("w"),
            )
        )
    return (
        w.select("source", F.col("w").alias("weight_micro"))
        .join(ces.select("source", F.col("ces").alias("ce_shared_micro")), "source")
        .join(ceo.select("source", F.col("ceo").alias("ce_own_micro")), "source")
        .join(ex.select("source", F.col("ex").alias("excess_micro")), "source")
        .orderBy(F.col("weight_micro").desc(), "source")
    )


# -------------------------------------------------------- sequence packing

_PK_CTX = 512  # context-window token budget
_PK_SEED = 903  # reproducible global-shuffle hash seed


@q(
    "llm_sequence_packing",
    f"""WITH d AS (
  SELECT doc_id,
         ('0x' || substring(md5('{_PK_SEED}:' || doc_id::VARCHAR),
                            1, 15))::BIGINT AS sh,
         len(string_split(text, ' '))::BIGINT AS tok
  FROM documents),
c AS (
  SELECT doc_id, tok,
         sum(tok) OVER (ORDER BY sh, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
  FROM d),
sp AS (
  SELECT doc_id, tok,
         ((cum - 1) // {_PK_CTX} - (cum - tok) // {_PK_CTX})::BIGINT AS spans
  FROM c),
n AS (SELECT count(*)::BIGINT AS n FROM sp)
SELECT spans, count(*)::BIGINT AS n_docs,
       sum(tok)::BIGINT AS n_tokens,
       floor(count(*) * 1000000.0 / (SELECT n FROM n))::BIGINT
         AS doc_share_micro
FROM sp GROUP BY spans ORDER BY spans""",
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence-packing audit — the fragmentation
    profile of the GPT-style packing step: documents are laid out in a
    REPRODUCIBLE global shuffle order (portable-hash key, the training
    shuffle every epoch pipeline runs), concatenated, and cut into
    {_PK_CTX}-token context windows; each document then spans
    (end_chunk - start_chunk) boundaries. The histogram by span count is
    the packing-quality table: spans = 0 documents sit whole inside one
    window, spans >= 1 are fragmented across attention boundaries — the
    share the loss masking / document-attention design has to care
    about. Scale: token counts are one narrow map; the running offset
    uses operators/ranks.partitioned_prefix_sums (range-repartition +
    local windows + one <= #partitions-row serial pass) — NO
    single-partition global window anywhere; the histogram grain is the
    span count (tiny). The oracle's plain windowed prefix sum is the
    fixture-tier mirror of the same total order."""
    from hawaiidatapipeline_spark.operators.dedup import portable_hash64
    from hawaiidatapipeline_spark.operators.ranks import (
        partitioned_prefix_sums,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        portable_hash64(F.col("doc_id").cast("string"), _PK_SEED).alias("sh"),
        F.size(F.split("text", " ")).cast("long").alias("tok"),
    )
    c = partitioned_prefix_sums(
        d, [F.col("sh"), F.col("doc_id")], {"cum": "tok"}
    )
    sp = c.select(
        "doc_id",
        "tok",
        (
            F.floor((F.col("cum") - 1) / _PK_CTX)
            - F.floor((F.col("cum") - F.col("tok")) / _PK_CTX)
        )
        .cast("long")
        .alias("spans"),
    )
    n = sp.count()
    return (
        sp.groupBy("spans")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "doc_share_micro",
            F.floor(F.col("n_docs") * 1000000.0 / F.lit(float(n)))
            .cast("long"),
        )
        .orderBy("spans")
    )


# ----------------------------------------------------------- effective rank


@q(
    "emb_effective_rank",
    """WITH vm AS (
  SELECT list_transform(embedding, e -> round(e * 1000)::BIGINT) AS vm
  FROM embeddings),
u AS (
  SELECT rid, unnest(vm) AS e,
         generate_subscripts(vm, 1) - 1 AS i
  FROM (SELECT vm, row_number() OVER () AS rid FROM vm)),
pairs AS (
  SELECT a.i AS i, b.i AS j, count(*)::BIGINT AS n,
         sum(a.e)::BIGINT AS sx, sum(b.e)::BIGINT AS sy,
         sum(a.e * b.e)::BIGINT AS sxy
  FROM u a JOIN u b ON a.rid = b.rid AND a.i <= b.i
  GROUP BY 1, 2),
cm AS (SELECT i, j,
         (n::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT)::BIGINT
           AS cov_mm FROM pairs),
agg AS (
  SELECT sum(CASE WHEN i = j THEN cov_mm END)::HUGEINT AS tr,
         (sum(CASE WHEN i = j THEN cov_mm::HUGEINT * cov_mm END)
          + 2 * sum(CASE WHEN i < j THEN cov_mm::HUGEINT * cov_mm END))
           AS frob2
  FROM cm)
SELECT (SELECT count(*) FROM embeddings)::BIGINT AS n_vectors,
       (SELECT max(len(vm)) FROM vm)::BIGINT AS dim,
       tr::BIGINT AS trace_mm,
       (tr * tr * 1000 // frob2)::BIGINT AS pr_milli
FROM agg""",
)
def emb_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective rank (participation ratio) of the embedding covariance:
    PR = (tr S)² / ||S||_F² = (Σλ)²/Σλ² — the embedding-COLLAPSE
    diagnostic (PR ≈ dim for isotropic embeddings, PR ≈ 1 when the
    space has collapsed onto one direction; a collapsed space silently
    breaks SemDeDup cells and IVF recall, so this is the health gate
    before any of them). Computed WITHOUT an eigensolve: trace and
    Frobenius norm come straight from the exact integer co-moment
    matrix n·Σxy − Σx·Σy (milli-unit values, the kmeans quantization),
    squares and the final ratio in DECIMAL(38,0)/HUGEINT with integral
    division — bit-identical across engines. Scale: the (i, j) pair
    expansion is IN-ARRAY per vector (the emb_covariance_topk trick) so
    the only shuffle is d²/2 partial-agg groups (d = 64 → 2,080 rows)
    regardless of N; everything after is matrix-grain."""
    e = load_table(spark, sf_dir, "embeddings")
    n_vec = e.count()
    vm = e.select(
        F.expr(
            "transform(embedding, x -> cast(round(x * 1000) AS bigint))"
        ).alias("vm")
    )
    pairs = vm.select(
        F.explode(
            F.expr(
                "flatten(transform(vm, (x, i) -> transform("
                "  slice(vm, i + 1, size(vm) - i),"
                "  (y, j) -> struct(cast(i AS bigint) AS i,"
                "                   cast(i + j AS bigint) AS j,"
                "                   x AS x, y AS y))))"
            )
        ).alias("p")
    ).select("p.*")
    cm = (
        pairs.groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
        .select(
            "i",
            "j",
            # Wide co-moment multiply (ADVICE r12): n*sxy alone exceeds
            # int64 around N >= ~3M vectors, where Spark (non-ANSI) wraps
            # silently but DuckDB raises — so both engines form the
            # product in DECIMAL(38,0)/HUGEINT, then narrow the CENTERED
            # co-moment. Exactness envelope: cov_mm (~ n^2 * 1e6) fits
            # int64 and frob2 (~ d * cov_mm^2) fits 38 digits up to
            # N ~= 3e6 vectors; past that, run PR on a corpus-scaled
            # subsample (the triplet-stride pattern) — the diagnostic is
            # a ratio and subsampling preserves it.
            (
                F.col("n").cast("decimal(38,0)") * F.col("sxy")
                - F.col("sx").cast("decimal(38,0)") * F.col("sy")
            )
            .cast("long")
            .alias("cov_mm"),
        )
    )
    dec = "decimal(38,0)"
    agg = cm.agg(
        F.sum(F.when(F.col("i") == F.col("j"), F.col("cov_mm")))
        .cast(dec)
        .alias("tr"),
        (
            F.sum(
                F.when(
                    F.col("i") == F.col("j"),
                    F.col("cov_mm").cast(dec) * F.col("cov_mm"),
                )
            )
            + 2
            * F.sum(
                F.when(
                    F.col("i") < F.col("j"),
                    F.col("cov_mm").cast(dec) * F.col("cov_mm"),
                )
            )
        )
        .cast(dec)
        .alias("frob2"),
    )
    dim = e.select(F.max(F.size("embedding")).alias("d")).collect()[0].d
    return agg.select(
        F.lit(n_vec).cast("long").alias("n_vectors"),
        F.lit(dim).cast("long").alias("dim"),
        F.col("tr").cast("long").alias("trace_mm"),
        F.expr(
            "CAST((tr * tr * 1000) div frob2 AS BIGINT)"
        ).alias("pr_milli"),
    )


# ----------------------------------------------------------- hard negatives


def _hn_sql() -> str:
    from hawaiidatapipeline_spark.queries.emb_extra import (
        _adc_stride_subquery,
    )

    return f"""WITH qv AS (
  SELECT vec_id, unnest(generate_series(0, len(embedding) - 1)) AS d,
         round(unnest(embedding) * 1000)::BIGINT AS q
  FROM embeddings),
src AS (SELECT e.vec_id, d.source
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
probes AS (SELECT * FROM qv
           WHERE vec_id % {_adc_stride_subquery()} = 0),
dist AS (
  SELECT p.vec_id AS probe_id, v.vec_id AS other_id,
         sum((p.q - v.q) * (p.q - v.q))::BIGINT AS d2
  FROM probes p JOIN qv v ON v.d = p.d
  WHERE v.vec_id <> p.vec_id
  GROUP BY 1, 2),
tagged AS (
  SELECT t.probe_id, sp.source AS probe_src, t.other_id,
         so.source AS other_src, t.d2,
         (sp.source = so.source) AS same_src
  FROM dist t
  JOIN src sp ON sp.vec_id = t.probe_id
  JOIN src so ON so.vec_id = t.other_id),
best AS (
  SELECT probe_id, probe_src, same_src, other_id, other_src, d2
  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id, same_src
                                     ORDER BY d2, other_id) AS rn
        FROM tagged) x WHERE rn = 1)
SELECT p.probe_id, p.probe_src,
       p.other_id AS pos_id, p.d2 AS pos_d2,
       n.other_id AS neg_id, n.other_src AS neg_src, n.d2 AS neg_d2,
       (n.d2 - p.d2)::BIGINT AS margin
FROM best p JOIN best n ON n.probe_id = p.probe_id
WHERE p.same_src AND NOT n.same_src
ORDER BY margin, p.probe_id LIMIT 20"""


@q("emb_triplet_margins", _hn_sql())
def emb_triplet_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-margin mining for embedding-model training — the MARGIN
    view emb_hard_negatives (top-5 similar different-label vectors)
    does not give: per
    corpus-scaled stride probe, the nearest SAME-source vector (the
    in-batch positive candidate) and the nearest DIFFERENT-source vector
    (the hard negative), with margin = neg_d² − pos_d². The 20 smallest
    margins are the hardest triplets — the ones that actually move a
    contrastive loss; a NEGATIVE margin flags a probe whose nearest
    neighbor crosses the source boundary (either a labeling problem or a
    genuinely hard case). Exact int64 milli-unit distances with
    (d², id) total orders; sources come from the documents table
    (vec_id = doc_id, the pipeline_demo join). Scale: the exact leg is
    probes × corpus with the probe set held at ~65 by the corpus-scaled
    _adc_stride (the recall-audit discipline); at production scale the
    same mining runs per ANN cell instead (cell-mates are the candidate
    pool), which this audits."""
    from hawaiidatapipeline_spark.queries.emb_extra import _adc_stride

    e = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = materialize(
        e.select("vec_id", F.posexplode("embedding").alias("d", "x")).select(
            "vec_id", "d", F.round(F.col("x") * 1000).cast("long").alias("q")
        )
    )
    src = e.select("vec_id").join(
        docs.select(F.col("doc_id").alias("vec_id"), "source"), "vec_id"
    )
    stride = _adc_stride(spark, sf_dir)
    probes = qv.filter(F.col("vec_id") % stride == 0)
    dist = (
        probes.alias("p")
        .join(qv.alias("v"), F.col("p.d") == F.col("v.d"))
        .filter(F.col("v.vec_id") != F.col("p.vec_id"))
        .groupBy(
            F.col("p.vec_id").alias("probe_id"),
            F.col("v.vec_id").alias("other_id"),
        )
        .agg(
            F.sum(
                (F.col("p.q") - F.col("v.q")) * (F.col("p.q") - F.col("v.q"))
            )
            .cast("long")
            .alias("d2")
        )
    )
    sp = src.select(F.col("vec_id").alias("probe_id"), F.col("source").alias("probe_src"))
    so = src.select(F.col("vec_id").alias("other_id"), F.col("source").alias("other_src"))
    tagged = (
        dist.join(F.broadcast(sp), "probe_id")
        .join(so, "other_id")
        .withColumn("same_src", F.col("probe_src") == F.col("other_src"))
    )
    wbest = Window.partitionBy("probe_id", "same_src").orderBy("d2", "other_id")
    best = (
        tagged.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("probe_id", "probe_src", "same_src", "other_id", "other_src", "d2")
    )
    p = best.filter(F.col("same_src")).select(
        "probe_id",
        "probe_src",
        F.col("other_id").alias("pos_id"),
        F.col("d2").alias("pos_d2"),
    )
    n = best.filter(~F.col("same_src")).select(
        "probe_id",
        F.col("other_id").alias("neg_id"),
        F.col("other_src").alias("neg_src"),
        F.col("d2").alias("neg_d2"),
    )
    return (
        p.join(n, "probe_id")
        .select(
            "probe_id",
            "probe_src",
            "pos_id",
            "pos_d2",
            "neg_id",
            "neg_src",
            "neg_d2",
            (F.col("neg_d2") - F.col("pos_d2")).cast("long").alias("margin"),
        )
        .orderBy("margin", "probe_id")
        .limit(20)
    )
