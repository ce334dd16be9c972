"""Round-11 batch-3 operator tests: DDSketch quantiles, farthest-first
seeding, the v7 DSIR-selection pipeline, CMS mergeability."""

from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries.emb_extra import emb_kmeanspp_init
from hawaiidatapipeline_spark.queries.pipeline_demo import (
    _V7_DSIR_N,
    llm_corpus_pipeline_v6,
    llm_corpus_pipeline_v7,
)
from hawaiidatapipeline_spark.queries.sketches_extra import (
    agg_cms_merge_proof,
    agg_ddsketch_quantiles,
)
from hawaiidatapipeline_spark.registry import load_table

from .conftest import SF0001


def test_ddsketch_estimates_within_relative_error(spark):
    """DDSketch guarantee: each quantile estimate is within the 2%
    relative-error bound of the exact quantile (computed here directly),
    and estimates are monotone in q within each group."""
    rows = agg_ddsketch_quantiles(spark, SF0001).collect()
    assert rows
    li = load_table(spark, SF0001, "lineitem")
    exact = {}
    for q in (0.5, 0.95, 0.99):
        for r in li.groupBy("l_returnflag").agg(
            F.percentile_approx("l_extendedprice", q, 100000).alias("v")
        ).collect():
            exact[(r.l_returnflag, int(q * 1000))] = r.v
    by_flag = {}
    for r in rows:
        true_v = exact[(r.flag, r.q_milli)]
        assert abs(r.q_estimate - true_v) <= 0.021 * true_v, (
            r.flag,
            r.q_milli,
            r.q_estimate,
            true_v,
        )
        by_flag.setdefault(r.flag, []).append((r.q_milli, r.q_estimate))
    for flag, qs in by_flag.items():
        qs.sort()
        vals = [v for _, v in qs]
        assert vals == sorted(vals)


def test_kmeanspp_objective_monotone_and_picks_distinct(spark):
    """Every added center can only shrink the corpus Σ min-d² objective;
    picks are distinct and each pick's min_d2 is the objective argmax
    from the previous state (so it is ≤ the previous pick's min_d2 is
    NOT guaranteed, but the objective curve is non-increasing)."""
    rows = sorted(emb_kmeanspp_init(spark, SF0001).collect(), key=lambda r: r.pick)
    assert [r.pick for r in rows] == [0, 1, 2, 3]
    assert len({r.vec_id for r in rows}) == 4
    objs = [r.objective for r in rows]
    assert all(a >= b for a, b in zip(objs, objs[1:]))
    assert all(r.min_d2 >= 0 for r in rows)


def test_v7_selection_is_subset_of_v6_survivors(spark):
    """v7's shard manifest counts at most _V7_DSIR_N docs, and every
    shard that appears in v7 also appears in v6 (the selection draws
    only from the v6 survivors)."""
    v6 = {r.shard: r for r in llm_corpus_pipeline_v6(spark, SF0001).collect()}
    v7 = {r.shard: r for r in llm_corpus_pipeline_v7(spark, SF0001).collect()}
    assert sum(r.n_docs for r in v7.values()) <= _V7_DSIR_N
    for shard, r in v7.items():
        assert shard in v6
        assert r.n_docs <= v6[shard].n_docs
        assert r.total_tokens <= v6[shard].total_tokens


def test_cms_merge_is_lossless(spark):
    rows = agg_cms_merge_proof(spark, SF0001).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.max_diff == 0
        assert r.merge_lossless == 1
        assert r.probe_direct == r.probe_merged
        assert r.n_buckets <= 64
