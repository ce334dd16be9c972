"""Skew-handling operators (SURVEY.md §4.2; [NS] 100 TB design).

AQE's skew-join splitting covers sort-merge joins at runtime; these helpers
cover the cases AQE can't:

- ``salted_aggregate``: two-phase aggregation for skewed GROUP BY keys.
  Phase 1 aggregates (key, salt) — the hot key's rows spread over
  ``n_salts`` reducers; phase 2 merges the per-salt partials. Works for any
  algebraic aggregate (sum/count/min/max — avg passed as sum+count).
- ``salted_join``: fact-side salt × dim-side replication, for joining a
  skewed fact key against a non-broadcastable dim. Each fact row gets a
  random-but-deterministic salt (hash of a stable column set); every dim
  row is replicated once per salt, so the join key becomes (key, salt) and
  the hot key's rows land on ``n_salts`` different reducers.

Both return results identical to the unsalted plan (tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
    salt_src: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase (partial-over-salt, then merge) aggregation.

    ``aggs`` maps output name → aggregate Column; the expression must be
    decomposable (re-applying sum/min/max/count-as-sum over partials must
    equal the direct aggregate). For count use ``F.count(...)`` — the merge
    phase sums it.
    """
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
        if salt_src
        else (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, expr in aggs.items()])
    )

    def outer_agg_fn(expr: Column) -> tuple[str, bool]:
        """(function name, is_distinct) of the outermost aggregate, read from
        a probe plan's ANALYZED form — analysis is driver-side only, no job.
        str(Column) is NOT enough: count_distinct('x') and count('x') both
        stringify as "count(x)", and merging a distinct count by SUM silently
        overcounts values that appear under several salts."""
        import re

        probe = df.groupBy().agg(expr.alias("_probe"))
        plan = probe._jdf.queryExecution().analyzed().toString()
        m = re.search(r"Aggregate \[(\w+)\((distinct)?", plan)
        if not m:
            raise ValueError(f"salted_aggregate: cannot classify aggregate {expr}")
        return m.group(1).lower(), m.group(2) is not None

    def merge_expr(name: str, expr: Column) -> Column:
        # Whitelist of salt-decomposable aggregates: count partials merge by
        # SUM; min/max/sum re-apply themselves. Anything else (avg, stddev,
        # any DISTINCT form, ...) is NOT mergeable over per-salt partials and
        # must fail loudly instead of silently re-summing.
        fn, is_distinct = outer_agg_fn(expr)
        if not is_distinct:
            if fn == "count":
                return F.sum(f"_p_{name}").alias(name)
            if fn in ("min", "max", "sum"):
                return getattr(F, fn)(f"_p_{name}").alias(name)
        raise ValueError(
            f"salted_aggregate: {name}={fn}{'(distinct)' if is_distinct else ''} "
            "is not mergeable over salt partials; use sum/count/min/max "
            "(express avg as sum+count and divide after the merge; for "
            "count-distinct salt BY THE COUNTED COLUMN via salt_src so each "
            "distinct value lands in exactly one salt)"
        )

    return phase1.groupBy(*keys).agg(
        *[merge_expr(name, expr) for name, expr in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with fact-side salting + dim-side
    replication. Use when the dim is too big to broadcast and the fact key
    is skewed. Output columns = fact columns + dim columns (minus its key).

    Only fact-preserving modes are allowed: under right/full outer joins
    every unmatched dim row would be emitted once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — dim replication would "
            "duplicate unmatched dim rows; use inner or left"
        )
    salted_fact = fact.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    joined = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return joined.drop("_salt")


def salted_window_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    n_salts: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k per group for a SKEWED group key — the salted twin of the
    plain ``row_number() OVER (PARTITION BY keys ORDER BY ...) <= k``
    window, which AQE cannot help with (skew-join splitting applies to
    joins; a window partition is indivisible, so one zipf-hot key means
    one straggler task sorting the whole hot group).

    Phase 1 ranks within (keys, salt) — the hot group's rows spread over
    ``n_salts`` window partitions, each sorting ~1/n_salts of the data —
    and keeps each bucket's top-k. Phase 2 re-ranks the surviving
    ``n_salts × k`` rows per group; correct because a row in a group's
    true top-k is necessarily in the top-k of its own salt bucket
    (row_number assigns rank by the same total order in both phases).
    ``order_by`` must be a TOTAL order (break ties, e.g. by a unique id)
    for exact parity with the unsalted window; with ties, both plans
    pick an arbitrary tied subset."""
    salt = (F.rand(seed=42) * n_salts).cast("int")
    from pyspark.sql import Window

    w1 = Window.partitionBy(*keys, "_salt").orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
