"""Property-based tests (hypothesis): the skew operators must be
*algebraically invisible* — salted plans return exactly the rows of their
unsalted twins on arbitrary inputs, including duplicate keys, empty frames,
negative values, and single-salt degenerate configs."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.operators.skew import salted_aggregate, salted_join

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (few distinct → collisions)
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=0,
    max_size=50,
)

SLOW = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(rows=ROWS, n_salts=st.integers(min_value=1, max_value=8))
@SLOW
def test_salted_aggregate_equals_plain(spark, rows, n_salts):
    df = spark.createDataFrame(rows or [(0, 0)], "k int, v int")
    if not rows:
        df = df.filter(F.lit(False))
    aggs = {
        "total": F.sum("v"),
        "n": F.count(F.lit(1)),
        "lo": F.min("v"),
        "hi": F.max("v"),
    }
    salted = salted_aggregate(df, ["k"], aggs, n_salts=n_salts)
    plain = df.groupBy("k").agg(*[c.alias(n) for n, c in aggs.items()])
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


@given(
    fact=ROWS,
    dim=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.text("ab", max_size=3)),
        min_size=0,
        max_size=10,
        unique_by=lambda t: t[0],  # dim key unique, like a real dimension
    ),
    n_salts=st.integers(min_value=1, max_value=8),
)
@SLOW
def test_salted_join_equals_plain(spark, fact, dim, n_salts):
    f = spark.createDataFrame(fact or [(0, 0)], "k int, v int")
    d = spark.createDataFrame(dim or [(0, "x")], "k int, name string")
    if not fact:
        f = f.filter(F.lit(False))
    if not dim:
        d = d.filter(F.lit(False))
    salted = salted_join(f, d, "k", n_salts=n_salts)
    plain = f.join(d, "k")
    cols = plain.columns
    assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
        map(tuple, plain.collect())
    )


URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~",
    min_size=1,
    max_size=12,
)


@given(
    host=URL_CHARS,
    path=URL_CHARS,
    param=URL_CHARS,
    utm=URL_CHARS,
    frag=URL_CHARS,
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_url_canonicalization_idempotent(spark, host, path, param, utm, frag):
    """canon(canon(u)) == canon(u): canonicalization must be a projection —
    a second pass can never strip more (otherwise incremental re-crawls
    that store canonical keys would dedup differently from fresh crawls)."""
    from pyspark.sql import functions as F

    from hawaiidatapipeline_spark.queries.curation_extra import canonicalize_url

    urls = [
        f"https://{host}/p/{path}?ref={param}&utm_source={utm}#{frag}",
        f"https://{host}/{path}?utm_campaign={utm}",
        f"https://{host}/{path}",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(F.col("c1").alias("url")).select(
        canonicalize_url(F.col("url")).alias("c2")
    )
    assert [r.c1 for r in once.collect()] == [r.c2 for r in twice.collect()]


# --- round-4 operator properties -------------------------------------------

EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id (few → collisions)
        st.integers(min_value=0, max_value=20000),  # offset seconds
    ),
    min_size=1,
    max_size=40,
)


@given(rows=EVENT_ROWS)
@SLOW
def test_sessionize_gap_partitions_events_exactly(spark, rows):
    """Gap sessionization is a PARTITION of each user's events: session
    sizes sum to the user's event count, and the number of sessions is
    1 + the number of >1800 s gaps in the sorted timeline."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u, "view", 0.0, "{}")
            for i, (u, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os, tempfile

    d = tempfile.mkdtemp(prefix="prop_sess")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    from hawaiidatapipeline_spark.queries import collect

    out = collect()[0]["events_sessionize_gap"](spark, d).collect()
    per_user_events = {}
    per_user_times = {}
    for i, (u, s) in enumerate(rows):
        per_user_events[u] = per_user_events.get(u, 0) + 1
        per_user_times.setdefault(u, []).append(s)
    got_counts = {}
    for r in out:
        got_counts[r["user_id"]] = got_counts.get(r["user_id"], 0) + r["n_events"]
    assert got_counts == per_user_events
    for u, times in per_user_times.items():
        times.sort()
        expected_sessions = 1 + sum(
            1 for a, b in zip(times, times[1:]) if b - a > 1800
        )
        assert sum(1 for r in out if r["user_id"] == u) == expected_sessions


@given(rows=EVENT_ROWS)
@SLOW
def test_rate_limit_conserves_rows(spark, rows):
    """kept + dropped over ALL users equals the total event count, and no
    (user, hour) keeps more than the cap."""
    import datetime as dt

    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u)
            for i, (u, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long",
    )
    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    ranked = df.select("user_id", F.row_number().over(w).alias("rn"))
    agg = ranked.agg(
        F.count(F.when(F.col("rn") <= 2, 1)).alias("kept"),
        F.count(F.when(F.col("rn") > 2, 1)).alias("dropped"),
    ).collect()[0]
    assert agg["kept"] + agg["dropped"] == len(rows)
    per_key_kept = (
        ranked.filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .count()
        .collect()
    )
    # a user has at most 2 kept events per distinct hour they appear in
    hours = {}
    for i, (u, s) in enumerate(rows):
        hours.setdefault(u, set()).add(s // 3600)
    for r in per_key_kept:
        assert r["count"] <= 2 * len(hours[r["user_id"]])


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # group key (collide hard)
            st.integers(min_value=-1000, max_value=1000),  # order value
        ),
        min_size=0,
        max_size=60,
    ),
    k=st.integers(min_value=1, max_value=5),
    n_salts=st.integers(min_value=1, max_value=8),
)
@SLOW
def test_salted_window_topk_equals_plain(spark, rows, k, n_salts):
    """salted_window_topk must be algebraically invisible under a TOTAL
    order — arbitrary inputs, duplicate order values broken by a unique
    id, degenerate single-salt configs, empty frames."""
    from pyspark.sql import Window

    from hawaiidatapipeline_spark.operators.skew import salted_window_topk

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data or [(0, 0, 0)], "id int, g int, v int")
    if not rows:
        df = df.filter(F.lit(False))
    order = [F.col("v").desc(), F.col("id")]  # total order via unique id
    w = Window.partitionBy("g").orderBy(*order)
    plain = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    salted = salted_window_topk(df, ["g"], order, k=k, n_salts=n_salts)
    cols = ["g", "id", "rn"]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # order key
            st.integers(min_value=0, max_value=9),   # part key
        ),
        min_size=0,
        max_size=60,
    ),
    min_orders=st.integers(min_value=1, max_value=3),
)
@SLOW
def test_copurchase_edges_equals_selfjoin(spark, rows, min_orders):
    """The collect+expand edge build must equal the reference self-join
    formulation on arbitrary (order, part) multisets — duplicates inside
    an order, singleton orders, empty input, both orientations."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    df = spark.createDataFrame(
        rows or [(0, 0)], "l_orderkey long, l_partkey long"
    )
    if not rows:
        df = df.filter(F.lit(False))
    items = df.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    ref = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_orders)
        .select("u", "v")
    )
    got = copurchase_edges(df, min_orders=min_orders)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
    # directed = exact mirror closure of the undirected set
    und = sorted(map(tuple, got.collect()))
    dird = sorted(
        map(tuple, copurchase_edges(df, min_orders=min_orders, directed=True).collect())
    )
    assert dird == sorted([(u, v) for u, v in und] + [(v, u) for u, v in und])


def test_copurchase_edges_caps_mega_order(spark):
    """Skew-lane probe: a planted 1,000-part order must be DROPPED by the
    max_parts_per_order guard, not expanded into ~500k pairs. Normal
    orders sharing pairs still produce their edges, and raising the cap
    re-admits the mega-order (the guard is the only thing excluding it)."""
    from hawaiidatapipeline_spark.operators.graph import copurchase_edges

    mega = [(999, p) for p in range(1000)]
    normal = [(1, 1), (1, 2), (2, 1), (2, 2)]  # pair (1,2) in 2 orders
    df = spark.createDataFrame(mega + normal, "l_orderkey long, l_partkey long")
    capped = copurchase_edges(df, min_orders=2)  # default cap 64
    assert sorted(map(tuple, capped.collect())) == [(1, 2)]
    # cap raised past the planted order → quadratic expansion comes back
    uncapped = copurchase_edges(df, min_orders=1, max_parts_per_order=1000)
    assert uncapped.count() == 1000 * 999 // 2  # (1,2) merges into the mega set


@given(q=st.text(st.characters(codec="ascii", exclude_characters="\x00"), max_size=40))
@SLOW
def test_q_terms_never_empty_or_quoted(q):
    """SODA $q tokenizer invariants on arbitrary ASCII snippets: no empty
    terms, no surviving double quotes, word terms carry no boundary
    punctuation, and tokenization is idempotent for plain word lists."""
    from hawaiidatapipeline_spark.soql import _Q_STRIP, _q_terms

    terms = _q_terms(q)
    for t in terms:
        assert t != ""
        assert '"' not in t or " " in t or q.count('"') % 2 == 1
    # unquoted word terms have stripped boundaries
    rest = q
    if '"' not in q:
        for t in terms:
            assert t == t.strip(_Q_STRIP)
        assert _q_terms(" ".join(terms)) == terms


# --- within_polygon: Spark ray casting vs a pure-Python PNPOLY reference ---

def _pnpoly(ring, lat, lon):
    """Reference Franklin PNPOLY (half-open), same convention as
    functions/geo.py — independent implementation, not shared code."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


# star-shaped polygons are always simple: random radii at sorted angles
STAR = st.lists(
    st.tuples(
        st.floats(min_value=0.1, max_value=3.1, allow_nan=False),  # angle step
        st.floats(min_value=5.0, max_value=50.0, allow_nan=False),  # radius
    ),
    min_size=3,
    max_size=8,
)
PROBES = st.lists(
    st.tuples(
        st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),  # lat
        st.floats(min_value=-60.0, max_value=60.0, allow_nan=False),  # lon
    ),
    min_size=1,
    max_size=10,
)


@given(star=STAR, probes=PROBES)
@SLOW
def test_within_polygon_matches_reference(spark, star, probes):
    import math

    from hawaiidatapipeline_spark.functions.geo import within_polygon

    # build a simple polygon: cumulative angles (capped under 2π), radius per vertex
    total = sum(a for a, _ in star)
    angle = 0.0
    ring = []
    for a, r in star:
        angle += a / total * 6.0  # spread vertices over <2π, strictly increasing
        ring.append((round(r * math.cos(angle), 4), round(r * math.sin(angle), 4)))
    if len({p for p in ring}) < 3:
        return  # degenerate collapse after rounding — skip
    rows = [(i, la, lo) for i, (la, lo) in enumerate(probes)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        r["id"]: r["got"]
        for r in df.withColumn(
            "got", within_polygon(F.col("lat"), F.col("lon"), ring)
        ).collect()
    }
    for i, (la, lo) in enumerate(probes):
        assert got[i] == _pnpoly(ring, la, lo), (ring, la, lo)


def test_copurchase_oracles_mirror_mega_order_cap():
    """ADVICE r7 (medium): every DuckDB oracle that rebuilds the
    co-purchase edge set must mirror copurchase_edges' default
    max_parts_per_order=64 guard, or Spark and oracle silently diverge
    on any input containing a mega-order. The shared fragment lives in
    operators/graph.CAPPED_ITEMS_SQL; each oracle must splice it (and no
    oracle may keep a bare DISTINCT item scan straight into a pair
    self-join)."""
    from hawaiidatapipeline_spark.operators.graph import CAPPED_ITEMS_SQL
    from hawaiidatapipeline_spark.queries import collect

    _, oracles = collect()
    edge_keys = [
        "graph_triangle_count", "graph_pagerank_copurchase",
        "graph_link_prediction", "graph_kcore_peel",
        "graph_degree_assortativity", "graph_degree_distribution",
        "graph_edge_triangle_support", "graph_connected_components",
    ]
    norm = lambda s: " ".join(s.split())
    missing = [
        k for k in edge_keys
        if norm(CAPPED_ITEMS_SQL) not in norm(oracles[k])
    ]
    assert not missing, (
        f"edge-rebuilding oracles without the mega-order cap: {missing}"
    )
