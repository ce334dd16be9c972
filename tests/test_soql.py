"""SoQL compiler (soql.py): the reference's SODA request surface compiled
onto DataFrames — clause mapping, function rewrites, $q, paging, and the
unsupported-token guard."""

import pytest
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.registry import load_table
from hawaiidatapipeline_spark.soql import SoqlError, rewrite_soql_expr, soql_query

from .conftest import SF0001


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_select_where_order_limit_offset(spark):
    o = load_table(spark, SF0001, "orders")
    got = soql_query(
        o,
        {
            "$select": "o_orderkey, o_totalprice",
            "$where": "o_totalprice > 100000 and o_orderpriority != '5-LOW'",
            "$order": "o_totalprice DESC, o_orderkey",
            "$limit": "20",
            "$offset": "5",
        },
    )
    expected = (
        o.filter((F.col("o_totalprice") > 100000) & (F.col("o_orderpriority") != "5-LOW"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(5)
        .limit(20)
    )
    assert _rows(got) == _rows(expected)


def test_group_having_aggregates(spark):
    o = load_table(spark, SF0001, "orders")
    got = soql_query(
        o,
        {
            "$select": "o_orderpriority, count(*) AS n, round(sum(o_totalprice), 6) AS total",
            "$group": "o_orderpriority",
            "$having": "count(*) > 10",
        },
    )
    expected = (
        o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 6).alias("total"))
        .filter(F.col("n") > 10)
    )
    assert _rows(got) == _rows(expected)


def test_soql_function_rewrites(spark):
    e = load_table(spark, SF0001, "events")
    got = soql_query(
        e,
        {
            "$select": "event_id, date_extract_m(ts) AS m, date_trunc_ymd(ts) AS d",
            "$where": "date_extract_y(ts) >= 2024",
            "$limit": "100",
        },
    )
    expected = (
        e.filter(F.year("ts") >= 2024)
        .select(
            "event_id",
            F.month("ts").alias("m"),
            F.date_trunc("DAY", "ts").alias("d"),
        )
        .limit(100)
    )
    assert got.count() == expected.count()
    assert _rows(got.select("event_id", "m")) == _rows(expected.select("event_id", "m"))


def test_starts_with_and_case(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(
        d,
        {
            "$select": "doc_id, case(length(text) > 200, 'long', length(text) > 50, 'mid', true, 'short') AS bucket",
            "$where": "starts_with(source, 'src1')",
        },
    )
    expected = d.filter(F.col("source").startswith("src1")).select(
        "doc_id",
        F.when(F.length("text") > 200, "long")
        .when(F.length("text") > 50, "mid")
        .otherwise("short")
        .alias("bucket"),
    )
    assert _rows(got) == _rows(expected)


def test_q_fulltext_over_string_columns(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(d, {"$select": "doc_id", "$q": "merge"})
    expected = d.filter(
        F.lower("text").contains("merge")
        | F.lower("lang").contains("merge")
        | F.lower("source").contains("merge")
    ).select("doc_id")
    assert _rows(got) == _rows(expected)


def test_distance_in_meters_rewrite():
    s = rewrite_soql_expr("distance_in_meters(lat, lon, 21.3, -157.85) < 5000")
    assert "asin" in s and "6371008.8" in s


def test_select_distinct(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(d, {"$select": "distinct lang"})
    assert sorted(r.lang for r in got.collect()) == sorted(
        r.lang for r in d.select("lang").distinct().collect()
    )


def test_offset_beyond_rows_and_empty_result(spark):
    d = load_table(spark, SF0001, "documents")
    got = soql_query(
        d, {"$select": "doc_id", "$order": "doc_id", "$limit": "10", "$offset": "999999"}
    )
    assert got.count() == 0
    none = soql_query(d, {"$select": "doc_id", "$where": "doc_id < 0"})
    assert none.count() == 0


def test_where_fuzz_equals_spark_sql(spark):
    """Property fuzz: random SoQL $where trees must filter identically to
    the same expression evaluated by Spark SQL directly (SoQL's predicate
    grammar is an ANSI subset, so the compiled clause must be semantics-
    preserving, not just parseable)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    o = load_table(spark, SF0001, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    o = o.localCheckpoint()  # one read; fuzz cases reuse it
    total = o.count()

    comparisons = st.sampled_from(
        [
            "o_totalprice > 100000",
            "o_totalprice <= 50000.5",
            "o_orderkey % 7 = 0",
            "o_orderpriority != '5-LOW'",
            "o_orderpriority in ('1-URGENT', '2-HIGH')",
            "o_totalprice between 10000 and 90000",
            "o_custkey is not null",
            "o_orderpriority like '1%'",
            "starts_with(o_orderpriority, '3')",
            "length(o_orderpriority) > 5",
        ]
    )

    def trees(depth):
        if depth == 0:
            return comparisons
        sub = trees(depth - 1)
        return st.one_of(
            comparisons,
            st.tuples(sub, st.sampled_from(["and", "or"]), sub).map(
                lambda t: f"({t[0]}) {t[1]} ({t[2]})"
            ),
            sub.map(lambda s: f"not ({s})"),
        )

    @given(clause=trees(2))
    @settings(
        max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    def run(clause):
        got = soql_query(o, {"$select": "o_orderkey", "$where": clause}).count()
        want = o.filter(F.expr(rewrite_soql_expr(clause))).count()
        assert got == want, clause
        assert 0 <= got <= total

    run()


def test_query_string_equals_param_bundle(spark):
    from hawaiidatapipeline_spark.soql import parse_soql_string, soql_query_string

    o = load_table(spark, SF0001, "orders")
    qs = (
        "SELECT o_orderpriority, count(*) AS n "
        "WHERE o_totalprice > 50000 GROUP BY o_orderpriority "
        "ORDER BY n DESC, o_orderpriority LIMIT 3"
    )
    got = soql_query_string(o, qs)
    want = soql_query(
        o,
        {
            "$select": "o_orderpriority, count(*) AS n",
            "$where": "o_totalprice > 50000",
            "$group": "o_orderpriority",
            "$order": "n DESC, o_orderpriority",
            "$limit": "3",
        },
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # string literals containing keywords must not split clauses
    params = parse_soql_string("SELECT doc_id WHERE lang = 'where select'")
    assert params == {"$select": "doc_id", "$where": "lang = 'where select'"}
    # leading whitespace is legal; SEARCH keeps inner/escaped quotes intact
    assert parse_soql_string("  SELECT a")["$select"] == "a"
    assert parse_soql_string("SELECT a SEARCH 'rock''n'''")["$q"] == "rock'n'"


def test_query_string_errors(spark):
    from hypothesis import strategies as _  # noqa: F401 (keep import pattern uniform)

    from hawaiidatapipeline_spark.soql import parse_soql_string

    with pytest.raises(SoqlError, match="must start with SELECT"):
        parse_soql_string("WHERE x > 1")
    with pytest.raises(SoqlError, match="duplicate"):
        parse_soql_string("SELECT a WHERE x > 1 WHERE y > 2")
    with pytest.raises(SoqlError, match="empty"):
        parse_soql_string("SELECT a WHERE")


def test_rejects_unsupported(spark):
    d = load_table(spark, SF0001, "documents")
    with pytest.raises(SoqlError, match="unsupported SoQL function"):
        soql_query(d, {"$select": "doc_id", "$where": "sleep(10) = 1"})
    with pytest.raises(SoqlError, match="unsupported character"):
        soql_query(d, {"$select": "doc_id; DROP TABLE documents"})
    with pytest.raises(SoqlError, match="unsupported SODA parameters"):
        soql_query(d, {"$bogus": "1"})


def test_rewrite_generated_names_not_user_writable(spark):
    """ADVICE r12: the convex_hull rewrite emits higher-order machinery
    (transform/aggregate/element_at/...) that must stay INTERNAL — a user
    clause spelling those names raises, while convex_hull itself (whose
    compiled output contains them) still passes validation."""
    d = load_table(spark, SF0001, "documents")
    for expr in ("transform(array(1), x - 1) = array(0)",
                 "aggregate(array(1), 0, (a, x) - a) = 1",
                 "element_at(array(1), 1) = 1",
                 "collect_list(doc_id)"):
        with pytest.raises(SoqlError, match="unsupported SoQL function"):
            soql_query(d, {"$select": "doc_id", "$where": expr})
    # the compiler's own output still validates (pass-2 allowlist)
    pts = spark.createDataFrame(
        [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)], "lat double, lon double"
    )
    out = soql_query(pts, {"$select": "convex_hull(lat, lon) AS hull"})
    assert out.columns == ["hull"] and out.count() == 1


class TestQTokenization:
    """SODA $q spec corner cases (dev.socrata.com): multi-token AND,
    quoted phrases, boundary-punctuation stripping."""

    def test_terms_split_and_strip(self):
        from hawaiidatapipeline_spark.soql import _q_terms

        assert _q_terms("merge sort") == ["merge", "sort"]
        assert _q_terms('  "fast merge"  sort, ') == ["fast merge", "sort"]
        assert _q_terms("(merge) sort!") == ["merge", "sort"]
        assert _q_terms("o'brien") == ["o'brien"]  # interior punct kept
        assert _q_terms('""  ,,, ') == []

    def test_multi_token_is_and_not_substring(self, spark):
        from hawaiidatapipeline_spark.soql import soql_query

        docs = load_table(spark, SF0001, "documents")

        both = soql_query(docs, {"$select": "doc_id", "$q": "merge sort"})
        merge = soql_query(docs, {"$select": "doc_id", "$q": "merge"})
        sort = soql_query(docs, {"$select": "doc_id", "$q": "sort"})
        substring = soql_query(docs, {"$select": "doc_id", "$q": '"merge sort"'})
        got = {r["doc_id"] for r in both.collect()}
        want = {r["doc_id"] for r in merge.collect()} & {
            r["doc_id"] for r in sort.collect()
        }
        assert got == want and got  # AND semantics, non-empty
        # the quoted phrase is strictly narrower than the AND of its words
        phrase_ids = {r["doc_id"] for r in substring.collect()}
        assert phrase_ids < got

    def test_punctuation_stripped_token_still_matches(self, spark):
        from hawaiidatapipeline_spark.soql import soql_query

        docs = load_table(spark, SF0001, "documents")

        clean = soql_query(docs, {"$select": "doc_id", "$q": "merge"})
        punct = soql_query(docs, {"$select": "doc_id", "$q": "(merge),"})
        assert {r["doc_id"] for r in clean.collect()} == {
            r["doc_id"] for r in punct.collect()
        }

    def test_stemming_matches_inflected_word_terms(self, spark):
        """stemming=True: 'merges'/'scans' match docs whose tokens stem to
        the same form; default exact matching returns nothing for the
        inflected terms (the corpus spells the bare forms)."""
        from hawaiidatapipeline_spark.soql import _stem, soql_query

        assert _stem("merges") == _stem("merge") == "merge"
        assert _stem("scans") == _stem("scan") == "scan"
        assert _stem("sorted") == "sort"
        docs = load_table(spark, SF0001, "documents")

        exact = soql_query(docs, {"$select": "doc_id", "$q": "merges"})
        assert exact.count() == 0  # inflected form absent from the corpus
        stemmed = soql_query(
            docs, {"$select": "doc_id", "$q": "merges"}, stemming=True
        )
        bare = soql_query(docs, {"$select": "doc_id", "$q": "merge"})
        got = {r["doc_id"] for r in stemmed.collect()}
        # token-level stem match ⊆ substring match on the bare form, and
        # every doc with the literal token 'merge' is found
        assert got and got <= {r["doc_id"] for r in bare.collect()}

    def test_stemming_never_applies_to_phrases(self, spark):
        """A quoted phrase matches verbatim even with stemming on: the
        inflected phrase finds nothing, the bare phrase is unchanged."""
        from hawaiidatapipeline_spark.soql import soql_query

        docs = load_table(spark, SF0001, "documents")
        inflected = soql_query(
            docs, {"$select": "doc_id", "$q": '"fast merges"'}, stemming=True
        )
        assert inflected.count() == 0
        on = soql_query(
            docs, {"$select": "doc_id", "$q": '"fast merge"'}, stemming=True
        )
        off = soql_query(docs, {"$select": "doc_id", "$q": '"fast merge"'})
        assert {r["doc_id"] for r in on.collect()} == {
            r["doc_id"] for r in off.collect()
        }


class TestWithinBox:
    def test_rewrite_is_sargable_comparisons(self):
        from hawaiidatapipeline_spark.soql import rewrite_soql_expr

        got = rewrite_soql_expr("within_box(lat, lon, 40, -60, -40, 60)")
        assert "within_box" not in got
        for frag in ["(lat) <= (40)", "(lat) >= (-40)", "(lon) >= (-60)", "(lon) <= (60)"]:
            assert frag in got
        # no trig — the whole point vs within_circle
        assert "asin" not in got and "radians" not in got

    def test_wrong_arity_raises(self):
        import pytest as _pytest

        from hawaiidatapipeline_spark.soql import SoqlError, rewrite_soql_expr

        with _pytest.raises(SoqlError):
            rewrite_soql_expr("within_box(lat, lon, 40, -60, -40)")

    def test_where_filter_matches_dataframe_twin(self, spark):
        from pyspark.sql import functions as F

        from hawaiidatapipeline_spark.functions.geo import within_box
        from hawaiidatapipeline_spark.soql import soql_query

        c = load_table(spark, SF0001, "customer").select(
            "c_custkey",
            ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
            (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
        )
        compiled = soql_query(
            c,
            {"$select": "c_custkey",
             "$where": "within_box(lat, lon, 40, -60, -40, 60)"},
        )
        direct = c.filter(
            within_box(F.col("lat"), F.col("lon"), 40.0, -60.0, -40.0, 60.0)
        ).select("c_custkey")
        assert sorted(r[0] for r in compiled.collect()) == sorted(
            r[0] for r in direct.collect()
        )


def test_soql21_stddev_aggregates_compile(spark):
    """SoQL 2.1 exposes stddev_pop/stddev_samp as aggregate functions —
    they must pass the token filter and compile (identical names on
    Spark, so passthrough suffices)."""
    from hawaiidatapipeline_spark.soql import soql_query

    c = load_table(spark, SF0001, "customer")
    out = soql_query(
        c,
        {"$select": ("c_nationkey, round(stddev_pop(c_acctbal), 4) AS sp, "
                     "round(stddev_samp(c_acctbal), 4) AS ss, "
                     "round(var_pop(c_acctbal), 4) AS vp"),
         "$group": "c_nationkey", "$order": "c_nationkey", "$limit": "5"},
    ).collect()
    assert len(out) == 5 and all(r["sp"] is not None for r in out)


class TestWithinPolygon:
    def test_ray_cast_matches_known_points(self, spark):
        from pyspark.sql import functions as F

        from hawaiidatapipeline_spark.functions.geo import within_polygon

        # non-convex pentagon with a notch at the bottom (lon, lat)
        ring = [(-50, -30), (0, 10), (50, -30), (50, 30), (-50, 30)]
        pts = spark.createDataFrame(
            [
                (1, 20.0, 0.0, True),    # top half: inside
                (2, -20.0, 0.0, False),  # inside the notch: outside
                (3, -20.0, -45.0, True), # left lobe under the notch edge
                (4, 0.0, 60.0, False),   # right of the ring
                (5, 40.0, 0.0, False),   # above the ring
            ],
            "id long, lat double, lon double, want boolean",
        )
        got = pts.withColumn(
            "got", within_polygon(F.col("lat"), F.col("lon"), ring)
        ).collect()
        for r in got:
            assert r["got"] == r["want"], (r["id"], r["got"], r["want"])

    def test_wkt_parse_and_sql_twin(self):
        from hawaiidatapipeline_spark.functions.geo import (
            parse_wkt_polygon,
            polygon_ray_cast_sql,
        )

        ring = parse_wkt_polygon(
            "POLYGON ((-50 -30, 0 10, 50 -30, 50 30, -50 30, -50 -30))"
        )
        assert len(ring) == 5  # closing repeat vertex dropped
        sql = polygon_ray_cast_sql("lat", "lon", ring)
        assert "% 2 = 1" in sql and "CASE WHEN" in sql
        # horizontal top edge skipped (no 0-divisor slope)
        assert "/ (0" not in sql.replace("(0 ", "(0")

    def test_wkt_errors(self):
        import pytest as _pytest

        from hawaiidatapipeline_spark.functions.geo import parse_wkt_polygon
        from hawaiidatapipeline_spark.soql import SoqlError, rewrite_soql_expr

        with _pytest.raises(ValueError):
            parse_wkt_polygon("LINESTRING (0 0, 1 1)")
        with _pytest.raises(ValueError):
            parse_wkt_polygon("POLYGON ((0 0, 1 1, 0 0))")  # <3 distinct
        with _pytest.raises(SoqlError):
            rewrite_soql_expr("within_polygon(lat, lon, wkt_col)")  # not a literal


def test_intersects_point_polygon_aliases_within_polygon(spark):
    """SODA `intersects` on a point location with a polygon WKT is
    containment — must compile to the same predicate as within_polygon."""
    from hawaiidatapipeline_spark.soql import rewrite_soql_expr

    wkt = "POLYGON ((-50 -30, 0 10, 50 -30, 50 30, -50 30, -50 -30))"
    a = rewrite_soql_expr(f"within_polygon(lat, lon, '{wkt}')")
    b = rewrite_soql_expr(f"intersects(lat, lon, '{wkt}')")
    assert a == b and "% 2 = 1" in a


def test_extent_rewrite_compiles_to_decimal_pinned_box(spark):
    from hawaiidatapipeline_spark.soql import rewrite_soql_expr

    got = rewrite_soql_expr("extent(lat, lon)")
    assert got.count("DECIMAL(14,4)") == 4 and got.startswith("concat('BOX('")


class TestRound11SurfaceSweep:
    """Round-11 SoQL function-library completeness sweep (SOQL_SURFACE.md):
    the documented scalars/aggregates that were still missing."""

    def test_minute_second_extracts_rewrite(self):
        s = rewrite_soql_expr("date_extract_mm(ts) + date_extract_ss(ts)")
        assert "minute(ts)" in s and "second(ts)" in s

    def test_get_utc_date_rewrites_to_current_timestamp(self):
        assert rewrite_soql_expr("get_utc_date()") == "current_timestamp()"

    def test_convex_hull_exact_ring(self, spark):
        """The compiled hull is the TRUE convex hull (round-12 upgrade
        from the extent-box approximation): vertex-minimal closed ring,
        monotone-chain order, 1e-4 grid rendering."""
        s = rewrite_soql_expr("convex_hull(lat, lon)")
        assert "collect_list" in s and "4503599627370496" in s
        df = spark.createDataFrame(
            [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0),
             (2.0, 1.5),            # interior — must not appear
             (2.0, 0.0)],           # collinear mid-edge — must not appear
            "lat double, lon double",
        )
        out = soql_query(df, {"$select": "convex_hull(lat, lon) AS hull"})
        hull = out.collect()[0].hull
        assert hull == (
            "POLYGON ((0.0000 0.0000, 3.0000 0.0000, 3.0000 4.0000, "
            "0.0000 4.0000, 0.0000 0.0000))"
        )

    def test_simplify_is_identity_on_geometry(self):
        assert rewrite_soql_expr("simplify(extent(lat, lon), 0.5)") == (
            "(" + rewrite_soql_expr("extent(lat, lon)") + ")"
        )
        assert rewrite_soql_expr(
            "simplify_preserve_topology(extent(lat, lon), 0.5)"
        ) == "(" + rewrite_soql_expr("extent(lat, lon)") + ")"

    def test_num_points_counts_wkt_vertices(self, spark):
        s = rewrite_soql_expr(
            "num_points('POLYGON ((-50 -30, 0 10, 50 -30, -50 -30))')"
        )
        got = spark.sql(f"SELECT {s} AS n").collect()[0].n
        assert got == 4
        # NULL geometry counts zero
        s0 = rewrite_soql_expr("num_points(NULL)")
        assert spark.sql(f"SELECT {s0} AS n").collect()[0].n == 0

    def test_median_compiles_and_matches_duckdb(self, spark):
        import duckdb

        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate([1, 3, 3, 6, 7, 8, 9])],
            "id long, v double",
        )
        out = soql_query(df, {"$select": "round(median(v), 6) AS med"})
        want = duckdb.sql(
            "SELECT round(median(v), 6) AS med FROM (SELECT unnest([1,3,3,6,7,8,9])::DOUBLE v)"
        ).fetchone()[0]
        assert out.collect()[0].med == want

    def test_wrong_arity_geo_raises(self):
        import pytest as _pytest

        for bad in (
            "convex_hull(lat)",
            "simplify(extent(lat, lon))",
            "num_points(a, b)",
        ):
            with _pytest.raises(SoqlError):
                rewrite_soql_expr(bad)

    def test_cast_sugar_maps_soql_type_names(self, spark):
        s = rewrite_soql_expr("n::text || (x::number)::text")
        assert "::string" in s and "::double" in s and "text" not in s
        df = spark.createDataFrame([(7, 2.5)], "n long, x double")
        got = soql_query(df, {"$select": "n::text AS ns, x::number AS xd"})
        row = got.collect()[0]
        assert row.ns == "7" and abs(row.xd - 2.5) < 1e-12
