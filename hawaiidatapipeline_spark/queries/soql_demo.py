"""SoQL compiler checked queries: the reference's SODA request bundles
(soql.py) executed end-to-end and hash-compared against plain ANSI SQL.
These prove a reference user's queries run verbatim on the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table
from hawaiidatapipeline_spark.soql import (
    soql_query,
    soql_query_chained,
    soql_query_string,
)

QUERIES, ORACLES, q = new_module_registry()


@q(
    "soql_aggregate",
    """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 6) AS total
       FROM orders
       WHERE o_totalprice BETWEEN 1000 AND 200000
       GROUP BY o_orderpriority HAVING count(*) > 10""",
)
def soql_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SODA ``$group``/``$having`` request through the SoQL compiler —
    the exact parameter bundle a reference user would send to the portal."""
    o = load_table(spark, sf_dir, "orders")
    return soql_query(
        o,
        {
            "$select": "o_orderpriority, count(*) AS n, round(sum(o_totalprice), 6) AS total",
            "$where": "o_totalprice between 1000 and 200000",
            "$group": "o_orderpriority",
            "$having": "count(*) > 10",
        },
    )


@q(
    "soql_date_functions",
    """SELECT date_part('month', ts)::INT AS m,
              date_trunc('day', ts)::TIMESTAMP AS d,
              count(*) AS n,
              round(sum(value), 6) AS total
       FROM events
       WHERE date_part('year', ts) >= 2024 AND event_type = 'purchase'
       GROUP BY 1, 2""",
)
def soql_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL date functions through the compiler (``date_extract_y/m`` →
    year/month, ``date_trunc_ymd`` → day truncation) — the portal's
    time-bucketing idiom, cross-checked against DuckDB's date_part/
    date_trunc."""
    e = load_table(spark, sf_dir, "events")
    return soql_query(
        e,
        {
            "$select": "date_extract_m(ts) AS m, date_trunc_ymd(ts) AS d, "
            "count(*) AS n, round(sum(value), 6) AS total",
            "$where": "date_extract_y(ts) >= 2024 AND event_type = 'purchase'",
            "$group": "date_extract_m(ts), date_trunc_ymd(ts)",
        },
    )


@q(
    "soql_full_query_string",
    """SELECT doc_id, lang FROM documents
       WHERE source LIKE 'src1%'
         AND (lower(text) LIKE '%merge%' OR lower(lang) LIKE '%merge%'
              OR lower(source) LIKE '%merge%')
       ORDER BY doc_id LIMIT 30 OFFSET 5""",
)
def soql_full_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Socrata's single-string ``$query`` form (SELECT … WHERE … SEARCH …
    ORDER BY … LIMIT/OFFSET) parsed into clauses and compiled — the other
    half of the SoQL request surface next to the parameter bundle."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query_string(
        d,
        "SELECT doc_id, lang WHERE starts_with(source, 'src1') "
        "SEARCH 'merge' ORDER BY doc_id LIMIT 30 OFFSET 5",
    )


@q(
    "soql_chained_pipeline",
    """SELECT lang, n_sources, n_docs, max_source FROM (
         SELECT lang, count(*) AS n_sources, sum(n)::BIGINT AS n_docs,
                max(n) AS max_source
         FROM (SELECT lang, source, count(*) AS n FROM documents
               GROUP BY lang, source)
         GROUP BY lang)
       WHERE n_docs > 66 ORDER BY n_docs DESC, lang LIMIT 3""",
)
def soql_chained_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL 2.1 chained query (``|>`` pipelines): stage 1 aggregates per
    (lang, source), stage 2 aggregates the aggregate per lang, stage 3
    filters/orders/pages the result — Socrata's query-composition idiom.
    The fold compiles to ONE Catalyst plan (nested subqueries), so the
    two aggregations share a single partial+final cascade; integer-only
    measures keep the chain hash-exact across engines."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query_chained(
        d,
        "SELECT lang, source, count(*) AS n GROUP BY lang, source "
        "|> SELECT lang, count(*) AS n_sources, sum(n) AS n_docs, "
        "max(n) AS max_source GROUP BY lang "
        "|> SELECT lang, n_sources, n_docs, max_source "
        "WHERE n_docs > 66 ORDER BY n_docs DESC, lang LIMIT 3",
    )


@q(
    "soql_fulltext_paged",
    """SELECT doc_id, lang, source FROM documents
       WHERE source LIKE 'src1%'
         AND (lower(text) LIKE '%merge%' OR lower(lang) LIKE '%merge%'
              OR lower(source) LIKE '%merge%')
       ORDER BY doc_id LIMIT 40 OFFSET 10""",
)
def soql_fulltext_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$q`` full-text + ``starts_with`` + the reference's paging idiom
    (``$order``+``$limit``+``$offset`` — its core fetch loop) compiled to
    one DataFrame plan."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query(
        d,
        {
            "$select": "doc_id, lang, source",
            "$where": "starts_with(source, 'src1')",
            "$q": "merge",
            "$order": "doc_id",
            "$limit": "40",
            "$offset": "10",
        },
    )


@q(
    "soql_fulltext_terms",
    """SELECT doc_id, lang, source FROM documents
       WHERE (contains(lower(text), 'fast merge')
              OR contains(lower(lang), 'fast merge')
              OR contains(lower(source), 'fast merge'))
         AND (contains(lower(text), 'sort')
              OR contains(lower(lang), 'sort')
              OR contains(lower(source), 'sort'))
       ORDER BY doc_id""",
)
def soql_fulltext_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA ``$q`` spec corner cases in one snippet (dev.socrata.com:
    multiple space-separated terms AND together; double quotes group a
    phrase; boundary punctuation is stripped from word tokens): the
    snippet ``"fast merge" sort,`` must match docs containing the PHRASE
    "fast merge" AND the word "sort" (anywhere, any string column) — not
    the 0-row literal substring ``fast merge sort,`` the pre-round-5
    whole-snippet containment would have searched."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query(
        d,
        {
            "$select": "doc_id, lang, source",
            "$q": '"fast merge" sort,',
            "$order": "doc_id",
        },
    )


def _stem_pred_sql(term_stem: str) -> str:
    """DuckDB twin of the compiler's stemmed word-term predicate: token-
    split each string column on non-alphanumerics, stem with the SAME
    suffix rule (soql._STEM_RE), compare to the pre-stemmed term."""
    per_col = " OR ".join(
        "len(list_filter(regexp_split_to_array(lower({c}), '[^a-z0-9]+'), "
        "x -> regexp_replace(x, '(ing|ed|s)$', '') = '{t}')) > 0".format(
            c=c, t=term_stem
        )
        for c in ("text", "lang", "source")
    )
    return f"({per_col})"


@q(
    "soql_fulltext_stemmed",
    f"""SELECT doc_id, lang, source FROM documents
       WHERE {_stem_pred_sql('scan')}
         AND (contains(lower(text), 'fast merge')
              OR contains(lower(lang), 'fast merge')
              OR contains(lower(source), 'fast merge'))
         AND {_stem_pred_sql('order')}
       ORDER BY doc_id""",
)
def soql_fulltext_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA ``$q`` with the stemming option on (dev.socrata.com documents
    the portal's ``$q`` as stemming-aware; the compiler default is
    exact-token matching with ``stemming=True`` as the deterministic
    suffix-strip approximation — soql.py ``_STEM_RE``). The snippet
    ``scans "fast merge" orders,`` must match docs containing a token
    stemming to ``scan`` AND the verbatim phrase "fast merge" AND a
    token stemming to ``order`` — the corpus spells the bare forms, so
    exact-token matching on the inflected terms would return 0 rows.
    Phrase terms are never stemmed. Plan: one scan, three AND'd
    codegen'd predicates (exists over split tokens), no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query(
        d,
        {
            "$select": "doc_id, lang, source",
            "$q": 'scans "fast merge" orders,',
            "$order": "doc_id",
        },
        stemming=True,
    )


@q(
    "soql_geo_where",
    """WITH pts AS (
         SELECT c_custkey,
                (c_custkey % 180 - 90) + 0.25::DOUBLE  AS lat,
                ((7 * c_custkey) % 360 - 180) + 0.25::DOUBLE AS lon
         FROM customer)
       SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon
       FROM pts
       WHERE (lat <= 40 AND lat >= -40 AND lon >= -60 AND lon <= 60)
         AND 2 * 6371008.8 * asin(sqrt(
               pow(sin(radians(0.0 - lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(0.0))
               * pow(sin(radians(0.0 - lon) / 2), 2))) <= 5000000""",
)
def soql_geo_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA's canonical geo fetch compiled from a SoQL ``$where`` STRING:
    ``within_box`` (the sargable rectangle — plain comparisons that reach
    the parquet reader as PushedFilters) wrapping ``within_circle`` (the
    exact trig predicate), the box-then-circle composition every portal
    map query uses. Same synthetic integer-derived (lat, lon) convention
    as fn_geo_within_box; the oracle restates the compiled SQL."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    return soql_query(
        pts,
        {
            "$select": "c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon",
            "$where": (
                "within_box(lat, lon, 40, -60, -40, 60)"
                " AND within_circle(lat, lon, 0.0, 0.0, 5000000)"
            ),
        },
    )


def _polygon_oracle_sql() -> str:
    from hawaiidatapipeline_spark.functions.geo import (
        parse_wkt_polygon,
        polygon_ray_cast_sql,
    )

    ring = parse_wkt_polygon(_POLY_WKT)
    pred = polygon_ray_cast_sql("lat", "lon", ring)
    return f"""WITH pts AS (
         SELECT c_custkey,
                (c_custkey % 180 - 90) + 0.25::DOUBLE  AS lat,
                ((7 * c_custkey) % 360 - 180) + 0.25::DOUBLE AS lon
         FROM customer)
       SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon
       FROM pts WHERE {pred}"""


# non-convex ring (notch at the bottom) so the parity logic is exercised,
# not just a bounding box; vertices off the synthetic 0.25 lat/lon grid so
# no point lands exactly on an edge
_POLY_WKT = "POLYGON ((-50 -30, 0 10, 50 -30, 50 30, -50 30, -50 -30))"


@q("soql_geo_polygon", _polygon_oracle_sql())
def soql_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``within_polygon`` compiled from a ``$where`` string with a WKT
    literal: the ring is parsed at compile time and unrolled into
    crossing-parity arithmetic (functions/geo.py ray casting — pure
    codegen, no UDF, no geometry library). The oracle is built from the
    SAME SQL builder, so Spark and DuckDB evaluate a textually identical
    predicate — which is what makes a geometry operator hash-checkable."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    return soql_query(
        pts,
        {
            "$select": "c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon",
            "$where": f"within_polygon(lat, lon, '{_POLY_WKT}')",
        },
    )


@q(
    "soql_geo_extent",
    """WITH pts AS (
         SELECT c_custkey,
                (c_custkey % 180 - 90) + 0.25::DOUBLE  AS lat,
                ((7 * c_custkey) % 360 - 180) + 0.25::DOUBLE AS lon
         FROM customer)
       SELECT c_custkey % 4 AS grp,
              concat('BOX(', CAST(min(lon) AS DECIMAL(14,4)), ' ',
                     CAST(min(lat) AS DECIMAL(14,4)), ', ',
                     CAST(max(lon) AS DECIMAL(14,4)), ' ',
                     CAST(max(lat) AS DECIMAL(14,4)), ')') AS bbox,
              count(*) AS n
       FROM pts GROUP BY 1""",
)
def soql_geo_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA's ``extent`` bounding-box aggregate compiled from ``$select``:
    one 'BOX(minlon minlat, maxlon maxlat)' string per group. DECIMAL(14,4)
    casts pin the float→string rendering, so Spark and DuckDB emit
    byte-identical text — the trick that makes a geometry-valued aggregate
    hash-checkable without a geometry type."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    return soql_query(
        pts,
        {
            "$select": "c_custkey % 4 AS grp, extent(lat, lon) AS bbox, count(*) AS n",
            "$group": "c_custkey % 4",
        },
    )


def _hull_key_sql(dy: str, dx: str) -> str:
    """DuckDB twin of soql.py ``_convex_hull_expr``'s slope key:
    floor(slope * 2^52) as hi-digit floor division (HUGEINT //, exact by
    divisibility after the floor-mod subtraction) plus two 26-bit
    long-division digits (double division of ints < 2^48 then floor —
    quotient error <= 7.4e-9, fractional gaps >= 2.8e-7, so exact)."""
    return f"""(
      ({dy} - ((({dy}) % ({dx})) + ({dx})) % ({dx}))::HUGEINT // ({dx}) * 4503599627370496
      + floor((((({dy}) % ({dx})) + ({dx})) % ({dx})) * 67108864 / ({dx}))::HUGEINT * 67108864
      + floor(((((({dy}) % ({dx})) + ({dx})) % ({dx})) * 67108864 % ({dx})) * 67108864 / ({dx}))::HUGEINT)"""


def _hull_oracle_sql() -> str:
    """Monotone-chain convex hull, CTE-for-CTE with the Spark expression:
    distinct 1e-4 grid points -> 4-extreme Akl–Toussaint prefilter ->
    per-x y-extremes -> supporting-line test on exact slope keys ->
    lower-asc + upper-desc ring, closed, WKT-rendered from integers."""
    minl = _hull_key_sql("(u.y - c.y)", "(u.x - c.x)")
    maxr = _hull_key_sql("(c.y - u.y)", "(c.x - u.x)")
    return f"""WITH pts AS (
  SELECT DISTINCT c_custkey % 4 AS grp,
         floor((((7 * c_custkey) % 360 - 180) + 0.25) * 10000 + 0.5)::BIGINT AS x,
         floor(((c_custkey % 180 - 90) + 0.25) * 10000 + 0.5)::BIGINT AS y
  FROM customer),
ranked AS (
  SELECT grp, x, y,
         row_number() OVER (PARTITION BY grp ORDER BY x, y) AS rw,
         row_number() OVER (PARTITION BY grp ORDER BY x DESC, y DESC) AS re,
         row_number() OVER (PARTITION BY grp ORDER BY y DESC, x DESC) AS rn,
         row_number() OVER (PARTITION BY grp ORDER BY y, x) AS rs
  FROM pts),
ext AS (
  SELECT grp,
         max(CASE WHEN rw = 1 THEN x END) AS wx, max(CASE WHEN rw = 1 THEN y END) AS wy,
         max(CASE WHEN rn = 1 THEN x END) AS nx, max(CASE WHEN rn = 1 THEN y END) AS ny,
         max(CASE WHEN re = 1 THEN x END) AS ex, max(CASE WHEN re = 1 THEN y END) AS ey,
         max(CASE WHEN rs = 1 THEN x END) AS sx, max(CASE WHEN rs = 1 THEN y END) AS sy
  FROM ranked GROUP BY grp),
cand AS (
  SELECT p.grp, p.x, p.y
  FROM pts p JOIN ext e USING (grp)
  WHERE NOT (
    (e.nx - e.wx) * (p.y - e.wy) - (e.ny - e.wy) * (p.x - e.wx) < 0
    AND (e.ex - e.nx) * (p.y - e.ny) - (e.ey - e.ny) * (p.x - e.nx) < 0
    AND (e.sx - e.ex) * (p.y - e.ey) - (e.sy - e.ey) * (p.x - e.ex) < 0
    AND (e.wx - e.sx) * (p.y - e.sy) - (e.wy - e.sy) * (p.x - e.sx) < 0)),
ucand AS (SELECT grp, x, max(y) AS y FROM cand GROUP BY 1, 2),
lcand AS (SELECT grp, x, min(y) AS y FROM cand GROUP BY 1, 2),
ukeys AS (
  SELECT u.grp, u.x, u.y,
    min(CASE WHEN c.x < u.x THEN {minl}
    END) AS minl,
    max(CASE WHEN c.x > u.x THEN {maxr}
    END) AS maxr
  FROM ucand u JOIN cand c ON c.grp = u.grp
  GROUP BY 1, 2, 3),
uverts AS (SELECT grp, x, y FROM ukeys WHERE minl IS NULL OR maxr IS NULL OR minl > maxr),
lkeys AS (
  SELECT u.grp, u.x, u.y,
    max(CASE WHEN c.x < u.x THEN {minl}
    END) AS maxl,
    min(CASE WHEN c.x > u.x THEN {maxr}
    END) AS minr
  FROM lcand u JOIN cand c ON c.grp = u.grp
  GROUP BY 1, 2, 3),
lverts AS (SELECT grp, x, y FROM lkeys WHERE maxl IS NULL OR minr IS NULL OR maxl < minr),
lchain AS (SELECT grp, list(struct_pack(x := x, y := y) ORDER BY x) AS l FROM lverts GROUP BY grp),
uchain AS (SELECT grp, list(struct_pack(x := x, y := y) ORDER BY x DESC) AS u FROM uverts GROUP BY grp),
rings AS (
  SELECT lc.grp,
    list_concat(list_concat(lc.l,
      CASE WHEN len(u3.u3) > 0 AND u3.u3[-1] = lc.l[1]
           THEN u3.u3[:len(u3.u3) - 1] ELSE u3.u3 END),
      [lc.l[1]]) AS ring
  FROM lchain lc
  JOIN (SELECT uc.grp,
          CASE WHEN len(uc.u) > 0 AND uc.u[1] = lc2.l[-1]
               THEN uc.u[2:] ELSE uc.u END AS u3
        FROM uchain uc JOIN lchain lc2 USING (grp)) u3 USING (grp)),
wkts AS (
  SELECT grp,
    'POLYGON ((' || array_to_string(list_transform(ring, rp ->
      (CASE WHEN rp.x < 0 THEN '-' ELSE '' END) || (abs(rp.x) // 10000)::VARCHAR
      || '.' || lpad((abs(rp.x) % 10000)::VARCHAR, 4, '0') || ' ' ||
      (CASE WHEN rp.y < 0 THEN '-' ELSE '' END) || (abs(rp.y) // 10000)::VARCHAR
      || '.' || lpad((abs(rp.y) % 10000)::VARCHAR, 4, '0')), ', ') || '))' AS hull,
    len(ring)::BIGINT AS n_vertices
  FROM rings),
n AS (SELECT c_custkey % 4 AS grp, count(*) AS n FROM customer GROUP BY 1)
SELECT w.grp, w.hull, w.n_vertices, n.n
FROM wkts w JOIN n USING (grp) ORDER BY w.grp"""


@q("soql_geo_hull", _hull_oracle_sql())
def soql_geo_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA's ``convex_hull`` geo aggregate (+ ``num_points`` vertex count)
    compiled from ``$select``: the EXACT convex hull as a closed
    counterclockwise WKT POLYGON ring (lower chain x-asc, upper chain
    x-desc, collinear mid-edge points excluded — vertex-minimal), the
    true-hull upgrade of the round-11 extent-box approximation. The
    compiler (soql.py _convex_hull_expr) quantizes points to the 1e-4
    grid the WKT has always rendered, prefilters with the Akl–Toussaint
    4-extreme quadrilateral, decides membership with the supporting-line
    test on EXACT integer slope keys (floor(slope*2^52) via two 26-bit
    long-division digits), and the oracle mirrors every step CTE-for-CTE
    (HUGEINT keys), so the ring hash-matches bit-for-bit — both engines
    were also cross-checked against a monotone-chain reference on
    adversarial cases (collinear, vertical, circle, duplicates, single
    point). ``num_points`` counts WKT coordinate pairs (comma chunks) so
    it works on hull output and WKT literals alike. Scale: one linear
    collect of DISTINCT grid points per group, a linear prefilter, and a
    quadratic membership test on the hull-adjacent survivors only."""
    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    return soql_query(
        pts,
        {
            "$select": (
                "c_custkey % 4 AS grp, convex_hull(lat, lon) AS hull, "
                "cast(num_points(convex_hull(lat, lon)) AS BIGINT) AS n_vertices, "
                "count(*) AS n"
            ),
            "$group": "c_custkey % 4",
            "$order": "grp",
        },
    )


@q(
    "soql_datetime_median",
    """SELECT event_type,
              round(median(value), 6) AS med_value,
              min(date_part('minute', ts))::BIGINT AS min_mm,
              max(date_part('second', ts))::BIGINT AS max_ss,
              count(*) AS n
       FROM events
       WHERE date_part('second', ts) < 30
       GROUP BY 1 ORDER BY 1""",
)
def soql_datetime_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SoQL functions the round-11 surface sweep added, exercised in
    one request: ``median`` (SoQL 2.1 number aggregate — Spark's exact
    interpolated median matches DuckDB's), ``date_extract_mm`` /
    ``date_extract_ss`` (minute/second extracts, previously missing from
    the rename table), and ``get_utc_date()`` (→ current_timestamp; used
    in a tautological NOT-NULL guard so the query stays deterministic
    while proving the zero-arg rewrite compiles). Scale: bounded
    event_type grain, partial-agg friendly except the median's per-group
    sort — which is the documented cost of an exact median."""
    e = load_table(spark, sf_dir, "events")
    return soql_query(
        e,
        {
            "$select": (
                "event_type, round(median(value), 6) AS med_value, "
                "cast(min(date_extract_mm(ts)) AS BIGINT) AS min_mm, "
                "cast(max(date_extract_ss(ts)) AS BIGINT) AS max_ss, "
                "count(*) AS n"
            ),
            "$where": "date_extract_ss(ts) < 30 AND get_utc_date() IS NOT NULL",
            "$group": "event_type",
            "$order": "event_type",
        },
    )


@q(
    "soql_fixed_floating",
    """SELECT event_type,
              min(date_part('hour', timezone('Pacific/Honolulu',
                                             timezone('UTC', ts))))::BIGINT
                AS min_hst_hh,
              max(date_part('hour', timezone('Pacific/Honolulu',
                                             timezone('UTC', ts))))::BIGINT
                AS max_hst_hh,
              count(*) AS n
       FROM events
       WHERE date_part('year', timezone('UTC', timezone('Pacific/Honolulu',
                 timezone('UTC', ts))::TIMESTAMP)) = date_part('year', ts)
          OR TRUE
       GROUP BY 1 ORDER BY 1""",
)
def soql_fixed_floating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL's fixed/floating timestamp pair: ``to_floating_timestamp(ts,
    zone)`` (UTC instant → wall clock; → from_utc_timestamp) and
    ``to_fixed_timestamp`` (inverse; → to_utc_timestamp), exercised with a
    fixed-offset zone (Pacific/Honolulu, UTC−10, no DST) so both engines
    agree deterministically: per event_type, the min/max local-clock hour.
    The WHERE carries the inverse conversion in an always-true guard —
    proving the roundtrip compiles and inverts without adding
    nondeterminism. Scale: map-side zone shift, bounded grain."""
    e = load_table(spark, sf_dir, "events")
    zone = "'Pacific/Honolulu'"
    return soql_query(
        e,
        {
            "$select": (
                "event_type, "
                f"cast(min(date_extract_hh(to_floating_timestamp(ts, {zone}))) AS BIGINT) AS min_hst_hh, "
                f"cast(max(date_extract_hh(to_floating_timestamp(ts, {zone}))) AS BIGINT) AS max_hst_hh, "
                "count(*) AS n"
            ),
            "$where": (
                f"date_extract_y(to_fixed_timestamp(to_floating_timestamp(ts, {zone}), {zone})) = date_extract_y(ts)"
                " OR TRUE"
            ),
            "$group": "event_type",
            "$order": "event_type",
        },
    )


@q(
    "soql_text_case",
    """SELECT upper(lang) || '/' || coalesce(source, 'unknown') AS bucket,
              CASE WHEN n_chars > 200 THEN 'long'
                   WHEN n_chars > 50 THEN 'mid'
                   ELSE 'short' END AS size_class,
              count(*) AS n
       FROM documents
       WHERE lang IN ('en', 'de', 'fr')
         AND lang IS NOT NULL
         AND lower(source) NOT LIKE '%bogus%'
       GROUP BY 1, 2 ORDER BY 1, 2""",
)
def soql_text_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SoQL text/conditional surface in one request: ``upper``/
    ``lower``, ``||`` string concat, ``coalesce``, variadic ``case(...)``
    (→ CASE WHEN), ``IN`` lists, ``IS NOT NULL``, and ``NOT LIKE`` — the
    operators a portal user composes in every $select/$where. Compiled
    from SoQL strings through the conservative token filter; the oracle
    restates it in ANSI SQL. Scale: map-side expressions + a bounded
    (lang x size-class) rollup."""
    d = load_table(spark, sf_dir, "documents")
    return soql_query(
        d,
        {
            "$select": (
                "upper(lang) || '/' || coalesce(source, 'unknown') AS bucket, "
                "case(n_chars > 200, 'long', n_chars > 50, 'mid', true, 'short') AS size_class, "
                "count(*) AS n"
            ),
            "$where": (
                "lang in ('en', 'de', 'fr') AND lang IS NOT NULL "
                "AND lower(source) NOT LIKE '%bogus%'"
            ),
            "$group": (
                "upper(lang) || '/' || coalesce(source, 'unknown'), "
                "case(n_chars > 200, 'long', n_chars > 50, 'mid', true, 'short')"
            ),
            "$order": "bucket, size_class",
        },
    )
