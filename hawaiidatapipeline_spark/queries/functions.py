"""Scalar-function families (SURVEY.md §2.H) — the SoQL scalar library plus
Ruby string/date munging, as built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen; no Python in the hot path).

Oracle-parity notes (probed against DuckDB 1.0):
- DuckDB ``year()``/``floor()``/``datediff`` return BIGINT/DECIMAL/etc. —
  integer-valued computed columns are cast to BIGINT on BOTH sides.
- DuckDB ``dayofweek`` is 0=Sunday; Spark ``dayofweek`` is 1=Sunday → oracle
  adds 1.
- ``sign``: Spark double vs DuckDB tinyint → oracle casts to DOUBLE.
- Spark ``slice(arr, start, length)`` vs DuckDB ``list_slice(l, start,
  end_inclusive)``.
- Floating results rounded to 6 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()


@q(
    "fn_string",
    """SELECT c_custkey,
              upper(c_name)                       AS uname,
              lower(c_mktsegment)                 AS lseg,
              concat(c_name, ':', c_mktsegment)   AS tagged,
              substring(c_name, 1, 8)             AS prefix8,
              trim(c_name)                        AS trimmed,
              length(c_name)::BIGINT              AS name_len,
              lpad(c_custkey::VARCHAR, 12, '0')   AS padded_key,
              replace(c_name, 'Customer', 'Cust') AS short_name
       FROM customer""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("tagged"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.trim("c_name").alias("trimmed"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded_key"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("short_name"),
    )


@q(
    "fn_regex",
    r"""SELECT c_custkey,
               regexp_extract(c_name, 'Customer#(\d+)', 1)        AS key_digits,
               regexp_extract(c_name, 'Customer#(\d+)', 1)::BIGINT AS key_num,
               regexp_replace(c_name, '0+', '0', 'g')             AS squeezed,
               regexp_matches(c_name, '^Customer#0{3}')           AS has_triple_zero
        FROM customer""",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep to RE2-compatible patterns so Java regex ≡ DuckDB RE2."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("key_digits"),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("key_num"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.col("c_name").rlike("^Customer#0{3}").alias("has_triple_zero"),
    )


@q(
    "fn_date_extract",
    """SELECT o_orderkey,
              year(o_orderdate)            AS o_year,
              month(o_orderdate)           AS o_month,
              day(o_orderdate)             AS o_day,
              (dayofweek(o_orderdate) + 1) AS o_dow,
              quarter(o_orderdate)         AS o_quarter,
              dayofyear(o_orderdate)       AS o_doy
       FROM orders""",
)
def fn_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.dayofweek("o_orderdate").cast("long").alias("o_dow"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.dayofyear("o_orderdate").cast("long").alias("o_doy"),
    )


@q(
    "fn_date_trunc",
    """SELECT date_trunc('month', o_orderdate)::DATE AS order_month,
              count(*) AS n_orders,
              round(sum(o_totalprice), 6) AS month_revenue
       FROM orders GROUP BY 1""",
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncation as a rollup key — the canonical time-partitioning idiom."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("month_revenue"),
        )
    )


@q(
    "fn_date_arith",
    """SELECT o_orderkey,
              date_diff('day', o_orderdate, DATE '2000-01-01')  AS days_to_y2k,
              (o_orderdate + INTERVAL 30 DAY)::DATE             AS due_date,
              (o_orderdate - INTERVAL 7 DAY)::DATE              AS week_before,
              floor(epoch(o_orderdate))::BIGINT                 AS epoch_s
       FROM orders""",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_y2k"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
        F.date_sub(F.col("o_orderdate"), 7).alias("week_before"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@q(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
              round(l_extendedprice, 1)                  AS rounded1,
              floor(l_extendedprice)::BIGINT             AS floored,
              ceil(l_extendedprice)::BIGINT              AS ceiled,
              abs(l_quantity - 25.0)                     AS dist25,
              round(ln(l_extendedprice), 6)              AS log_price,
              round(log10(l_extendedprice), 6)           AS log10_price,
              round(pow(l_discount, 2), 6)               AS disc_sq,
              round(sqrt(l_quantity), 6)                 AS root_qty,
              (l_orderkey % 7)                           AS key_mod7,
              sign(l_quantity - 25.0)::DOUBLE            AS side
       FROM lineitem""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("rounded1"),
        F.floor("l_extendedprice").alias("floored"),
        F.ceil("l_extendedprice").alias("ceiled"),
        F.abs(F.col("l_quantity") - 25.0).alias("dist25"),
        F.round(F.log("l_extendedprice"), 6).alias("log_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("root_qty"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.signum(F.col("l_quantity") - 25.0).alias("side"),
    )


@q(
    "fn_conditional",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice >= 200000 THEN 'high'
                   WHEN o_totalprice >= 75000  THEN 'mid'
                   ELSE 'low' END                          AS price_band,
              coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
              greatest(o_totalprice, 100000.0)             AS floor_price,
              least(o_totalprice, 100000.0)                AS capped_price
       FROM orders""",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 75000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floor_price"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
    )


@q(
    "fn_cast",
    """SELECT c_custkey,
              c_custkey::VARCHAR            AS key_str,
              c_nationkey::BIGINT           AS nation_l,
              c_nationkey::DOUBLE           AS nation_d,
              substring(c_name, 10, 9)::BIGINT AS parsed_key,
              (c_acctbal > 0)               AS in_credit
       FROM customer""",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``to_number``/``to_text`` analog. double→int is avoided — Spark
    truncates while DuckDB rounds; the engine's policy is explicit
    floor/ceil/round before integer casts."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_nationkey").cast("long").alias("nation_l"),
        F.col("c_nationkey").cast("double").alias("nation_d"),
        F.substring("c_name", 10, 9).cast("long").alias("parsed_key"),
        (F.col("c_acctbal") > 0).alias("in_credit"),
    )


@q(
    "fn_json",
    """SELECT event_id,
              json_extract_string(props, '$.k')          AS k_str,
              json_extract_string(props, '$.k')::BIGINT  AS k_num,
              json_extract_string(props, '$.missing')    AS absent
       FROM events""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SODA nested-object analog: typed extraction from a JSON string column."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@q(
    "fn_map",
    """SELECT event_id,
              json_extract_string(props, '$.k')::INT AS k_val,
              1::BIGINT                              AS n_keys,
              'k'                                    AS first_key
       FROM events""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``from_json`` → MapType — the dynamic-schema path for free-form props.
    (Fixture props are single-key objects; oracle encodes that shape.)"""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return e.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.size(m).cast("long").alias("n_keys"),
        F.element_at(F.array_sort(F.map_keys(m)), 1).alias("first_key"),
    )


@q(
    "fn_array",
    """SELECT doc_id,
              len(string_split(text, ' '))::BIGINT                 AS n_tokens,
              list_contains(string_split(text, ' '), 'merge')      AS has_merge,
              array_to_string(list_slice(string_split(text, ' '), 1, 3), '|')
                                                                   AS first3,
              string_split(text, ' ')[2]                           AS second_token,
              array_to_string(
                  list_sort(list_slice(string_split(text, ' '), 1, 5)), '|')
                                                                   AS first5_sorted
       FROM documents""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice/sort/contains — arrays serialized to '|'-joined strings
    because the driver's pandas canonicalizer cannot hash array cells."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "merge").alias("has_merge"),
        F.concat_ws("|", F.slice(toks, 1, 3)).alias("first3"),
        F.element_at(toks, 2).alias("second_token"),
        F.concat_ws("|", F.array_sort(F.slice(toks, 1, 5))).alias("first5_sorted"),
    )


@q(
    "fn_explode",
    """SELECT doc_id, t.token, t.pos::BIGINT AS pos
       FROM documents,
            LATERAL (SELECT unnest(string_split(text, ' ')) AS token,
                            generate_subscripts(string_split(text, ' '), 1) AS pos) t
       WHERE doc_id < 100""",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array → rows with position (UNNEST WITH ORDINALITY). posexplode is
    0-based → +1 to match SQL subscripts."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", "token", (F.col("pos0") + 1).cast("long").alias("pos"))


@q(
    "fn_hash",
    """SELECT doc_id,
              md5(lower(trim(text)))    AS content_md5,
              sha256(lang || ':' || source) AS tag_sha
       FROM documents""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing for keys/dedup ids. xxhash64 exists Spark-side but is
    seed-incompatible with other engines, so the checked query uses md5/sha2."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
        F.sha2(F.concat_ws(":", "lang", "source"), 256).alias("tag_sha"),
    )


@q(
    "fn_geo_distance",
    """WITH pts AS (
         SELECT c_custkey,
                (c_custkey * 7919 % 18000) / 100.0 - 90.0    AS lat,
                (c_custkey * 104729 % 36000) / 100.0 - 180.0 AS lon
         FROM customer
       )
       SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon,
              round(2.0 * 6371000.0 * asin(sqrt(
                  pow(sin(radians(21.3069 - lat) / 2), 2)
                  + cos(radians(lat)) * cos(radians(21.3069))
                    * pow(sin(radians(-157.8583 - lon) / 2), 2))), 2) AS dist_m
       FROM pts
       WHERE round(2.0 * 6371000.0 * asin(sqrt(
                 pow(sin(radians(21.3069 - lat) / 2), 2)
                 + cos(radians(lat)) * cos(radians(21.3069))
                   * pow(sin(radians(-157.8583 - lon) / 2), 2))), 2) <= 3000000.0""",
)
def fn_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SODA ``location`` surface: SoQL ``distance_in_meters`` +
    ``within_circle`` (functions/geo.py), composed from built-in trig so the
    whole predicate stays in codegen. Coordinates are derived from c_custkey
    with integer arithmetic (fixtures carry no geo columns) — identical on
    both engines, so the oracle is exact. Circle center: Honolulu."""
    from hawaiidatapipeline_spark.functions.geo import distance_in_meters

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("c_custkey") * 104729 % 36000) / 100.0 - 180.0).alias("lon"),
    )
    dist = F.round(
        distance_in_meters(F.col("lat"), F.col("lon"), F.lit(21.3069), F.lit(-157.8583)), 2
    )
    return pts.filter(dist <= 3000000.0).select(
        "c_custkey",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        dist.alias("dist_m"),
    )


@q(
    "fn_url_parse",
    """WITH urls AS (
         SELECT c_custkey,
                'https://portal' || (c_custkey % 3) || '.hawaii.gov/api/views/'
                  || c_mktsegment || '?page=' || (c_custkey % 7) AS url
         FROM customer
       )
       SELECT c_custkey,
              regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
              regexp_extract(url, '://([^/]+)/', 1) AS host,
              regexp_extract(url, '://[^/]+(/[^?]*)', 1) AS path,
              regexp_extract(url, 'page=([0-9]+)', 1)::BIGINT AS page
       FROM urls""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SODA ``url`` type surface: scheme/host/path/query-param
    extraction. Implemented with portable regexes (Java ∩ RE2) rather than
    Spark's ``parse_url`` so the oracle is exact; URLs are synthesized from
    keys (fixtures carry none) in the portal's resource-URL shape."""
    c = load_table(spark, sf_dir, "customer")
    urls = c.select(
        "c_custkey",
        F.concat(
            F.lit("https://portal"),
            (F.col("c_custkey") % 3).cast("string"),
            F.lit(".hawaii.gov/api/views/"),
            F.col("c_mktsegment"),
            F.lit("?page="),
            (F.col("c_custkey") % 7).cast("string"),
        ).alias("url"),
    )
    return urls.select(
        "c_custkey",
        F.regexp_extract("url", r"^([a-z]+)://", 1).alias("scheme"),
        F.regexp_extract("url", r"://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"page=([0-9]+)", 1).cast("long").alias("page"),
    )


@q(
    "fn_money_decimal",
    """SELECT o_orderpriority,
              CAST(sum(o_totalprice::DECIMAL(18,2)) AS VARCHAR) AS total_money,
              CAST(min(o_totalprice::DECIMAL(18,2)) AS VARCHAR) AS min_money,
              CAST(max(o_totalprice::DECIMAL(18,2)) AS VARCHAR) AS max_money
       FROM orders GROUP BY o_orderpriority""",
)
def fn_money_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SODA ``money`` type: exact DECIMAL(18,2) arithmetic. Unlike the
    double aggregates elsewhere (rounded to 6 dp to absorb summation-order
    differences), decimal sums are EXACT in any order on both engines — no
    rounding appears on either side. This is the engine's recommended type
    for monetary measures at 100 TB (bit-for-bit reproducible re-runs).

    Outputs are serialized as canonical decimal STRINGS on both sides:
    DuckDB's pandas conversion degrades DECIMAL to float64 (lossy at 9
    significant digits), so comparing the native types hash-mismatches even
    when the decimals are identical (driver fail, round 2). String form
    preserves exactness AND survives any client's type bridging."""
    o = load_table(spark, sf_dir, "orders")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select("o_orderpriority", money.alias("m")).groupBy("o_orderpriority").agg(
        F.sum("m").cast("string").alias("total_money"),
        F.min("m").cast("string").alias("min_money"),
        F.max("m").cast("string").alias("max_money"),
    )


@q(
    "fn_array_topk_struct",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS token
         FROM documents
       ),
       ranked AS (
         SELECT doc_id, token, length(token) AS tok_len,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY length(token) DESC, token) AS rank
         FROM toks
       )
       SELECT doc_id, rank, token, tok_len FROM ranked WHERE rank <= 3""",
)
def fn_array_topk_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type manipulation (the SODA nested-object analog taken
    further): per doc, the 3 longest tokens computed ENTIRELY with
    higher-order array functions — transform into (neg-length, token)
    structs, array_sort (field-order comparison gives length desc, token
    asc), slice, posexplode. Zero shuffles and zero window state: at 100 TB
    this replaces a window top-k whenever the per-row collection already
    holds the data — the oracle IS that window formulation, proving
    equivalence."""
    d = load_table(spark, sf_dir, "documents")
    structs = F.transform(
        F.split("text", " "),
        lambda t: F.struct((-F.length(t)).alias("nl"), t.alias("token")),
    )
    top3 = F.slice(F.array_sort(structs), 1, 3)
    return (
        d.select("doc_id", F.posexplode(top3).alias("pos0", "s"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).cast("long").alias("rank"),
            F.col("s.token").alias("token"),
            (-F.col("s.nl")).cast("long").alias("tok_len"),
        )
    )


@q(
    "fn_null_semantics",
    """SELECT e.event_id,
              v IS NOT DISTINCT FROM w AS nullsafe_eq,
              coalesce(v, w, 0.0) AS first_present,
              CASE WHEN v IS NULL THEN 'missing' ELSE 'present' END AS v_status,
              nullif(e.event_type, 'error') AS type_or_null
       FROM (SELECT event_id, event_type,
                    CASE WHEN event_type <> 'error' THEN round(value, 6) END AS v,
                    CASE WHEN event_type <> 'view'  THEN round(value, 6) END AS w
             FROM events) e""",
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics end-to-end: null-safe equality (``<=>`` /
    IS NOT DISTINCT FROM), coalesce chains, NULL-aware CASE, nullif. The
    masked v/w columns manufacture all four null/null combinations from
    deterministic data."""
    e = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") != "error", F.round("value", 6))
    w = F.when(F.col("event_type") != "view", F.round("value", 6))
    return e.select(
        "event_id",
        v.eqNullSafe(w).alias("nullsafe_eq"),
        F.coalesce(v, w, F.lit(0.0)).alias("first_present"),
        F.when(v.isNull(), "missing").otherwise("present").alias("v_status"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
    )


@q(
    "fn_timezone",
    """SELECT date_part('hour', timezone('Pacific/Honolulu', ts::TIMESTAMPTZ))::INT AS hst_hour,
              count(*) AS n,
              min(timezone('Pacific/Honolulu', ts::TIMESTAMPTZ)) AS first_local,
              max(timezone('Pacific/Honolulu', ts::TIMESTAMPTZ)) AS last_local
       FROM events GROUP BY 1""",
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion — the reference served HAWAII open data, so
    every portal timestamp is Pacific/Honolulu wall clock over UTC
    storage. ``from_utc_timestamp`` shifts event times to HST (fixed
    UTC-10, no DST — immune to tz-database drift between engines) and
    the local-hour histogram is what a "when do things happen" dashboard
    query looks like. Oracle: DuckDB's ICU ``timezone()`` under a UTC
    session recomputes the identical wall-clock values."""
    e = load_table(spark, sf_dir, "events")
    lts = F.from_utc_timestamp("ts", "Pacific/Honolulu")
    return (
        e.select(lts.alias("lts"))
        .groupBy(F.hour("lts").alias("hst_hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("lts").alias("first_local"),
            F.max("lts").alias("last_local"),
        )
    )


@q(
    "fn_bitwise",
    """SELECT o_orderkey,
              o_orderkey & 255 AS low_byte,
              o_orderkey | 15 AS or_mask,
              xor(o_orderkey, 170) AS xored,
              (o_orderkey * 256)::BIGINT AS shl8,
              (o_orderkey // 16)::BIGINT AS shr4,
              bit_count(o_orderkey) AS popcount
       FROM orders WHERE o_orderkey < 5000""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR masks, shifts, popcount — the
    primitives under bitmap indexes, bloom filters, and the Z-order/
    SimHash operators elsewhere in this engine. Shifts are expressed as
    multiply/divide on both sides (DuckDB's << widens to BIT, while
    integer arithmetic stays BIGINT on both engines); all integer-exact,
    pure codegen."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(255).alias("low_byte"),
        k.bitwiseOR(15).alias("or_mask"),
        k.bitwiseXOR(170).alias("xored"),
        (k * 256).cast("long").alias("shl8"),
        F.floor(k / 16).cast("long").alias("shr4"),
        F.bit_count(k).alias("popcount"),
    )


@q(
    "fn_uuid_deterministic",
    """WITH h AS (
         SELECT c_custkey, md5('hdp-ns:' || c_custkey::VARCHAR) AS hx
         FROM customer),
       built AS (
         SELECT c_custkey,
                substring(hx, 1, 8) || '-' || substring(hx, 9, 4)
                || '-3' || substring(hx, 14, 3) || '-'
                || CASE substring(hx, 17, 1)
                     WHEN '0' THEN '8' WHEN '1' THEN '9'
                     WHEN '2' THEN 'a' WHEN '3' THEN 'b'
                     WHEN '4' THEN '8' WHEN '5' THEN '9'
                     WHEN '6' THEN 'a' WHEN '7' THEN 'b'
                     WHEN '8' THEN '8' WHEN '9' THEN '9'
                     WHEN 'a' THEN 'a' WHEN 'b' THEN 'b'
                     WHEN 'c' THEN '8' WHEN 'd' THEN '9'
                     WHEN 'e' THEN 'a' ELSE 'b'
                   END || substring(hx, 18, 3) || '-'
                || substring(hx, 21, 12) AS uuid3
         FROM h),
       summary AS (
         SELECT count(*)::BIGINT AS n_keys,
                count(DISTINCT uuid3)::BIGINT AS n_distinct
         FROM built)
       SELECT b.c_custkey, b.uuid3, s.n_keys, s.n_distinct
       FROM built b CROSS JOIN summary s
       ORDER BY b.c_custkey LIMIT 10""",
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic namespace UUID (RFC 4122 v3 layout) from the md5 of
    a namespaced business key — the stable-surrogate-key generator a
    warehouse uses when the same entity must mint the same id on every
    run and every executor (no sequences, no coordination — the same
    reason as etl_data_vault_keys, but emitting the standard UUID wire
    format). Version nibble pinned to '3'; the variant nibble maps the
    17th hex digit onto [89ab] via (d & 0x3) | 0x8, written as an
    explicit 16-way CASE so both engines run the identical pure-string
    computation (no bit ops on hex chars needed). The distinct-count
    summary guards against construction bugs that collapse keys. Shape:
    map-only md5 + substring assembly; TakeOrdered sample."""
    c = load_table(spark, sf_dir, "customer")
    hx = F.md5(F.concat(F.lit("hdp-ns:"), F.col("c_custkey").cast("string")))
    variant = F.create_map(
        *[
            F.lit(x)
            for pair in [
                ("0", "8"), ("1", "9"), ("2", "a"), ("3", "b"),
                ("4", "8"), ("5", "9"), ("6", "a"), ("7", "b"),
                ("8", "8"), ("9", "9"), ("a", "a"), ("b", "b"),
                ("c", "8"), ("d", "9"), ("e", "a"), ("f", "b"),
            ]
            for x in pair
        ]
    )
    built = c.select(
        "c_custkey",
        F.concat(
            F.substring(hx, 1, 8), F.lit("-"),
            F.substring(hx, 9, 4), F.lit("-3"),
            F.substring(hx, 14, 3), F.lit("-"),
            variant[F.substring(hx, 17, 1)],
            F.substring(hx, 18, 3), F.lit("-"),
            F.substring(hx, 21, 12),
        ).alias("uuid3"),
    )
    summary = built.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.countDistinct("uuid3").cast("long").alias("n_distinct"),
    )
    return (
        built.orderBy("c_custkey")
        .limit(10)
        .crossJoin(F.broadcast(summary))
        .select("c_custkey", "uuid3", "n_keys", "n_distinct")
    )
