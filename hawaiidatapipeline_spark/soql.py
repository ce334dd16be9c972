"""SoQL → Spark compiler: run the reference's actual query language.

The reference was a SODA client — every query its users wrote is a SoQL
query string bundle (``$select``/``$where``/``$group``/``$having``/
``$order``/``$limit``/``$offset``/``$q``, dev.socrata.com). This module
compiles that request surface onto a DataFrame, so a reference user's
queries run verbatim against the engine:

    soql_query(df, {"$select": "lang, count(*) AS n",
                    "$where":  "starts_with(source, 'src1')",
                    "$group":  "lang", "$order": "n DESC", "$limit": "10"})

Strategy: SoQL is close enough to ANSI SQL that the clauses map 1:1 onto a
single SELECT over a temp view — Catalyst then owns optimization exactly as
for hand-written SQL. The SoQL-specific pieces are handled explicitly:

- SoQL scalar functions are rewritten to Spark SQL equivalents
  (``starts_with``→``startswith``, ``date_extract_y``→``year``,
  ``date_trunc_ym``→``date_trunc('MONTH', …)``, variadic ``case(…)``→
  ``CASE WHEN``, ``within_circle``/``distance_in_meters``→haversine,
  ``within_box``→sargable comparisons that reach PushedFilters,
  ``within_polygon``/``intersects``→compile-time ray-cast unroll,
  ``extent``→decimal-pinned bounding-box aggregate).
- ``$q`` (portal full-text search) becomes a case-insensitive ``contains``
  OR-fold over the frame's string columns — the engine twin of the
  portal-side text index.
- Clause text is validated against a conservative token filter before
  splicing into SQL (identifiers, literals, the SoQL operator set); anything
  else (semicolons, comments, unknown functions) raises ``SoqlError``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SoqlError",
    "soql_query",
    "soql_query_string",
    "soql_query_chained",
    "rewrite_soql_expr",
]


class SoqlError(ValueError):
    """Unsupported or malformed SoQL."""


# SoQL name → Spark SQL name, arity-preserving straight renames.
_RENAME = {
    "starts_with": "startswith",
    "date_extract_y": "year",
    "date_extract_m": "month",
    "date_extract_d": "day",
    "date_extract_hh": "hour",
    "date_extract_mm": "minute",
    "date_extract_ss": "second",
    "date_extract_woy": "weekofyear",
    "date_extract_dow": "dayofweek",
    "get_utc_date": "current_timestamp",
    # fixed_timestamp (UTC instant) <-> floating_timestamp (wall clock):
    # SoQL's pair maps 1:1 onto Spark's UTC-shift builtins
    "to_floating_timestamp": "from_utc_timestamp",
    "to_fixed_timestamp": "to_utc_timestamp",
}

# SoQL `::` cast datatype names → Spark SQL type names.
_CAST_TYPES = {
    "text": "string",
    "number": "double",
    "floating_timestamp": "timestamp",
    "fixed_timestamp": "timestamp",
    "boolean": "boolean",
}

# date_trunc_* takes one arg in SoQL; Spark's date_trunc takes (unit, col).
_TRUNC_UNITS = {"date_trunc_y": "YEAR", "date_trunc_ym": "MONTH", "date_trunc_ymd": "DAY"}

# Spark SQL functions allowed to pass through unchanged (ANSI ∩ SoQL core,
# plus the aggregates SoQL exposes). Conservative allow-list: anything not
# here and not SoQL-mapped raises. This is the PUBLIC user surface — names
# the compiler's own rewrites emit live in _REWRITE_GENERATED below
# (ADVICE r12: whitelisting them here silently widened the SoQL surface to
# user-written higher-order functions).
_PASSTHROUGH = {
    "upper", "lower", "length", "abs", "round", "floor", "ceil", "ceiling",
    "trim", "ltrim", "rtrim", "contains", "sum", "count", "avg", "min",
    "max", "coalesce", "concat", "substring", "replace", "stddev", "variance",
    "stddev_pop", "stddev_samp", "var_pop", "var_samp", "cast", "decimal",
    "year", "month", "day", "hour", "weekofyear", "dayofweek", "startswith",
    "date_trunc", "like", "between", "exp", "ln", "log", "power", "sqrt",
    "sin", "cos", "asin", "radians", "pow", "median", "minute", "second",
    "current_timestamp", "from_utc_timestamp", "to_utc_timestamp",
}

# Names EMITTED by the compiler's own rewrites (geo num_points, haversine,
# extent, the convex_hull monotone-chain machinery). Consulted ONLY when
# validating compiler OUTPUT (post-rewrite pass in soql_query) — a user
# expression containing one of these raises, keeping the public SoQL
# function surface exactly the documented set (ADVICE r12).
_REWRITE_GENERATED = {
    # geo rewrites (num_points vertex count)
    "size", "split",
    # convex_hull rewrite (_convex_hull_expr): collected point state +
    # higher-order hull machinery
    "element_at", "transform", "filter", "aggregate", "exists",
    "named_struct", "array_sort", "array_distinct", "collect_list",
    "slice", "reverse", "array_join", "lpad", "least", "greatest",
    "pmod", "array",
}

# SoQL-spelled functions consumed BY the rewrites (valid in user input,
# never present after rewriting), plus the straight renames/truncs.
_SOQL_REWRITTEN = {
    "case", "within_circle", "within_box", "within_polygon", "intersects",
    "distance_in_meters", "extent", "convex_hull", "simplify",
    "simplify_preserve_topology", "num_points",
} | set(_RENAME) | set(_TRUNC_UNITS)

# The full USER-facing function surface: what a clause may contain BEFORE
# rewriting. Compiler output validates against _PASSTHROUGH ∪
# _REWRITE_GENERATED instead.
_USER_SURFACE = _PASSTHROUGH | _SOQL_REWRITTEN

_VIEW_COUNTER = iter(range(10**9))

# boundary punctuation stripped from unquoted $q tokens — ASCII punctuation,
# the set Socrata's tokenizer discards at word edges ("merge," matches the
# word "merge"; interior punctuation like "o'brien" is preserved)
_Q_STRIP = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""


def _q_terms_tagged(q: str) -> list[tuple[str, bool]]:
    """SODA ``$q`` snippet tokenization: double-quoted spans become phrase
    terms (matched verbatim, case-insensitive); the remainder splits on
    whitespace into word terms with boundary punctuation stripped. ALL
    returned terms must match somewhere in the row — multi-token snippets
    AND together per the public spec, they are not one long substring.
    Returns (term, is_phrase) pairs: stemming (when enabled) applies only
    to word terms, never to quoted phrases."""
    terms: list[tuple[str, bool]] = []

    def grab(m: re.Match) -> str:
        if m.group(1).strip():
            terms.append((m.group(1), True))
        return " "

    rest = re.sub(r'"([^"]*)"', grab, q)
    for tok in rest.split():
        tok = tok.strip(_Q_STRIP)
        if tok:
            terms.append((tok, False))
    return terms


def _q_terms(q: str) -> list[str]:
    """Flat form of :func:`_q_terms_tagged` (phrase markers dropped)."""
    return [t for t, _ in _q_terms_tagged(q)]


# Suffix-strip rule shared VERBATIM by the Spark predicate, the DuckDB
# oracle, and the Python-side term stem: leftmost-anchored alternation at
# end-of-token, so every engine strips the same suffix. One plain suffix
# per token ("merges" ~ "merge", "scans" ~ "scan"); -ing/-ed forms with
# doubled consonants deliberately under-stem ("running" -> "runn").
_STEM_RE = "(ing|ed|s)$"


def _stem(token: str) -> str:
    return re.sub(_STEM_RE, "", token)

_TOKEN_RE = re.compile(
    r"""\s+|                                  # whitespace
        '(?:[^']|'')*'|                       # string literal ('' escape)
        \d+(?:\.\d+)?(?:[eE][+-]?\d+)?|       # number
        [A-Za-z_][A-Za-z_0-9]*|               # identifier / keyword
        ::|<=|>=|!=|<>|\|\||[-+*/%(),.<>=]    # operators & punctuation
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "in", "between", "is", "null", "true", "false",
    "like", "asc", "desc", "as", "when", "then", "else", "end", "case",
    "distinct",
}


def _check_tokens(clause: str, what: str, allowed: frozenset | set = None) -> None:
    """Reject anything outside the SoQL token set BEFORE SQL splicing.

    ``allowed`` picks the function surface: user clauses validate against
    ``_USER_SURFACE`` (documented SoQL names only — the default); the
    post-rewrite pass validates compiler OUTPUT against ``_PASSTHROUGH ∪
    _REWRITE_GENERATED`` so rewrite-emitted higher-order machinery never
    widens what a user may write (ADVICE r12)."""
    if allowed is None:
        allowed = _USER_SURFACE
    pos = 0
    while pos < len(clause):
        m = _TOKEN_RE.match(clause, pos)
        if not m:
            raise SoqlError(f"unsupported character in {what} at {clause[pos:pos+10]!r}")
        tok = m.group(0)
        pos = m.end()
        if tok[:1].isalpha() or tok[:1] == "_":
            low = tok.lower()
            is_call = clause[pos : pos + 1] == "("
            if is_call and low not in allowed and low not in _KEYWORDS:
                raise SoqlError(f"unsupported SoQL function {tok!r} in {what}")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not inside parens/strings."""
    parts, depth, start, i, in_str = [], 0, 0, 0, False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
        i += 1
    parts.append(s[start:].strip())
    return [p for p in parts if p]


def _rewrite_calls(s: str, name: str, fn) -> str:
    """Replace every ``name(args)`` call with ``fn(args_list)``; balanced-
    paren scan so nested calls survive."""
    out, i = [], 0
    pat = re.compile(rf"\b{re.escape(name)}\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(s, i)
        if not m:
            out.append(s[i:])
            return "".join(out)
        out.append(s[i : m.start()])
        depth, j, in_str = 1, m.end(), False
        while depth:
            if j >= len(s):
                raise SoqlError(f"unbalanced parens in {name}(...)")
            c = s[j]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        args = _split_top_level(s[m.end() : j - 1])
        out.append(fn(args))
        i = j


def _convex_hull_expr(lat: str, lon: str) -> str:
    """Exact convex hull of a point group as ONE Spark SQL aggregate
    expression — the true-hull upgrade of the old extent-box rendering
    (VERDICT r11 #5).

    Machinery (every step bit-identical in the DuckDB oracle):

    - Points are quantized to the 1e-4 grid the WKT has always rendered:
      ``floor(v * 10000 + 0.5)`` (half-up via floor — round() differs
      across engines), then de-duplicated and sorted — the collected
      state per group is DISTINCT grid points, bounded by the occupied
      1e-4 cells, not the row count.
    - Akl–Toussaint prefilter: points strictly inside the quadrilateral
      of the 4 extreme points can never be hull vertices and are dropped
      with 4 integer cross products per point (one linear pass).
    - Hull membership is the supporting-line test: p is an upper-hull
      vertex iff min over left points of slope(a,p) exceeds max over
      right points of slope(p,b) (endpoints vacuously in; strict > keeps
      the ring vertex-minimal). Slopes are compared EXACTLY via an
      integer order-embedding: key = floor(slope * 2^52) computed as two
      26-bit long-division digits (all int64-safe; summed in
      DECIMAL(38,0)) — distinct rationals with denominators <= 3.6e6
      differ by >= 1/dx1·dx2 >= 2^-44, so the 52-bit key separates them,
      and equal slopes map to equal keys.
    - Ring: lower chain (x asc), then upper chain (x desc) minus shared
      endpoints, closed on the start vertex — counterclockwise, the
      monotone-chain vertex order. Coordinates render sign/intpart/
      4-digit-frac from the grid integers, matching DECIMAL(14,4) text.

    Scale: the quadratic membership test runs on AT-filter SURVIVORS
    only (hull-adjacent points — O(sqrt n) expected on non-adversarial
    data); everything before it is one linear collect of distinct grid
    cells. Wrapped in transform(array(..), v -> ..) let-bindings so each
    stage is evaluated once per group."""
    qx = f"CAST(floor(({lon}) * 10000 + 0.5) AS BIGINT)"
    qy = f"CAST(floor(({lat}) * 10000 + 0.5) AS BIGINT)"
    pt = (
        f"CASE WHEN ({lat}) IS NULL OR ({lon}) IS NULL THEN NULL "
        f"ELSE named_struct('x', {qx}, 'y', {qy}) END"
    )
    pts = f"array_sort(array_distinct(collect_list({pt})))"

    def key(dy: str, dx: str) -> str:
        # floor(slope * 2^52): hi digit = floor(dy/dx) (pmod makes DIV a
        # floor), then two 26-bit remainder digits; 2^52 = 4503599627370496
        return (
            f"(CAST((({dy}) - pmod({dy}, {dx})) DIV ({dx}) AS DECIMAL(20,0))"
            f" * 4503599627370496"
            f" + ((pmod({dy}, {dx}) * 67108864) DIV ({dx})) * 67108864"
            f" + (pmod(pmod({dy}, {dx}) * 67108864, {dx}) * 67108864) DIV ({dx}))"
        )

    def cross(ax, ay, bx, by, px, py):
        return f"(({bx} - {ax}) * ({py} - {ay}) - ({by} - {ay}) * ({px} - {ax}))"

    n_pt = (
        "aggregate(ps, element_at(ps, 1), (na, np) -> "
        "CASE WHEN np.y > na.y OR (np.y = na.y AND np.x > na.x) "
        "THEN np ELSE na END)"
    )
    s_pt = (
        "aggregate(ps, element_at(ps, 1), (sa, sp) -> "
        "CASE WHEN sp.y < sa.y OR (sp.y = sa.y AND sp.x < sa.x) "
        "THEN sp ELSE sa END)"
    )
    ext = (
        f"named_struct('w', element_at(ps, 1), 'n', {n_pt}, "
        f"'e', element_at(ps, -1), 's', {s_pt})"
    )
    inside = " AND ".join(
        cross(f"xw.{a}.x", f"xw.{a}.y", f"xw.{b}.x", f"xw.{b}.y", "cp.x", "cp.y")
        + " < 0"
        for a, b in (("w", "n"), ("n", "e"), ("e", "s"), ("s", "w"))
    )
    cand = f"filter(ps, cp -> NOT ({inside}))"

    def verts(updown: str) -> str:
        # per-x y-extreme candidates, then the supporting-line test with
        # min/max slope keys over ALL candidates (least/greatest skip the
        # NULL init, so the running extreme needs no IS NULL branch)
        if updown == "u":
            ycmp, lagg, ragg, cmp_ = ">", "least", "greatest", ">"
        else:
            ycmp, lagg, ragg, cmp_ = "<", "greatest", "least", "<"
        xext = (
            f"filter(cs, fp -> NOT exists(cs, fq -> "
            f"fq.x = fp.x AND fq.y {ycmp} fp.y))"
        )
        ml = (
            f"aggregate(cs, CAST(NULL AS DECIMAL(38,0)), (la, lp) -> "
            f"CASE WHEN lp.x < hp.x THEN "
            f"{lagg}(la, {key('hp.y - lp.y', 'hp.x - lp.x')}) ELSE la END)"
        )
        mr = (
            f"aggregate(cs, CAST(NULL AS DECIMAL(38,0)), (ra, rp) -> "
            f"CASE WHEN rp.x > hp.x THEN "
            f"{ragg}(ra, {key('rp.y - hp.y', 'rp.x - hp.x')}) ELSE ra END)"
        )
        return (
            f"filter({xext}, hp -> element_at(transform("
            f"array(named_struct('ml', {ml}, 'mr', {mr})), mk -> "
            f"mk.ml IS NULL OR mk.mr IS NULL OR mk.ml {cmp_} mk.mr), 1))"
        )

    fmt_x = (
        "concat(CASE WHEN rp.x < 0 THEN '-' ELSE '' END, "
        "CAST(abs(rp.x) DIV 10000 AS STRING), '.', "
        "lpad(CAST(abs(rp.x) % 10000 AS STRING), 4, '0'))"
    )
    fmt_y = fmt_x.replace("rp.x", "rp.y")
    wkt = (
        f"concat('POLYGON ((', array_join(transform("
        f"concat(ul.l, uu, array(element_at(ul.l, 1))), rp -> "
        f"concat({fmt_x}, ' ', {fmt_y})), ', '), '))')"
    )
    # u2/u3: drop the upper chain's endpoints when they coincide with the
    # lower chain's last/first vertex (shared extremes), monotone-chain
    # ring assembly
    u2 = (
        "CASE WHEN size(ul.u) > 0 AND element_at(ul.u, 1) = "
        "element_at(ul.l, -1) THEN slice(ul.u, 2, size(ul.u) - 1) "
        "ELSE ul.u END"
    )
    ring_of = (
        f"element_at(transform(array({u2}), u2 -> "
        f"element_at(transform(array("
        f"CASE WHEN size(u2) > 0 AND element_at(u2, -1) = "
        f"element_at(ul.l, 1) THEN slice(u2, 1, size(u2) - 1) "
        f"ELSE u2 END), uu -> {wkt}), 1)), 1)"
    )
    body = (
        f"element_at(transform(array(named_struct("
        f"'l', {verts('l')}, 'u', reverse({verts('u')}))), ul -> "
        f"{ring_of}), 1)"
    )
    with_cand = f"element_at(transform(array({cand}), cs -> {body}), 1)"
    with_ext = f"element_at(transform(array({ext}), xw -> {with_cand}), 1)"
    return (
        f"element_at(transform(array({pts}), ps -> "
        f"CASE WHEN size(ps) = 0 THEN CAST(NULL AS STRING) "
        f"ELSE {with_ext} END), 1)"
    )


def rewrite_soql_expr(expr: str) -> str:
    """SoQL expression → Spark SQL expression (function-level rewrites)."""
    s = expr
    # variadic case(c1, v1, c2, v2, ...) → CASE WHEN … END
    def _case(args: list[str]) -> str:
        if len(args) < 2 or len(args) % 2:
            raise SoqlError("case(...) needs an even number of arguments")
        whens = " ".join(
            f"WHEN {rewrite_soql_expr(c)} THEN {rewrite_soql_expr(v)}"
            for c, v in zip(args[::2], args[1::2])
        )
        return f"(CASE {whens} END)"

    s = _rewrite_calls(s, "case", _case)

    for soql_name, unit in _TRUNC_UNITS.items():
        s = _rewrite_calls(
            s, soql_name, lambda args, u=unit: f"date_trunc('{u}', {', '.join(args)})"
        )

    # great-circle distance / radius filter over (lat, lon) columns
    def _dist(args: list[str]) -> str:
        if len(args) != 4:
            raise SoqlError("distance_in_meters(lat, lon, lat2, lon2) needs 4 args")
        lat1, lon1, lat2, lon2 = args
        return (
            "(6371008.8 * 2 * asin(sqrt("
            f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
            f"cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
        )

    s = _rewrite_calls(s, "distance_in_meters", _dist)
    s = _rewrite_calls(
        s,
        "within_circle",
        lambda args: f"({_dist(args[:4])} <= ({args[4]}))"
        if len(args) == 5
        else (_ for _ in ()).throw(SoqlError("within_circle needs 5 args")),
    )

    # rectangular prune — SARGABLE (plain comparisons on the raw columns,
    # unlike the trig circle), so it survives to PushedFilters; SODA's
    # within_box(location, nw_lat, nw_lon, se_lat, se_lon) with location
    # split into (lat, lon) per this compiler's geo convention
    def _box(args: list[str]) -> str:
        if len(args) != 6:
            raise SoqlError(
                "within_box(lat, lon, nw_lat, nw_lon, se_lat, se_lon) needs 6 args"
            )
        lat, lon, nwlat, nwlon, selat, selon = args
        return (
            f"(({lat}) <= ({nwlat}) AND ({lat}) >= ({selat}) "
            f"AND ({lon}) >= ({nwlon}) AND ({lon}) <= ({selon}))"
        )

    s = _rewrite_calls(s, "within_box", _box)

    # point-in-polygon from a WKT literal — unrolled at compile time into
    # crossing-parity arithmetic (functions/geo.py), no geometry library
    def _poly(args: list[str]) -> str:
        from hawaiidatapipeline_spark.functions.geo import (
            parse_wkt_polygon,
            polygon_ray_cast_sql,
        )

        if len(args) != 3:
            raise SoqlError("within_polygon(lat, lon, 'POLYGON((…))') needs 3 args")
        wkt = args[2].strip()
        if not (wkt.startswith("'") and wkt.endswith("'")):
            raise SoqlError("within_polygon WKT must be a string literal")
        try:
            ring = parse_wkt_polygon(wkt[1:-1])
        except ValueError as exc:
            raise SoqlError(str(exc)) from exc
        return polygon_ray_cast_sql(args[0], args[1], ring)

    s = _rewrite_calls(s, "within_polygon", _poly)
    # SODA `intersects(point_location, 'WKT shape')`: for point columns
    # (the only location type this engine models) intersection with a
    # polygon IS containment — alias onto the same unroll
    # SODA `extent(location)` bounding-box aggregate → one deterministic
    # 'BOX(minlon minlat, maxlon maxlat)' string: DECIMAL(14,4) casts pin
    # the float→string rendering so Spark and DuckDB emit identical text
    def _extent(args: list[str]) -> str:
        if len(args) != 2:
            raise SoqlError("extent(lat, lon) needs 2 args")
        lat, lon = args
        d = "DECIMAL(14,4)"
        return (
            f"concat('BOX(', CAST(min({lon}) AS {d}), ' ', "
            f"CAST(min({lat}) AS {d}), ', ', CAST(max({lon}) AS {d}), ' ', "
            f"CAST(max({lat}) AS {d}), ')')"
        )

    s = _rewrite_calls(s, "extent", _extent)

    # SODA `convex_hull(location)` over point columns: the EXACT convex
    # hull as a closed WKT POLYGON ring (counterclockwise: lower chain
    # left-to-right, then upper chain right-to-left, closed on the start
    # vertex; collinear mid-edge points excluded, so the ring is
    # vertex-minimal). See _convex_hull_expr for the machinery.
    def _hull(args: list[str]) -> str:
        if len(args) != 2:
            raise SoqlError("convex_hull(lat, lon) needs 2 args")
        return _convex_hull_expr(args[0], args[1])

    s = _rewrite_calls(s, "convex_hull", _hull)

    # SODA `simplify(geom, tolerance)` / `simplify_preserve_topology`: the
    # engine's geometries are points and the extent/hull boxes above —
    # already minimal, so simplification is the identity on the geometry
    # argument (tolerance validated then discarded).
    def _simplify(args: list[str]) -> str:
        if len(args) != 2:
            raise SoqlError("simplify(geometry, tolerance) needs 2 args")
        return f"({rewrite_soql_expr(args[0])})"

    s = _rewrite_calls(s, "simplify", _simplify)
    s = _rewrite_calls(s, "simplify_preserve_topology", _simplify)

    # SODA `num_points(geometry)`: vertex count of a WKT rendering — one
    # coordinate pair per comma-separated chunk, so count the chunks; NULL
    # or empty geometry counts 0. Works on the engine's own WKT strings
    # (extent/convex_hull output) and WKT literals alike.
    def _num_points(args: list[str]) -> str:
        if len(args) != 1:
            raise SoqlError("num_points(geometry) needs 1 arg")
        g = rewrite_soql_expr(args[0])
        return (
            f"(CASE WHEN ({g}) IS NULL OR ({g}) = '' THEN 0 "
            f"ELSE size(split(CAST(({g}) AS STRING), ',')) END)"
        )

    s = _rewrite_calls(s, "num_points", _num_points)
    s = _rewrite_calls(
        s,
        "intersects",
        lambda args: _poly(args)
        if len(args) == 3
        else (_ for _ in ()).throw(
            SoqlError("intersects(lat, lon, 'POLYGON((…))') needs 3 args")
        ),
    )

    for old, new in _RENAME.items():
        s = re.sub(rf"\b{old}\s*\(", f"{new}(", s, flags=re.IGNORECASE)
    # `expr::type` cast sugar: SoQL datatype names → Spark SQL type names
    # (Spark 3.4+ supports the `::` spelling natively, only the names map)
    for soql_t, spark_t in _CAST_TYPES.items():
        s = re.sub(rf"::\s*{soql_t}\b", f"::{spark_t}", s, flags=re.IGNORECASE)
    return s


_QUERY_CLAUSES = [
    # SoQL $query clause keyword -> SODA parameter key (longest first so
    # GROUP BY wins over a bare identifier, SEARCH maps to $q)
    ("select", "$select"),
    ("where", "$where"),
    ("group by", "$group"),
    ("having", "$having"),
    ("order by", "$order"),
    ("limit", "$limit"),
    ("offset", "$offset"),
    ("search", "$q"),
]


def parse_soql_string(query: str) -> dict[str, str]:
    """Split a full SoQL ``$query`` string (``SELECT … WHERE … GROUP BY …
    ORDER BY … LIMIT n``) into the SODA parameter bundle ``soql_query``
    consumes. Keyword scanning is string-literal-aware; clauses may appear
    in any order but at most once."""
    query = query.strip()
    # find top-level (outside string literals) positions of clause keywords
    lowered, positions, i, in_str = query.lower(), [], 0, False
    while i < len(lowered):
        c = lowered[i]
        if in_str:
            if c == "'":
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
            i += 1
            continue
        for kw, param in _QUERY_CLAUSES:
            end = i + len(kw)
            if (
                lowered.startswith(kw, i)
                and (i == 0 or not (lowered[i - 1].isalnum() or lowered[i - 1] == "_"))
                and (end >= len(lowered) or not (lowered[end].isalnum() or lowered[end] == "_"))
            ):
                positions.append((i, end, param))
                i = end
                break
        else:
            i += 1
    if not positions or positions[0][2] != "$select" or positions[0][0] != 0:
        raise SoqlError("$query must start with SELECT")
    params: dict[str, str] = {}
    for idx, (start, end, param) in enumerate(positions):
        body_end = positions[idx + 1][0] if idx + 1 < len(positions) else len(query)
        body = query[end:body_end].strip()
        if param in params:
            raise SoqlError(f"duplicate {param[1:].upper()} clause in $query")
        if not body:
            raise SoqlError(f"empty {param[1:]} clause in $query")
        if param == "$q":
            # remove exactly one surrounding quote pair and unescape ''
            if len(body) >= 2 and body[0] == body[-1] == "'":
                body = body[1:-1].replace("''", "'")
        params[param] = body
    return params


def split_soql_chain(query: str) -> list[str]:
    """Split a chained SoQL query on top-level ``|>`` (SoQL 2.1 query
    pipelines). The scan is string-literal-aware so ``'a |> b'`` inside a
    literal never splits."""
    stages, start, i, in_str = [], 0, 0, False
    while i < len(query):
        c = query[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "|" and query[i + 1 : i + 2] == ">":
            stages.append(query[start:i].strip())
            i += 1
            start = i + 1
        i += 1
    stages.append(query[start:].strip())
    if any(not s for s in stages):
        raise SoqlError("empty stage in chained SoQL query")
    return stages


def soql_query_string(df: DataFrame, query: str) -> DataFrame:
    """Execute a full SoQL ``$query`` string — Socrata's single-parameter
    alternative to the individual ``$select``/``$where``/… params."""
    return soql_query(df, parse_soql_string(query))


def soql_query_chained(df: DataFrame, query: str) -> DataFrame:
    """Execute a SoQL 2.1 chained query: ``SELECT … |> SELECT … |> …``.

    Each ``|>`` stage is a full SoQL query whose FROM is the previous
    stage's output (aggregates of aggregates, post-aggregation paging —
    Socrata's composition idiom). Compiled by folding ``soql_query_string``
    over the stages, so the whole chain is ONE Catalyst plan: nested
    subqueries the optimizer is free to collapse, prune, and push through —
    no per-stage materialization."""
    out = df
    for stage in split_soql_chain(query):
        out = soql_query_string(out, stage)
    return out


def soql_query(
    df: DataFrame, params: dict[str, str], stemming: bool = False
) -> DataFrame:
    """Execute a SODA request-parameter bundle against a DataFrame.

    Supported keys: ``$select`` ``$where`` ``$group`` ``$having`` ``$order``
    ``$limit`` ``$offset`` ``$q``. Unknown keys raise ``SoqlError``.

    ``stemming``: dev.socrata.com documents that the portal's ``$q`` is
    stemming-aware ("mained" matches "remained"-style variants). The
    default here is EXACT-token AND matching (``stemming=False`` — a
    documented divergence: Socrata's exact stemmer is proprietary to its
    search backend and unspecifiable). ``stemming=True`` enables a cheap
    deterministic approximation for WORD terms: a term matches when any
    lowercased alphanumeric token of a string column equals it after both
    sides drop one trailing ``ing``/``ed``/``s`` suffix
    (``merge ~ merges``, ``sort ~ sorted``). Doubled-consonant variants do
    NOT unify: ``running`` strips to ``runn``, which never equals ``run`` —
    the single-suffix rule is deliberately that cheap. Quoted phrase terms
    always match by verbatim substring — stemming never applies to
    phrases."""
    known = {"$select", "$where", "$group", "$having", "$order", "$limit", "$offset", "$q"}
    unknown = set(params) - known
    if unknown:
        raise SoqlError(f"unsupported SODA parameters: {sorted(unknown)}")

    # Pass 1 — validate the RAW user clauses against the documented SoQL
    # surface (rewrite-emitted names like transform/aggregate are NOT valid
    # here; ADVICE r12 closed that widening).
    for key in ("$select", "$where", "$group", "$having", "$order"):
        raw = params.get(key)
        if raw and raw != "*":
            _check_tokens(raw, key, allowed=_USER_SURFACE)

    select = rewrite_soql_expr(params.get("$select", "*"))
    where = rewrite_soql_expr(params["$where"]) if "$where" in params else None
    group = rewrite_soql_expr(params["$group"]) if "$group" in params else None
    having = rewrite_soql_expr(params["$having"]) if "$having" in params else None
    order = rewrite_soql_expr(params["$order"]) if "$order" in params else None
    # Pass 2 — defense-in-depth on the COMPILER OUTPUT before SQL splicing:
    # passthrough core plus exactly the names the rewrites emit.
    for clause, what in [(select, "$select"), (where, "$where"), (group, "$group"),
                         (having, "$having"), (order, "$order")]:
        if clause and clause != "*":
            _check_tokens(clause, what, allowed=_PASSTHROUGH | _REWRITE_GENERATED)

    # $q: portal full-text search, SODA semantics (dev.socrata.com "search
    # with $q"): the snippet is TOKENIZED — double-quoted spans are phrase
    # terms, the rest splits on whitespace with boundary punctuation
    # stripped — and EVERY term must match (case-insensitively) in at least
    # one string column; terms AND together, columns OR within a term. A
    # one-term snippet degenerates to the old whole-string containment.
    if "$q" in params:
        terms = _q_terms_tagged(params["$q"])
        str_cols = [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
        if not str_cols:
            raise SoqlError("$q requires at least one string column")

        def col_pred(c: str, t: str, is_phrase: bool) -> str:
            def esc(s: str) -> str:
                return s.replace(chr(39), chr(39) * 2)

            if stemming and not is_phrase:
                # token-level stem equality: split the column on non-
                # alphanumerics and compare stems (suffix rule _STEM_RE,
                # identical on the oracle side)
                return (
                    f"exists(split(lower({c}), '[^a-z0-9]+'), "
                    f"_t -> regexp_replace(_t, '{_STEM_RE}', '') = "
                    f"'{esc(_stem(t.lower()))}')"
                )
            return f"contains(lower({c}), '{esc(t.lower())}')"

        if terms:
            per_term = [
                "(" + " OR ".join(col_pred(c, t, ph) for c in str_cols) + ")"
                for t, ph in terms
            ]
            q_pred = "(" + " AND ".join(per_term) + ")"
            where = f"({where}) AND {q_pred}" if where else q_pred

    spark = df.sparkSession
    view = f"_soql_{next(_VIEW_COUNTER)}"
    df.createOrReplaceTempView(view)
    sql = [f"SELECT {select} FROM {view}"]
    if where:
        sql.append(f"WHERE {where}")
    if group:
        sql.append(f"GROUP BY {group}")
    if having:
        sql.append(f"HAVING {having}")
    if order:
        sql.append(f"ORDER BY {order}")
    out = spark.sql(" ".join(sql))

    # LIMIT/OFFSET as DataFrame ops so they compose with the ORDER BY above
    def _int(key: str) -> int:
        try:
            n = int(params[key])
        except ValueError as exc:
            raise SoqlError(f"{key} must be an integer, got {params[key]!r}") from exc
        if n < 0:
            raise SoqlError(f"{key} must be non-negative, got {n}")
        return n

    if "$offset" in params:
        out = out.offset(_int("$offset"))
    if "$limit" in params:
        out = out.limit(_int("$limit"))
    return out
