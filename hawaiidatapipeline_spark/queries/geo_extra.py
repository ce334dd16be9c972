"""Remaining SODA ``location`` surface: within_box (the sargable prune that
wraps within_circle at scale) and the box→circle composition."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hawaiidatapipeline_spark.queries._registry import new_module_registry
from hawaiidatapipeline_spark.registry import load_table

QUERIES, ORACLES, q = new_module_registry()

# Fixtures carry no geo columns; synthesize deterministic (lat, lon) from
# the key with integer arithmetic — identical on both engines (same
# convention as fn_geo_distance). The 0.25 literal is cast to DOUBLE:
# DuckDB would otherwise type it DECIMAL(3,2) and propagate DECIMAL into
# the output, which degrades to float64 in the driver's pandas fetch
# while Spark (double literal) returns true doubles.
_LATLON_SQL = """
SELECT c_custkey,
       (c_custkey % 180 - 90) + 0.25::DOUBLE  AS lat,
       ((7 * c_custkey) % 360 - 180) + 0.25::DOUBLE AS lon
FROM customer
"""


@q(
    "fn_geo_within_box",
    f"""WITH pts AS ({_LATLON_SQL})
       SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon
       FROM pts
       WHERE lat <= 40 AND lat >= 10 AND lon >= -30 AND lon <= 60""",
)
def fn_geo_within_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoQL ``within_box`` (functions/geo.py): rectangular prune from plain
    comparisons — on real (raw-column) geo data this is sargable and reaches
    the parquet reader as PushedFilters, which is why it should always wrap
    the trig-based ``within_circle`` at 100 TB."""
    from hawaiidatapipeline_spark.functions.geo import within_box

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    return pts.filter(
        within_box(F.col("lat"), F.col("lon"), 40.0, -30.0, 10.0, 60.0)
    ).select("c_custkey", F.round("lat", 6).alias("lat"), F.round("lon", 6).alias("lon"))


@q(
    "fn_geo_box_then_circle",
    f"""WITH pts AS ({_LATLON_SQL})
       SELECT count(*) AS n_in_circle
       FROM pts
       WHERE lat <= 30 AND lat >= -30 AND lon >= -40 AND lon <= 40
         AND 2 * 6371000.0 * asin(sqrt(
               pow(sin(radians(0.0 - lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(0.0))
                 * pow(sin(radians(0.0 - lon) / 2), 2))) <= 3000000""",
)
def fn_geo_box_then_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production composition: cheap box prune FIRST (sargable), then
    the haversine circle only over survivors — at scale the box skips row
    groups before any trig runs."""
    from hawaiidatapipeline_spark.functions.geo import within_box, within_circle

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180 - 90) + 0.25).alias("lat"),
        (((7 * F.col("c_custkey")) % 360 - 180) + 0.25).alias("lon"),
    )
    survivors = pts.filter(
        within_box(F.col("lat"), F.col("lon"), 30.0, -40.0, -30.0, 40.0)
    ).filter(within_circle(F.col("lat"), F.col("lon"), 0.0, 0.0, 3_000_000.0))
    return survivors.agg(F.count(F.lit(1)).alias("n_in_circle"))
