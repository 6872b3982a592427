"""Spatial operators over deterministic synthetic coordinates.

The corpus has no geometry columns, so coordinates are derived
deterministically from entity keys via md5 (the repo's sanctioned
hash-derived-value idiom: Spark conv(substring(md5..)) == DuckDB
CAST('0x'||substring(md5..))): every entity gets a reproducible point in
a [-60,60) x [-180,180) planar degree space. Distances are PLANAR
(dlat^2 + dlon^2): products/sums/sqrt of exact doubles are IEEE-exact and
bit-identical across engines, unlike trig-based haversine (a production
deployment would swap the distance expression; the blocking scheme is
distance-agnostic).

Blocking: a 5-degree grid. A radius-5 disc around any point is fully
covered by the 3x3 neighborhood of its cell (floor is monotone: points
within 5 degrees per axis differ by at most one 5-degree cell), so the
join probes exactly 9 cells per supplier — candidate pairs are bounded by
local point DENSITY, never all-pairs. This is the standard grid spatial
join (e.g. Sedona/ESRI grid partitioning) expressed as a plain equi-join
Catalyst can shuffle-hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kwery_spark.catalog import table
from kwery_spark.registry import register

_CELL = 5.0
_R2 = 25.0  # radius 5.0 degrees, compared in squared space (no sqrt in filter)


def _coord_spark(tag: str, key: str, mod: int, shift: float):
    h = F.expr(
        f"CAST(conv(substring(md5(concat('{tag}:', CAST({key} AS STRING))), 1, 12), "
        f"16, 10) AS BIGINT) % {mod}"
    )
    return h / F.lit(10000.0) - F.lit(shift)


def _coord_sql(tag: str, key: str, mod: int, shift: float) -> str:
    return (
        f"(CAST('0x' || substring(md5('{tag}:' || CAST({key} AS VARCHAR)), 1, 12) "
        f"AS BIGINT) % {mod}) / 10000.0 - {shift}"
    )


def _points_spark(df: DataFrame, key: str, prefix: str) -> DataFrame:
    lat = _coord_spark(prefix + "lat", key, 1200000, 60.0)
    lon = _coord_spark(prefix + "lon", key, 3600000, 180.0)
    return df.select(
        "*",
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat / _CELL).alias("cell_lat"),
        F.floor(lon / _CELL).alias("cell_lon"),
    )


@register(
    "geo_radius_join",
    oracle=f"""
    WITH cc AS (
        SELECT c_custkey,
               {_coord_sql('clat', 'c_custkey', 1200000, 60.0)} AS lat,
               {_coord_sql('clon', 'c_custkey', 3600000, 180.0)} AS lon
        FROM customer
    ),
    cg AS (
        SELECT c_custkey, lat, lon,
               CAST(floor(lat / 5.0) AS BIGINT) AS cell_lat,
               CAST(floor(lon / 5.0) AS BIGINT) AS cell_lon
        FROM cc
    ),
    ss AS (
        SELECT s_suppkey, s_nationkey,
               {_coord_sql('slat', 's_suppkey', 1200000, 60.0)} AS lat,
               {_coord_sql('slon', 's_suppkey', 3600000, 180.0)} AS lon
        FROM supplier
    ),
    sg AS (
        SELECT s_suppkey, s_nationkey, lat, lon,
               CAST(floor(lat / 5.0) AS BIGINT) AS cell_lat,
               CAST(floor(lon / 5.0) AS BIGINT) AS cell_lon
        FROM ss
    ),
    cand AS (
        SELECT s.s_suppkey, s.s_nationkey,
               (s.lat - c.lat) * (s.lat - c.lat)
             + (s.lon - c.lon) * (s.lon - c.lon) AS d2
        FROM sg s JOIN cg c
          ON c.cell_lat BETWEEN s.cell_lat - 1 AND s.cell_lat + 1
         AND c.cell_lon BETWEEN s.cell_lon - 1 AND s.cell_lon + 1
    ),
    per_s AS (
        SELECT s_suppkey, s_nationkey,
               CAST(count(*) AS BIGINT) AS n_within, min(d2) AS min_d2
        FROM cand WHERE d2 <= 25.0
        GROUP BY s_suppkey, s_nationkey
    ),
    allsup AS (
        SELECT s.s_suppkey, s.s_nationkey,
               coalesce(p.n_within, 0) AS n_within, p.min_d2
        FROM sg s LEFT JOIN per_s p ON s.s_suppkey = p.s_suppkey
    )
    SELECT s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CASE WHEN n_within > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_matched,
           CAST(sum(n_within) AS BIGINT) AS pairs_within,
           round(coalesce(sqrt(min(min_d2)), -1.0), 6) AS min_dist
    FROM allsup
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial radius join: for every supplier, count the
    customers within planar distance 5.0 of its synthetic coordinate and
    track the nearest one, summarized per nation (25 spec-fixed rows:
    supplier count, suppliers with >=1 neighbor, total in-radius pairs,
    global nearest distance).

    Exactness: coordinates are md5-derived exact rationals; the squared
    distance uses only IEEE +/-/* on doubles (bit-identical across
    engines), the radius test compares in squared space, and sqrt is
    IEEE-exact — so even the boundary rows agree exactly; the only
    round() is cosmetic on the final scalar.

    Scale: the supplier side replicates 9x via a static explode and
    equi-joins the customer grid on (cell_lat, cell_lon) — a plain hash
    join keyed by cell, so work is supplier_count x local density, never
    |S|x|C|. Both scans prune to key columns; the per-supplier aggregate
    map-side-combines into <=|S| rows and the nation rollup into 25.
    At 100 TB you'd additionally bucket both tables by cell — the join
    key already matches that layout."""
    cust = _points_spark(
        table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", "c"
    )
    supp = _points_spark(
        table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"),
        "s_suppkey",
        "s",
    )
    d = F.array(F.lit(-1), F.lit(0), F.lit(1))
    probes = (
        supp.withColumn("dlat", F.explode(d))
        .withColumn("dlon", F.explode(d))
        .select(
            "s_suppkey",
            "s_nationkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            (F.col("cell_lat") + F.col("dlat")).alias("jlat"),
            (F.col("cell_lon") + F.col("dlon")).alias("jlon"),
        )
    )
    d2 = (F.col("s_lat") - F.col("lat")) * (F.col("s_lat") - F.col("lat")) + (
        F.col("s_lon") - F.col("lon")
    ) * (F.col("s_lon") - F.col("lon"))
    per_s = (
        probes.join(
            cust,
            (F.col("jlat") == cust.cell_lat) & (F.col("jlon") == cust.cell_lon),
        )
        .select("s_suppkey", "s_nationkey", d2.alias("d2"))
        .filter(F.col("d2") <= _R2)
        .groupBy("s_suppkey", "s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_within"),
            F.min("d2").alias("min_d2"),
        )
    )
    allsup = supp.select("s_suppkey", "s_nationkey").join(
        per_s.select("s_suppkey", "n_within", "min_d2"), "s_suppkey", "left"
    )
    return (
        allsup.select(
            "s_nationkey",
            F.coalesce(F.col("n_within"), F.lit(0)).alias("n_within"),
            "min_d2",
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum(F.when(F.col("n_within") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
            F.sum("n_within").cast("long").alias("pairs_within"),
            F.round(F.coalesce(F.sqrt(F.min("min_d2")), F.lit(-1.0)), 6).alias(
                "min_dist"
            ),
        )
        .coalesce(1)
        .sortWithinPartitions("s_nationkey")
    )


@register(
    "geo_grid_density",
    oracle=f"""
    WITH cc AS (
        SELECT c_custkey,
               {_coord_sql('clat', 'c_custkey', 1200000, 60.0)} AS lat,
               {_coord_sql('clon', 'c_custkey', 3600000, 180.0)} AS lon
        FROM customer
    ),
    cells AS (
        SELECT CAST(floor(lat / 5.0) AS BIGINT) AS cell_lat,
               CAST(floor(lon / 5.0) AS BIGINT) AS cell_lon,
               CAST(count(*) AS BIGINT) AS n_points
        FROM cc GROUP BY 1, 2
    ),
    sm AS (
        SELECT c.cell_lat, c.cell_lon, c.n_points,
               CAST(sum(n.n_points) AS BIGINT) AS n_hood
        FROM cells c JOIN cells n
          ON n.cell_lat BETWEEN c.cell_lat - 1 AND c.cell_lat + 1
         AND n.cell_lon BETWEEN c.cell_lon - 1 AND c.cell_lon + 1
        GROUP BY c.cell_lat, c.cell_lon, c.n_points
    )
    SELECT cell_lat, cell_lon, n_points, n_hood,
           round(CAST(n_hood AS DOUBLE) / 9.0, 6) AS smoothed
    FROM sm
    ORDER BY n_hood DESC, cell_lat, cell_lon
    LIMIT 20
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density surface: bin customers into the 5-degree grid,
    then smooth each cell with its 3x3 neighborhood (a box-kernel
    density — the binning step behind every map heatmap) and emit the
    20 hottest cells.

    Exactness: pure integer counts; the smoothed density is one double
    division by the constant kernel area.

    Scale: the corpus collapses to the FIXED cell domain (24 x 72 =
    1728 possible 5-degree cells) in one map-side-combined groupBy; the
    neighborhood sum replicates each CELL row 9x (explode on the
    1728-row grid, not on data) and re-aggregates; the final top-20 is
    orderBy+limit -> TakeOrderedAndProject. Input size only affects
    the first scan."""
    cust = _points_spark(
        table(spark, sf_dir, "customer").select("c_custkey"), "c_custkey", "c"
    )
    cells = cust.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    d = F.array(F.lit(-1), F.lit(0), F.lit(1))
    spread = (
        cells.withColumn("dlat", F.explode(d))
        .withColumn("dlon", F.explode(d))
        .select(
            (F.col("cell_lat") + F.col("dlat")).alias("cell_lat"),
            (F.col("cell_lon") + F.col("dlon")).alias("cell_lon"),
            F.col("n_points").alias("contrib"),
        )
    )
    sm = (
        cells.join(
            spread.groupBy("cell_lat", "cell_lon").agg(
                F.sum("contrib").cast("long").alias("n_hood")
            ),
            ["cell_lat", "cell_lon"],
        )
    )
    return (
        sm.select(
            "cell_lat",
            "cell_lon",
            "n_points",
            "n_hood",
            F.round(F.col("n_hood").cast("double") / 9.0, 6).alias("smoothed"),
        )
        .orderBy(F.desc("n_hood"), "cell_lat", "cell_lon")
        .limit(20)
    )
