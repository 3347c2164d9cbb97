"""Geospatial operators: haversine distance and grid-bucketed radius
joins (the taxi-domain ops a zone-level pipeline grows into:
pickup/dropoff proximity, hotspot pairing, stop clustering).

The radius self-join is banding pattern #3 in this engine (after LSH
bands for near-dup text and fixed-width bands for interval overlap):
bucket points into grid cells at least one radius wide, equi-join each
point's 3x3 neighbor cells against plain cells, then verify with the
exact haversine predicate. Cost is sum-over-cells of neighbor-cell
cross sizes instead of |P|^2 — the shape that survives a continent of
GPS points, with AQE handling hotspot-cell skew.

Float parity: the haversine expression is written ONCE as a Python
structure and emitted in the SAME operation order for Spark and
DuckDB (`sql_haversine_m`), so cross-engine divergence is bounded by
last-ulp transcendental differences (~1e-9 m at city scale) — far
inside the 0.1 m rounding the suite gates on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (double). Keep the operation
    order in sync with `sql_haversine_m` — the two are the same
    formula by construction."""
    dlat_h = F.radians(lat2 - lat1) / 2
    dlon_h = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat_h) * F.sin(dlat_h)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon_h) * F.sin(dlon_h)
    )
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def sql_haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB fragment with the identical operation order."""
    dlat = f"radians({lat2} - {lat1}) / 2"
    dlon = f"radians({lon2} - {lon1}) / 2"
    a = (
        f"sin({dlat}) * sin({dlat}) "
        f"+ cos(radians({lat1})) * cos(radians({lat2})) * sin({dlon}) * sin({dlon})"
    )
    return f"{2 * EARTH_RADIUS_M} * asin(sqrt({a}))"


def radius_pairs(
    df: DataFrame,
    radius_m: float,
    cell_deg: float,
    id_col: str = "point_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All point pairs within `radius_m` meters (a_id < b_id, exact
    haversine distance attached). `cell_deg` MUST be at least one
    radius in degrees along BOTH axes at the data's latitudes
    (lat: radius/111320 m per degree; lon: divide further by
    cos(lat)) — a too-small cell silently loses cross-cell pairs, so
    pick it for the widest latitude in the data.

    Each pair is found exactly once: side A explodes into its 3x3
    neighbor cells, side B keeps its actual cell, and exactly one
    neighbor offset matches B's cell — no post-join dedup needed.
    """
    s = F.lit(float(cell_deg))
    cx = F.floor(F.col(lat_col) / s)
    cy = F.floor(F.col(lon_col) / s)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(lat_col).alias("__lat"),
        F.col(lon_col).alias("__lon"),
        cx.alias("__cx"),
        cy.alias("__cy"),
    )
    neighbors = F.array(
        *[
            F.struct(
                (F.col("__cx") + dx).alias("cx"), (F.col("__cy") + dy).alias("cy")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = base.select(
        F.col("__id").alias("a_id"),
        F.col("__lat").alias("__lat_a"),
        F.col("__lon").alias("__lon_a"),
        F.explode(neighbors).alias("__n"),
    ).select("a_id", "__lat_a", "__lon_a", F.col("__n.cx").alias("__cx"), F.col("__n.cy").alias("__cy"))
    b = base.select(
        F.col("__id").alias("b_id"),
        F.col("__lat").alias("__lat_b"),
        F.col("__lon").alias("__lon_b"),
        "__cx",
        "__cy",
    )
    dist = haversine_m(
        F.col("__lat_a"), F.col("__lon_a"), F.col("__lat_b"), F.col("__lon_b")
    )
    return (
        a.join(b, on=["__cx", "__cy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("__dist", dist)
        .filter(F.col("__dist") <= F.lit(float(radius_m)))
        .select("a_id", "b_id", F.col("__dist").alias("dist_m"))
    )
