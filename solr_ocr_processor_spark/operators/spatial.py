"""Solr spatial search analogs — ``{!geofilt}`` / ``geodist()``.

Lucene-surface parity: the reference forwards query strings verbatim
to its stored Solr core (app/process/solr.go:48-49), and the spatial
query parsers (`{!geofilt pt=lat,lon sfield=loc d=km}`, `sort=geodist()
asc`) are part of that core's registry — radius filtering plus
distance ranking over a LatLonPointSpatialField.

Spark-first shape: great-circle distance is a pure column expression
(haversine over radians/sin/cos/asin — whole-stage codegen, no
Python), so the radius filter PUSHES into the scan stage and the
distance sort lowers to TakeOrderedAndProject. At 10^12-doc scale the
real pruning win is a geohash / spatial-cell partition key (filter cells
whose bounding box intersects the radius before computing exact
distances) — the cell column composes with this kernel exactly like
the ANN store's bucket pruning composes with the exact rerank; the
haversine kernel below is the exactness spine either way.

The sandbox tables carry no coordinates, so :func:`synth_coords`
derives a deterministic lat/lon grid from doc ids (the synth_edges /
synth_media discipline — integer arithmetic the relational oracle
replays exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def synth_coords(docs: DataFrame) -> DataFrame:
    """Deterministic (doc_id, lat, lon) grid: lat sweeps [-90, 89.9]
    in 0.1-degree steps keyed by doc_id*37, lon sweeps [-180, 179.9]
    keyed by doc_id*73 — coprime strides so the points scatter rather
    than line up. Pure integer arithmetic + one division; bit-equal
    in SQL."""
    return docs.select(
        "doc_id",
        (F.pmod(F.col("doc_id") * 37, F.lit(1800)) / 10.0 - 90.0).alias("lat"),
        (F.pmod(F.col("doc_id") * 73, F.lit(3600)) / 10.0 - 180.0).alias("lon"),
    )


def _haversine_km(lat_col, lon_col, pt_lat: float, pt_lon: float):
    """Great-circle distance (km) from (pt_lat, pt_lon) as a codegen
    column expression: 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))."""
    dlat = F.radians(lat_col - F.lit(float(pt_lat)))
    dlon = F.radians(lon_col - F.lit(float(pt_lon)))
    h = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(F.lit(float(pt_lat))))
        * F.cos(F.radians(lat_col))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def geofilt_topk(
    coords: DataFrame,
    pt_lat: float,
    pt_lon: float,
    d_km: float,
    k: int = 20,
) -> DataFrame:
    """``fq={!geofilt pt=lat,lon d=km}&sort=geodist() asc`` — documents
    within ``d_km`` of the point, nearest first. Returns (doc_id, lat,
    lon, dist_km) with dist rounded 6dp, ordered (raw dist ASC, doc_id
    ASC), top ``k``.

    The filter and the sort share ONE distance expression (computed
    once per row in codegen); the predicate sits in the scan stage, so
    column pruning + the top-k TakeOrderedAndProject keep driver
    traffic at k rows."""
    dist = _haversine_km(F.col("lat"), F.col("lon"), pt_lat, pt_lon)
    return (
        coords.withColumn("d", dist)
        .where(F.col("d") <= F.lit(float(d_km)))
        .orderBy(F.asc("d"), F.asc("doc_id"))
        .limit(int(k))
        .select(
            "doc_id", "lat", "lon", F.round("d", 6).alias("dist_km")
        )
    )


def cell_geofilt_topk(
    coords: DataFrame,
    pt_lat: float,
    pt_lon: float,
    d_km: float,
    k: int = 20,
    cell_deg: float = 5.0,
) -> DataFrame:
    """Cell-pruned ``{!geofilt}`` — the 10^12-doc shape of
    :func:`geofilt_topk`: points carry a coarse (lat, lon) grid-cell
    id (``floor(deg / cell_deg)`` — the geohash-lite partition key a
    stored table would be partitioned by), the radius query first
    prunes WHOLE CELLS against the conservative bounding box of the
    circle, and only survivors pay the exact haversine. On a
    partitioned store the cell predicate is partition pruning — the
    scan never opens out-of-box files; here it demonstrates the same
    plan shape with the cell filter ahead of the distance math.

    Soundness (so pruning can NEVER change the answer): on the
    R=6371.0088 sphere one degree of latitude is 111.195 km; the
    latitude margin uses 111.0 (smaller divisor -> wider box) and the
    longitude margin divides by cos at the band's extreme latitude,
    both padded 2%. If the box crosses the antimeridian or reaches a
    pole (``abs(pt_lat) + dlat >= 90`` — near a pole EVERY longitude
    can be in range even when the computed dlon stays under 180, e.g.
    pt_lat=88, d=250km) the longitude axis stops pruning entirely. The driver twin checks
    this structurally: the ORACLE is the brute-force formulation, so
    the hash match proves the pruned plan lossless.

    Returns exactly :func:`geofilt_topk`'s output."""
    import math

    dlat = d_km / 111.0 * 1.02
    lat_edge = min(abs(float(pt_lat)) + dlat, 89.0)
    dlon = d_km / (111.0 * math.cos(math.radians(lat_edge))) * 1.02
    c = float(cell_deg)
    cells = coords.withColumn(
        "cell_lat", F.floor(F.col("lat") / F.lit(c)).cast("int")
    ).withColumn("cell_lon", F.floor(F.col("lon") / F.lit(c)).cast("int"))
    pred = (F.col("cell_lat") >= math.floor((pt_lat - dlat) / c)) & (
        F.col("cell_lat") <= math.floor((pt_lat + dlat) / c)
    )
    pole_reach = abs(float(pt_lat)) + dlat >= 90.0
    if (
        not pole_reach
        and dlon < 180.0
        and pt_lon - dlon >= -180.0
        and pt_lon + dlon <= 180.0
    ):
        pred = (
            pred
            & (F.col("cell_lon") >= math.floor((pt_lon - dlon) / c))
            & (F.col("cell_lon") <= math.floor((pt_lon + dlon) / c))
        )
    pruned = cells.where(pred).select("doc_id", "lat", "lon")
    return geofilt_topk(pruned, pt_lat, pt_lon, d_km, k=k)
