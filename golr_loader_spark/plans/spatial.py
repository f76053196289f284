"""Spatial search over the engine index: Solr's geofilt / bbox /
geodist surface (SpatialFilterQParser + ``sort=geodist() asc`` —
LatLonType semantics).

The reference's Solr cores don't index locations, but the serving
stack it targets ships spatial out of the box; this module
re-expresses that surface over the engine-owned index: matching stays
decode-only (``facets.matching_doc_ids``), the location doc-values
table joins on the co-located (bucket, doc_id) key, and the distance
math is pure Catalyst (haversine on builtin trig — no UDFs anywhere).

Semantics pinned to Solr/Lucene:
* ``geofilt`` — great-circle (haversine) distance ≤ d km from a
  point, on the mean-earth-radius sphere Lucene's GeoUtils uses
  (6371.0087714 km).
* ``bbox`` — the cheaper rectangle filter COVERING the d-km circle
  (Solr's bbox admits the corners; docs in the corners pass bbox but
  fail geofilt — pinned in tests).
* ``geodist_topk`` — sort matching docs by distance asc, doc_id asc
  tie-break; distances rounded to 4 decimals BEFORE ranking and
  thresholding (the module-wide float discipline, so a sub-1e-4
  jitter can never flip an ordering or a boundary).

Plan shape at 100 TB: decode-only match → one equi-join against the
location table (co-partitioned by the same range bucket as every
doc-values join in ``plans.facets``) → a filter/TakeOrdered whose
predicate is whole-stage-codegen trig. The bbox pre-filter pushes
down to the location scan as two range predicates (parquet min/max
pruning on lat), then the exact haversine runs only on the survivors
— Lucene's own two-phase LatLonPoint design (box approximation, then
exact check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import InvertedIndex, bucket_of
from golr_loader_spark.plans.facets import matching_doc_ids

# Lucene GeoUtils.EARTH_MEAN_RADIUS_METERS / 1000
EARTH_RADIUS_KM = 6371.0087714


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (degree) points —
    builtin trig only, stays inside whole-stage codegen."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _bbox_cond(lat: Column, lon: Column, pt: tuple[float, float], d_km: float):
    """Rectangle covering the d-km circle around pt. Latitude delta
    is exact on the sphere; the longitude delta widens by the
    narrowest cosine inside the box (evaluated driver-side — the
    predicate itself is two constant range checks, pushdown-able).
    Clamped at the poles / antimeridian to a full band (correct,
    conservative — Solr's bbox does the same)."""
    import math

    dlat = math.degrees(d_km / EARTH_RADIUS_KM)
    lo_lat, hi_lat = pt[0] - dlat, pt[0] + dlat
    cond = (lat >= lo_lat) & (lat <= hi_lat)
    # narrowest parallel inside the box bounds the lon spread
    max_abs_lat = min(max(abs(lo_lat), abs(hi_lat)), 90.0)
    c = math.cos(math.radians(max_abs_lat))
    if lo_lat <= -90.0 or hi_lat >= 90.0 or c <= 1e-9:
        return cond  # polar cap: full longitude band
    dlon = math.degrees(d_km / (EARTH_RADIUS_KM * c))
    if dlon >= 180.0:
        return cond
    lo_lon, hi_lon = pt[1] - dlon, pt[1] + dlon
    if lo_lon < -180.0 or hi_lon > 180.0:
        # antimeridian wrap: the band splits into two ranges
        lo_w = lo_lon + 360.0 if lo_lon < -180.0 else lo_lon
        hi_w = hi_lon - 360.0 if hi_lon > 180.0 else hi_lon
        return cond & ((lon >= lo_w) | (lon <= hi_w))
    return cond & (lon >= lo_lon) & (lon <= hi_lon)


def _matched_locations(
    index: InvertedIndex,
    locations: DataFrame,
    query: str,
    cfg: IndexConfig | None,
    mode: str,
    fq,
    exclude_ids,
) -> DataFrame:
    cfg = cfg or index.cfg
    m = matching_doc_ids(index, query, cfg=cfg, mode=mode, exclude_ids=exclude_ids)
    if fq is not None:
        from golr_loader_spark.plans.lucene import fq_doc_ids

        m = m.join(
            fq_doc_ids(index, fq, cfg=cfg, exclude_ids=exclude_ids)
            .select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
    loc = locations.select("doc_id", "lat", "lon").withColumn(
        "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
    )
    return m.join(loc, on=["bucket", "doc_id"]).select("doc_id", "lat", "lon")


def bbox_filter(
    index: InvertedIndex,
    locations: DataFrame,
    query: str,
    pt: tuple[float, float],
    d_km: float,
    cfg: IndexConfig | None = None,
    mode: str = "or",
    fq=None,
    exclude_ids=None,
) -> DataFrame:
    """Solr ``{!bbox}``: matching docs inside the rectangle covering
    the d-km circle → (doc_id) asc. Admits circle corners (Solr
    semantics); use ``geofilt`` for the exact circle."""
    j = _matched_locations(index, locations, query, cfg, mode, fq, exclude_ids)
    return (
        j.filter(_bbox_cond(F.col("lat"), F.col("lon"), pt, d_km))
        .select("doc_id")
        .orderBy("doc_id")
    )


def geofilt(
    index: InvertedIndex,
    locations: DataFrame,
    query: str,
    pt: tuple[float, float],
    d_km: float,
    cfg: IndexConfig | None = None,
    mode: str = "or",
    fq=None,
    exclude_ids=None,
) -> DataFrame:
    """Solr ``{!geofilt}``: matching docs within d km great-circle of
    pt → (doc_id, dist_km) ordered (dist asc, doc_id asc), dist
    rounded to 4 before the threshold AND the sort. Two-phase like
    LatLonPoint: bbox prunes, haversine verifies."""
    j = _matched_locations(index, locations, query, cfg, mode, fq, exclude_ids)
    return (
        j.filter(_bbox_cond(F.col("lat"), F.col("lon"), pt, d_km))
        .withColumn(
            "dist_km",
            F.round(
                haversine_km(
                    F.col("lat"), F.col("lon"), F.lit(pt[0]), F.lit(pt[1])
                ),
                4,
            ),
        )
        .filter(F.col("dist_km") <= d_km)
        .select("doc_id", "dist_km")
        .orderBy(F.asc("dist_km"), F.asc("doc_id"))
    )


def geodist_topk(
    index: InvertedIndex,
    locations: DataFrame,
    query: str,
    pt: tuple[float, float],
    k: int = 10,
    cfg: IndexConfig | None = None,
    mode: str = "or",
    fq=None,
    exclude_ids=None,
) -> DataFrame:
    """Solr ``sort=geodist() asc`` + rows=k: the k matching docs
    nearest pt → (rank, doc_id, dist_km). No radius filter — pure
    distance sort (TakeOrdered, never a full sort); rank attached
    driver-side to the ≤k collected rows (the q24 pattern)."""
    j = _matched_locations(index, locations, query, cfg, mode, fq, exclude_ids)
    spark = index.postings.sparkSession
    top = (
        j.withColumn(
            "dist_km",
            F.round(
                haversine_km(
                    F.col("lat"), F.col("lon"), F.lit(pt[0]), F.lit(pt[1])
                ),
                4,
            ),
        )
        .select("doc_id", "dist_km")
        .orderBy(F.asc("dist_km"), F.asc("doc_id"))
        .limit(k)
        .collect()  # bounded: ≤ k rows
    )
    return spark.createDataFrame(
        [(i + 1, int(r["doc_id"]), float(r["dist_km"])) for i, r in enumerate(top)],
        "rank int, doc_id long, dist_km double",
    )
