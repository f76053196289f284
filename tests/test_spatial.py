"""Spatial search: geofilt / bbox / geodist over the engine index.

Pins: haversine on Lucene's mean earth radius, round-to-4-then-
rank/threshold, bbox admits circle corners that geofilt rejects,
serving twins match the distributed plans row for row.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.serve import LocalSearcher
from golr_loader_spark.plans.spatial import (
    EARTH_RADIUS_KM,
    bbox_filter,
    geodist_topk,
    geofilt,
)

PT = (40.0, -100.0)
# one degree of latitude ≈ 111.195 km on this sphere
DEG_KM = math.pi * EARTH_RADIUS_KM / 180.0
ROWS = [
    # (doc_id, text, lat, lon) — all match 'data' except doc 5
    (0, "data a", 40.0, -100.0),          # at the point: 0 km
    (1, "data b", 40.5, -100.0),          # ~55.6 km due north
    (2, "data c", 40.0, -98.0),           # ~170 km due east
    (3, "data d", 41.4, -98.2),           # near the 200-km box corner: in bbox, outside circle
    (4, "data e", 70.0, -100.0),          # far north
    (5, "other words", 40.0, -100.01),    # nearest but does NOT match q
]
SCHEMA = "doc_id long, text string, lat double, lon double"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=0, id_space_bits=3,
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ix(docs, cfg):
    return build_index(docs.select("doc_id", "text"), cfg)


@pytest.fixture(scope="module")
def locs(docs):
    return docs.select("doc_id", "lat", "lon")


@pytest.fixture(scope="module")
def searcher(docs, ix, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("spatial") / "ix")
    write_index(ix, root, term_partitions=2, documents=docs,
                store_fields=["lat", "lon"])
    return LocalSearcher(root, cfg)


def brute(d_km=None, k=None):
    """Reference distances by plain python math over matching docs."""
    out = []
    for did, text, lat, lon in ROWS:
        if "data" not in text.split():
            continue
        rl1, rl2 = math.radians(PT[0]), math.radians(lat)
        a = (
            math.sin(math.radians(lat - PT[0]) / 2) ** 2
            + math.cos(rl1) * math.cos(rl2)
            * math.sin(math.radians(lon - PT[1]) / 2) ** 2
        )
        out.append((round(2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a)), 4), did))
    out.sort()
    if d_km is not None:
        out = [x for x in out if x[0] <= d_km]
    if k is not None:
        out = out[:k]
    return out


def test_geofilt_distributed(ix, locs, cfg):
    got = [
        (float(r["dist_km"]), int(r["doc_id"]))
        for r in geofilt(ix, locs, "data", PT, 200.0, cfg=cfg).collect()
    ]
    assert got == brute(d_km=200.0)
    # doc 5 (nearest overall) excluded: it doesn't match q
    assert 5 not in {d for _, d in got}
    # doc 3 sits in the bbox corner but outside the circle
    assert 3 not in {d for _, d in got}


def test_bbox_admits_corners(ix, locs, cfg):
    box = {int(r["doc_id"]) for r in bbox_filter(ix, locs, "data", PT, 200.0, cfg=cfg).collect()}
    circle = {d for _, d in brute(d_km=200.0)}
    assert circle < box          # strict superset
    assert 3 in box - circle     # the corner doc is the witness


def test_geodist_topk_and_serving_parity(ix, locs, cfg, searcher):
    expect = [(i + 1, did, d) for i, (d, did) in enumerate(brute(k=3))]
    got = [
        (int(r["rank"]), int(r["doc_id"]), float(r["dist_km"]))
        for r in geodist_topk(ix, locs, "data", PT, k=3, cfg=cfg).collect()
    ]
    assert got == expect
    assert searcher.geodist_topk("data", PT, k=3) == expect


def test_geofilt_serving_parity(ix, locs, cfg, searcher):
    dist = [
        (int(r["doc_id"]), float(r["dist_km"]))
        for r in geofilt(ix, locs, "data", PT, 200.0, cfg=cfg).collect()
    ]
    assert searcher.geofilt("data", PT, 200.0) == dist


def test_geofilt_with_fq(ix, locs, cfg, searcher):
    # fq='b' keeps only doc 1
    got = [
        (int(r["doc_id"]), float(r["dist_km"]))
        for r in geofilt(ix, locs, "data", PT, 200.0, cfg=cfg, fq="b").collect()
    ]
    assert [d for d, _ in got] == [1]
    assert searcher.geofilt("data", PT, 200.0, fq="b") == got


def test_polar_band_no_lon_filter(ix, locs, cfg):
    # a circle straddling the pole keeps the full longitude band:
    # doc 4 at lat 70 is ~2224 km from pole-point (89.9, -100)
    got = {
        int(r["doc_id"])
        for r in geofilt(ix, locs, "data", (89.9, -100.0), 2300.0, cfg=cfg).collect()
    }
    assert got == {4}
