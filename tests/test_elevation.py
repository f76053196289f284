"""QueryElevationComponent (lucene.search_elevated + twins): pinned
docs first in elevation order (score 0.0 when they don't match —
forceElevation), excluded docs gone, organic tail after the pinned
block."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.lucene import (
    elevate_lists,
    search_elevated,
    search_lucene,
)

ROWS = [
    (0, "data query spark engine"),
    (1, "query data spark"),
    (2, "data query data query runs"),
    (3, "spark streaming joins"),
    (4, "unrelated words entirely"),
    (5, "the data query"),
    (6, "sort scan data"),
    (7, "span sort query"),
]
SCHEMA = "doc_id long, text string"
Q = "data query"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )


@pytest.fixture(scope="module")
def ix(spark, cfg):
    return build_index(spark.createDataFrame(ROWS, SCHEMA).cache(), cfg)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_pinned_first_excluded_gone_tail_organic(spark, ix, cfg):
    organic = rows(search_lucene(ix, Q, k=10, cfg=cfg))
    base = dict(organic)
    got = rows(
        search_elevated(ix, Q, elevate=[6, 4], exclude=[0], k=10, cfg=cfg)
    )
    # pinned block: 6 (matches, keeps organic score), 4 (no match → 0.0)
    assert got[0] == (6, base[6])
    assert got[1] == (4, 0.0)
    # tail: organic order minus pinned/excluded
    want_tail = [(d, s) for d, s in organic if d not in {6, 4, 0}]
    assert got[2:] == want_tail
    # the shared kernel agrees
    assert elevate_lists(base, [6, 4], [0], 10) == got


def test_k_truncation_and_exclusion_interplay(spark, ix, cfg):
    # an elevated id that is also excluded vanishes and does NOT eat a
    # page slot
    got = rows(
        search_elevated(ix, Q, elevate=[6, 5], exclude=[6], k=3, cfg=cfg)
    )
    assert got[0][0] == 5
    assert len(got) == 3
    assert 6 not in {d for d, _s in got}


def test_no_elevation_is_plain_search(spark, ix, cfg):
    assert rows(search_elevated(ix, Q, k=5, cfg=cfg)) == rows(
        search_lucene(ix, Q, k=5, cfg=cfg)
    )


def test_serving_and_sharded_parity(spark, ix, cfg, tmp_path):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    root = str(tmp_path / "ix")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    sh = ShardedSearcher(shard_index(spark, root, root + "/sh", 2, cfg=cfg), cfg)
    for elev, excl, k in [([6, 4], [0], 10), ([7], None, 4), (None, [2], 5)]:
        want = [
            (d, round(s, 9))
            for d, s in rows(
                search_elevated(ix, Q, elevate=elev, exclude=excl, k=k, cfg=cfg)
            )
        ]
        got_l = [
            (d, round(s, 9))
            for d, s in ls.search_elevated(Q, elevate=elev, exclude=excl, k=k)
        ]
        got_s = [
            (d, round(s, 9))
            for d, s in sh.search_elevated(Q, elevate=elev, exclude=excl, k=k)
        ]
        assert got_l == want, (elev, excl, k)
        assert got_s == want, (elev, excl, k)
