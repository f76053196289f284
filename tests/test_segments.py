"""Segment-scoped tombstones / fast upsert (Lucene add+liveDocs).

Contract under test:
* ``upsert_docs_fast`` is append-only (O(batch)): old content becomes
  unfindable IMMEDIATELY, new content findable, n_docs accounting
  exact, while df/avgdl stay stale until compaction;
* all read paths (distributed search in both modes, batch, facets
  matching, phrase scoring, LocalSearcher) mask superseded copies by
  segment — a doc never matches or scores through its old copy;
* ``compact_root`` merges segments and restores BIT-exact rank
  parity with a fresh rebuild of the final corpus;
* delete → fast re-upsert revives; fast upsert → delete kills all
  copies; the exact ``upsert_docs`` on a root with pending segment
  tombstones resolves them.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.bm25 import search
from golr_loader_spark.plans.build_index import build_index, read_index, write_index
from golr_loader_spark.plans.maintenance import (
    compact_root,
    delete_docs,
    load_tombstones,
    upsert_docs,
    upsert_docs_fast,
)
from golr_loader_spark.plans.serve import LocalSearcher

N0 = 24


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _base_rows():
    # every doc shares 'common'; doc i carries unique marker f"uid{i}"
    return [(i, f"common filler uid{i} words here") for i in range(N0)]


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=6)


@pytest.fixture()
def root(spark, cfg, tmp_path):
    docs = _docs(spark, _base_rows())
    ix = build_index(docs, cfg)
    root = str(tmp_path / "ix_seg")
    write_index(ix, root, term_partitions=2, documents=docs)
    return root


def _ids(df):
    return [r["doc_id"] for r in df.collect()]


def test_fast_upsert_masks_old_and_serves_new(spark, root, cfg):
    res = upsert_docs_fast(
        spark, root, _docs(spark, [(3, "replacement body novelword common")]), cfg
    )
    assert res == {"updated": 1, "added": 0, "segment": 1}
    ix = read_index(spark, root, cfg)
    tomb = load_tombstones(spark, root)
    assert ix.n_docs == N0  # replacement, not growth
    # old content unfindable, new findable — in both modes
    assert _ids(search(ix, "uid3", k=5, cfg=cfg, exclude_ids=tomb)) == []
    assert _ids(search(ix, "novelword", k=5, cfg=cfg, exclude_ids=tomb)) == [3]
    assert _ids(
        search(ix, "novelword common", k=5, cfg=cfg, mode="and", exclude_ids=tomb)
    ) == [3]
    # the doc matches 'common' exactly ONCE (through its newest copy)
    from golr_loader_spark.plans.facets import matching_doc_ids

    m = matching_doc_ids(ix, "common", cfg=cfg, exclude_ids=tomb)
    assert sorted(_ids(m)) == list(range(N0))
    # serving path agrees without being handed tombstones explicitly
    ls = LocalSearcher(root, cfg)
    assert ls.search("uid3", k=5) == []
    assert [d for d, _s in ls.search("novelword", k=5)] == [3]


def test_fast_upsert_appends_only(spark, root, cfg):
    import glob

    before = set(glob.glob(f"{root}/postings/*.parquet"))
    upsert_docs_fast(spark, root, _docs(spark, [(5, "changed text common")]), cfg)
    after = set(glob.glob(f"{root}/postings/*.parquet"))
    assert before <= after and len(after) > len(before)  # no base file rewritten


def test_fast_upsert_add_and_compact_restores_exactness(spark, root, cfg):
    upsert_docs_fast(
        spark,
        root,
        _docs(
            spark,
            [
                (3, "replacement body novelword common"),
                (N0, "brand new appended doc common"),
            ],
        ),
        cfg,
    )
    ix = read_index(spark, root, cfg)
    assert ix.n_docs == N0 + 1
    removed = compact_root(spark, root, cfg)
    assert removed == 0  # superseded copies are not doc removals
    # post-compact: bit-exact parity with a fresh rebuild of the
    # final corpus, tombstones gone, one segment
    final_rows = [r for r in _base_rows() if r[0] != 3] + [
        (3, "replacement body novelword common"),
        (N0, "brand new appended doc common"),
    ]
    rebuilt = build_index(_docs(spark, final_rows), cfg)
    after = read_index(spark, root, cfg)
    assert after.n_docs == N0 + 1
    ids_t, _db = load_tombstones(spark, root)
    assert len(ids_t) == 0
    assert after.postings.select("segment").distinct().collect()[0][0] == 0
    for q in ("common filler", "novelword", "uid7 common", "brand appended"):
        got = [(r["doc_id"], r["score"]) for r in search(after, q, k=10, cfg=cfg).collect()]
        want = [(r["doc_id"], r["score"]) for r in search(rebuilt, q, k=10, cfg=cfg).collect()]
        assert got == want, q


def test_delete_then_fast_reupsert_revives(spark, root, cfg):
    delete_docs(spark, root, [4])
    ix = read_index(spark, root, cfg)
    assert _ids(search(ix, "uid4", k=5, cfg=cfg, exclude_ids=load_tombstones(spark, root))) == []
    upsert_docs_fast(spark, root, _docs(spark, [(4, "revived uid4 common")]), cfg)
    ix = read_index(spark, root, cfg)
    tomb = load_tombstones(spark, root)
    assert _ids(search(ix, "uid4", k=5, cfg=cfg, exclude_ids=tomb)) == [4]
    assert read_index(spark, root, cfg).n_docs == N0
    # and the reverse: fast upsert then hard delete kills every copy
    delete_docs(spark, root, [4])
    tomb = load_tombstones(spark, root)
    assert _ids(search(ix, "uid4", k=5, cfg=cfg, exclude_ids=tomb)) == []
    assert _ids(search(ix, "revived", k=5, cfg=cfg, exclude_ids=tomb)) == []


def test_exact_upsert_resolves_pending_segment_tombstones(spark, root, cfg):
    upsert_docs_fast(spark, root, _docs(spark, [(6, "first rewrite common")]), cfg)
    res = upsert_docs(spark, root, _docs(spark, [(7, "second rewrite common")]), cfg)
    assert res == {"updated": 1, "added": 0}
    # the exact path physically resolved doc 6's segment tombstone:
    # no tombstones remain, and stats are exact again
    ids_t, _db = load_tombstones(spark, root)
    assert len(ids_t) == 0
    final_rows = [r for r in _base_rows() if r[0] not in (6, 7)] + [
        (6, "first rewrite common"),
        (7, "second rewrite common"),
    ]
    rebuilt = build_index(_docs(spark, final_rows), cfg)
    after = read_index(spark, root, cfg)
    for q in ("common filler", "rewrite", "uid9 common"):
        got = [(r["doc_id"], r["score"]) for r in search(after, q, k=10, cfg=cfg).collect()]
        want = [(r["doc_id"], r["score"]) for r in search(rebuilt, q, k=10, cfg=cfg).collect()]
        assert got == want, q


def test_phrase_on_fast_upserted_root(spark, root, cfg):
    from golr_loader_spark.plans.phrase import phrase_search

    upsert_docs_fast(
        spark, root, _docs(spark, [(2, "alpha beta gamma common")]), cfg
    )
    ix = read_index(spark, root, cfg)
    tomb = load_tombstones(spark, root)
    docs_now = _docs(
        spark,
        [r for r in _base_rows() if r[0] != 2] + [(2, "alpha beta gamma common")],
    )
    hits = phrase_search(ix, docs_now, "alpha beta", k=5, cfg=cfg, exclude_ids=tomb)
    assert _ids(hits) == [2]
    # the OLD copy's phrase is gone
    assert (
        phrase_search(ix, docs_now, "filler uid2", k=5, cfg=cfg, exclude_ids=tomb).count()
        == 0
    )
