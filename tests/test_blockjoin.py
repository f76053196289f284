"""Block join (plans/blockjoin.py): Solr {!parent}/{!child} semantics
— ScoreMode aggregates over per-block child scores, parents never
score as children, {!child} returns block members minus parents —
against a brute-force model, with serving and sharded parity (blocks
deliberately SPAN shards to exercise the cross-shard partial merge)."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.blockjoin import (
    block_join_child,
    block_join_parent,
)
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import build_facets
from golr_loader_spark.plans.lucene import search_lucene

# parents carry the marker token 'parentdoc'; children are ordinary
# docs. block = the blk column (a facet field on BOTH).
# doc_ids spread across range buckets so block members land on
# DIFFERENT shards at n_shards=3 (bucket = id >> 3 here): the sharded
# twin must merge per-block partials across shards to be correct.
ROWS = [
    (0, "data query spark", "g0"),
    (9, "query data", "g0"),
    (18, "data runs alone", "g1"),
    (27, "spark streaming", "g1"),
    (36, "unrelated words", "g2"),
    (45, "data query data", "g2"),
    (54, "sort scan", "g3"),
    (64, "parentdoc alpha", "g0"),
    (73, "parentdoc beta data", "g1"),  # parent MATCHING child query
    (82, "parentdoc gamma", "g2"),
    (91, "parentdoc delta", "g3"),
]
SCHEMA = "doc_id long, text string, blk string"
Q = "data query"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(fields={"text": ("simple", 1.0)}, id_space_bits=7)


@pytest.fixture(scope="module")
def setup(spark, cfg, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, SCHEMA).cache()
    ix = build_index(docs.select("doc_id", "text"), cfg)
    fx = build_facets(docs, ["blk"], cfg)
    root = str(tmp_path_factory.mktemp("bjix") / "flat")
    write_index(ix, root, term_partitions=2, facets=fx)
    return ix, fx, root


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def brute_parent(ix, cfg, score_mode, k=10):
    kid = dict(rows(search_lucene(ix, Q, k=100, cfg=cfg)))
    parents = {64: "g0", 73: "g1", 82: "g2", 91: "g3"}
    blocks = {d: b for d, _t, b in ROWS}
    agg: dict = {}
    for d in sorted(kid):
        if d in parents:
            continue
        agg.setdefault(blocks[d], []).append(kid[d])
    out = []
    for p, b in parents.items():
        if b not in agg:
            continue
        xs = agg[b]
        s = {"none": 1.0, "total": sum(xs), "avg": sum(xs) / len(xs),
             "max": max(xs)}[score_mode]
        out.append((p, pytest.approx(s)))
    out.sort(key=lambda x: (-x[1].expected, x[0]))
    return out[:k]


@pytest.mark.parametrize("mode", ["none", "total", "avg", "max"])
def test_parent_score_modes_match_brute(spark, cfg, setup, mode):
    ix, fx, _root = setup
    got = rows(block_join_parent(ix, fx, Q, "parentdoc", "blk", mode, cfg=cfg))
    assert got == brute_parent(ix, cfg, mode), mode


def test_parent_never_scores_as_child(spark, cfg, setup):
    # doc 73 matches the child query AND the which query → its score
    # must NOT contribute to g1's aggregate (only doc 18's does)
    ix, fx, _root = setup
    kid = dict(rows(search_lucene(ix, Q, k=100, cfg=cfg)))
    got = dict(rows(block_join_parent(ix, fx, Q, "parentdoc", "blk", "total", cfg=cfg)))
    assert got[73] == pytest.approx(kid[18])


def test_child_join(spark, cfg, setup):
    ix, fx, _root = setup
    # parents matching 'beta' → block g1 → children {18, 27}
    got = [r["doc_id"] for r in block_join_child(ix, fx, "beta", "parentdoc", "blk", cfg=cfg).collect()]
    assert got == [18, 27]
    # all parents → every child, no parents in the result
    got_all = [r["doc_id"] for r in block_join_child(ix, fx, "parentdoc", "parentdoc", "blk", cfg=cfg).collect()]
    assert got_all == [0, 9, 18, 27, 36, 45, 54]


def test_serving_and_sharded_parity(spark, cfg, setup):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    ix, fx, root = setup
    ls = LocalSearcher(root, cfg)
    sh = ShardedSearcher(
        shard_index(spark, root, root + "/sh", 3, cfg=cfg), cfg
    )
    # blocks span shards: assert at least one block's members live on
    # two different shards, so the cross-shard merge is exercised
    from golr_loader_spark.plans.shard import shard_of_doc

    spans = {
        b: {shard_of_doc(d, cfg, 3) for d, _t, bb in ROWS if bb == b}
        for _d, _t, b in ROWS
    }
    assert any(len(s) > 1 for s in spans.values())
    for mode in ("none", "total", "avg", "max"):
        want = [
            (d, round(s, 9))
            for d, s in rows(
                block_join_parent(ix, fx, Q, "parentdoc", "blk", mode, cfg=cfg)
            )
        ]
        got_l = [
            (d, round(s, 9))
            for d, s in ls.block_join_parent(Q, "parentdoc", "blk", mode)
        ]
        got_s = [
            (d, round(s, 9))
            for d, s in sh.block_join_parent(Q, "parentdoc", "blk", mode)
        ]
        assert got_l == want, mode
        assert got_s == want, mode
    want_c = [r["doc_id"] for r in block_join_child(ix, fx, "beta", "parentdoc", "blk", cfg=cfg).collect()]
    assert ls.block_join_child("beta", "parentdoc", "blk") == want_c
    assert sh.block_join_child("beta", "parentdoc", "blk") == want_c


def test_bad_score_mode(spark, cfg, setup):
    ix, fx, _root = setup
    with pytest.raises(ValueError, match="score_mode"):
        block_join_parent(ix, fx, Q, "parentdoc", "blk", "sumsq", cfg=cfg)
