"""Solr ReRank (plans/rerank.py): two-pass ranking with Lucene's
ReRankCollector block contract — top-N re-sorts by first + W*second,
the tail keeps first-pass order AFTER the block, and no tail doc can
rise above the block."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.lucene import search_lucene
from golr_loader_spark.plans.rerank import rerank_lists, rerank_search

ROWS = [
    (0, "data query spark engine"),
    (1, "query data spark sort"),
    (2, "data query data query runs"),
    (3, "spark streaming joins scan"),
    (4, "unrelated words entirely"),
    (5, "the data query sort scan"),
    (6, "sort scan data"),
    (7, "span sort query"),
]
SCHEMA = "doc_id long, text string"
Q1, Q2 = "data query spark", "sort scan"


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


def complete(ix, cfg, q):
    return dict(rows(search_lucene(ix, q, k=100, cfg=cfg)))


@pytest.mark.parametrize(
    "n,w,k",
    [(3, 2.0, 10), (2, 5.0, 10), (100, 1.0, 5), (3, -4.0, 10), (4, 2.0, 3)],
)
def test_matches_block_model(ix, cfg, n, w, k):
    # brute-force model: complete match sets + the block contract
    # applied in plain python
    first, second = complete(ix, cfg, Q1), complete(ix, cfg, Q2)
    ranked = sorted(first.items(), key=lambda x: (-x[1], x[0]))
    blk = [(d, s + w * second.get(d, 0.0)) for d, s in ranked[:n]]
    blk.sort(key=lambda x: (-x[1], x[0]))
    want = [(d, pytest.approx(s)) for d, s in (blk + ranked[n:])[:k]]
    got = rows(
        rerank_search(
            ix, Q1, Q2, k=k, rerank_docs=n, rerank_weight=w, cfg=cfg
        )
    )
    assert got == want, (n, w, k)
    # the shared kernel agrees with itself (serving path uses it)
    assert rerank_lists(first, second, k, n, w) == [
        (d, s) for d, s in (blk + ranked[n:])[:k]
    ]


def test_tail_keeps_first_pass_order(ix, cfg):
    # doc 6 ("sort scan data") would LOVE the rerank query, but with
    # rerank_docs=2 it sits in the tail → keeps its first-pass slot
    first = complete(ix, cfg, Q1)
    ranked = [d for d, _s in sorted(first.items(), key=lambda x: (-x[1], x[0]))]
    got = [d for d, _s in rows(
        rerank_search(ix, Q1, Q2, k=10, rerank_docs=2, rerank_weight=50.0, cfg=cfg)
    )]
    assert got[2:] == ranked[2:]  # tail untouched
    assert set(got[:2]) == set(ranked[:2])  # block membership fixed


def test_no_rerank_matches_is_first_pass(ix, cfg):
    got = rows(rerank_search(ix, Q1, "zzzmissing", k=10, rerank_docs=5, cfg=cfg))
    want = rows(search_lucene(ix, Q1, k=10, cfg=cfg))
    assert got == want


def test_serving_and_sharded_parity(spark, ix, cfg, tmp_path):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    root = str(tmp_path / "ix")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    sh = ShardedSearcher(shard_index(spark, root, root + "/sh", 2, cfg=cfg), cfg)
    for n, w, k in [(3, 2.0, 10), (2, -1.5, 8), (100, 3.0, 5)]:
        want = [
            (d, round(s, 6))
            for d, s in rows(
                rerank_search(
                    ix, Q1, Q2, k=k, rerank_docs=n, rerank_weight=w, cfg=cfg
                )
            )
        ]
        got_l = [
            (d, round(s, 6))
            for d, s in ls.rerank(Q1, Q2, k=k, rerank_docs=n, rerank_weight=w)
        ]
        got_s = [
            (d, round(s, 6))
            for d, s in sh.rerank(Q1, Q2, k=k, rerank_docs=n, rerank_weight=w)
        ]
        assert got_l == want, (n, w, k)
        assert got_s == want, (n, w, k)
