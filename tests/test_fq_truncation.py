"""Regression tests for fq (Solr filter query) correctness:

1. fq must intersect the COMPLETE scored match set, not a top-k
   truncated one — fq-passing docs ranked below k among pre-filter
   matches must still surface (the Solr search-then-filter
   composition; mirrors bm25.search's `k if fq is None else n_docs`
   invariant). Both the distributed executor (search_lucene) and the
   serving twin (LocalSearcher.query) had per-bucket truncation
   applied before the fq semi-join.
2. Pure-negative fq ("-engine") implies *:* like Solr's all-negative
   rewrite: live universe minus the negated match set — previously it
   emptied the whole result.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.bm25 import search
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import all_doc_ids
from golr_loader_spark.plans.lucene import fq_doc_ids, search_lucene
from golr_loader_spark.plans.serve import LocalSearcher

# One bucket (bucket_bits=0) so per-bucket truncation == global
# truncation; docs 0-2 score far above docs 3-4 on 'data' (tf 4 vs 1
# at equal dl), so pre-fq top-2 is a subset of {0,1,2} while only
# {3,4} pass fq='spark'.
ROWS = [
    (0, "data data data data"),
    (1, "data data data data"),
    (2, "data data data data"),
    (3, "data spark filler words"),
    (4, "data spark other words"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=0, id_space_bits=3,
    )


@pytest.fixture(scope="module")
def ix(spark, cfg):
    return build_index(spark.createDataFrame(ROWS, SCHEMA).cache(), cfg)


@pytest.fixture(scope="module")
def searcher(spark, ix, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fqserve") / "ix")
    write_index(ix, root, term_partitions=2)
    return LocalSearcher(root, cfg)


def ids(df):
    return {int(r["doc_id"]) for r in df.collect()}


def test_fq_survives_topk_truncation_distributed(ix, cfg):
    got = ids(search_lucene(ix, "data", k=2, cfg=cfg, fq="spark"))
    assert got == {3, 4}
    # same invariant through the richer executor fq path
    got2 = ids(search_lucene(ix, "data", k=2, cfg=cfg, fq="+spark"))
    assert got2 == {3, 4}
    # and through bm25.search's fq
    got3 = ids(search(ix, "data", k=2, cfg=cfg, fq="spark"))
    assert got3 == {3, 4}


def test_fq_survives_topk_truncation_serving(searcher):
    got = {d for d, _s in searcher.query("data", k=2, fq="spark")}
    assert got == {3, 4}


def test_fq_parity_distributed_vs_serving(ix, cfg, searcher):
    for q, fq, k in [("data", "spark", 2), ("data spark", "filler", 1)]:
        want = [
            (int(r["doc_id"]), round(float(r["score"]), 6))
            for r in search_lucene(ix, q, k=k, cfg=cfg, fq=fq).collect()
        ]
        got = [
            (d, round(s, 6)) for d, s in searcher.query(q, k=k, fq=fq)
        ]
        assert got == want, (q, fq)


def test_all_doc_ids_is_the_universe(ix, cfg):
    assert ids(all_doc_ids(ix)) == {0, 1, 2, 3, 4}


def test_pure_negative_fq_distributed(ix, cfg):
    # fq='-spark' implies *:* minus spark docs → {0,1,2}
    assert ids(fq_doc_ids(ix, "-spark", cfg=cfg)) == {0, 1, 2}
    got = ids(search_lucene(ix, "data", k=10, cfg=cfg, fq="-spark"))
    assert got == {0, 1, 2}
    # negating a term absent from the corpus keeps the full universe
    assert ids(fq_doc_ids(ix, "-xyzzyq", cfg=cfg)) == {0, 1, 2, 3, 4}


def test_pure_negative_fq_serving(searcher):
    assert searcher._fq_ids_local("-spark") == {0, 1, 2}
    got = {d for d, _s in searcher.query("data", k=10, fq="-spark")}
    assert got == {0, 1, 2}
    assert searcher._all_doc_ids_local() == {0, 1, 2, 3, 4}


def test_pure_negative_fq_parity(ix, cfg, searcher):
    want = [
        (int(r["doc_id"]), round(float(r["score"]), 6))
        for r in search_lucene(
            ix, "data filler", k=10, cfg=cfg, fq="-spark"
        ).collect()
    ]
    got = [
        (d, round(s, 6))
        for d, s in searcher.query("data filler", k=10, fq="-spark")
    ]
    assert got == want
