"""Solr LTR (plans.ltr): feature extraction + LinearModel rerank.

Pins: block scores are REPLACED by the model (not additively
combined), the ReRankCollector block contract (tail rows never enter
the block, block rows never fall below it), all four stock feature
kinds resolve, feature logging exports the block's vectors, and the
LocalSearcher twin matches the distributed path row for row.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.ltr import (
    Feature,
    LinearModel,
    extract_features,
    ltr_block,
    ltr_rerank,
)
from golr_loader_spark.plans.serve import LocalSearcher

# docs 0-2 score high on 'data' (tf 3); docs 3-5 low (tf 1). With
# rerank_docs=3 the block is {0,1,2}; the model inverts it via n_len.
ROWS = [
    (0, "data data data x", 10),
    (1, "data data data y", 20),
    (2, "data data data z", 30),
    (3, "data p q r", 40),
    (4, "data s t u", 50),
    (5, "data v w q", 60),
]
SCHEMA = "doc_id long, text string, n_chars long"

FEATS = [
    Feature("orig", "original_score"),
    Feature("f_q", "solr_query", "y z"),
    Feature("f_len", "field_value", "n_chars"),
    Feature("f_c", "constant", 2.0),
]


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
def searcher(docs, ix, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ltr") / "ix")
    write_index(ix, root, term_partitions=2, documents=docs,
                store_fields=["n_chars"])
    return LocalSearcher(root, cfg)


def test_ltr_block_kernel_contract():
    first = [(0, 9.0), (1, 8.0), (2, 7.0), (3, 1.0), (4, 0.5)]
    vals = {"neg": {0: 3.0, 1: 2.0, 2: 1.0}}
    model = LinearModel("m", (("neg", -1.0),))
    out = ltr_block(first, vals, model, k=5, rerank_docs=3)
    # block inverted by the model; tail (3, 4) keeps first-pass order
    assert out == [
        (1, 2, -1.0), (2, 1, -2.0), (3, 0, -3.0),
        (4, 3, 1.0), (5, 4, 0.5),
    ]
    # block contract: doc 3 scores above every block row yet stays out
    assert [d for _r, d, _s in out[:3]] == [2, 1, 0]


def test_model_replaces_score(ix, docs, cfg):
    # weights zero except the constant: every block score == 2.0·w
    model = LinearModel("m", (("f_c", 3.0),))
    got = ltr_rerank(ix, docs, "data", FEATS, model, k=3, rerank_docs=3, cfg=cfg)
    assert [float(r["score"]) for r in got.collect()] == [6.0, 6.0, 6.0]
    # ties broke by doc_id asc
    assert [int(r["doc_id"]) for r in got.collect()] == [0, 1, 2]


def test_field_and_query_features_rerank(ix, docs, cfg):
    # n_chars dominates → block order inverted to 2, 1, 0; tail 3..5
    model = LinearModel("m", (("orig", 1.0), ("f_len", 10.0)))
    got = [
        (int(r["rank"]), int(r["doc_id"]))
        for r in ltr_rerank(
            ix, docs, "data", FEATS, model, k=6, rerank_docs=3, cfg=cfg
        ).collect()
    ]
    assert [d for _r, d in got[:3]] == [2, 1, 0]
    assert [d for _r, d in got[3:]] == [3, 4, 5]


def test_serving_twin_parity(ix, docs, cfg, searcher):
    model = LinearModel(
        "m", (("orig", 1.0), ("f_q", 0.8), ("f_len", 0.01), ("f_c", 0.5))
    )
    dist = [
        (int(r["rank"]), int(r["doc_id"]), float(r["score"]))
        for r in ltr_rerank(
            ix, docs, "data", FEATS, model, k=6, rerank_docs=3, cfg=cfg
        ).collect()
    ]
    assert searcher.ltr_rerank("data", FEATS, model, k=6, rerank_docs=3) == dist


def test_extract_features_logging(ix, docs, cfg):
    got = {
        int(r["doc_id"]): r
        for r in extract_features(
            ix, docs, "data", FEATS, rerank_docs=3, cfg=cfg
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    assert float(got[1]["f_len"]) == 20.0
    assert float(got[0]["f_c"]) == 2.0
    # f_q ('y z') matches docs 1 and 2 only; doc 0 logs 0.0
    assert float(got[0]["f_q"]) == 0.0
    assert float(got[1]["f_q"]) > 0.0
    assert float(got[0]["first_score"]) > 0.0


def test_no_match_empty(ix, docs, cfg, searcher):
    model = LinearModel("m", (("orig", 1.0),))
    assert ltr_rerank(ix, docs, "zzznope", FEATS, model, cfg=cfg).count() == 0
    assert searcher.ltr_rerank("zzznope", FEATS, model) == []
