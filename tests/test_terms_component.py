"""Solr TermsComponent (bm25.terms_enum) and TermVectorComponent
(bm25.term_vector) — brute-force df/tf models, serving-path twins,
chain interaction."""

from __future__ import annotations

from collections import Counter

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.bm25 import term_vector, terms_enum
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.serve import LocalSearcher

ROWS = [
    (0, "scan sort scan table"),
    (1, "sort spark stream table table"),
    (2, "spark scan agg"),
    (3, "stream spark spark scan value"),
    (4, "agg value sort"),
]


def brute_df() -> dict[str, int]:
    df: Counter[str] = Counter()
    for _i, text in ROWS:
        df.update(set(text.split(" ")))
    return dict(df)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, id_space_bits=3, bucket_bits=2
    )


@pytest.fixture(scope="module")
def index(corpus, cfg):
    return build_index(corpus, cfg)


@pytest.fixture(scope="module")
def served(index, corpus, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("terms") / "ix")
    write_index(index, root, documents=corpus, store_fields=["text"])
    return LocalSearcher(root)  # cfg restored from config.json


def test_terms_enum_count_sort_matches_brute(spark, index, cfg):
    ix = index
    got = [(r["term"], r["df"]) for r in terms_enum(ix, limit=100, cfg=cfg).collect()]
    want = sorted(brute_df().items(), key=lambda x: (-x[1], x[0]))
    assert got == want
    # prefix + limit
    got = [(r["term"], r["df"]) for r in terms_enum(ix, prefix="s", limit=3, cfg=cfg).collect()]
    want_s = [x for x in want if x[0].startswith("s")][:3]
    assert got == want_s
    # index sort
    got = [r["term"] for r in terms_enum(ix, sort="index", limit=100, cfg=cfg).collect()]
    assert got == sorted(brute_df())
    # min_df
    got = {r["term"] for r in terms_enum(ix, min_df=3, limit=100, cfg=cfg).collect()}
    assert got == {t for t, d in brute_df().items() if d >= 3}


def test_terms_enum_serving_parity(index, cfg, served):
    for kw in (
        dict(limit=100),
        dict(prefix="s", limit=3),
        dict(sort="index", limit=100),
        dict(min_df=3, limit=100),
        dict(prefix="zz", limit=5),
    ):
        dist = [(r["term"], r["df"]) for r in terms_enum(index, cfg=cfg, **kw).collect()]
        assert served.terms(**kw) == dist, kw


def test_term_vector_matches_brute(spark, index, corpus, cfg):
    df = brute_df()
    for doc_id, text in ROWS:
        tf = Counter(text.split(" "))
        want = [(t, tf[t], df[t]) for t in sorted(tf)]
        got = [
            (r["term"], r["tf"], r["df"])
            for r in term_vector(index, corpus, doc_id, cfg=cfg).collect()
        ]
        assert got == want, doc_id
    # missing doc → empty
    assert term_vector(index, corpus, 99, cfg=cfg).count() == 0


def test_term_vector_serving_parity(index, corpus, cfg, served):
    for doc_id, _ in ROWS:
        dist = [
            (r["term"], r["tf"], r["df"])
            for r in term_vector(index, corpus, doc_id, cfg=cfg).collect()
        ]
        assert served.term_vector(doc_id) == dist, doc_id


def test_terms_enum_respects_chain(spark):
    ccfg = IndexConfig(
        fields={"text": ("simple", 1.0)},
        id_space_bits=3,
        bucket_bits=2,
        stopwords=("the",),
        stem="minimal_english",
    )
    corpus = spark.createDataFrame(
        [(0, "the tables"), (1, "table scans")], "doc_id long, text string"
    )
    ix = build_index(corpus, ccfg)
    got = dict(
        (r["term"], r["df"]) for r in terms_enum(ix, limit=10, cfg=ccfg).collect()
    )
    # 'the' stopped; 'tables'/'table' merged by the stemmer; 'scans' stemmed
    assert got == {"table": 2, "scan": 1}
    tv = [(r["term"], r["tf"], r["df"]) for r in term_vector(ix, corpus, 0, cfg=ccfg).collect()]
    assert tv == [("table", 1, 2)]
