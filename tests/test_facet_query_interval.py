"""facet.query + facet.interval: distributed plans vs serving twins.

Solr semantics pinned here:
* facet.query — count per requested subquery WITHIN the q match set,
  every requested label returned (zero counts included, mincount does
  not apply), subqueries through the full non-scoring filter executor
  (boolean, phrase).
* facet.interval — counts per REQUESTED interval in request order,
  zero counts included, OVERLAPPING intervals each count the doc,
  open/closed/unbounded bounds per the facet.interval.set syntax.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import (
    facet_query_counts,
    interval_facet_counts,
    parse_interval,
)
from golr_loader_spark.plans.serve import LocalSearcher

# doc 0: matches q + 'spark' + phrase; doc 1: q + spark + engine;
# doc 2: q only; doc 3: q + phrase; doc 4: does NOT match q.
ROWS = [
    (0, "data spark stream data stream x", 10),
    (1, "query spark engine fast", 150),
    (2, "data plain words here", 250),
    (3, "query data stream end", 600),
    (4, "unrelated spark text", 300),
]
SCHEMA = "doc_id long, text string, n_chars long"

FACET_QUERIES = {
    "has_spark": "spark",
    "spark_not_engine": "+spark -engine",
    "phrase_ds": '"data stream"',
}
INTERVALS = ["[0,200)", "[200,500)", "[500,*]", "(100,300]"]
# matched docs {0,1,2,3}; n_chars 10,150,250,600
EXPECT_INTERVALS = [(1, "[0,200)", 2), (2, "[200,500)", 1),
                    (3, "[500,*]", 1), (4, "(100,300]", 2)]
EXPECT_QUERIES = [("has_spark", 2), ("phrase_ds", 2), ("spark_not_engine", 1)]


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=0, id_space_bits=3,
        positions=True,
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ix(docs, cfg):
    return build_index(docs.select("doc_id", "text"), cfg)


@pytest.fixture(scope="module")
def searcher(docs, ix, cfg, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qifacet") / "ix")
    write_index(ix, root, term_partitions=2, documents=docs,
                store_fields=["text", "n_chars"])
    return LocalSearcher(root, cfg)


def test_parse_interval():
    assert parse_interval("[0,200)") == (0.0, 200.0, True, False)
    assert parse_interval("(100,300]") == (100.0, 300.0, False, True)
    assert parse_interval("[500,*]") == (500.0, None, True, True)
    assert parse_interval("[*,5)") == (None, 5.0, True, False)
    with pytest.raises(ValueError):
        parse_interval("0,200")
    with pytest.raises(ValueError):
        parse_interval("[0;200)")


def test_facet_query_counts_distributed(ix, cfg):
    got = [
        (r["label"], int(r["n"]))
        for r in facet_query_counts(ix, FACET_QUERIES, "data query", cfg=cfg).collect()
    ]
    assert got == EXPECT_QUERIES


def test_facet_query_counts_serving_parity(searcher):
    assert searcher.facet_query_counts("data query", FACET_QUERIES) == EXPECT_QUERIES


def test_facet_query_zero_count_included(ix, cfg, searcher):
    fqs = {"never": "zzznope"}
    assert [
        (r["label"], int(r["n"]))
        for r in facet_query_counts(ix, fqs, "data query", cfg=cfg).collect()
    ] == [("never", 0)]
    assert searcher.facet_query_counts("data query", fqs) == [("never", 0)]


def test_facet_query_with_fq(ix, cfg, searcher):
    # fq='spark' shrinks the base set to {0,1}; phrase holds only for 0
    fqs = {"phrase_ds": '"data stream"'}
    expect = [("phrase_ds", 1)]
    got = [
        (r["label"], int(r["n"]))
        for r in facet_query_counts(
            ix, fqs, "data query", cfg=cfg, fq="spark"
        ).collect()
    ]
    assert got == expect
    assert searcher.facet_query_counts("data query", fqs, fq="spark") == expect


def test_interval_facets_distributed(ix, docs, cfg):
    from pyspark.sql import functions as F

    vals = docs.select("doc_id", F.col("n_chars").cast("double").alias("value"))
    got = [
        (int(r["pos"]), r["interval"], int(r["n"]))
        for r in interval_facet_counts(
            ix, vals, INTERVALS, "data query", cfg=cfg
        ).collect()
    ]
    assert got == EXPECT_INTERVALS


def test_interval_facets_serving_parity(searcher):
    assert searcher.interval_facet_counts(
        "data query", "n_chars", INTERVALS
    ) == EXPECT_INTERVALS


def test_interval_facets_zero_and_empty_match(ix, docs, cfg, searcher):
    from pyspark.sql import functions as F

    vals = docs.select("doc_id", F.col("n_chars").cast("double").alias("value"))
    got = [
        (int(r["pos"]), r["interval"], int(r["n"]))
        for r in interval_facet_counts(
            ix, vals, ["[1000,*]"], "zzznope", cfg=cfg
        ).collect()
    ]
    assert got == [(1, "[1000,*]", 0)]
    assert searcher.interval_facet_counts("zzznope", "n_chars", ["[1000,*]"]) == [
        (1, "[1000,*]", 0)
    ]
