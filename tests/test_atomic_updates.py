"""Stored-field / facet-row update contract (the Lucene per-segment
stored+docValues semantics) and Solr atomic updates:

* after ``upsert_docs_fast``, fetch / facets / sort-by-field all see
  the NEW values (before this round they silently served stale rows);
* compaction folds the segments into clean resolved tables;
* the exact ``upsert_docs`` path rewrites the doc tables in step;
* ``atomic_update`` = read stored → apply set/inc/add/remove →
  re-upsert, with Solr's all-fields-stored preconditions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import build_facets
from golr_loader_spark.plans.maintenance import (
    atomic_update,
    compact_root,
    upsert_docs,
    upsert_docs_fast,
)
from golr_loader_spark.plans.serve import LocalSearcher

SCHEMA = "doc_id long, text string, lang string, views long"
ROWS = [
    (0, "data query", "en", 10),
    (1, "spark joins", "de", 20),
    (2, "sort scan data", "en", 30),
]


@pytest.fixture()
def root(spark, tmp_path):
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    docs = spark.createDataFrame(ROWS, SCHEMA)
    r = str(tmp_path / "ix")
    ix = build_index(docs.select("doc_id", "text"), cfg)
    write_index(
        ix, r, term_partitions=2, documents=docs,
        facets=build_facets(docs, ["lang"], cfg),
        store_fields=["text", "lang", "views"],
    )
    return r, cfg, docs


def test_fast_upsert_refreshes_stored_and_facets(spark, root):
    r, cfg, _docs = root
    upd = spark.createDataFrame([(0, "fresh words", "fr", 99)], SCHEMA)
    upsert_docs_fast(spark, r, upd, cfg)
    ls = LocalSearcher(r, cfg)
    # index: new text searchable, old gone (pre-existing behavior)
    assert [d for d, _s in ls.search("fresh", k=5)] == [0]
    assert ls.search("query", k=5) == []
    # stored fields: the NEW row, not the stale base row
    assert ls.fetch([0]) == {0: {"text": "fresh words", "lang": "fr", "views": 99}}
    # facets: doc 0 now counts as fr, not en
    counts = ls.facet_counts("fresh spark sort", "lang")
    assert dict(counts["lang"]) == {"fr": 1, "de": 1, "en": 1}
    # sort-by-stored-field sees the new value
    page = ls.search_sorted("fresh spark sort", "views", ascending=False, rows=3)
    assert [(d, v) for _p, d, v in page] == [(0, 99), (2, 30), (1, 20)]


def test_compaction_resolves_doc_tables(spark, root):
    r, cfg, _docs = root
    upsert_docs_fast(
        spark, r,
        spark.createDataFrame([(0, "fresh words", "fr", 99)], SCHEMA), cfg,
    )
    compact_root(spark, r, cfg)
    ls = LocalSearcher(r, cfg)
    assert ls.fetch([0])[0]["lang"] == "fr"
    assert dict(ls.facet_counts("fresh spark sort", "lang")["lang"]) == {
        "fr": 1, "de": 1, "en": 1,
    }
    # clean tables: no duplicate stored rows survive compaction
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{r}/stored", format="parquet").to_table()
    assert sorted(tbl["doc_id"].to_pylist()) == [0, 1, 2]


def test_exact_upsert_rewrites_doc_tables(spark, root):
    r, cfg, _docs = root
    upsert_docs(
        spark, r,
        spark.createDataFrame([(1, "neue worte", "it", 7)], SCHEMA), cfg,
    )
    ls = LocalSearcher(r, cfg)
    assert ls.fetch([1]) == {1: {"text": "neue worte", "lang": "it", "views": 7}}
    assert dict(ls.facet_counts("data neue", "lang")["lang"]) == {
        "en": 2, "it": 1,
    }


def test_sharded_parity_after_upsert(spark, root):
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    r, cfg, _docs = root
    upsert_docs_fast(
        spark, r,
        spark.createDataFrame([(0, "fresh words", "fr", 99)], SCHEMA), cfg,
    )
    ls = LocalSearcher(r, cfg)
    sh = ShardedSearcher(shard_index(spark, r, r + "/sh", 2, cfg=cfg), cfg)
    assert sh.fetch([0, 1, 2]) == ls.fetch([0, 1, 2])
    q = "fresh spark sort"
    assert sh.facet_counts(q, "lang") == ls.facet_counts(q, "lang")


def test_atomic_update_ops(spark, root):
    r, cfg, _docs = root
    out = atomic_update(
        spark, r,
        {
            0: {"text": ("set", "brand new data"), "views": ("inc", 5)},
            2: {"lang": ("set", "es")},
        },
        cfg,
    )
    assert out["updated"] == 2 and out["added"] == 0
    ls = LocalSearcher(r, cfg)
    assert ls.fetch([0])[0] == {"text": "brand new data", "lang": "en", "views": 15}
    assert ls.fetch([2])[2]["lang"] == "es"
    # reindexed: new token searchable, replaced token gone for doc 0
    assert [d for d, _s in ls.search("brand", k=5)] == [0]
    assert 0 in {d for d, _s in ls.search("data", k=5)}  # still has 'data'
    assert ls.search("query", k=5) == []
    assert dict(ls.facet_counts("brand spark sort data", "lang")["lang"]) == {
        "de": 1, "en": 1, "es": 1,
    }


def test_atomic_update_preconditions(spark, root):
    r, cfg, _docs = root
    with pytest.raises(ValueError, match="unknown doc"):
        atomic_update(spark, r, {77: {"views": ("inc", 1)}}, cfg)
    with pytest.raises(ValueError, match="unstored field"):
        atomic_update(spark, r, {0: {"nope": ("set", 1)}}, cfg)
    with pytest.raises(ValueError, match="unknown atomic op"):
        atomic_update(spark, r, {0: {"views": ("mul", 2)}}, cfg)


def test_realtime_get(spark, root):
    from golr_loader_spark.plans.maintenance import delete_docs

    r, cfg, _docs = root
    ls = LocalSearcher(r, cfg)
    assert ls.get(1) == {"text": "spark joins", "lang": "de", "views": 20}
    assert ls.get(1, ["lang"]) == {"lang": "de"}
    assert ls.get(77) is None
    # updated doc → latest version; deleted doc → None
    upsert_docs_fast(
        spark, r,
        spark.createDataFrame([(0, "fresh words", "fr", 99)], SCHEMA), cfg,
    )
    delete_docs(spark, r, [2])
    ls = ls.refresh()
    assert ls.get(0)["text"] == "fresh words"
    assert ls.get(2) is None
