"""Broadcast-shipped tombstone masks (VERDICT r3 item 4).

Contract: every distributed read path accepts ``exclude_ids`` as a
``broadcast_excl`` Broadcast and produces results identical to the
plain-array shape — but the task closure no longer embeds the liveDocs
arrays (they ride Spark's broadcast channel: a 10^8-row delete set
would otherwise be serialized into every stage's task binary)."""

from __future__ import annotations

import numpy as np
import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.bm25 import (
    broadcast_excl,
    search,
    search_batch,
)
from golr_loader_spark.plans.build_index import build_index, read_index, write_index
from golr_loader_spark.plans.facets import matching_doc_ids
from golr_loader_spark.plans.lucene import search_lucene
from golr_loader_spark.plans.maintenance import (
    broadcast_tombstones,
    delete_docs,
    load_tombstones,
)
from golr_loader_spark.plans.phrase import phrase_search_positional

N0 = 24


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=6,
        positions=True,
    )


@pytest.fixture(scope="module")
def rootix(spark, cfg, tmp_path_factory):
    rows = [(i, f"common filler uid{i} words here") for i in range(N0)]
    docs = _docs(spark, rows)
    ix = build_index(docs, cfg)
    root = str(tmp_path_factory.mktemp("btomb") / "ix")
    write_index(ix, root, term_partitions=2, documents=docs)
    delete_docs(spark, root, [1, 5, 7])
    return root, read_index(spark, root, cfg)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_broadcast_equals_plain_arrays(spark, rootix, cfg):
    root, ix = rootix
    tomb = load_tombstones(spark, root)
    bca = broadcast_tombstones(spark, root)
    assert bca is not None
    for q, mode in [("common", "or"), ("common filler", "and"), ("uid5", "or")]:
        want = [
            (r["doc_id"], r["score"])
            for r in search(ix, q, k=30, cfg=cfg, exclude_ids=tomb).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in search(ix, q, k=30, cfg=cfg, exclude_ids=bca).collect()
        ]
        assert got == want and all(d not in {1, 5, 7} for d, _ in got), q
    # decode-only membership path
    assert _ids(
        matching_doc_ids(ix, "common", cfg=cfg, exclude_ids=bca)
    ) == _ids(matching_doc_ids(ix, "common", cfg=cfg, exclude_ids=tomb))
    # lucene executor path
    assert _ids(search_lucene(ix, "common -uid9", k=30, cfg=cfg, exclude_ids=bca)) == _ids(
        search_lucene(ix, "common -uid9", k=30, cfg=cfg, exclude_ids=tomb)
    )
    # positional phrase path
    assert _ids(
        phrase_search_positional(ix, "common filler", k=30, cfg=cfg, exclude_ids=bca)
    ) == _ids(
        phrase_search_positional(ix, "common filler", k=30, cfg=cfg, exclude_ids=tomb)
    )
    # shared-scan batch path
    want_b = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in search_batch(
            ix, {0: "common", 1: "uid3"}, k=3, cfg=cfg, exclude_ids=tomb
        ).collect()
    }
    got_b = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in search_batch(
            ix, {0: "common", 1: "uid3"}, k=3, cfg=cfg, exclude_ids=bca
        ).collect()
    }
    assert got_b == want_b


def test_closure_does_not_embed_arrays(spark):
    """The serialized task function carries the Broadcast handle (a
    few hundred bytes), not the arrays: factory closures built from a
    Broadcast must pickle ~independent of tombstone-set size, while
    the plain-array shape grows linearly (the exact driver+network
    weight the broadcast removes)."""
    import cloudpickle

    from golr_loader_spark.plans.facets import _match_bucket_factory

    big = np.arange(2_000_000, dtype=np.int64)
    fn_raw = _match_bucket_factory({"t": ["text"]}, None, big)
    raw_sz = len(cloudpickle.dumps(fn_raw))
    assert raw_sz > 8_000_000  # arrays embedded: ids + dead_below

    bca = broadcast_excl(spark, big)
    fn_b = _match_bucket_factory({"t": ["text"]}, None, bca)
    b_sz = len(cloudpickle.dumps(fn_b))
    assert b_sz < 100_000, (raw_sz, b_sz)
    bca.unpersist()


def test_broadcast_excl_empty_is_none(spark):
    assert broadcast_excl(spark, None) is None
    assert broadcast_excl(spark, np.empty(0, dtype=np.int64)) is None
