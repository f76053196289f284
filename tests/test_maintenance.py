"""Delete (tombstone) + compaction lifecycle tests.

The contract: deletes take effect immediately at query time (Lucene
liveDocs — stale stats until compaction), and a compacted index is
rank-identical to an index rebuilt from the surviving corpus.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.plans.bm25 import search, search_batch
from golr_loader_spark.plans.build_index import build_index, read_index, write_index
from golr_loader_spark.plans.documents import assign_dense_ids, flatten_documents
from golr_loader_spark.plans.maintenance import (
    compact_index,
    compact_root,
    delete_docs,
    load_tombstone_ids,
)

QUERIES = ["def return", "zq0007", "user_data", "import batch", "http server"]


@pytest.fixture(scope="module")
def corpus(spark):
    return assign_dense_ids(
        flatten_documents(synth_corpus(spark, 600, seed=42))
    ).cache()


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(bucket_bits=3, id_space_bits=10)


def _top(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_exclude_ids_masks_results_with_stale_stats(spark, corpus, cfg):
    ix = build_index(corpus, cfg)
    base = _top(search(ix, "def return", k=10, cfg=cfg))
    victims = np.array([d for d, _s in base[:3]], dtype=np.int64)
    got = _top(search(ix, "def return", k=10, cfg=cfg, exclude_ids=victims))
    assert not set(victims) & {d for d, _s in got}
    # stale-stats semantics: surviving docs keep their PRE-delete
    # scores, and the next-ranked docs move up in the same order
    survivors = [(d, s) for d, s in base if d not in set(victims)]
    assert got[: len(survivors)] == survivors[:10][: len(got)] or got == survivors[:10]


def test_compacted_index_rank_identical_to_rebuild(spark, corpus, cfg):
    ix = build_index(corpus, cfg)
    victims = np.array(
        [r["doc_id"] for r in corpus.filter(F.col("doc_id") % 7 == 0).collect()],
        dtype=np.int64,
    )
    compacted = compact_index(ix, victims)
    rebuilt = build_index(corpus.filter(F.col("doc_id") % 7 != 0), cfg)
    assert compacted.n_docs == rebuilt.n_docs
    for q in QUERIES:
        a = _top(search(compacted, q, k=10, cfg=cfg))
        b = _top(search(rebuilt, q, k=10, cfg=cfg))
        assert a == b, q
    # batch path too
    qs = dict(enumerate(QUERIES))
    a = search_batch(compacted, qs, k=5, cfg=cfg).collect()
    b = search_batch(rebuilt, qs, k=5, cfg=cfg).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compaction_repacks_blocks_and_drops_empty_lists(spark, corpus, cfg):
    ix = build_index(corpus, cfg)
    all_ids = np.array([r["doc_id"] for r in corpus.select("doc_id").collect()])
    # delete everything except 5 docs: most lists must disappear
    keep5 = set(all_ids[:5].tolist())
    victims = np.array([i for i in all_ids if i not in keep5], dtype=np.int64)
    compacted = compact_index(ix, victims)
    rows = compacted.postings.collect()
    assert all(r["n"] > 0 for r in rows)
    decoded_docs = set()
    for r in rows:
        assert r["block_id"] == 0  # <=5 postings per list: one block
        decoded_docs.add(r["doc_id_first"])
    assert decoded_docs <= keep5


def test_persisted_delete_then_compact_root(spark, corpus, cfg, tmp_path):
    root = str(tmp_path / "ix")
    ix = build_index(corpus, cfg)
    write_index(ix, root, term_partitions=4)

    base = _top(search(read_index(spark, root, cfg), "def return", k=10, cfg=cfg))
    victims = [d for d, _s in base[:2]]
    delete_docs(spark, root, victims)
    delete_docs(spark, root, victims[:1])  # overlapping batch: union semantics
    tomb = load_tombstone_ids(spark, root)
    assert set(tomb) == set(victims)

    # LocalSearcher sees tombstones immediately
    from golr_loader_spark.plans.serve import LocalSearcher

    ls = LocalSearcher(root, cfg)
    hits = ls.search("def return", k=10)
    assert not set(victims) & {d for d, _s in hits}

    removed = compact_root(spark, root, cfg)
    assert removed == 2
    assert len(load_tombstone_ids(spark, root)) == 0
    live = corpus.filter(~F.col("doc_id").isin(victims))
    rebuilt = build_index(live, cfg)
    after = read_index(spark, root, cfg)
    for q in QUERIES:
        assert _top(search(after, q, k=10, cfg=cfg)) == _top(
            search(rebuilt, q, k=10, cfg=cfg)
        ), q
    # fresh LocalSearcher over the compacted root agrees as well
    ls2 = LocalSearcher(root, cfg)
    assert ls2.tombstones is None
    assert ls2.search("def return", k=10) == _top(search(rebuilt, "def return", k=10, cfg=cfg))


def test_upsert_replaces_adds_and_revives(spark, corpus, cfg, tmp_path):
    """update = delete + add (eager): changed docs are re-ranked by
    their NEW content, brand-new docs join the corpus, a previously
    deleted doc that is re-upserted becomes live again — and the
    whole index is rank-identical to a fresh build of the final
    corpus state."""
    from golr_loader_spark.plans.maintenance import upsert_docs

    root = str(tmp_path / "ix_up")
    ix = build_index(corpus, cfg)
    write_index(ix, root, term_partitions=4, documents=corpus)

    # delete one doc; it will be revived by the upsert below
    revived = int(corpus.select("doc_id").first()["doc_id"])
    delete_docs(spark, root, [revived])

    # batch: 30 changed docs (content swapped for another doc's),
    # 10 brand-new docs, plus the revived one unchanged
    n0 = corpus.count()
    changed = (
        corpus.filter((F.col("doc_id") % 20 == 3) | (F.col("doc_id") == revived))
        .withColumn("content", F.reverse(F.col("content")))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    new_docs = corpus.limit(10).select(
        *[
            (F.col("doc_id") + 100000).alias("doc_id")
            if c == "doc_id"
            else F.col(c)
            for c in corpus.columns
        ]
    )
    batch = changed.unionByName(new_docs)
    res = upsert_docs(spark, root, batch, cfg)
    assert res["updated"] == changed.count()
    assert res["added"] == 10
    assert len(load_tombstone_ids(spark, root)) == 0  # revived

    # final corpus state = originals minus changed + changed + new
    final = (
        corpus.join(changed.select("doc_id"), "doc_id", "left_anti")
        .unionByName(changed)
        .unionByName(new_docs)
    )
    rebuilt = build_index(final, cfg)
    after = read_index(spark, root, cfg)
    assert after.n_docs == rebuilt.n_docs == n0 + 10
    for q in QUERIES:
        assert _top(search(after, q, k=10, cfg=cfg)) == _top(
            search(rebuilt, q, k=10, cfg=cfg)
        ), q
    # compaction of the segmented index preserves rank identity
    compact_root(spark, root, cfg)  # no tombstones -> returns 0, no-op
    delete_docs(spark, root, [revived])
    assert compact_root(spark, root, cfg) == 1
    after2 = read_index(spark, root, cfg)
    rebuilt2 = build_index(final.filter(F.col("doc_id") != revived), cfg)
    for q in QUERIES:
        assert _top(search(after2, q, k=10, cfg=cfg)) == _top(
            search(rebuilt2, q, k=10, cfg=cfg)
        ), q


def test_compact_prunes_docs_manifest(spark, corpus, cfg, tmp_path):
    """delete → compact → upsert the SAME id must count as 'added'
    (not 'updated') with correct n_docs — i.e. compaction prunes the
    docs manifest, otherwise idf/avgdl are computed against a phantom
    corpus size forever after."""
    from golr_loader_spark.plans.maintenance import upsert_docs

    root = str(tmp_path / "ix_mp")
    ix = build_index(corpus, cfg)
    write_index(ix, root, term_partitions=4, documents=corpus)
    n0 = corpus.count()

    victim = int(corpus.select("doc_id").first()["doc_id"])
    delete_docs(spark, root, [victim])
    assert compact_root(spark, root, cfg) == 1
    assert read_index(spark, root, cfg).n_docs == n0 - 1
    # the manifest must no longer list the compacted-away doc
    assert (
        spark.read.parquet(f"{root}/docs").filter(F.col("doc_id") == victim).count()
        == 0
    )

    res = upsert_docs(
        spark, root, corpus.filter(F.col("doc_id") == victim), cfg
    )
    assert res == {"updated": 0, "added": 1}
    after = read_index(spark, root, cfg)
    assert after.n_docs == n0
    rebuilt = build_index(corpus, cfg)
    for q in QUERIES[:3]:
        assert _top(search(after, q, k=10, cfg=cfg)) == _top(
            search(rebuilt, q, k=10, cfg=cfg)
        ), q
