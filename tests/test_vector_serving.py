"""Serving-path vector search + hybrid RRF: exact parity with the
distributed kernels (similarity.cosine_topk / rrf_fuse) on the same
data — the q45 story served JVM-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.operators import similarity as sim
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.serve import LocalSearcher
from golr_loader_spark.plans.vectors import (
    VectorReader,
    rrf_fuse_lists,
    write_vectors,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vecroot") / "ix")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)},
        id_space_bits=max(
            int(docs.agg(F.max("doc_id")).collect()[0][0]).bit_length(), 1
        ),
    )
    write_index(build_index(docs.select("doc_id", "text"), cfg), root,
                documents=docs)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = write_vectors(emb, root)
    assert n == emb.count()
    return root, cfg


def test_vector_topk_matches_distributed(spark, root):
    r, cfg = root
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    want = [
        (row["neighbor_id"], row["rank"], row["cos_sim"])
        for row in sim.cosine_topk(emb, [0], k=15).orderBy("rank").collect()
    ]
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = VectorReader(r).topk(qvec, k=15, exclude_id=0)
    assert [(i, rk) for i, rk, _ in got] == [(i, rk) for i, rk, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 2e-6  # both rounded to 6 dp


def test_hybrid_rrf_matches_distributed(spark, root):
    r, cfg = root
    ls = LocalSearcher(r, cfg)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]

    # distributed arms with the same parameters
    from golr_loader_spark.plans.bm25 import search
    from golr_loader_spark.plans.build_index import read_index

    ix = read_index(spark, r, cfg=cfg)
    lex_rows = search(ix, "data query spark", k=25, cfg=cfg).collect()
    lex = spark.createDataFrame(
        [(row["doc_id"], i + 1) for i, row in enumerate(lex_rows)],
        "doc_id long, rank long",
    )
    vec = sim.cosine_topk(emb, [0], k=25).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    want = [
        (row["id"], row["r0"], row["r1"], row["rrf_score"])
        for row in sim.rrf_fuse([lex, vec], top=10).collect()
    ]

    got = ls.hybrid_rrf(
        "data query spark", qvec, k_arms=25, top=10, exclude_id=0
    )
    assert [(g[0], g[1], g[2]) for g in got] == [
        (w[0], w[1], w[2]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-9


def test_rrf_fuse_lists_semantics():
    # id 3 in both arms dominates; singles ordered by rank then id
    got = rrf_fuse_lists([[3, 1], [3, 5]], k=60, top=4)
    assert got[0][0] == 3 and got[0][1] == 1 and got[0][2] == 1
    assert {g[0] for g in got} == {3, 1, 5}
    # missing arm contributes 0, ties break on id asc
    a, b = rrf_fuse_lists([[7], [9]], k=60, top=2)
    assert (a[0], b[0]) == (7, 9)


def test_vector_reader_edge_cases(root):
    r, _ = root
    vr = VectorReader(r)
    assert vr.topk([0.0] * vr.mat.shape[1], k=5) == []  # zero vector
    out = vr.topk(vr.mat[0], k=3)
    assert len(out) == 3 and out[0][1] == 1


def test_sharded_vector_and_hybrid_parity(spark, root):
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    r, cfg = root
    import tempfile

    out = tempfile.mkdtemp() + "/shards"
    roots = shard_index(spark, r, out, n_shards=2, cfg=cfg)
    ls = LocalSearcher(r, cfg)
    emb_row = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") == 0
    ).collect()[0]
    qvec = [float(x) for x in emb_row["embedding"]]

    want_vec = ls.vector_topk(qvec, k=12, exclude_id=0)
    want_hyb = ls.hybrid_rrf("data query spark", qvec, k_arms=20, top=8,
                             exclude_id=0)
    for parallel in (False, True):
        with ShardedSearcher(roots, cfg, parallel=parallel) as ss:
            assert ss.vector_topk(qvec, k=12, exclude_id=0) == want_vec
            assert ss.hybrid_rrf(
                "data query spark", qvec, k_arms=20, top=8, exclude_id=0
            ) == want_hyb


@pytest.fixture(scope="module")
def ivf_root(spark, tmp_path_factory):
    r = str(tmp_path_factory.mktemp("ivfroot") / "ix")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    write_vectors(emb, r, ivf_cells=16, ivf_iters=2)
    return r


def test_ivf_serving_exact_at_full_probe(ivf_root):
    vr = VectorReader(ivf_root)
    assert vr._cells == 16
    q = vr.mat[3]
    exact = vr.topk(q, k=10, exclude_id=int(vr.ids[3]))
    full = vr.topk(q, k=10, exclude_id=int(vr.ids[3]), n_probe=16)
    assert full == exact


def test_ivf_serving_recall_gate(ivf_root):
    """Recall on the near-random test embeddings is probe-ratio-bound
    (no multi-table amplification): the distributed op's documented
    curve is 0.49 @ 4/16 untrained. The serving reader probes TRAINED
    cells (2 Lloyd iterations), which must beat the untrained ratio —
    gate ≥ 0.55 @ 4/16 and ≥ 0.75 @ 8/16 (measured: 0.63 / 0.8+).
    Clustered real corpora concentrate neighbors in the query's cell
    and clear far higher recall at the same probe ratio."""
    vr = VectorReader(ivf_root)

    def recall(n_probe):
        hits = total = 0
        for qi in range(0, 40, 4):
            q = vr.mat[qi]
            ex = {i for i, _, _ in vr.topk(q, k=10, exclude_id=int(vr.ids[qi]))}
            ap = {
                i for i, _, _ in vr.topk(
                    q, k=10, exclude_id=int(vr.ids[qi]), n_probe=n_probe
                )
            }
            hits += len(ex & ap)
            total += len(ex)
        return hits / total

    assert recall(4) >= 0.55
    assert recall(8) >= 0.75
    # probed results must carry EXACT cosines (same rounded dot)
    q = vr.mat[8]
    ex = {i: c for i, _, c in vr.topk(q, k=10, exclude_id=int(vr.ids[8]))}
    for i, _, c in vr.topk(q, k=10, exclude_id=int(vr.ids[8]), n_probe=4):
        if i in ex:
            assert c == ex[i]


def test_vector_reader_skips_zero_row_parts(root, tmp_path):
    """Spark routinely writes empty part files (shard_index's
    repartitionByRange makes them near-certain): zero-row parts must
    not break the vstack (round-6 fix of the (0,0)-reshape crash)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    r, _ = root
    r2 = str(tmp_path / "vec_with_empty")
    shutil.copytree(r, r2)
    vr_ref = VectorReader(r)
    d = vr_ref.mat.shape[1]
    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(empty, f"{r2}/vectors/part-99999-empty.parquet")
    vr = VectorReader(r2)
    assert vr.mat.shape == vr_ref.mat.shape
    q = vr_ref.mat[3]
    assert vr.topk(q, k=5) == vr_ref.topk(q, k=5)
    # all-empty root → empty results, no crash
    import os

    r3 = str(tmp_path / "vec_all_empty")
    os.makedirs(f"{r3}/vectors")
    pq.write_table(empty, f"{r3}/vectors/part-0-empty.parquet")
    vr_e = VectorReader(r3)
    assert vr_e.topk([1.0] * d, k=5) == []
