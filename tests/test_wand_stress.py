"""Randomized stress for block-max pruning rank-identity.

The pruning invariant (bm25.py module doc) is the subtlest piece of
the engine; this sweeps configurations that change which blocks get
pruned — tiny blocks (pruning decisions per few postings), different
bucket counts, k=1 (aggressive θ) vs large k (no pruning), multiple
corpus seeds — and demands exact rank+score identity vs the oracle
every time.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.functions.tokenize import analyze_query, tokenize
from golr_loader_spark.plans.bm25 import score_exact, search
from golr_loader_spark.plans.build_index import build_index, doc_lengths
from golr_loader_spark.plans.documents import flatten_documents

CASES = [
    # (seed, block_size, bucket_bits, k)
    (7, 8, 2, 1),     # tiny blocks, few buckets, k=1 → max pruning
    (7, 8, 2, 25),
    (11, 16, 5, 3),
    (13, 128, 4, 10),
    (13, 4, 6, 5),    # 4-posting blocks, 64 buckets
]
QUERIES = ["def return", "zq0011 batch", "user_data the", "import def return the class"]


@pytest.mark.parametrize("seed,block,bits,k", CASES)
def test_rank_identity_under_config_sweep(spark, seed, block, bits, k):
    cfg = IndexConfig(block_size=block, bucket_bits=bits)
    docs = flatten_documents(synth_corpus(spark, 250, seed=seed)).cache()
    ix = build_index(docs, cfg)
    ix.postings = ix.postings.cache()
    tokens = tokenize(docs, cfg).cache()
    dls = doc_lengths(tokens)
    avgdl = ix.avgdl_by_field
    for q in QUERIES:
        exact = score_exact(
            tokens, dls, ix.n_docs, avgdl, analyze_query(q), cfg, k=k
        ).collect()
        wand = search(ix, q, k=k, cfg=cfg).collect()
        assert [r["doc_id"] for r in wand] == [r["doc_id"] for r in exact], (
            seed, block, bits, k, q,
        )
        for a, b in zip(wand, exact):
            assert a["score"] == pytest.approx(b["score"], rel=1e-9)
