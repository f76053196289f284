"""Packed-encoder external-bucket spill (round-6 batch 3): when a
reduce partition's buffered token bytes exceed
``spark.golr_loader.build.packed_spill_mb``, the unpack stage routes
rows into term-hash sub-bucket spill files (disjoint (term, fcode)
group sets) and sorts+encodes them one sub-bucket at a time — bounded
memory, and the block table must stay EXACTLY the flat path's.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.functions.tokenize import tokenize
from golr_loader_spark.plans.build_index import (
    build_postings,
    build_postings_packed,
)
from golr_loader_spark.plans.documents import assign_dense_ids, flatten_documents

N = 1200
SPILL_CONF = "spark.golr_loader.build.packed_spill_mb"


@pytest.fixture(scope="module")
def docs(spark):
    return flatten_documents(synth_corpus(spark, N, seed=42, partitions=6)).cache()


@pytest.fixture(scope="module")
def dense(docs):
    return assign_dense_ids(docs).cache()


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(cols).collect())


@pytest.mark.parametrize("positional", [False, True])
def test_spilled_equals_flat(spark, dense, positional):
    cfg = IndexConfig(
        bucket_bits=4,
        id_space_bits=max(2, (N - 1).bit_length()),
        positions=positional,
    )
    flat = build_postings(tokenize(dense, cfg, field_codes=True), cfg)
    try:
        # ~50 KB threshold: every reduce partition trips the spill
        spark.conf.set(SPILL_CONF, "0.05")
        spilled = build_postings_packed(dense, cfg)
        cols = flat.columns
        assert _rows(spilled, cols) == _rows(flat, cols)
    finally:
        spark.conf.unset(SPILL_CONF)


def test_spilled_equals_flat_hash_ids(spark, docs):
    # 64-bit hash ids (negative doc_ids, sparse buckets) through the
    # spill path
    cfg = IndexConfig(bucket_bits=5, id_space_bits=64)
    flat = build_postings(tokenize(docs, cfg, field_codes=True), cfg)
    try:
        spark.conf.set(SPILL_CONF, "0.05")
        spilled = build_postings_packed(docs, cfg)
        cols = flat.columns
        assert _rows(spilled, cols) == _rows(flat, cols)
    finally:
        spark.conf.unset(SPILL_CONF)


def test_zero_disables_spill(spark, dense):
    # packed_spill_mb=0 → pure in-memory path (the pre-spill behavior)
    cfg = IndexConfig(bucket_bits=4, id_space_bits=max(2, (N - 1).bit_length()))
    flat = build_postings(tokenize(dense, cfg, field_codes=True), cfg)
    try:
        spark.conf.set(SPILL_CONF, "0")
        packed = build_postings_packed(dense, cfg)
        cols = flat.columns
        assert _rows(packed, cols) == _rows(flat, cols)
    finally:
        spark.conf.unset(SPILL_CONF)
