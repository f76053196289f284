"""Index maintenance: document deletes (tombstones) + compaction.

The reference's Solr sink gets update/delete for free from the Solr
server (GolrLoader.java:498-515 POSTs documents; Solr overwrites or
deletes by id). An engine-owned index needs the same lifecycle, and
this module provides it with Lucene's two-phase semantics:

* ``delete_docs`` appends ids to a tombstone table next to the index
  (cheap, O(batch)); queries mask tombstoned docs at posting-decode
  time (``exclude_ids`` in plans.bm25 — Lucene liveDocs), so deleted
  docs vanish from results IMMEDIATELY while corpus statistics stay
  stale — exactly Lucene's behavior between delete and segment merge.
* ``compact_index`` physically rewrites the posting blocks without
  the tombstoned postings and recomputes term/corpus stats, after
  which results are rank-identical to an index rebuilt from the
  surviving corpus (asserted in tests/test_maintenance.py) and the
  tombstone table resets.

Compaction plan shape at scale: the block table shuffles ONCE on its
own (term, field, bucket) key — the same skew-safe bound as the build
(a bucket holds ≤ n_docs/2**bucket_bits postings per term) — and each
group decodes, masks, and re-encodes with the build's vectorized
codec, also re-packing underfull blocks. The tombstone set rides a
Spark broadcast (a delete batch of 10M ids is ~80 MB — fine; a
tombstone set rivaling the corpus itself should be expressed as a
rebuild instead).
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.codec import varint_decode
from golr_loader_spark.plans.build_index import (
    InvertedIndex,
    _encode_groups,
    derived_stats,
    derived_term_stats,
)

_POSTING_COLS = [
    "term", "field", "bucket", "block_id", "n", "doc_id_first",
    "doc_ids", "tfs", "dls", "max_tf", "min_dl", "tf_sum",
]


def delete_docs(spark: SparkSession, root: str, ids: Iterable[int]) -> None:
    """Append a delete batch to ``{root}/tombstones`` (idempotent at
    query time: the mask is a set union)."""
    ids = [int(i) for i in ids]
    spark.createDataFrame([(i,) for i in ids], "doc_id long").write.mode(
        "append"
    ).parquet(f"{root}/tombstones")


def load_tombstone_ids(spark: SparkSession, root: str) -> np.ndarray:
    """Current tombstone set for ``exclude_ids`` (empty if none)."""
    path = f"{root}/tombstones"
    if not os.path.isdir(path):
        return np.empty(0, dtype=np.int64)
    rows = spark.read.parquet(path).select("doc_id").distinct().collect()
    return np.array(sorted(r["doc_id"] for r in rows), dtype=np.int64)


def compact_postings(
    postings: DataFrame, tombstone_ids: np.ndarray, cfg: IndexConfig
) -> DataFrame:
    """Rewrite the block table without tombstoned postings.

    Each (term, field, bucket) list is decoded whole, masked, and
    re-encoded as one group — which both drops deleted postings and
    re-packs underfull blocks to ``cfg.block_size``; lists losing all
    postings disappear. Delta/varint streams, block-max bounds, and
    tf_sum are all recomputed by the build's own encoder, so a
    compacted index is byte-compatible with a fresh build."""
    spark = postings.sparkSession
    tomb_b = spark.sparkContext.broadcast(
        np.unique(np.asarray(tombstone_ids, dtype=np.int64))
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, fld, bucket = key
        pdf = pdf.sort_values("block_id")
        n_per_block = pdf["n"].to_numpy(np.int64)
        firsts = pdf["doc_id_first"].to_numpy(np.int64)
        deltas = varint_decode(b"".join(pdf["doc_ids"])).astype(np.int64)
        g = np.cumsum(deltas)
        starts = np.concatenate([[0], np.cumsum(n_per_block)])[:-1]
        ids = g + np.repeat(firsts - g[starts], n_per_block)
        tfs = varint_decode(b"".join(pdf["tfs"])).astype(np.int64)
        dls = varint_decode(b"".join(pdf["dls"])).astype(np.int64)
        keep = np.isin(ids, tomb_b.value, invert=True)
        m = int(keep.sum())
        if m == 0:
            return pd.DataFrame({c: [] for c in _POSTING_COLS})
        rb = _encode_groups(
            pa.array([term]),
            pa.array([fld]),
            np.array([bucket]),
            np.array([0, m], dtype=np.int64),
            ids[keep],
            tfs[keep],
            dls[keep],
            cfg,
        )
        return rb.to_pandas()

    schema = (
        "term string, field string, bucket int, block_id int, n int, "
        "doc_id_first long, doc_ids binary, tfs binary, dls binary, "
        "max_tf int, min_dl int, tf_sum long"
    )
    return postings.groupBy("term", "field", "bucket").applyInPandas(fn, schema)


def compact_index(
    index: InvertedIndex,
    tombstone_ids: np.ndarray,
    n_docs_removed: int | None = None,
) -> InvertedIndex:
    """→ new InvertedIndex without the tombstoned docs.

    ``n_docs_removed`` defaults to the distinct tombstone count —
    exact when callers tombstone live corpus ids (the delete-API
    contract, mirroring Solr's delete-by-id of known documents)."""
    from pyspark import StorageLevel

    tomb = np.unique(np.asarray(tombstone_ids, dtype=np.int64))
    removed = len(tomb) if n_docs_removed is None else int(n_docs_removed)
    new_postings = compact_postings(index.postings, tomb, index.cfg).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_docs = index.n_docs - removed
    return InvertedIndex(
        postings=new_postings,
        term_stats=derived_term_stats(new_postings),
        stats=derived_stats(new_postings, n_docs),
        cfg=index.cfg,
    )


def compact_root(spark: SparkSession, root: str, cfg: IndexConfig | None = None) -> int:
    """Compact a PERSISTED index in place: fold ``{root}/tombstones``
    into the postings, rewrite postings/term_stats/stats, clear the
    tombstone table. Returns the number of docs removed."""
    import shutil

    from golr_loader_spark.plans.build_index import read_index, write_index

    cfg = cfg or IndexConfig()
    tomb = load_tombstone_ids(spark, root)
    if not len(tomb):
        return 0
    ix = read_index(spark, root, cfg)
    new_ix = compact_index(ix, tomb)
    new_ix.postings.count()  # materialize BEFORE overwriting the source
    tmp = f"{root}/.compact_tmp"
    write_index(new_ix, tmp)
    for t in ("postings", "term_stats", "stats"):
        shutil.rmtree(f"{root}/{t}")
        os.rename(f"{tmp}/{t}", f"{root}/{t}")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(f"{root}/tombstones", ignore_errors=True)
    return len(tomb)
