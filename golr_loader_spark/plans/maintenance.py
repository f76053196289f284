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


def _swap_tables(root: str, tmp: str, tables: tuple) -> None:
    """Move freshly-written tables from ``tmp`` into ``root`` with the
    narrowest practical crash window: each old table is atomically
    renamed ASIDE (never deleted before its replacement exists), the
    new one renamed in, and the aside copies removed only after every
    table swapped. A crash mid-swap leaves the old table recoverable
    in ``{root}/.gc`` (never a root with a missing table + no backup);
    callers order the tombstone rewrite AFTER the swap so the worst
    crash outcome is conservative (a re-upserted doc stays masked
    until the idempotent operation is retried), never resurrection or
    a lost table."""
    import shutil

    gc = f"{root}/.gc"
    shutil.rmtree(gc, ignore_errors=True)
    os.makedirs(gc)
    for t in tables:
        if os.path.isdir(f"{root}/{t}"):
            os.rename(f"{root}/{t}", f"{gc}/{t}")
        os.rename(f"{tmp}/{t}", f"{root}/{t}")
    shutil.rmtree(gc, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


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
        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        # multi-segment lists (incremental/upsert appends) interleave
        # doc ranges across blocks — re-sort so the compacted list is
        # globally doc_id-ordered (smallest deltas, format contract)
        order = np.argsort(ids, kind="stable")
        rb = _encode_groups(
            pa.array([term]),
            pa.array([fld]),
            np.array([bucket]),
            np.array([0, m], dtype=np.int64),
            ids[order],
            tfs[order],
            dls[order],
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


def upsert_docs(
    spark: SparkSession,
    root: str,
    documents: DataFrame,
    cfg: IndexConfig | None = None,
) -> dict:
    """Solr-style add/overwrite into a persisted index root: incoming
    docs REPLACE existing docs with the same ``doc_id`` and extend the
    corpus otherwise. Returns {"updated": n, "added": n}.

    Requires the ``{root}/docs`` manifest (write_index(...,
    documents=...)) — membership is a semi-join against it, so the
    updated/added split and the n_docs accounting are exact.

    Mechanics (Lucene's update = delete + add, applied eagerly):
      1. postings of existing versions are physically removed by a
         targeted compaction (only lists containing the updated ids
         change; the tombstone broadcast masks them);
      2. the new docs' postings are built with the build's own
         pipeline and appended as a fresh segment — per-bucket WAND
         scoring is segment-order-insensitive (accumulation per doc),
         the same property the incremental stream relies on;
      3. term/corpus stats are recomputed over the merged block table;
      4. incoming ids are withdrawn from ``{root}/tombstones`` (a
         deleted doc that is re-upserted becomes live again) and the
         docs manifest is rewritten.
    A later ``compact_root`` re-packs the segments into globally
    doc_id-sorted lists."""
    import shutil

    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.build_index import (
        build_postings,
        read_index,
        write_index,
    )

    cfg = cfg or IndexConfig()
    docs_path = f"{root}/docs"
    if not os.path.isdir(docs_path):
        raise ValueError(
            "upsert requires the {root}/docs manifest — persist with "
            "write_index(..., documents=flattened_docs)"
        )
    meta = spark.read.parquet(docs_path)
    incoming = documents.select("doc_id").distinct()
    # ONE driver job resolves membership AND the id list: left-join
    # incoming against the manifest and collect the (id, known) pairs
    marked = incoming.join(
        meta.select("doc_id", F.lit(True).alias("_known")), "doc_id", "left"
    ).collect()
    incoming_ids = [int(r["doc_id"]) for r in marked]
    existing_ids = np.array(
        sorted(r["doc_id"] for r in marked if r["_known"]), dtype=np.int64
    )
    n_incoming = len(incoming_ids)

    ix = read_index(spark, root, cfg)
    base = (
        compact_postings(ix.postings, existing_ids, cfg)
        if len(existing_ids)
        else ix.postings
    )
    from pyspark import StorageLevel

    fresh = build_postings(tokenize(documents, cfg), cfg)
    merged = base.unionByName(fresh).persist(StorageLevel.MEMORY_AND_DISK)
    merged.count()  # materialize once: 3 table writes + stats reuse it
    n_docs = ix.n_docs - len(existing_ids) + n_incoming
    new_ix = InvertedIndex(
        postings=merged,
        term_stats=derived_term_stats(merged),
        stats=derived_stats(merged, n_docs),
        cfg=cfg,
    )
    tmp = f"{root}/.upsert_tmp"
    new_meta = meta.join(incoming, "doc_id", "left_anti").unionByName(
        documents.select(
            "doc_id",
            (
                F.col("content_sha256")
                if "content_sha256" in documents.columns
                else F.lit(None).cast("string")
            ).alias("content_sha256"),
        )
    )
    new_meta.write.mode("overwrite").parquet(f"{tmp}/docs")
    write_index(new_ix, tmp)
    # read the surviving tombstones BEFORE the swap, rewrite them
    # AFTER it: a crash between swap and rewrite leaves re-upserted
    # ids still masked (conservative; retrying the upsert fixes it) —
    # never resurrection against old postings
    tomb = load_tombstone_ids(spark, root)
    live_again = set(incoming_ids)
    remaining = [i for i in tomb.tolist() if i not in live_again]
    _swap_tables(root, tmp, ("postings", "term_stats", "stats", "docs"))
    shutil.rmtree(f"{root}/tombstones", ignore_errors=True)
    if remaining:
        delete_docs(spark, root, remaining)
    return {"updated": int(len(existing_ids)), "added": int(n_incoming - len(existing_ids))}


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
    tables = ["postings", "term_stats", "stats"]
    docs_path = f"{root}/docs"
    if os.path.isdir(docs_path):
        # prune compacted-away ids from the docs manifest — a stale
        # entry would make a later upsert of that id count as
        # "updated" and undercount n_docs (corrupting idf/avgdl)
        meta = spark.read.parquet(docs_path)
        tomb_df = spark.createDataFrame(
            [(int(i),) for i in tomb], "doc_id long"
        )
        meta.join(tomb_df, "doc_id", "left_anti").write.mode(
            "overwrite"
        ).parquet(f"{tmp}/docs")
        tables.append("docs")
    _swap_tables(root, tmp, tuple(tables))
    shutil.rmtree(f"{root}/tombstones", ignore_errors=True)
    return len(tomb)
