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
    "doc_ids", "tfs", "dls", "max_tf", "min_dl", "tf_sum", "segment",
]

_DEAD_EVERYWHERE = np.iinfo(np.int64).max


def delete_docs(
    spark: SparkSession, root: str, ids: Iterable[int], dead_below: int | None = None
) -> None:
    """Append a delete batch to ``{root}/tombstones`` (idempotent at
    query time: the mask is a set union). ``dead_below`` defaults to
    "dead in every segment" (a hard delete); fast upserts pass their
    new segment number so only OLDER copies of the doc die."""
    db = _DEAD_EVERYWHERE if dead_below is None else int(dead_below)
    ids = [int(i) for i in ids]
    spark.createDataFrame(
        [(i, db) for i in ids], "doc_id long, dead_below long"
    ).write.mode("append").parquet(f"{root}/tombstones")


def load_tombstones(spark: SparkSession, root: str) -> tuple[np.ndarray, np.ndarray]:
    """Current tombstone set as the ``(ids, dead_below)`` pair the
    scorers accept (bm25._norm_excl semantics; duplicate ids resolve
    to the MAX dead_below — latest operation wins). Tables written
    before the segment upgrade carry no dead_below column → hard
    deletes."""
    path = f"{root}/tombstones"
    if not os.path.isdir(path):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    t = spark.read.option("mergeSchema", "true").parquet(path)
    if "dead_below" not in t.columns:
        t = t.withColumn("dead_below", F.lit(_DEAD_EVERYWHERE))
    else:
        t = t.fillna({"dead_below": _DEAD_EVERYWHERE})
    rows = t.groupBy("doc_id").agg(F.max("dead_below").alias("db")).collect()
    rows.sort(key=lambda r: r["doc_id"])
    return (
        np.array([r["doc_id"] for r in rows], dtype=np.int64),
        np.array([r["db"] for r in rows], dtype=np.int64),
    )


def load_tombstone_ids(spark: SparkSession, root: str) -> np.ndarray:
    """Back-compat: just the tombstoned ids (hard and segment alike)."""
    return load_tombstones(spark, root)[0]


def broadcast_tombstones(spark: SparkSession, root: str):
    """Current tombstone set as a ``bm25.broadcast_excl`` Broadcast
    (None when empty) — the exclude_ids shape the distributed query
    paths should be handed for long-lived sessions: the liveDocs
    arrays ship once per executor over the broadcast channel instead
    of inside every pickled task closure."""
    from golr_loader_spark.plans.bm25 import broadcast_excl

    return broadcast_excl(spark, load_tombstones(spark, root))


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
    compacted index is byte-compatible with a fresh build. All
    surviving postings land in segment 0 (the Lucene merge: segment
    tombstones from fast upserts are resolved physically).

    ``tombstone_ids``: plain id array (dead everywhere) or the
    ``(ids, dead_below)`` pair from ``load_tombstones``."""
    from golr_loader_spark.functions.codec import positions_encode
    from golr_loader_spark.plans.bm25 import _live_of, _norm_excl
    from golr_loader_spark.plans.phrase import _decode_positions

    spark = postings.sparkSession
    tomb_b = spark.sparkContext.broadcast(_norm_excl(tombstone_ids))
    has_pos = "poss" in postings.columns
    # output column order = schema order (poss before segment)
    posting_cols = [c for c in _POSTING_COLS if c != "segment"]
    if has_pos:
        posting_cols.append("poss")
    posting_cols.append("segment")

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, fld, bucket = key
        sort_cols = [c for c in ("segment", "block_id") if c in pdf.columns]
        pdf = pdf.sort_values(sort_cols, kind="stable")
        n_per_block = pdf["n"].to_numpy(np.int64)
        firsts = pdf["doc_id_first"].to_numpy(np.int64)
        deltas = varint_decode(b"".join(pdf["doc_ids"])).astype(np.int64)
        g = np.cumsum(deltas)
        starts = np.concatenate([[0], np.cumsum(n_per_block)])[:-1]
        ids = g + np.repeat(firsts - g[starts], n_per_block)
        tfs = varint_decode(b"".join(pdf["tfs"])).astype(np.int64)
        dls = varint_decode(b"".join(pdf["dls"])).astype(np.int64)
        if has_pos:
            # absolute positions survive compaction unchanged; only
            # the per-posting segmentation is re-derived post-mask
            pos_flat = _decode_positions(b"".join(pdf["poss"]), tfs)
        excl = tomb_b.value
        if excl is not None:
            segs = (
                np.repeat(pdf["segment"].to_numpy(np.int64), n_per_block)
                if "segment" in pdf.columns
                else np.zeros(len(ids), dtype=np.int64)
            )
            keep = _live_of(ids, segs, excl)
        else:
            keep = np.ones(len(ids), dtype=bool)
        m = int(keep.sum())
        if m == 0:
            return pd.DataFrame({c: [] for c in posting_cols})
        if has_pos:
            pos_flat = pos_flat[np.repeat(keep, tfs)]
        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        # multi-segment lists (incremental/upsert appends) interleave
        # doc ranges across blocks — re-sort so the compacted list is
        # globally doc_id-ordered (smallest deltas, format contract)
        order = np.argsort(ids, kind="stable")
        pos_kw = {}
        if has_pos:
            # gather each surviving posting's position run in the new
            # doc order, then re-delta-encode (vectorized)
            bounds = (np.cumsum(tfs) - tfs).astype(np.int64)
            cnt_o = tfs[order]
            total = int(cnt_o.sum())
            gidx = np.repeat(bounds[order], cnt_o) + (
                np.arange(total) - np.repeat(np.cumsum(cnt_o) - cnt_o, cnt_o)
            )
            pdat, psiz = positions_encode(pos_flat[gidx], cnt_o)
            pos_kw = {"pos_data": pdat, "pos_sizes": psiz}
        rb = _encode_groups(
            pa.array([term]),
            pa.array([fld]),
            np.array([bucket]),
            np.array([0, m], dtype=np.int64),
            ids[order],
            tfs[order],
            dls[order],
            cfg,
            **pos_kw,
        )
        out = rb.to_pandas()
        out["segment"] = np.int32(0)
        return out

    schema = (
        "term string, field string, bucket int, block_id int, n int, "
        "doc_id_first long, doc_ids binary, tfs binary, dls binary, "
        "max_tf int, min_dl int, tf_sum long"
        + (", poss binary" if has_pos else "")
        + ", segment int"
    )
    return postings.groupBy("term", "field", "bucket").applyInPandas(fn, schema)


def compact_index(
    index: InvertedIndex,
    tombstone_ids,
    n_docs_removed: int | None = None,
) -> InvertedIndex:
    """→ new InvertedIndex without the tombstoned docs.

    ``n_docs_removed`` defaults to the number of HARD-deleted ids
    (dead in every segment) — exact when callers tombstone live
    corpus ids (the delete-API contract, mirroring Solr's
    delete-by-id). Segment tombstones (superseded upsert copies)
    resolve physically but do not change the doc count — the doc's
    newest copy survives."""
    from pyspark import StorageLevel

    from golr_loader_spark.plans.bm25 import _norm_excl

    excl = _norm_excl(tombstone_ids)
    if n_docs_removed is not None:
        removed = int(n_docs_removed)
    else:
        removed = (
            0 if excl is None else int((excl[1] == _DEAD_EVERYWHERE).sum())
        )
    new_postings = compact_postings(index.postings, tombstone_ids, index.cfg).persist(
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
    # fold the existing versions (dead everywhere — they are being
    # replaced) AND any pending segment tombstones from earlier fast
    # upserts into ONE compaction mask; hard deletes stay pending so
    # their stats-staleness contract is unchanged
    t_ids, t_db = load_tombstones(spark, root)
    seg_mask = t_db != _DEAD_EVERYWHERE
    comb_ids = np.concatenate([existing_ids, t_ids[seg_mask]])
    comb_db = np.concatenate(
        [
            np.full(len(existing_ids), _DEAD_EVERYWHERE, dtype=np.int64),
            t_db[seg_mask],
        ]
    )
    base = (
        compact_postings(ix.postings, (comb_ids, comb_db), cfg)
        if len(comb_ids)
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
    doc_tables = _rewrite_doc_tables(
        spark, root, tmp, documents, incoming_ids, cfg
    )
    # surviving tombstones = HARD deletes not re-upserted (segment
    # tombstones were resolved physically in the compaction above).
    # Read BEFORE the swap, rewrite AFTER it: a crash between swap and
    # rewrite leaves re-upserted ids still masked (conservative;
    # retrying the upsert fixes it) — never resurrection against old
    # postings
    live_again = set(incoming_ids)
    remaining = [
        int(i) for i, db in zip(t_ids, t_db)
        if db == _DEAD_EVERYWHERE and int(i) not in live_again
    ]
    _swap_tables(
        root, tmp,
        tuple(["postings", "term_stats", "stats", "docs"] + doc_tables),
    )
    shutil.rmtree(f"{root}/tombstones", ignore_errors=True)
    if remaining:
        delete_docs(spark, root, remaining)
    return {"updated": int(len(existing_ids)), "added": int(n_incoming - len(existing_ids))}



def _doc_table_files(root: str, tbl: str) -> list[str]:
    import glob as _glob

    return sorted(_glob.glob(f"{root}/{tbl}/*.parquet"))


def _facet_field_names(spark: SparkSession, root: str) -> list[str]:
    """The facet fields a root was built with — read as the distinct
    of the (dictionary-encoded) ``facet`` column. A production deploy
    would pin this list in config.json; the column read is metadata-
    cheap either way."""
    import pyarrow.dataset as pads

    ds = pads.dataset(_doc_table_files(root, "facets"), format="parquet")
    col = ds.to_table(columns=["facet"])["facet"]
    return sorted(set(col.to_pylist()))


def _append_doc_tables(
    spark: SparkSession,
    root: str,
    documents: DataFrame,
    cfg: IndexConfig,
    segment: int,
) -> list[str]:
    """Lucene's full update contract for the doc-side tables: stored
    fields and facet rows (docValues) are SEGMENT-scoped — an update
    appends the new doc's rows tagged ``_seg = segment`` and readers
    resolve each doc to its LATEST segment (serve.fetch /
    serve._load_facets), exactly how per-segment stored fields +
    liveDocs behave in Lucene. Base rows written by write_index carry
    no ``_seg`` column and read as segment 0.

    Incoming docs must carry every stored / faceted field — Solr's
    all-fields-stored atomic-update precondition, surfaced as a clear
    error instead of silent nulls."""
    import os as _os

    touched: list[str] = []
    if _os.path.isdir(f"{root}/stored"):
        import pyarrow.parquet as _pq

        names: set[str] = set()
        for f in _doc_table_files(root, "stored"):
            names |= set(_pq.read_schema(f).names)
        cols = sorted(names - {"doc_id", "_seg"})
        missing = [c for c in cols if c not in documents.columns]
        if missing:
            raise ValueError(
                f"upsert into a root with stored fields requires the "
                f"incoming docs to carry them (missing: {missing}) — "
                "the all-fields-stored update precondition"
            )
        (
            documents.select("doc_id", *cols)
            .withColumn("_seg", F.lit(int(segment)))
            .write.mode("append")
            .parquet(f"{root}/stored")
        )
        touched.append("stored")
    if _os.path.isdir(f"{root}/facets"):
        from golr_loader_spark.plans.facets import build_facets

        fnames = _facet_field_names(spark, root)
        missing = [c for c in fnames if c not in documents.columns]
        if missing:
            raise ValueError(
                f"upsert into a root with facets requires the incoming "
                f"docs to carry the facet fields (missing: {missing})"
            )
        (
            build_facets(documents, fnames, cfg)
            .withColumn("_seg", F.lit(int(segment)))
            .write.mode("append")
            .parquet(f"{root}/facets")
        )
        touched.append("facets")
    return touched


def _resolve_doc_table(df: DataFrame, per_doc: bool = True) -> DataFrame:
    """Latest-segment resolution for a doc-side table read with
    mergeSchema: keep each doc's rows from its max ``_seg`` (missing /
    null = 0 — base write_index rows), drop the column. Used by the
    exact upsert and compaction rewrites; the serving readers do the
    same resolution in-memory."""
    from pyspark.sql import Window

    if "_seg" not in df.columns:
        return df
    seg = F.coalesce(F.col("_seg"), F.lit(0))
    w = Window.partitionBy("doc_id")
    return (
        df.withColumn("_s", seg)
        .withColumn("_m", F.max("_s").over(w))
        .filter(F.col("_s") == F.col("_m"))
        .drop("_seg", "_s", "_m")
    )


def _rewrite_doc_tables(
    spark: SparkSession,
    root: str,
    tmp: str,
    documents: DataFrame | None,
    replaced_ids: list[int],
    cfg: IndexConfig,
    drop_ids: list[int] | None = None,
) -> list[str]:
    """Full clean rewrite of stored/facets into ``tmp`` (the exact-
    upsert / compaction path): resolve to latest segments, drop
    ``replaced_ids`` (their fresh rows come from ``documents``) and
    ``drop_ids`` (hard deletes), union the fresh rows, no ``_seg``
    column in the result. Returns the table names written."""
    import os as _os

    written: list[str] = []
    repl = [int(i) for i in replaced_ids]
    dead = [int(i) for i in (drop_ids or [])]
    if _os.path.isdir(f"{root}/stored"):
        cur = _resolve_doc_table(
            spark.read.option("mergeSchema", "true").parquet(f"{root}/stored")
        )
        cols = [c for c in cur.columns if c != "doc_id"]
        keep = cur.filter(~F.col("doc_id").isin(repl + dead))
        if documents is not None:
            missing = [c for c in cols if c not in documents.columns]
            if missing:
                raise ValueError(
                    f"upsert requires incoming stored fields {missing}"
                )
            keep = keep.unionByName(documents.select("doc_id", *cols))
        (
            keep.repartitionByRange(2, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{tmp}/stored")
        )
        written.append("stored")
    if _os.path.isdir(f"{root}/facets"):
        from golr_loader_spark.plans.facets import build_facets

        fnames = _facet_field_names(spark, root)
        cur = _resolve_doc_table(
            spark.read.option("mergeSchema", "true").parquet(f"{root}/facets")
        )
        keep = cur.filter(~F.col("doc_id").isin(repl + dead))
        if documents is not None:
            missing = [c for c in fnames if c not in documents.columns]
            if missing:
                raise ValueError(
                    f"upsert requires incoming facet fields {missing}"
                )
            keep = keep.unionByName(
                build_facets(documents, fnames, cfg).select(*cur.columns)
            )
        (
            keep.repartitionByRange(2, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(f"{tmp}/facets")
        )
        written.append("facets")
    return written


def compact_root(spark: SparkSession, root: str, cfg: IndexConfig | None = None) -> int:
    """Compact a PERSISTED index in place: fold ``{root}/tombstones``
    into the postings (hard deletes removed, superseded upsert copies
    resolved, appended segments merged back to segment 0), rewrite
    postings/term_stats/stats, clear the tombstone table. Returns the
    number of docs removed (hard deletes only — resolving a
    superseded copy does not remove a doc)."""
    import shutil

    from golr_loader_spark.plans.build_index import read_index, write_index

    cfg = cfg or IndexConfig()
    t_ids, t_db = load_tombstones(spark, root)
    if not len(t_ids):
        return 0
    tomb = t_ids[t_db == _DEAD_EVERYWHERE]  # hard deletes: leave the corpus
    ix = read_index(spark, root, cfg)
    new_ix = compact_index(ix, (t_ids, t_db))
    new_ix.postings.count()  # materialize BEFORE overwriting the source
    tmp = f"{root}/.compact_tmp"
    write_index(new_ix, tmp)
    tables = ["postings", "term_stats", "stats"]
    tables += _rewrite_doc_tables(
        spark, root, tmp, None, [], cfg, drop_ids=[int(i) for i in tomb]
    )
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


def upsert_docs_fast(
    spark: SparkSession,
    root: str,
    documents: DataFrame,
    cfg: IndexConfig | None = None,
    term_partitions: int = 2,
) -> dict:
    """Lucene-style add/overwrite: O(batch) work, never O(index).

    Where ``upsert_docs`` (the exact path) rewrites the whole block
    table to keep statistics exact, this path does what Lucene does on
    every update: APPEND the new docs' postings as a fresh segment
    (new parquet files — no existing file is read or rewritten) and
    tombstone the superseded copies with a SEGMENT-scoped liveDocs
    entry (dead_below = the new segment number), so queries mask the
    old copies immediately while the new ones — same doc_id, higher
    segment — stay live.

    What stays exact: result membership and n_docs accounting.
    What goes stale until ``compact_root`` (exactly Lucene's contract
    between update and merge): df still counts superseded copies once
    more than live reality, and avgdl's numerator keeps their dl mass.
    ``compact_root`` merges segments, drops dead copies, recomputes
    stats, and restores bit-exactness with a fresh rebuild.

    At 100 TB this is the difference between an update batch costing
    O(batch) and costing a full-index rewrite; tombstone resolution is
    deferred to scheduled compactions, amortized across many batches.

    Crash contract: postings append before tombstones. A crash in the
    window leaves BOTH copies live (transient double-count of the
    updated docs); retrying the upsert appends again and its
    tombstones kill every copy but the newest — self-healing, never
    data loss. Stats writes are last and swap atomically."""
    import shutil

    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.build_index import build_postings

    cfg = cfg or IndexConfig()
    docs_path = f"{root}/docs"
    if not os.path.isdir(docs_path):
        raise ValueError(
            "upsert requires the {root}/docs manifest — persist with "
            "write_index(..., documents=flattened_docs)"
        )
    meta = spark.read.parquet(docs_path)
    incoming = documents.select("doc_id").distinct()
    marked = incoming.join(
        meta.select("doc_id", F.lit(True).alias("_known")), "doc_id", "left"
    ).collect()
    incoming_ids = [int(r["doc_id"]) for r in marked]
    existing_ids = sorted(int(r["doc_id"]) for r in marked if r["_known"])
    n_added = len(incoming_ids) - len(existing_ids)

    cur = spark.read.option("mergeSchema", "true").parquet(f"{root}/postings")
    if "segment" in cur.columns:
        max_seg = cur.agg(F.max("segment")).collect()[0][0] or 0
    else:
        max_seg = 0
    new_seg = int(max_seg) + 1

    from pyspark import StorageLevel

    fresh = (
        build_postings(tokenize(documents, cfg), cfg)
        .withColumn("segment", F.lit(new_seg))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # per-field dl mass of the fresh segment, for the stats update —
    # reads the persisted fresh blocks, not the corpus again
    fresh_sums = {
        r["field"]: int(r["s"])
        for r in fresh.groupBy("field").agg(F.sum("tf_sum").alias("s")).collect()
    }
    # 1. append the segment (sorted small files: footer stats still
    #    prune term lookups in both read paths)
    (
        fresh.repartitionByRange(max(1, term_partitions), "term")
        .sortWithinPartitions("term", "field", "bucket", "block_id")
        .write.mode("append")
        .option("parquet.block.size", str(4 << 20))
        .parquet(f"{root}/postings")
    )
    # 2. append the segment's term stats (readers SUM df/cf per
    #    (term, field) across segments)
    from golr_loader_spark.plans.build_index import derived_term_stats

    derived_term_stats(fresh).write.mode("append").parquet(f"{root}/term_stats")
    # 2b. stored fields + facet rows ride the SAME segment (Lucene's
    #     update replaces them; readers resolve each doc to its latest
    #     segment). Appended BEFORE tombstones — same crash contract
    #     as the postings: a crash leaves both copies live, a retry
    #     appends again and resolution picks the newest.
    _append_doc_tables(spark, root, documents, cfg, new_seg)
    # 3. tombstone the superseded copies (old segments only) and
    #    withdraw any pending tombstones on re-upserted ids (revive)
    t_ids, t_db = load_tombstones(spark, root)
    live_again = set(incoming_ids)
    keep_rows = [
        (int(i), int(db)) for i, db in zip(t_ids, t_db) if int(i) not in live_again
    ] + [(int(i), new_seg) for i in existing_ids]
    shutil.rmtree(f"{root}/tombstones", ignore_errors=True)
    if keep_rows:
        spark.createDataFrame(
            keep_rows, "doc_id long, dead_below long"
        ).write.mode("append").parquet(f"{root}/tombstones")
    # 4. stats: n_docs exact; avgdl numerator keeps the dead copies'
    #    mass until compaction (documented staleness)
    old_stats = {
        r["field"]: (float(r["avgdl"]), int(r["n_docs"]))
        for r in spark.read.parquet(f"{root}/stats").collect()
    }
    n_old = max((n for _a, n in old_stats.values()), default=0)
    n_new = n_old + n_added
    fields = set(old_stats) | set(fresh_sums)
    stats_rows = []
    for fld in sorted(fields):
        avg_old, _n = old_stats.get(fld, (0.0, n_old))
        total = avg_old * n_old + fresh_sums.get(fld, 0)
        stats_rows.append((fld, total / n_new if n_new else 0.0, n_new))
    tmp = f"{root}/.stats_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.createDataFrame(
        stats_rows, "field string, avgdl double, n_docs long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/stats")
    # 5. docs manifest rewrite (metadata-sized)
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
    _swap_tables(root, tmp, ("stats", "docs"))
    fresh.unpersist()
    return {
        "updated": len(existing_ids),
        "added": n_added,
        "segment": new_seg,
    }


def atomic_update(
    spark: SparkSession,
    root: str,
    ops: dict[int, dict[str, tuple]],
    cfg: IndexConfig | None = None,
    term_partitions: int = 2,
) -> dict:
    """Solr atomic updates: ``{doc_id: {field: (op, value)}}`` with op
    in ``set`` / ``inc`` / ``add`` / ``remove`` (add/remove on
    multi-valued fields). Current values are read back from the
    ``{root}/stored`` table (latest segment — which is why Solr
    requires all fields stored for atomic updates; same precondition
    here, same clear error when violated), the ops applied, and the
    merged docs re-upserted through ``upsert_docs_fast`` — Lucene's
    update = delete + add, O(batch) not O(index).

    Point-update shaped by design (Solr's atomic updates are per-doc
    REST calls): the driver loop is over the update batch, never the
    corpus. Bulk transformations should build a docs DataFrame and
    call ``upsert_docs_fast`` directly."""
    cfg = cfg or IndexConfig()
    if not os.path.isdir(f"{root}/stored"):
        raise ValueError(
            "atomic updates need stored fields — persist with "
            "write_index(..., store_fields=[...all indexed fields...])"
        )
    ids = [int(d) for d in ops]
    cur = _resolve_doc_table(
        spark.read.option("mergeSchema", "true").parquet(f"{root}/stored")
    ).filter(F.col("doc_id").isin(ids))
    rows = {int(r["doc_id"]): r.asDict(recursive=True) for r in cur.collect()}
    missing_docs = sorted(set(ids) - set(rows))
    if missing_docs:
        raise ValueError(
            f"atomic update of unknown doc(s): {missing_docs} — Solr "
            "rejects atomic updates of missing documents"
        )
    schema = cur.schema
    fields = {f.name for f in schema.fields} - {"doc_id"}
    unstored_indexed = sorted(set(cfg.fields) - fields)
    if unstored_indexed:
        raise ValueError(
            f"atomic updates need every INDEXED field stored too "
            f"(missing from stored: {unstored_indexed}) — the re-add "
            "would otherwise drop the doc's indexed content"
        )
    for d, field_ops in ops.items():
        doc = rows[int(d)]
        for field, (op, val) in field_ops.items():
            if field not in fields:
                raise ValueError(
                    f"atomic update of unstored field {field!r} "
                    f"(stored: {sorted(fields)})"
                )
            if op == "set":
                doc[field] = val
            elif op == "inc":
                doc[field] = (doc[field] or 0) + val
            elif op == "add":
                doc[field] = list(doc[field] or []) + [val]
            elif op == "remove":
                doc[field] = [x for x in (doc[field] or []) if x != val]
            else:
                raise ValueError(
                    f"unknown atomic op {op!r} (set/inc/add/remove)"
                )
    updated = spark.createDataFrame(list(rows.values()), schema)
    return upsert_docs_fast(
        spark, root, updated, cfg, term_partitions=term_partitions
    )


def snapshot_index(root: str, dest: str) -> dict:
    """Point-in-time index snapshot — the Solr ReplicationHandler /
    Lucene SnapshotDeletionPolicy analog: replicas and backups copy a
    CONSISTENT commit point, not a directory mid-mutation.

    Parquet index files are immutable once written (mutations either
    append new segment files or atomic-rename whole tables via
    ``_swap_tables``), so a snapshot is a hardlink tree: O(#files)
    metadata operations, zero data copied, and the snapshot keeps
    serving even after the source compacts (the links pin the old
    inodes — exactly Lucene's commit-point pinning). Falls back to a
    real copy across filesystems. The snapshot is itself a complete
    ``LocalSearcher``-able root.

    Returns {"files": n, "bytes": total} for the manifest/log line.
    """
    import shutil as _shutil

    if os.path.exists(dest) and os.listdir(dest):
        raise ValueError(f"snapshot dest {dest!r} exists and is not empty")
    n_files = 0
    n_bytes = 0
    for dirpath, _dirnames, filenames in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        # dot-directories (.upsert_tmp/.compact_tmp/.stats_tmp/.gc)
        # are in-flight _swap_tables staging — not part of any commit
        # point
        if any(part.startswith(".") for part in rel.split(os.sep) if part != "."):
            continue
        out_dir = os.path.join(dest, rel) if rel != "." else dest
        os.makedirs(out_dir, exist_ok=True)
        for fn in filenames:
            src = os.path.join(dirpath, fn)
            dst = os.path.join(out_dir, fn)
            try:
                os.link(src, dst)
            except OSError:  # cross-device: copy
                _shutil.copy2(src, dst)
            n_files += 1
            n_bytes += os.path.getsize(src)
    return {"files": n_files, "bytes": n_bytes}
