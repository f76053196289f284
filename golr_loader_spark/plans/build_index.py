"""Inverted-index construction — the half the reference delegated to
Solr (GolrLoader.java:498-515 batches docs to an external indexer;
here posting lists are built inside the engine).

Physical design (SURVEY.md §4.2):

* **Doc-space range buckets as the salt.** ``bucket =
  shiftright(doc_id, 64 - bucket_bits)`` is a *monotone* function of
  doc_id, so per-``(term, field, bucket)`` posting blocks are globally
  doc_id-ordered across buckets while hot terms (``def``, ``return``)
  fan out over ``2**bucket_bits`` independent reduce tasks instead of
  one giant one. This is the skew treatment the north rule mandates —
  range-salting rather than random-salting, because it buys global
  order for free (no second merge pass).
* **Self-contained postings.** Each posting stores ``(doc_id delta,
  tf, dl)`` varint streams — doc length rides with the posting (the
  Lucene-norms idea, but exact), so BM25 scoring never joins a
  doc-norm table at query time. Storage trades ~1 varint per posting
  for the removal of an N-row join at 10^12-doc scale.
* **Block-max metadata.** Per block: ``max_tf``, ``min_dl`` and
  ``tf_sum``. The query-time bound ``wt·max_tf/(max_tf +
  k1(1−b+b·min_dl/avgdl))`` upper-bounds every posting's contribution
  (the tf-normalization is monotone ↑tf, ↓dl), so block skipping stays
  admissible — and because the bound needs NO corpus statistic at
  encode time, the whole build is ONE linear job: tokenize → one wide
  shuffle → encode. No stats barrier, no tokens materialization.
* **Derived statistics.** ``avgdl`` (Σ tf_sum per field / n_docs) and
  ``term_stats`` (df = Σ n, cf = Σ tf_sum per term) are aggregations
  over the ~1000×-smaller block table, not second passes over tokens.
* Postings are written range-partitioned + sorted by term so parquet
  row-group min/max stats prune query-term lookups at the scan.

All heavy lifting is Catalyst (groupBy partial aggregation, AQE);
Python appears once, in the Arrow-native block encoder (zero-copy
ListArray buffers, loops only over term-groups, never posting rows).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.codec import (
    binary_from_segments as _binary_from_segments,
    varint_encode_with_sizes,
)
from golr_loader_spark.functions.tokenize import tokenize

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("field", pa.string()),
        ("bucket", pa.int32()),
        ("block_id", pa.int32()),
        ("n", pa.int32()),
        ("doc_id_first", pa.int64()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("max_tf", pa.int32()),
        ("min_dl", pa.int32()),
        ("tf_sum", pa.int64()),
    ]
)

# positional variant (IndexConfig.positions): per block one extra
# binary column — the concatenation of each posting's varint-delta
# position list. No extra length metadata is needed: posting i's list
# has exactly tf_i values, so a sequential varint decode of the block
# blob splits at cumsum(tfs). This is the Lucene .prx layout idea
# expressed as one more parquet column.
POSTINGS_SCHEMA_POS = POSTINGS_SCHEMA.append(pa.field("poss", pa.binary()))


def bucket_of(doc_id_col, bucket_bits: int, id_space_bits: int = 64):
    """Monotone doc_id → bucket (arithmetic shift keeps sign order).
    ``id_space_bits``: 64 for hash ids, ceil(log2 N) for dense ids."""
    shift = max(0, id_space_bits - bucket_bits)
    return F.shiftright(doc_id_col, shift).cast("int")


def doc_lengths(tokens: DataFrame) -> DataFrame:
    """(doc_id, field, dl) — tokens per document per field. The
    tokenizer already rides dl on every token row; when present this
    is a cheap first() instead of a sum."""
    if "dl" in tokens.columns:
        return tokens.groupBy("doc_id", "field").agg(F.first("dl").alias("dl"))
    return tokens.groupBy("doc_id", "field").agg(F.sum("tf").alias("dl"))


def corpus_stats(documents: DataFrame, dls: DataFrame) -> DataFrame:
    """One row per field: (field, n_docs, avgdl).

    n_docs is the corpus-global document count (docs lacking a field
    count with dl=0 toward that field's avgdl — the BM25F convention).
    doc_ids are unique by construction (hash or dense assignment;
    check_doc_id_collisions is the separate validation op), so this is
    a plain count — no distinct shuffle.
    """
    n_docs = documents.count()
    return dls.groupBy("field").agg(
        (F.sum("dl") / F.lit(n_docs)).alias("avgdl"),
        F.lit(n_docs).alias("n_docs"),
    )


def term_stats(tokens: DataFrame) -> DataFrame:
    """(term, field, df, cf) — document + collection frequency.
    Plain partial-aggregated groupBy: hot terms are safe because the
    map-side combine reduces each partition to one row per term."""
    return tokens.groupBy("term", "field").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )




def _encode_groups(
    terms: pa.Array,
    fields: pa.Array,
    buckets: np.ndarray,
    offs: np.ndarray,
    flat_ids: np.ndarray,
    flat_tfs: np.ndarray,
    flat_dls: np.ndarray,
    cfg: IndexConfig,
    pos_data: np.ndarray | None = None,
    pos_sizes: np.ndarray | None = None,
) -> pa.RecordBatch:
    """Vectorized core: encode posting groups (given by ``offs``
    boundaries over the flat arrays) into block rows. Every step —
    delta, varint, block segmentation, block-max — is one numpy pass
    over ALL groups; no per-group or per-block Python loop. Needs no
    corpus statistic: block bounds are (max_tf, min_dl), closed into
    the BM25 upper bound at query time once avgdl is known."""
    block = cfg.block_size
    G = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    total = int(offs[-1])

    pos_in_group = np.arange(total) - np.repeat(offs[:-1], lens)

    blocks_per_group = (lens + block - 1) // block
    block_offsets = np.concatenate([[0], np.cumsum(blocks_per_group)])
    starts = np.flatnonzero(pos_in_group % block == 0)
    n_blocks = int(blocks_per_group.sum())
    block_lens = np.diff(np.append(starts, total))
    block_group = np.repeat(np.arange(G), blocks_per_group)
    block_id = np.arange(n_blocks) - block_offsets[block_group]

    # deltas (uint64 wraparound at group/block starts is overwritten
    # with 0, so signed overflow across boundaries is harmless)
    u = flat_ids.astype(np.uint64)
    deltas = np.empty(total, dtype=np.uint64)
    deltas[1:] = u[1:] - u[:-1]
    deltas[starts] = 0

    tfs_i = flat_tfs.astype(np.int64)
    dls_i = flat_dls.astype(np.int64)

    id_bytes, id_nb = varint_encode_with_sizes(deltas)
    tf_bytes, tf_nb = varint_encode_with_sizes(flat_tfs.astype(np.uint64))
    dl_bytes, dl_nb = varint_encode_with_sizes(flat_dls.astype(np.uint64))

    take = pa.array(block_group)
    arrays = [
        terms.take(take),
        fields.take(take),
        pa.array(buckets.astype(np.int32)).take(take),
        pa.array(block_id.astype(np.int32)),
        pa.array(block_lens.astype(np.int32)),
        pa.array(flat_ids[starts]),
        _binary_from_segments(id_bytes, np.add.reduceat(id_nb, starts)),
        _binary_from_segments(tf_bytes, np.add.reduceat(tf_nb, starts)),
        _binary_from_segments(dl_bytes, np.add.reduceat(dl_nb, starts)),
        pa.array(np.maximum.reduceat(tfs_i, starts).astype(np.int32)),
        pa.array(np.minimum.reduceat(dls_i, starts).astype(np.int32)),
        pa.array(np.add.reduceat(tfs_i, starts)),
    ]
    if pos_sizes is not None:
        # per-posting blobs are already contiguous in row order —
        # block blob = slice of the flat stream (zero re-encode)
        arrays.append(
            _binary_from_segments(pos_data, np.add.reduceat(pos_sizes, starts))
        )
        return pa.RecordBatch.from_arrays(arrays, schema=POSTINGS_SCHEMA_POS)
    return pa.RecordBatch.from_arrays(arrays, schema=POSTINGS_SCHEMA)


def _encode_batches(cfg: IndexConfig) -> "callable":
    """Streaming flat-row block encoder for mapInArrow.

    Input batches are FLAT posting rows (term, fcode, doc_id, tf,
    dl), hash-partitioned by (term, fcode, bucket-of(doc_id)) and
    sorted by (term, fcode, doc_id) within the partition — ``fcode``
    is the field's integer position in ``cfg.fields`` and the bucket
    is NOT shipped: it is a monotone function of doc_id, so the
    (term, fcode, doc_id) sort already yields contiguous
    (term, field, bucket) runs, and the encoder re-derives it with
    one vectorized shift (guide §2.3: shuffle keys, not derivable
    metadata — dropping the field string + bucket int cut the wide
    shuffle's row width by ~25%). Group boundaries are detected
    vectorized; the (possibly incomplete) trailing group of each
    batch is carried over and prepended to the next, so NO posting
    list is ever materialized as a single row — the giant-row /
    executor-OOM failure mode of collect_list on a hot term simply
    cannot occur, at any scale."""
    field_names = list(cfg.fields)
    shift = np.int64(max(0, cfg.id_space_bits - cfg.bucket_bits))

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        pend: dict | None = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            terms = rb.column(0)
            fcodes = rb.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            ids = rb.column(2).to_numpy(zero_copy_only=False)
            tfs = rb.column(3).to_numpy(zero_copy_only=False)
            dls = rb.column(4).to_numpy(zero_copy_only=False)
            # bucket re-derived from doc_id: same arithmetic shift as
            # bucket_of (monotone, sign-preserving)
            buckets = np.right_shift(ids.astype(np.int64), shift).astype(
                np.int32
            )
            if rb.num_columns > 5:
                # positional: flat byte stream + per-row sizes straight
                # from the Arrow binary buffers (no per-row objects)
                pcol = rb.column(5)
                pbufs = pcol.buffers()
                poffs = np.frombuffer(pbufs[1], dtype=np.int32)[
                    pcol.offset : pcol.offset + len(pcol) + 1
                ].astype(np.int64)
                pdata = (
                    np.frombuffer(pbufs[2], dtype=np.uint8)
                    if pbufs[2] is not None
                    else np.empty(0, dtype=np.uint8)
                )
                psizes = np.diff(poffs)
            else:
                poffs = pdata = psizes = None

            # group keys without string compares: dictionary-encode
            # terms (codes are appearance-ordered, fine — we only need
            # equal-key runs and input is grouped); fcodes arrive as
            # ints already.
            tcodes = pa.compute.dictionary_encode(terms).indices.to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            bmin = np.int64(buckets.min())
            brange = np.int64(buckets.max()) - bmin + 1
            key = (tcodes * len(field_names) + fcodes) * brange + (
                buckets.astype(np.int64) - bmin
            )

            if pend is not None:
                # pending tail continues iff first key here equals its
                # key fingerprint (same term/field/bucket values)
                cont = (
                    pend["term"] == terms[0].as_py()
                    and pend["fcode"] == int(fcodes[0])
                    and pend["bucket"] == int(buckets[0])
                )
                if cont:
                    ne = key != key[0]
                    head_len = int(np.argmax(ne)) if ne.any() else len(key)
                    pend["ids"] = np.concatenate([pend["ids"], ids[:head_len]])
                    pend["tfs"] = np.concatenate([pend["tfs"], tfs[:head_len]])
                    pend["dls"] = np.concatenate([pend["dls"], dls[:head_len]])
                    if psizes is not None:
                        pend["pdata"] = np.concatenate(
                            [pend["pdata"], pdata[poffs[0] : poffs[head_len]]]
                        )
                        pend["psizes"] = np.concatenate(
                            [pend["psizes"], psizes[:head_len]]
                        )
                        poffs, psizes = poffs[head_len:], psizes[head_len:]
                    terms, fcodes = terms[head_len:], fcodes[head_len:]
                    buckets, ids = buckets[head_len:], ids[head_len:]
                    tfs, dls, key = tfs[head_len:], dls[head_len:], key[head_len:]
                    if len(ids) == 0:
                        continue
                out = _flush_pend(pend, cfg)
                if out is not None:
                    yield out
                pend = None

            # boundaries of sorted keys
            change = np.flatnonzero(np.diff(key) != 0) + 1
            offs = np.concatenate([[0], change, [len(key)]])
            # last group → pend (may continue in the next batch)
            last_lo = int(offs[-2])
            pend = {
                "term": terms[last_lo].as_py(),
                "fcode": int(fcodes[last_lo]),
                "field": field_names[int(fcodes[last_lo])],
                "bucket": int(buckets[last_lo]),
                "ids": ids[last_lo:].copy(),
                "tfs": tfs[last_lo:].copy(),
                "dls": dls[last_lo:].copy(),
            }
            if psizes is not None:
                pend["pdata"] = pdata[poffs[last_lo] : poffs[-1]].copy()
                pend["psizes"] = psizes[last_lo:].copy()
            if len(offs) > 2:
                g_starts = offs[:-2].astype(np.int64)
                yield _encode_groups(
                    terms.take(pa.array(g_starts)),
                    pa.compute.take(
                        pa.array(field_names, type=pa.string()),
                        pa.array(fcodes[g_starts], type=pa.int64()),
                    ),
                    buckets[g_starts],
                    offs[:-1] - 0,
                    ids[:last_lo],
                    tfs[:last_lo],
                    dls[:last_lo],
                    cfg,
                    pos_data=(
                        pdata[poffs[0] : poffs[last_lo]]
                        if psizes is not None
                        else None
                    ),
                    pos_sizes=psizes[:last_lo] if psizes is not None else None,
                )
        if pend is not None:
            out = _flush_pend(pend, cfg)
            if out is not None:
                yield out

    return encode


def _flush_pend(pend: dict, cfg: IndexConfig):
    if len(pend["ids"]) == 0:
        return None
    return _encode_groups(
        pa.array([pend["term"]]),
        pa.array([pend["field"]]),
        np.array([pend["bucket"]]),
        np.array([0, len(pend["ids"])], dtype=np.int64),
        pend["ids"],
        pend["tfs"],
        pend["dls"],
        cfg,
        pos_data=pend.get("pdata"),
        pos_sizes=pend.get("psizes"),
    )


# ---------------------------------------------------------------------------
# Packed build path (guide §2.3/§8: the boundary crossings, not the
# kernels, dominated the build — so cross the boundary with a few
# binary blob rows instead of tens of millions of flat token rows).
#
# The flat pipeline converts every token row JVM→Arrow→Python twice
# (tokenizer out, encoder in) and Tungsten-sorts the flat rows in
# between; stage probes at 240k docs showed those conversions + sort
# at ~13 s of a ~21 s build while the numpy kernels cost <1 s. The
# packed path keeps the SAME shuffle keys and the SAME encoder
# arithmetic but moves token rows as serialized Arrow IPC batches:
#
#   tokenize+pack (mapInArrow over documents)
#     → (pid int, blob binary) rows, one blob per reduce partition
#       per input batch — the tokenizer groups its token rows by the
#       target reduce partition (hash of (term, fcode, bucket), the
#       exact key set of the flat exchange) and serializes each
#       group's columnar slice;
#   Exchange hashpartitioning(pid)
#     → moves ~n_red blob rows per map task instead of millions of
#       flat rows (pid values are chosen via _partition_lut so
#       Spark's own hash routes each logical group to its own reduce
#       partition — no balls-in-bins collision skew, guide §2.5);
#   unpack+sort+encode (mapInArrow)
#     → deserializes the partition's blobs, ONE numpy lexsort on
#       (dictionary code, fcode, doc_id) replaces the Tungsten sort,
#       then streams through the SAME `_encode_batches` kernel —
#       block output is byte-identical to the flat path.
#
# Memory: the unpack stage buffers one reduce partition's token rows
# (columnar, ~tens of MB at bench scale); partition count scales with
# cluster parallelism (waves × defaultParallelism), so per-task
# buffers shrink as the cluster grows — and
# `spark.golr_loader.build.packed=false` restores the flat
# Tungsten-sort plan (which spills) for memory-constrained clusters.
# ---------------------------------------------------------------------------

_PARTITION_LUT_CACHE: dict[int, "np.ndarray"] = {}


def _partition_lut(spark: SparkSession, n: int) -> np.ndarray:
    """lut[t] = an int x with pmod(murmur3_hash(x), n) == t, computed
    BY Spark itself (one tiny driver job, memoized per n) so the pack
    stage never re-implements Spark's hash: emitting pid=lut[t] makes
    the DataFrame `repartition(n, "pid")` place the row in reduce
    partition t exactly."""
    cached = _PARTITION_LUT_CACHE.get(n)
    if cached is not None:
        return cached
    lut = np.full(n, -1, dtype=np.int64)
    lo, found = 0, 0
    while found < n:
        hi = lo + max(64 * n, 4096)
        rows = (
            spark.range(lo, hi)
            .select(
                F.col("id").cast("int").alias("x"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("t"),
            )
            .collect()
        )
        for r in rows:
            t = int(r["t"])
            if lut[t] < 0:
                lut[t] = int(r["x"])
                found += 1
        lo = hi
    _PARTITION_LUT_CACHE[n] = lut
    return lut


_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants) — vectorized
    uint64 mixing for the pack stage's group→partition spread."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return x ^ (x >> np.uint64(31))


def _token_arrow_schema(cfg: IndexConfig) -> pa.schema:
    fields = [
        ("term", pa.string()), ("fcode", pa.int32()), ("doc_id", pa.int64()),
        ("tf", pa.int32()), ("dl", pa.int32()),
    ]
    if cfg.positions:
        fields.append(("positions", pa.binary()))
    return pa.schema(fields)


def _pack_batches(cfg: IndexConfig, n_red: int, lut: np.ndarray) -> "callable":
    """mapInArrow stage: documents → (pid, blob) rows. Tokenizes with
    the SAME `_field_arrays` kernel as `tokenize` (byte-identical
    token rows), assigns each row its reduce partition from the
    (term, fcode, bucket) key, and serializes per-partition columnar
    slices as Arrow IPC record-batch messages."""
    from zlib import crc32

    from golr_loader_spark.functions.codec import (
        binary_from_segments,
        positions_encode,
    )
    from golr_loader_spark.functions.tokenize import _field_arrays

    field_spec = [(f, a) for f, (a, _b) in cfg.fields.items()]
    chain = cfg.chain
    min_len = cfg.min_term_len if chain is None else 1
    positional = cfg.positions
    shift = np.int64(max(0, cfg.id_space_bits - cfg.bucket_bits))
    schema = _token_arrow_schema(cfg)
    out_schema = pa.schema([("pid", pa.int32()), ("blob", pa.binary())])
    lut32 = lut.astype(np.int64)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            doc_ids = rb.column(0).to_numpy(zero_copy_only=False)
            col_parts: list[list] = [[] for _ in schema.names]
            tgt_parts: list[np.ndarray] = []
            for fi, (_fname, analyzer) in enumerate(field_spec):
                texts = rb.column(fi + 1).to_pandas()
                r = _field_arrays(texts, analyzer, positional, chain, min_len)
                if r is None:
                    continue
                pos, codes, vocab = r["pos"], r["codes"], r["vocab"]
                tf, dl_rows, cpos = r["tf"], r["dl"], r["cpos"]
                docs = doc_ids[pos].astype(np.int64)
                bucket = np.right_shift(docs, shift)
                # deterministic per-row reduce target: vocab-level
                # crc32 of the term (vocab is thousands of entries —
                # the per-row cost is one integer gather), mixed with
                # fcode and bucket by splitmix64
                vh = np.fromiter(
                    (crc32(t.encode()) for t in vocab),
                    dtype=np.uint64, count=len(vocab),
                )
                fsalt = np.uint64(
                    ((fi + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
                )
                key = _mix64(
                    vh[codes]
                    ^ fsalt
                    ^ (bucket.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))
                )
                tgt_parts.append((key % np.uint64(n_red)).astype(np.int64))
                col_parts[0].append(
                    pa.compute.take(
                        pa.array(vocab, type=pa.string()), pa.array(codes)
                    )
                )
                col_parts[1].append(pa.array(np.full(len(pos), fi, np.int32)))
                col_parts[2].append(pa.array(docs))
                col_parts[3].append(pa.array(tf.astype(np.int32)))
                col_parts[4].append(pa.array(dl_rows))
                if positional:
                    stream, seg = positions_encode(cpos, tf)
                    col_parts[5].append(binary_from_segments(stream, seg))
            if not tgt_parts:
                continue
            tgt = np.concatenate(tgt_parts)
            # introsort: within-blob row order is irrelevant — the
            # encoder side re-sorts the whole partition by
            # (term, fcode, doc_id) before encoding
            order = np.argsort(tgt)
            take = pa.array(order)
            cols = [
                pa.compute.take(
                    part[0] if len(part) == 1 else pa.concat_arrays(part), take
                )
                for part in col_parts
            ]
            packed = pa.RecordBatch.from_arrays(cols, schema=schema)
            st = tgt[order]
            bounds = np.flatnonzero(st[1:] != st[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(st)]))
            pids = lut32[st[starts]].astype(np.int32)
            blobs = [
                packed.slice(int(s), int(e - s)).serialize().to_pybytes()
                for s, e in zip(starts, ends)
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(pids), pa.array(blobs, type=pa.binary())],
                schema=out_schema,
            )

    return run


def _sort_token_batches(
    parts: list[pa.RecordBatch], schema: pa.Schema
) -> pa.RecordBatch | None:
    """Combine token batches and lexsort on (term dictionary code,
    fcode, doc_id) — appearance-ordered codes give exactly the
    per-(term, fcode) contiguity plus ascending doc_id the encoder
    needs (block content never depends on ORDER of distinct groups
    within a partition)."""
    if not parts:
        return None
    tbl = pa.Table.from_batches(parts).combine_chunks()
    terms = tbl.column(0).chunk(0) if tbl.column(0).num_chunks else None
    if terms is None or len(terms) == 0:
        return None
    tcodes = pa.compute.dictionary_encode(terms).indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    fcodes = tbl.column(1).chunk(0).to_numpy(zero_copy_only=False)
    docs = tbl.column(2).chunk(0).to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, fcodes, tcodes))
    take = pa.array(order)
    return pa.RecordBatch.from_arrays(
        [pa.compute.take(tbl.column(i).chunk(0), take)
         for i in range(tbl.num_columns)],
        schema=schema,
    )


_SPILL_BUCKETS = 16


def _unpack_encode(cfg: IndexConfig, spill_bytes: int = 0) -> "callable":
    """mapInArrow stage: (pid, blob) rows of one reduce partition →
    postings blocks. Deserializes the blobs, sorts with ONE numpy
    lexsort (`_sort_token_batches`), then streams the sorted rows
    through the same `_encode_batches` kernel as the flat path.

    **Bounded memory (external-bucket spill).** When the partition's
    buffered token bytes exceed ``spill_bytes`` (>0), rows are routed
    into ``_SPILL_BUCKETS`` term-hash sub-bucket files on local disk
    (Arrow IPC streams). A term's rows always share a sub-bucket, so
    sub-buckets partition the (term, fcode, bucket) group space —
    and since block content never depends on the order of distinct
    groups within a reduce partition, sorting + encoding the
    sub-buckets ONE AT A TIME yields the byte-identical block table
    with peak memory ~ partition/``_SPILL_BUCKETS`` instead of the
    whole partition (the packed analog of the flat path's Tungsten
    spill; parity gated by tests/test_packed_spill.py)."""
    schema = _token_arrow_schema(cfg)
    encode = _encode_batches(cfg)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import os
        import shutil
        import tempfile
        from zlib import crc32

        parts: list[pa.RecordBatch] = []
        nbytes = 0
        spill_dir: str | None = None
        writers: list = []
        files: list = []

        def _route(b: pa.RecordBatch) -> None:
            # vocab-level term hashing (same pattern as _pack_batches):
            # per-row cost is one integer gather, not a per-row crc32
            d = pa.compute.dictionary_encode(b.column(0))
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = d.dictionary.to_pylist()
            vh = np.fromiter(
                (crc32(t.encode()) % _SPILL_BUCKETS for t in vocab),
                dtype=np.int64, count=len(vocab),
            )
            tgt = vh[codes]
            order = np.argsort(tgt)
            take = pa.array(order)
            srb = pa.RecordBatch.from_arrays(
                [pa.compute.take(b.column(i), take)
                 for i in range(b.num_columns)],
                schema=schema,
            )
            st = tgt[order]
            bounds = np.flatnonzero(st[1:] != st[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(st)]))
            for s, e in zip(starts, ends):
                writers[int(st[s])].write_batch(srb.slice(int(s), int(e - s)))

        try:
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                for blob in rb.column(1):
                    b = pa.ipc.read_record_batch(
                        pa.py_buffer(blob.as_py()), schema
                    )
                    if spill_dir is None:
                        parts.append(b)
                        nbytes += b.nbytes
                        if spill_bytes and nbytes >= spill_bytes:
                            # spill beside Spark's own shuffle files
                            # when local dirs are configured
                            base = (
                                os.environ.get("SPARK_LOCAL_DIRS", "")
                                .split(",")[0]
                                or None
                            )
                            spill_dir = tempfile.mkdtemp(
                                prefix="golr_spill_", dir=base
                            )
                            for i in range(_SPILL_BUCKETS):
                                fh = open(
                                    os.path.join(spill_dir, f"b{i}.arrow"), "wb"
                                )
                                files.append(fh)
                                writers.append(pa.ipc.new_stream(fh, schema))
                            for p in parts:
                                _route(p)
                            parts = []
                    else:
                        _route(b)
            if spill_dir is None:
                srb = _sort_token_batches(parts, schema)
                if srb is not None:
                    yield from encode(iter([srb]))
                return
            for w in writers:
                w.close()
            for fh in files:
                fh.close()

            def _sorted_subbuckets() -> Iterator[pa.RecordBatch]:
                for i in range(_SPILL_BUCKETS):
                    path = os.path.join(spill_dir, f"b{i}.arrow")
                    with pa.ipc.open_stream(path) as rd:
                        sub = list(rd)
                    srb = _sort_token_batches(sub, schema)
                    if srb is not None:
                        # sub-buckets never share a (term, fcode)
                        # group, so the encoder's pending-group
                        # carryover flushes naturally at boundaries
                        yield srb

            yield from encode(_sorted_subbuckets())
        finally:
            if spill_dir is not None:
                shutil.rmtree(spill_dir, ignore_errors=True)

    return run


def build_postings_packed(
    documents: DataFrame,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """documents → postings via the packed boundary (see the section
    comment above). Same reduce-key set, same encoder, byte-identical
    blocks; the exchange moves ~n_red blob rows per map task instead
    of every token row, and the Tungsten sort disappears into one
    numpy lexsort per reduce task."""
    cfg = cfg or IndexConfig()
    spark = documents.sparkSession
    # packed reduce tasks are light (numpy sort, no Tungsten sort
    # memory pressure), so the knee is 2 waves, not the flat path's 4
    # (measured at 240k/local[32]: builds 7.4 s @2 vs 8.2 s @4, and
    # every later query over the persisted block table schedules half
    # the scan tasks). Same scale-adaptive form: waves ×
    # defaultParallelism, floored by spark.sql.shuffle.partitions.
    waves = int(
        spark.conf.get(
            "spark.golr_loader.build.packed_waves",
            spark.conf.get("spark.golr_loader.build.waves", "2"),
        )
    )
    n_red = max(
        spark.sparkContext.defaultParallelism * waves,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    lut = _partition_lut(spark, n_red)
    # external-bucket spill threshold for the unpack stage (MB; 0
    # disables). Default 1024: never trips at bench scale (~25 MB per
    # reduce partition at 240k docs / 64 partitions) but bounds a
    # pathological partition's memory to ~1/16th of its token bytes
    # on memory-constrained deployments without falling all the way
    # back to the flat Tungsten plan.
    spill_mb = float(
        spark.conf.get("spark.golr_loader.build.packed_spill_mb", "1024")
    )
    spill_bytes = int(spill_mb * (1 << 20)) if spill_mb > 0 else 0
    cols = ["doc_id"] + [f for f in cfg.fields]
    packed = documents.select(*cols).mapInArrow(
        _pack_batches(cfg, n_red, lut), "pid int, blob binary"
    )
    spark_schema = (
        "term string, field string, bucket int, block_id int, n int, "
        "doc_id_first long, doc_ids binary, tfs binary, dls binary, "
        "max_tf int, min_dl int, tf_sum long"
    )
    if cfg.positions:
        spark_schema += ", poss binary"
    return (
        packed.repartition(n_red, F.col("pid"))
        .mapInArrow(_unpack_encode(cfg, spill_bytes), spark_schema)
        .withColumn("segment", F.lit(0))
    )


def build_postings(
    tokens: DataFrame,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """tokens(doc_id, field, term, tf, dl) → compressed block-max
    postings.

    Plan: hash-repartition flat token rows on (term, fcode,
    bucket-of(doc_id)) — the bucket is hashed as an inline expression
    and the field travels as an int code, so the exchange rows are
    (term, fcode, doc_id, tf, dl[, positions]) only — then Tungsten-
    sort within partitions on (term, fcode, doc_id) (bucket is
    monotone in doc_id, so this equals the (term, field, bucket,
    doc_id) order the encoder needs), and stream through the
    Arrow-native block encoder, which re-derives buckets with one
    vectorized shift. This is the engine's only wide shuffle, it
    moves flat columnar rows (never materialized lists — a
    collect_list of a hot term would be a single giant JVM row, the
    classic skew OOM), and the bucket key bounds per-group work to
    ≤ n_docs / 2**bucket_bits postings regardless of term hotness.
    The encoder needs no corpus statistic, so the lineage tokenize →
    shuffle → encode is one unbroken job — no stats barrier in the
    middle.

    Shuffle sizing: the exchange uses an EXPLICIT partition count of
    ``spark.golr_loader.build.waves`` (default 4) × the session's
    defaultParallelism, floored by ``spark.sql.shuffle.partitions`` —
    multi-wave, scale-adaptive, never a local constant. With exactly
    one task per core a stage's wall is the max over concurrent
    tasks, so reduce-key imbalance and node slowdowns amplify with
    cluster width; a few waves per core lets fast cores absorb
    stragglers and keeps per-task sorts in executor memory (measured
    at 240k docs / local[32]: 1 wave 32.6s base / 46.0s positional,
    4 waves 21.3 / 24.9).
    """
    cfg = cfg or IndexConfig()

    tk = tokens
    if "dl" not in tk.columns:
        tk = tk.join(doc_lengths(tokens), on=["doc_id", "field"])

    positional = cfg.positions and "positions" in tk.columns
    # Shuffle-row diet (guide §2.3): the exchange carries (term,
    # fcode:int, doc_id, tf, dl[, positions]) — the field STRING is
    # replaced by its integer position in cfg.fields and the bucket
    # is not shipped at all (it is a monotone function of doc_id; the
    # partitioner hashes the inline expression and the encoder
    # re-derives it with one vectorized shift). Because bucket is
    # monotone in doc_id, sorting by (term, fcode, doc_id) yields the
    # exact same contiguous (term, field, bucket, doc_id-ascending)
    # runs the encoder needs.
    field_names = list(cfg.fields)
    if "fcode" in tk.columns:
        # tokenize(field_codes=True) already emitted the int code —
        # no string column ever existed on this path
        fcode = F.col("fcode")
    else:
        fcode = F.lit(None).cast("int")
        for i in range(len(field_names) - 1, -1, -1):
            fcode = F.when(F.col("field") == field_names[i], F.lit(i)).otherwise(
                fcode
            )
    cols = [F.col("term"), fcode.alias("_fc"), F.col("doc_id"),
            F.col("tf"), F.col("dl")]
    if positional:
        cols.append(F.col("positions"))
    spark = tk.sparkSession
    # Multi-wave reduce sizing, scale-adaptive: a few waves per core
    # lets fast cores absorb stragglers (see docstring); derived from
    # the session's parallelism/shuffle config, never a constant.
    # measured at 240k docs / local[32]: 1 wave 32.6s base / 46.0s
    # positional, 2 waves 22.1/32.7, 4 waves 21.3/24.9, 8 waves
    # 20.7/25.4 — 4 is the knee (stragglers absorbed, per-task sorts
    # smaller) and stays sane at cluster scale (reduce partitions =
    # 4× total cores, with shuffle.partitions as the floor)
    waves = int(spark.conf.get("spark.golr_loader.build.waves", "4"))
    n_red = max(
        spark.sparkContext.defaultParallelism * waves,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    bucket_expr = bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
    flat = (
        tk.select(*cols)
        .repartition(n_red, F.col("term"), F.col("_fc"), bucket_expr)
        .sortWithinPartitions("term", "_fc", "doc_id")
    )
    spark_schema = (
        "term string, field string, bucket int, block_id int, n int, "
        "doc_id_first long, doc_ids binary, tfs binary, dls binary, "
        "max_tf int, min_dl int, tf_sum long"
    )
    if positional:
        spark_schema += ", poss binary"
    # segment 0 = the base build. Fast upserts append blocks under
    # higher segment numbers; per-segment liveDocs (bm25._norm_excl)
    # kill only the superseded copies. Compaction folds everything
    # back to segment 0.
    return flat.mapInArrow(_encode_batches(cfg), spark_schema).withColumn(
        "segment", F.lit(0)
    )


@dataclass
class InvertedIndex:
    """Handle over the persisted (or in-memory) index tables.

    Corpus-level stats are collected once and memoized on the handle —
    per-query driver lookups read the cached dicts, not the tables."""

    postings: DataFrame
    term_stats: DataFrame
    stats: DataFrame  # (field, avgdl, n_docs)
    cfg: IndexConfig
    _stats_cache: dict | None = None
    # per-term df memo for _idf_table (the in-memory term-dictionary
    # analog): term → {field: Σdf}; immutable for the handle lifetime
    _df_cache: dict | None = None

    def _stats(self) -> dict:
        if self._stats_cache is None:
            rows = self.stats.collect()
            self._stats_cache = {
                "avgdl": {r["field"]: float(r["avgdl"]) for r in rows},
                "n_docs": max(int(r["n_docs"]) for r in rows) if rows else 0,
            }
        return self._stats_cache

    @property
    def n_docs(self) -> int:
        return self._stats()["n_docs"]

    @property
    def avgdl_by_field(self) -> dict[str, float]:
        return self._stats()["avgdl"]


def derived_stats(postings: DataFrame, n_docs: int) -> DataFrame:
    """(field, avgdl, n_docs) from the block table: Σ tf_sum per field
    is exactly Σ dl over docs (dl ≡ Σ tf by the tokenizer invariant),
    so avgdl needs no pass over raw tokens."""
    return postings.groupBy("field").agg(
        (F.sum("tf_sum") / F.lit(n_docs)).alias("avgdl"),
        F.lit(n_docs).alias("n_docs"),
    )


def derived_term_stats(postings: DataFrame) -> DataFrame:
    """(term, field, df, cf) from the block table: df = Σ n (one
    posting per doc per term), cf = Σ tf_sum."""
    return postings.groupBy("term", "field").agg(
        F.sum("n").alias("df"), F.sum("tf_sum").alias("cf")
    )


def build_index(
    documents: DataFrame, cfg: IndexConfig | None = None, n_docs: int | None = None
) -> InvertedIndex:
    """documents → in-memory InvertedIndex (no persistence).

    ONE pass over the corpus: tokenize → shuffle → encode, with the
    compact block table persisted (postings are ~50× smaller than the
    flat tokens the round-1 design persisted). avgdl and term_stats
    are aggregations over that block table, not extra corpus passes —
    the serial stats barrier between tokenize and encode is gone.

    ``n_docs``: pass the corpus size when the caller already knows it
    (ids unique by construction) — skips the count job, which is pure
    serial driver time in the build's critical path."""
    from pyspark import StorageLevel

    cfg = cfg or IndexConfig()
    spark = documents.sparkSession
    packed = (
        spark.conf.get("spark.golr_loader.build.packed", "true").lower()
        == "true"
    )
    if packed:
        # default: the packed-boundary plan (blob exchange + in-encoder
        # sort — see build_postings_packed); flat Tungsten-sort plan
        # stays available for memory-constrained clusters
        postings = build_postings_packed(documents, cfg)
    else:
        tokens = tokenize(documents, cfg, field_codes=True)
        postings = build_postings(tokens, cfg)
    postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    if n_docs is None:
        n_docs = documents.count()  # ids unique by construction
    return InvertedIndex(
        postings=postings,
        term_stats=derived_term_stats(postings),
        stats=derived_stats(postings, n_docs),
        cfg=cfg,
    )


def _write_config(cfg: IndexConfig, root: str) -> None:
    """Persist the index's OWN IndexConfig at ``{root}/config.json``
    (Solr stores schema.xml inside the core for the same reason):
    serving MUST analyze queries with the exact index-time analyzer
    chain — a stopword/stemmer/synonym mismatch between builder and
    searcher silently changes results. LocalSearcher restores this
    when the caller passes no cfg."""
    import json
    import os

    os.makedirs(root, exist_ok=True)
    with open(f"{root}/config.json", "w") as fh:
        json.dump(cfg.to_dict(), fh, indent=1, sort_keys=True)


def write_index(
    index: InvertedIndex,
    root: str,
    term_partitions: int = 8,
    documents: DataFrame | None = None,
    facets: DataFrame | None = None,
    store_fields: list[str] | None = None,
) -> None:
    """Persist index tables as parquet (Iceberg stand-in — the sandbox
    image lacks the Iceberg runtime jars; the layout below mirrors an
    Iceberg table bucketed by term: range-partition + in-file sort by
    term gives parquet row-group min/max pruning for query-term scans).

    ``documents`` (optional): also persist a ``{root}/docs`` manifest
    (doc_id, content_sha256) — doc-level membership for upsert
    accounting (plans.maintenance.upsert_docs) and the per-row
    sha256 invariant surfaced at the index root.

    The per-table writes target disjoint directories and share no
    lineage barrier, so they run as CONCURRENT jobs from a small
    driver thread pool (guide §2.6): each write's straggler tail is
    back-filled by the next table's tasks instead of idling the
    cluster between sequential jobs."""
    from concurrent.futures import ThreadPoolExecutor

    def _postings() -> None:
        (
            index.postings.repartitionByRange(term_partitions, "term")
            .sortWithinPartitions("term", "field", "bucket", "block_id")
            .write.mode("overwrite")
            # small row groups: with term-sorted files, per-row-group
            # min/max stats then prune single-term lookups to a few
            # groups instead of whole files (both for Catalyst
            # PushedFilters and the pyarrow LocalSearcher path)
            .option("parquet.block.size", str(4 << 20))
            .parquet(f"{root}/postings")
        )

    def _term_stats() -> None:
        (
            index.term_stats.repartitionByRange(max(2, term_partitions // 4), "term")
            .sortWithinPartitions("term", "field")
            .write.mode("overwrite")
            .parquet(f"{root}/term_stats")
        )

    def _stats() -> None:
        index.stats.coalesce(1).write.mode("overwrite").parquet(f"{root}/stats")

    jobs = [_postings, _term_stats, _stats]
    if documents is not None:
        sha = (
            F.col("content_sha256")
            if "content_sha256" in documents.columns
            else F.lit(None).cast("string")
        )

        def _docs() -> None:
            documents.select("doc_id", sha.alias("content_sha256")).write.mode(
                "overwrite"
            ).parquet(f"{root}/docs")

        jobs.append(_docs)
    if facets is not None:
        # (doc_id, bucket, facet, value) from plans.facets.build_facets
        # — doc_id-sorted within files so the serving path can
        # searchsorted-join matched ids without a per-query sort
        def _facets() -> None:
            (
                facets.repartitionByRange(max(2, term_partitions // 2), "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(f"{root}/facets")
            )

        jobs.append(_facets)
    if documents is not None and store_fields:
        # stored fields (Solr stored="true"): doc_id-range-partitioned
        # + in-file doc_id sort, so fetching a hit page is a few
        # row-group-pruned point reads, never a table scan
        def _stored() -> None:
            (
                documents.select("doc_id", *store_fields)
                .repartitionByRange(max(2, term_partitions // 2), "doc_id")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .option("parquet.block.size", str(4 << 20))
                .parquet(f"{root}/stored")
            )

        jobs.append(_stored)
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(j) for j in jobs]
        for f in futs:
            f.result()  # propagate the first failure
    _write_config(index.cfg, root)


def read_index(
    spark: SparkSession, root: str, cfg: IndexConfig | None = None
) -> InvertedIndex:
    # mergeSchema: a root can mix base files and appended upsert
    # segments; files predating the segment column read as null → 0
    postings = spark.read.option("mergeSchema", "true").parquet(f"{root}/postings")
    if "segment" not in postings.columns:
        postings = postings.withColumn("segment", F.lit(0))
    else:
        postings = postings.fillna({"segment": 0})
    return InvertedIndex(
        postings=postings,
        term_stats=spark.read.parquet(f"{root}/term_stats"),
        stats=spark.read.parquet(f"{root}/stats"),
        cfg=cfg or IndexConfig(),
    )
