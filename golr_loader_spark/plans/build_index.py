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
* **Block-max metadata.** Per block: ``max_tf`` and ``max_w`` — the
  block max of the BM25 tf-normalization ``tf/(tf + k1(1-b+b·dl/avgdl))``
  — enabling admissible block skipping at query time.
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
from golr_loader_spark.functions.codec import varint_encode
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
        ("max_w", pa.float64()),
    ]
)


def bucket_of(doc_id_col, bucket_bits: int):
    """Monotone doc_id → bucket (arithmetic shift keeps sign order)."""
    return F.shiftright(doc_id_col, 64 - bucket_bits).cast("int")


def doc_lengths(tokens: DataFrame) -> DataFrame:
    """(doc_id, field, dl) — tokens per document per field."""
    return tokens.groupBy("doc_id", "field").agg(F.sum("tf").alias("dl"))


def corpus_stats(documents: DataFrame, dls: DataFrame) -> DataFrame:
    """One row per field: (field, n_docs, avgdl).

    n_docs is the corpus-global document count (docs lacking a field
    count with dl=0 toward that field's avgdl — the BM25F convention).
    """
    n_docs = documents.select("doc_id").distinct().count()
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


def _encode_batches(
    cfg: IndexConfig, avgdl_by_field: dict[str, float]
) -> "callable":
    block = cfg.block_size
    k1, b = cfg.k1, cfg.b

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            ids_col = rb.column(rb.schema.get_field_index("ids"))
            tfs_col = rb.column(rb.schema.get_field_index("tfs"))
            dls_col = rb.column(rb.schema.get_field_index("dls"))
            # zero-copy flat buffers + per-group offsets
            flat_ids = ids_col.values.to_numpy(zero_copy_only=False)
            flat_tfs = tfs_col.values.to_numpy(zero_copy_only=False)
            flat_dls = dls_col.values.to_numpy(zero_copy_only=False)
            offs = ids_col.offsets.to_numpy(zero_copy_only=False)
            terms = rb.column(0).to_pylist()
            fields = rb.column(1).to_pylist()
            buckets = rb.column(2).to_numpy(zero_copy_only=False)

            out: dict[str, list] = {k: [] for k in POSTINGS_SCHEMA.names}
            for g in range(len(terms)):
                lo, hi = offs[g], offs[g + 1]
                ids = flat_ids[lo:hi]
                tfs = flat_tfs[lo:hi]
                dls = flat_dls[lo:hi]
                avgdl = avgdl_by_field[fields[g]]
                w = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
                n = hi - lo
                for blk, s in enumerate(range(0, n, block)):
                    e = min(s + block, n)
                    bi, bt, bd = ids[s:e], tfs[s:e], dls[s:e]
                    deltas = np.empty(e - s, dtype=np.uint64)
                    deltas[0] = 0
                    if e - s > 1:
                        deltas[1:] = np.diff(bi).astype(np.uint64)
                    out["term"].append(terms[g])
                    out["field"].append(fields[g])
                    out["bucket"].append(int(buckets[g]))
                    out["block_id"].append(blk)
                    out["n"].append(int(e - s))
                    out["doc_id_first"].append(int(bi[0]))
                    out["doc_ids"].append(varint_encode(deltas))
                    out["tfs"].append(varint_encode(bt.astype(np.uint64)))
                    out["dls"].append(varint_encode(bd.astype(np.uint64)))
                    out["max_tf"].append(int(bt.max()))
                    out["max_w"].append(float(w[s:e].max()))
            if out["term"]:
                yield pa.RecordBatch.from_pydict(out, schema=POSTINGS_SCHEMA)

    return encode


def build_postings(
    tokens: DataFrame,
    stats: DataFrame,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """tokens(doc_id, field, term, tf) → compressed block-max postings.

    Plan: join dl → groupBy (term, field, bucket) with sort_array'd
    aligned arrays → Arrow-native block encode. The groupBy is the
    engine's only wide shuffle; bucketing bounds every group to
    ≤ n_docs / 2**bucket_bits rows regardless of term frequency.
    """
    cfg = cfg or IndexConfig()
    avgdl_by_field = {r["field"]: float(r["avgdl"]) for r in stats.collect()}

    tk = tokens
    if "dl" not in tk.columns:
        tk = tk.join(doc_lengths(tokens), on=["doc_id", "field"])
    if "bucket" not in tk.columns:
        tk = tk.withColumn("bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits))

    grouped = (
        tk
        .groupBy("term", "field", "bucket")
        .agg(
            F.sort_array(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("p")
        )
        .select(
            "term",
            "field",
            "bucket",
            F.col("p.doc_id").alias("ids"),
            F.col("p.tf").alias("tfs"),
            F.col("p.dl").alias("dls"),
        )
    )
    spark_schema = (
        "term string, field string, bucket int, block_id int, n int, "
        "doc_id_first long, doc_ids binary, tfs binary, dls binary, "
        "max_tf int, max_w double"
    )
    return grouped.mapInArrow(_encode_batches(cfg, avgdl_by_field), spark_schema)


@dataclass
class InvertedIndex:
    """Handle over the persisted (or in-memory) index tables."""

    postings: DataFrame
    term_stats: DataFrame
    stats: DataFrame  # (field, avgdl, n_docs)
    cfg: IndexConfig

    @property
    def n_docs(self) -> int:
        return int(self.stats.select(F.max("n_docs")).collect()[0][0])


def build_index(
    documents: DataFrame, cfg: IndexConfig | None = None
) -> InvertedIndex:
    """documents → in-memory InvertedIndex (no persistence)."""
    cfg = cfg or IndexConfig()
    tokens = tokenize(documents, cfg)
    dls = doc_lengths(tokens)
    stats = corpus_stats(documents, dls).cache()
    return InvertedIndex(
        postings=build_postings(tokens, stats, cfg),
        term_stats=term_stats(tokens),
        stats=stats,
        cfg=cfg,
    )


def write_index(index: InvertedIndex, root: str, term_partitions: int = 8) -> None:
    """Persist index tables as parquet (Iceberg stand-in — the sandbox
    image lacks the Iceberg runtime jars; the layout below mirrors an
    Iceberg table bucketed by term: range-partition + in-file sort by
    term gives parquet row-group min/max pruning for query-term scans)."""
    (
        index.postings.repartitionByRange(term_partitions, "term")
        .sortWithinPartitions("term", "field", "bucket", "block_id")
        .write.mode("overwrite")
        .parquet(f"{root}/postings")
    )
    (
        index.term_stats.repartitionByRange(max(2, term_partitions // 4), "term")
        .sortWithinPartitions("term", "field")
        .write.mode("overwrite")
        .parquet(f"{root}/term_stats")
    )
    index.stats.coalesce(1).write.mode("overwrite").parquet(f"{root}/stats")


def read_index(
    spark: SparkSession, root: str, cfg: IndexConfig | None = None
) -> InvertedIndex:
    return InvertedIndex(
        postings=spark.read.parquet(f"{root}/postings"),
        term_stats=spark.read.parquet(f"{root}/term_stats"),
        stats=spark.read.parquet(f"{root}/stats"),
        cfg=cfg or IndexConfig(),
    )
