"""Checkpointed, manifest-tracked resumable index build.

The scale-out replacement for the reference's batch-commit protocol:
golr-loader flushed every 10,000 docs to Solr under a global lock
with one manual retry (GolrLoader.java:117,401-404,498-515 and
Pipeline.java:55) — a serialized, non-resumable sink. Here the build
is decomposed into idempotent partition-grain commits recorded in a
lineage manifest table, so a killed build resumes exactly where it
stopped (north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Two checkpointed phases, each a set of independent idempotent splits:

* **Phase A — tokenize** (one pass over the corpus, per doc-split):
  documents filtered by ``pmod(doc_id, n_doc_splits)`` → tokens with
  doc length and bucket attached → parquet under
  ``tokens/split=S/bucket=B``. Lineage: rows in/out, a corpus
  sha256-derived checksum (the per-row content-sha invariant rolled
  up per split), wall ms.
* **Phase B — postings** (per contiguous bucket-group): reads only
  the ``bucket=B`` directories of its group (partition pruning — no
  re-scan of the corpus, no re-tokenize), builds compressed block-max
  postings, writes ``postings/group=G``.

A crash between a split's data write and its manifest append simply
re-runs that split; the data write is a directory overwrite, so the
commit is idempotent (the optimistic-commit analog of an Iceberg
snapshot, which this layout stands in for — the sandbox lacks the
Iceberg jars).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.tokenize import tokenize
from golr_loader_spark.plans.build_index import (
    InvertedIndex,
    bucket_of,
    build_postings,
)

MANIFEST_SCHEMA = (
    "phase string, split_id int, status string, rows_in long, rows_out long, "
    "checksum long, wall_ms long"
)


class StopBuild(Exception):
    """Raised by the failure injector in kill-and-resume tests."""


@dataclass
class BuildProgress:
    completed: set[tuple[str, int]]

    def done(self, phase: str, split: int) -> bool:
        return (phase, split) in self.completed


def _read_manifest(spark: SparkSession, root: str) -> DataFrame | None:
    path = f"{root}/manifest"
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def _progress(spark: SparkSession, root: str) -> BuildProgress:
    m = _read_manifest(spark, root)
    if m is None:
        return BuildProgress(set())
    rows = m.filter(F.col("status") == "done").select("phase", "split_id").collect()
    return BuildProgress({(r["phase"], r["split_id"]) for r in rows})


def _append_manifest(
    spark: SparkSession,
    root: str,
    phase: str,
    split: int,
    rows_in: int,
    rows_out: int,
    checksum: int,
    wall_ms: int,
) -> None:
    spark.createDataFrame(
        [(phase, split, "done", rows_in, rows_out, checksum, wall_ms)],
        MANIFEST_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(f"{root}/manifest")


def _bucket_groups(cfg: IndexConfig, n_groups: int) -> list[list[int]]:
    """Contiguous bucket ranges → groups; each (term, bucket) pair
    lives in exactly one group, so per-group posting builds never
    interleave doc ranges (global doc_id order is preserved)."""
    n_b = cfg.n_buckets
    # signed hash ids span [-n_b/2, n_b/2); dense ids span [0, n_b)
    lo = -(n_b // 2) if cfg.id_space_bits == 64 else 0
    buckets = list(range(lo, lo + n_b))
    n_groups = min(n_groups, n_b)
    out: list[list[int]] = []
    per = n_b / n_groups
    for g in range(n_groups):
        out.append(buckets[int(g * per) : int((g + 1) * per)])
    return out


def build_index_checkpointed(
    documents: DataFrame,
    root: str,
    cfg: IndexConfig | None = None,
    n_doc_splits: int = 4,
    n_bucket_groups: int = 4,
    stop_after_commits: int | None = None,
) -> InvertedIndex:
    """Build (or resume building) a persistent index at ``root``.

    ``stop_after_commits`` kills the build after that many split
    commits (testing hook for kill-and-resume). Re-invoking with the
    same arguments resumes from the manifest and completes.
    """
    cfg = cfg or IndexConfig()
    spark = documents.sparkSession
    prog = _progress(spark, root)
    commits = 0

    def commit_gate() -> None:
        nonlocal commits
        commits += 1
        if stop_after_commits is not None and commits >= stop_after_commits:
            raise StopBuild(f"injected stop after {commits} commits")

    # ---- Phase A: tokenize per doc-split --------------------------------
    for s in range(n_doc_splits):
        if prog.done("tokenize", s):
            continue
        t0 = time.perf_counter()
        sub = documents.filter(F.pmod(F.col("doc_id"), F.lit(n_doc_splits)) == s)
        # lineage checksum: rolls up the per-row content_sha256 invariant
        agg = sub.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.crc32(F.col("content_sha256"))), F.lit(0)).alias("ck"),
        ).collect()[0]
        toks = tokenize(sub, cfg).withColumn(
            "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
        )
        out = f"{root}/tokens/split={s}"
        toks.write.mode("overwrite").partitionBy("bucket").parquet(out)
        n_out = spark.read.parquet(out).count()
        _append_manifest(
            spark, root, "tokenize", s, int(agg["n"]), n_out, int(agg["ck"]),
            int((time.perf_counter() - t0) * 1000),
        )
        commit_gate()

    # ---- Phase B: postings per bucket-group ------------------------------
    groups = _bucket_groups(cfg, n_bucket_groups)
    for g, buckets in enumerate(groups):
        if prog.done("postings", g):
            continue
        t0 = time.perf_counter()
        toks_g = spark.read.option("basePath", f"{root}/tokens").parquet(
            f"{root}/tokens/split=*"
        ).filter(F.col("bucket").isin(buckets))
        postings = build_postings(toks_g.drop("split"), cfg)
        out = f"{root}/postings/group={g}"
        (
            postings.repartitionByRange(4, "term")
            .sortWithinPartitions("term", "field", "bucket", "block_id")
            .write.mode("overwrite")
            # small row groups → term-sorted stats prune point lookups
            .option("parquet.block.size", str(4 << 20))
            .parquet(out)
        )
        # term stats derive from the just-written block table — no
        # second scan of the (much larger) token files
        from golr_loader_spark.plans.build_index import derived_term_stats

        tstats = derived_term_stats(spark.read.parquet(out))
        tstats.write.mode("overwrite").parquet(f"{root}/term_stats_partial/group={g}")
        n_out = spark.read.parquet(out).count()
        _append_manifest(
            spark, root, "postings", g, -1, n_out, 0,
            int((time.perf_counter() - t0) * 1000),
        )
        commit_gate()

    # ---- Corpus stats: derived from the block table (no token scan) ------
    if not prog.done("stats", 0):
        from golr_loader_spark.plans.build_index import derived_stats

        t0 = time.perf_counter()
        n_docs = documents.count()  # ids unique by construction
        post_all = spark.read.option("basePath", f"{root}/postings").parquet(
            f"{root}/postings/group=*"
        )
        stats = derived_stats(post_all.drop("group"), n_docs)
        stats.coalesce(1).write.mode("overwrite").parquet(f"{root}/stats")
        _append_manifest(
            spark, root, "stats", 0, n_docs, stats.count(), 0,
            int((time.perf_counter() - t0) * 1000),
        )
        commit_gate()

    # ---- Finalize: merge per-group term stats ----------------------------
    if not prog.done("finalize", 0):
        from golr_loader_spark.plans.build_index import _write_config

        _write_config(cfg, root)  # serving restores the exact analyzer
        t0 = time.perf_counter()
        partials = spark.read.option(
            "basePath", f"{root}/term_stats_partial"
        ).parquet(f"{root}/term_stats_partial/group=*")
        merged = partials.groupBy("term", "field").agg(
            F.sum("df").alias("df"), F.sum("cf").alias("cf")
        )
        (
            merged.repartitionByRange(2, "term")
            .sortWithinPartitions("term", "field")
            .write.mode("overwrite")
            .parquet(f"{root}/term_stats")
        )
        _append_manifest(
            spark, root, "finalize", 0, -1, merged.count(), 0,
            int((time.perf_counter() - t0) * 1000),
        )
        commit_gate()

    return load_checkpointed_index(spark, root, cfg)


def load_checkpointed_index(
    spark: SparkSession, root: str, cfg: IndexConfig | None = None
) -> InvertedIndex:
    return InvertedIndex(
        postings=spark.read.option("basePath", f"{root}/postings").parquet(
            f"{root}/postings/group=*"
        ).drop("group"),
        term_stats=spark.read.parquet(f"{root}/term_stats"),
        stats=spark.read.parquet(f"{root}/stats"),
        cfg=cfg or IndexConfig(),
    )


def build_metrics(spark: SparkSession, root: str) -> DataFrame:
    """The per-partition lineage/metrics view (north rule)."""
    m = _read_manifest(spark, root)
    if m is None:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return m.orderBy("phase", "split_id")


def verify_lineage(documents: DataFrame, spark: SparkSession, root: str) -> bool:
    """Re-derive the phase-A content checksums from the source and
    compare with the manifest — the per-row sha256 invariant of
    BASELINE.json surfaced as an auditable index property."""
    m = _read_manifest(spark, root)
    if m is None:
        return False
    recorded = {
        r["split_id"]: (r["rows_in"], r["checksum"])
        for r in m.filter(F.col("phase") == "tokenize").collect()
    }
    n_splits = len(recorded)
    actual = (
        documents.withColumn("s", F.pmod(F.col("doc_id"), F.lit(n_splits)))
        .groupBy("s")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.crc32(F.col("content_sha256"))), F.lit(0)).alias("ck"),
        )
        .collect()
    )
    return all(
        recorded.get(int(r["s"])) == (r["n"], int(r["ck"])) for r in actual
    ) and len(actual) == n_splits


__all__ = [
    "StopBuild",
    "build_index_checkpointed",
    "load_checkpointed_index",
    "build_metrics",
    "verify_lineage",
]
