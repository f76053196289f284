"""Driver contract for the spark-graft builder (PySpark target).

``entry``     — flagship: run the full fulltext engine (flatten →
                tokenize → compressed block-max postings → BM25
                top-k) over the sf0.001 documents table.
``queries``   — one entry per implemented operator from SURVEY.md §2
                and the training-data operator families (dedup,
                similarity, text analysis, closures, windows…).
``oracle_sql``— the DuckDB-runnable ANSI-SQL twin of each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _tune(spark: SparkSession) -> None:
    """Runtime-settable conf for the driver's session: the stock 200
    shuffle partitions over-parallelize these inputs badly, and the
    engine's Arrow kernels want big batches. All three are safe
    runtime confs (no restart needed)."""
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
    except Exception:
        pass  # locked-down session: proceed with its defaults


def _documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table onto the engine's corpus
    schema (repo, path, commit, lang, content) — BASELINE.json
    input_hint shape."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(
            F.col("source"), F.lit("/doc"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.md5(F.col("text")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full engine path
    (code-aware tokenize → bucketed compressed postings → block-max
    BM25 top-20)."""
    from golr_loader_spark.plans.bm25 import search
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.documents import flatten_documents

    _tune(spark)
    corpus = _documents_as_corpus(spark, "/root/testdata/sf0.001")
    ix = build_index(flatten_documents(corpus))
    return search(ix, "data query spark", k=20)


def _engine_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-index WAND path over the documents corpus (rows-only
    driver check — the code-aware analyzer is not SQL-expressible; its
    rank-identity vs the exact scorer is pytest-gated instead)."""
    from golr_loader_spark.plans.bm25 import search
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.documents import flatten_documents

    _tune(spark)
    ix = build_index(flatten_documents(_documents_as_corpus(spark, sf_dir)))
    return search(ix, "data query spark", k=20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from golr_loader_spark.operators.relational import QUERIES

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: fn for name, (fn, _sql) in QUERIES.items()
    }
    out["engine_bm25_wand"] = _engine_bm25_wand
    return out


def oracle_sql() -> dict[str, str]:
    from golr_loader_spark.operators.relational import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
