"""Stage-level scaling probe: where does the wall go at a given
parallelism level? Times (a) corpus materialization, (b) tokenize
only (no shuffle — tokens.count() pipelines scan→mapInPandas→count),
(c) the full build (adds the one wide shuffle + Arrow encode +
stats agg). Fresh JVM per invocation; prints one JSON line.

Usage: python scripts/scale_probe.py <cores> [n_docs] [gb_per_core]
Extra env knobs for A/B experiments:
  PROBE_ARROW_BATCH   spark.sql.execution.arrow.maxRecordsPerBatch
  PROBE_SHUFFLE_MULT  shuffle_partitions = cores * this (default 1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
    gb = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from golr_loader_spark import IndexConfig, get_spark
    from golr_loader_spark.corpus import synth_corpus
    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.documents import flatten_documents

    mult = int(os.environ.get("PROBE_SHUFFLE_MULT", "1"))
    extra = {
        "spark.driver.extraJavaOptions":
            f"-XX:ParallelGCThreads={cores} -XX:ConcGCThreads={max(1, cores // 4)}"
    }
    if os.environ.get("PROBE_ARROW_BATCH"):
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = os.environ[
            "PROBE_ARROW_BATCH"
        ]
    spark = get_spark(
        cores=cores, shuffle_partitions=cores * mult, app_name="probe",
        driver_mem=f"{cores * gb}g", extra_conf=extra,
    )
    out = {"cores": cores, "n_docs": n_docs, "gb_per_core": gb}

    in_mult = int(os.environ.get("PROBE_INPUT_MULT", "2"))
    t0 = time.perf_counter()
    docs = flatten_documents(
        synth_corpus(spark, n_docs, seed=42, partitions=cores * in_mult)
    ).persist()
    n = docs.count()
    out["corpus_s"] = round(time.perf_counter() - t0, 1)

    # warm-up (codegen + Python worker pools), tiny
    cfg = IndexConfig(bucket_bits=5)
    warm = build_index(
        flatten_documents(synth_corpus(spark, 200, seed=7, partitions=cores)),
        cfg, n_docs=200,
    )
    warm.term_stats.count()
    warm.postings.unpersist()

    t0 = time.perf_counter()
    tokenize(docs, cfg).count()
    out["tokenize_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ix = build_index(docs, cfg, n_docs=n)
    ix.term_stats = ix.term_stats.persist()
    ix.term_stats.count()
    out["build_s"] = round(time.perf_counter() - t0, 1)
    out["shuffle_encode_s"] = round(out["build_s"] - out["tokenize_s"], 1)

    print("PROBE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
