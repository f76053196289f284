"""Stage-delta probe for the index build (guide §1.4): times each
prefix of the build pipeline with the noop sink so the next stage's
cost is the delta. Temp diagnostic — numbers cited in
OPTIMIZATION_r06.md; does not touch bench.py.

Prefixes:
  dense      assign_dense_ids only
  tok        + tokenize (field_codes)
  shuf       + repartition (no sort)
  sort       + sortWithinPartitions
  enc        + mapInArrow encoder (= build_postings)

Usage: python scripts/build_probe.py [-r reps] [--pos] [phase ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "240000"))
    args = sys.argv[1:]
    reps = 2
    if "-r" in args:
        i = args.index("-r")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    positional = "--pos" in args
    if positional:
        args.remove("--pos")
    phases = args or ["dense", "tok", "shuf", "sort", "enc"]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.corpus import synth_corpus
    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.build_index import (
        _encode_batches,
        bucket_of,
        build_postings,
    )
    from golr_loader_spark.plans.documents import assign_dense_ids, flatten_documents
    from golr_loader_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="build_probe", shuffle_partitions=cpus)
    sc = spark.sparkContext
    cfg = IndexConfig(
        bucket_bits=5,
        id_space_bits=max(2, (n_docs - 1).bit_length()),
        positions=positional,
    )
    n_parts = cpus * 4

    def fresh_docs():
        d = flatten_documents(
            synth_corpus(spark, n_docs, seed=42, partitions=n_parts)
        ).persist()
        d.count()
        return d

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def _flat(tk):
        waves = int(spark.conf.get("spark.golr_loader.build.waves", "4"))
        n_red = max(
            sc.defaultParallelism * waves,
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        )
        cols = [F.col("term"), F.col("fcode").alias("_fc"), F.col("doc_id"),
                F.col("tf"), F.col("dl")]
        if positional:
            cols.append(F.col("positions"))
        bexpr = bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
        return tk.select(*cols).repartition(
            n_red, F.col("term"), F.col("_fc"), bexpr
        )

    builders = {
        "dense": lambda d: assign_dense_ids(d),
        "tok": lambda d: tokenize(assign_dense_ids(d), cfg, field_codes=True),
        "shuf": lambda d: _flat(tokenize(assign_dense_ids(d), cfg, field_codes=True)),
        "sort": lambda d: _flat(
            tokenize(assign_dense_ids(d), cfg, field_codes=True)
        ).sortWithinPartitions("term", "_fc", "doc_id"),
        "enc": lambda d: build_postings(
            tokenize(assign_dense_ids(d), cfg, field_codes=True), cfg
        ),
    }

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for _rep in range(reps):
        for ph in phases:
            spark.catalog.clearCache()
            docs = fresh_docs()
            sc.setJobDescription(f"probe:{ph}")
            t0 = time.perf_counter()
            noop(builders[ph](docs))
            wall = round(time.perf_counter() - t0, 3)
            samples.setdefault(ph, []).append(wall)
            timings[ph] = min(timings.get(ph, wall), wall)
            sc.setJobDescription(None)
            docs.unpersist()

    print(json.dumps({"positional": positional, "phases": timings, "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
