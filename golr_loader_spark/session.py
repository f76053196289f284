"""SparkSession factory tuned for this engine.

Local-mode knobs follow the public Spark tuning guidance: shuffle
partitions ~ cores, AQE on (runtime coalesce + skew-join), Arrow on
for every pandas-UDF boundary, UTC so DuckDB-oracle comparisons are
timezone-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "golr_loader_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    driver_mem: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` → ``local[*]``. ``shuffle_partitions`` defaults to
    the core count — the right size for local mode (the stock 200
    over-parallelizes small inputs and under-parallelizes nothing we
    run here; on a real cluster callers pass an explicit value sized
    to executors × cores).
    """
    n = cores or os.cpu_count() or 8
    master = f"local[{cores}]" if cores else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches: the vectorized tokenizer/encoder kernels
        # amortize per-batch overhead (default 10k rows starves them)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config(
            "spark.driver.memory",
            driver_mem or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
