"""Corpus synthesizer invariants (SURVEY.md §7 stage 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golr_loader_spark.corpus import synth_corpus


def test_corpus_shape_and_determinism(spark):
    df = synth_corpus(spark, 500, seed=42).cache()
    assert df.count() == 500
    assert df.columns == ["repo", "path", "commit", "lang", "content"]

    # content sha256 per-row invariant is stable across two generations
    # (the BASELINE.json content-sha256 equality check at fixture scale)
    h1 = (
        df.agg(F.sum(F.crc32(F.sha2(F.col("content"), 256))).alias("h"))
        .collect()[0]["h"]
    )
    df2 = synth_corpus(spark, 500, seed=42, partitions=7)
    h2 = (
        df2.agg(F.sum(F.crc32(F.sha2(F.col("content"), 256))).alias("h"))
        .collect()[0]["h"]
    )
    assert h1 == h2

    # different seed → different corpus
    h3 = (
        synth_corpus(spark, 500, seed=7)
        .agg(F.sum(F.crc32(F.sha2(F.col("content"), 256))).alias("h"))
        .collect()[0]["h"]
    )
    assert h1 != h3


def test_corpus_plausibility(spark):
    df = synth_corpus(spark, 500, seed=42).cache()
    row = df.agg(
        F.countDistinct("repo").alias("repos"),
        F.countDistinct("lang").alias("langs"),
        F.min(F.length("content")).alias("lmin"),
        F.max(F.length("content")).alias("lmax"),
        F.min(F.length("commit")).alias("cmin"),
        F.max(F.length("commit")).alias("cmax"),
    ).collect()[0]
    assert row["repos"] > 3
    assert row["langs"] == 8
    assert row["lmin"] >= 20 and row["lmax"] <= 6000
    assert row["cmin"] == 40 and row["cmax"] == 40
    # hot term present in most docs (skew fixture for salting)
    hot = df.filter(F.col("content").contains("def")).count()
    assert hot > 350
