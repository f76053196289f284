"""Streaming incremental indexing + multimodal plumbing tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)
from golr_loader_spark.plans.bm25 import search
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.documents import flatten_documents
from golr_loader_spark.streaming.incremental import (
    compute_global_stats,
    incremental_index_stream,
    merged_incremental_index,
    streaming_hourly_events,
)


def test_incremental_index_matches_batch(spark, tmp_path):
    """Docs arriving as a file stream → foreachBatch incremental index
    → same BM25 results as a one-shot batch build."""
    cfg = IndexConfig()
    corpus = flatten_documents(synth_corpus(spark, 300, seed=42)).cache()
    raw = synth_corpus(spark, 300, seed=42)

    # stats from the full corpus (periodic global-stats job)
    stats = compute_global_stats(corpus, cfg).cache()

    # drip the corpus into a directory in two "arrivals"
    src = str(tmp_path / "arriving")
    raw.filter(F.xxhash64("repo", "path", "commit") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(src)
    raw.filter(F.xxhash64("repo", "path", "commit") % 2 != 0).write.mode(
        "append"
    ).parquet(src)

    root = str(tmp_path / "inc_ix")
    q = incremental_index_stream(
        spark, src, root, stats, cfg, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    ix_inc = merged_incremental_index(spark, root, stats, cfg)
    ix_batch = build_index(corpus, cfg)
    for query in ["def return", "zq0007", "user_data"]:
        a = [(r["doc_id"], r["score"]) for r in search(ix_inc, query, k=10, cfg=cfg).collect()]
        b = [(r["doc_id"], r["score"]) for r in search(ix_batch, query, k=10, cfg=cfg).collect()]
        assert a == b, query


def test_streaming_windowed_events(spark, sf_dir, tmp_path):
    import shutil

    ev_dir = tmp_path / "events_stream"
    ev_dir.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", ev_dir / "part-0.parquet")
    out = streaming_hourly_events(spark, str(ev_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hourly_out")
    # watermark append-mode emits all closed windows; compare totals
    # against the batch groupBy on the same file
    batch = (
        spark.read.parquet(str(ev_dir))
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    n_stream = got.agg(F.sum("n")).collect()[0][0] or 0
    n_batch = batch.agg(F.sum("n")).collect()[0][0]
    # append mode holds back windows newer than the watermark; all
    # others must match the batch counts exactly
    joined = got.alias("s").join(batch.alias("b"), ["hour", "event_type"])
    mismatches = joined.filter(F.col("s.n") != F.col("b.n")).count()
    assert mismatches == 0
    assert 0 < n_stream <= n_batch


def test_multimodal_features_and_frames(spark):
    media = synth_media(spark, 30)
    feats = extract_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feat"]) == 8
        assert len(r["sha256"]) == 64
    # deterministic: same payload → same features
    again = {r["media_id"]: r["feat"] for r in extract_features(media, dim=8).collect()}
    assert all(again[r["media_id"]] == r["feat"] for r in feats)

    frames = sample_frames(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in frames}
    assert vids == {r["media_id"] for r in media.filter("kind='video'").collect()}
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == list(range(len(idxs)))

    resized = resize_images(media).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in resized)
    assert len(resized) == media.filter("kind='image'").count()
