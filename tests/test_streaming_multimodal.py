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
    streaming_sessionize,
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
        spark, src, root, cfg, checkpoint_dir=str(tmp_path / "ckpt")
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


def test_streaming_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Stateful sessionization stream (applyInPandasWithState) over the
    events table, dripped in two time-ordered micro-batches, converges
    to exactly the batch q12_sessionize answer — including sessions
    that span the batch boundary (gap state carried in GroupState)."""
    import glob
    import os
    import shutil

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cut = ev.selectExpr("percentile_approx(ts, 0.5) AS m").collect()[0]["m"]

    src = tmp_path / "sess_stream"
    src.mkdir()
    # the file source doesn't recurse into .parquet output dirs — write
    # each half to a scratch dir, then move its single part file in
    for name, pred in [("a", F.col("ts") <= F.lit(cut)), ("b", F.col("ts") > F.lit(cut))]:
        scratch = str(tmp_path / f"scratch_{name}")
        ev.filter(pred).coalesce(1).write.parquet(scratch)
        shutil.move(glob.glob(f"{scratch}/part-*.parquet")[0], str(src / f"{name}.parquet"))
    a, b = str(src / "a.parquet"), str(src / "b.parquet")
    # FileStreamSource orders by mod time: force a < b so each user's
    # events arrive time-ordered across micro-batches
    now = os.path.getmtime(b)
    os.utime(a, (now - 10, now - 10))

    out = streaming_sessionize(spark, str(src), max_files_per_trigger=1)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update-mode memory sink appends every per-trigger update; the
    # final state per user is the row with the largest n_events
    # (monotone within a user)
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            """SELECT user_id, n_sessions, n_events FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM sess_out) WHERE rn = 1"""
        ).collect()
    }
    from golr_loader_spark.operators.relational import q12_sessionize

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q12_sessionize(spark, sf_dir).collect()
    }
    assert got == want


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


def test_incremental_positional_phrase_matches_batch(spark, tmp_path):
    """Positional postings flow through the streaming path: an
    incrementally-built positions=True index answers phrase queries
    (exact and sloppy) identically to the one-shot batch build, and
    every epoch's blocks carry the poss column."""
    from golr_loader_spark.plans.phrase import phrase_search_positional

    cfg = IndexConfig(positions=True)
    corpus = flatten_documents(synth_corpus(spark, 300, seed=42)).cache()
    raw = synth_corpus(spark, 300, seed=42)
    stats = compute_global_stats(corpus, cfg).cache()

    src = str(tmp_path / "arriving_pos")
    raw.filter(F.xxhash64("repo", "path", "commit") % 2 == 0).write.mode(
        "overwrite"
    ).parquet(src)
    raw.filter(F.xxhash64("repo", "path", "commit") % 2 != 0).write.mode(
        "append"
    ).parquet(src)

    root = str(tmp_path / "inc_pos_ix")
    q = incremental_index_stream(
        spark, src, root, cfg, checkpoint_dir=str(tmp_path / "ckpt_pos")
    )
    q.awaitTermination(120)

    ix_inc = merged_incremental_index(spark, root, stats, cfg)
    assert "poss" in ix_inc.postings.columns
    ix_batch = build_index(corpus, cfg)
    for phrase, slop in [("user data", 0), ("def return", 1), ("get user", 0)]:
        a = [
            (r["doc_id"], r["score"])
            for r in phrase_search_positional(
                ix_inc, phrase, k=10, slop=slop, cfg=cfg
            ).collect()
        ]
        b = [
            (r["doc_id"], r["score"])
            for r in phrase_search_positional(
                ix_batch, phrase, k=10, slop=slop, cfg=cfg
            ).collect()
        ]
        assert a == b, (phrase, slop)
