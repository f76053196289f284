"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, partition-preserving mapInPandas
operators, Arrow batch shapes) is real and tested; the actual media
decoding is stubbed — the sandbox image has no codec libraries — as a
deterministic fake keyed on the bytes' sha256, clearly marked. On a
real cluster, swap ``_fake_decode`` for PIL/ffmpeg inside the same
operator bodies; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<float>"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame_sha string"


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decode: deterministic pseudo-features from the byte
    content (sha256-seeded). Replace with a real decoder on a cluster
    with codec libs; the operator contract (bytes → float vector) is
    unchanged. Raises like a real decoder on empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload → fixed-dim feature vector, one mapInPandas pass
    (Arrow batches; loop is per media row, unavoidable for opaque
    blobs — exactly what a real decoder does)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats, shas, sizes = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                sizes.append(len(b))
                shas.append(hashlib.sha256(b).hexdigest())
                feats.append(
                    _fake_decode(b, dim).tolist() if b else None
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.array(sizes, dtype=np.int32),
                    "sha256": shas,
                    "feat": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling stub: one output row per sampled timestamp
    (UDTF-shaped explode, like tokenize). Frame content is stubbed as
    a positional sha of the payload; the row shape/partitioning is the
    real contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[(pdf["kind"] == "video") & pdf["duration_ms"].notna()]
            if not len(vids):
                continue
            # row explosion is vectorized (np.repeat / segmented arange);
            # only the stubbed per-frame decode (one sha per frame — the
            # work a real decoder does anyway) stays a flat Python pass
            n = np.maximum(1, vids["duration_ms"].to_numpy(np.int64) // every_ms)
            total = int(n.sum())
            rep = np.repeat(np.arange(len(vids)), n)
            frame_idx = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(n)])[:-1], n
            )
            payloads = [
                bytes(p) if p is not None else b"" for p in vids["payload"]
            ]
            shas = [
                hashlib.sha256(payloads[r] + int(i).to_bytes(4, "big")).hexdigest()[:16]
                for r, i in zip(rep, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].to_numpy()[rep],
                    "frame_idx": frame_idx.astype(np.int32),
                    "ts_ms": (frame_idx * every_ms).astype(np.int32),
                    "frame_sha": shas,
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_images(media: DataFrame, w: int = 64, h: int = 64) -> DataFrame:
    """Image resize stub: passes bytes through a deterministic
    'resize' (sha-tagged), keeping the binary-in/binary-out operator
    shape. NotImplementedError path preserved for non-image kinds."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = pdf[pdf["kind"] == "image"]
            if not len(imgs):
                continue
            payloads = []
            for p in imgs["payload"]:
                b = bytes(p) if p is not None else b""
                # STUB: a real implementation decodes + resamples here
                payloads.append(hashlib.sha256(b + f"{w}x{h}".encode()).digest())
            out = imgs.copy()
            out["payload"] = payloads
            out["width"] = np.int32(w)
            out["height"] = np.int32(h)
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (i % 5 + 1)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                3000 + i * 100 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


__all__ = [
    "MEDIA_SCHEMA",
    "FEATURES_SCHEMA",
    "FRAMES_SCHEMA",
    "extract_features",
    "sample_frames",
    "resize_images",
    "synth_media",
]
