"""Vector serving: persisted embeddings + JVM-free cosine top-k and
hybrid (BM25 + vector) Reciprocal Rank Fusion on the serving path.

Completes the hybrid-retrieval story: q45's distributed kernel
(``similarity.cosine_topk`` + ``similarity.rrf_fuse``) gets a serving
twin a LocalSearcher can answer at query-service latency — exact
brute-force cosine over an in-memory float64 matrix (the baseline ANN
arm; LSH/IVF stay the distributed scale path in
``operators/similarity.py``), fused with the BM25 arm by the same RRF
arithmetic (1/(k+rank), missing arm contributes 0, ties on id).

Float discipline matches the distributed module: cosine is rounded to
6 dp BEFORE ranking with an id tie-break, so sub-1e-6 jitter can never
flip an order; RRF ranks are integers so the fusion is exact.

This module is numpy/pyarrow-only below ``write_vectors`` (the writer
is the only Spark-touching function), mirroring ``plans/serve.py``'s
JVM-free rule for forked shard workers.
"""

from __future__ import annotations

import glob

import numpy as np


def write_vectors(
    embeddings, root: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> int:
    """Persist an embeddings DataFrame under ``{root}/vectors`` for
    serving. Returns the row count."""
    from pyspark.sql import functions as F

    out = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    out.write.mode("overwrite").parquet(f"{root}/vectors")
    return out.count()


class VectorReader:
    """mmap-friendly reader over ``{root}/vectors``: ids (int64) and a
    row-major float64 matrix, normalized once at load so a query is
    one matvec + argpartition."""

    def __init__(self, root: str):
        import pyarrow.parquet as pq

        files = sorted(glob.glob(f"{root}/vectors/*.parquet"))
        if not files:
            raise FileNotFoundError(f"no vectors table under {root}/vectors")
        ids, mats = [], []
        for f in files:
            t = pq.read_table(f, columns=["vec_id", "embedding"])
            ids.append(t.column("vec_id").to_numpy())
            emb = t.column("embedding")
            flat = emb.combine_chunks().flatten().to_numpy()
            n = len(t)
            mats.append(flat.reshape(n, -1) if n else flat.reshape(0, 0))
        self.ids = np.concatenate(ids)
        self.mat = np.ascontiguousarray(np.vstack(mats), dtype=np.float64)
        norms = np.linalg.norm(self.mat, axis=1)
        norms[norms == 0] = 1.0
        self._unit = self.mat / norms[:, None]

    def topk(
        self, qvec, k: int = 10, exclude_id: int | None = None
    ) -> list[tuple[int, int, float]]:
        """Exact cosine top-k → [(vec_id, rank, cos_sim)] with the
        distributed module's ranking discipline: round to 6 dp first,
        then (cos desc, id asc)."""
        q = np.asarray(qvec, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn == 0:
            return []
        sims = np.round(self._unit @ (q / qn), 6)
        ids = self.ids
        if exclude_id is not None:
            mask = ids != exclude_id
            sims, ids = sims[mask], ids[mask]
        n = len(ids)
        kk = min(k, n)
        if kk == 0:
            return []
        # full (−cos, id) lexsort: argpartition can split a rounded
        # tie group at the k boundary, and exactness wins over the
        # O(N log N) of a brute-force baseline
        sel = np.lexsort((ids, -sims))[:kk]
        return [
            (int(ids[i]), r + 1, float(sims[i])) for r, i in enumerate(sel)
        ]


def rrf_fuse_lists(
    arms: list[list[int]], k: int = 60, top: int = 10, round_to: int = 6
) -> list[tuple]:
    """Serving twin of ``similarity.rrf_fuse``: each arm is its ranked
    id list (index+1 = rank); returns [(id, r0.., rrf_score)] — top by
    (unrounded score desc, id asc), score rounded last."""
    ranks: list[dict[int, int]] = [
        {i: r + 1 for r, i in enumerate(arm)} for arm in arms
    ]
    all_ids = set()
    for rk in ranks:
        all_ids.update(rk)
    rows = []
    for i in sorted(all_ids):
        score = sum(1.0 / (k + rk[i]) for rk in ranks if i in rk)
        rows.append((score, i))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return [
        (i, *[rk.get(i) for rk in ranks], round(s, round_to))
        for s, i in rows[:top]
    ]
