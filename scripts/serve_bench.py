"""Serving-latency bench at an arbitrary corpus size (round-5 judge
item 4: take serving to the 1M-doc corpus).

Builds the bench corpus at N docs (dense ids, same recipe as
bench.py), persists one index, and measures the 20-query p95 for:
  * the unsharded LocalSearcher,
  * ShardedSearcher at 2 and 4 shards, sequential AND process-parallel
    scatter (interleaved reps, min-of-R — the BENCH.md noise
    discipline).

Usage: python scripts/serve_bench.py [n_docs] [cores]
Env: SPARK_GRAFT_SERVE_REPS (default 3); SPARK_GRAFT_SERVE_DIR — a
persistent index root: reused if already built (skips the ~7-minute
1M build when re-measuring on a quiet box). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "def return value", "user data parse", "main util scan",
    "class method object", "file path read", "json codec stream",
    "net sock addr", "test assert equal", "loop index range",
    "hash key store", "tree node walk", "queue push pop",
    "str fmt concat", "sort merge cmp", "alloc free ptr",
    "thread lock sync", "regex match group", "time clock tick",
    "rand seed gen", "log warn err",
]


class _NullCtx:
    def __init__(self, path: str) -> None:
        self._path = path
        os.makedirs(path, exist_ok=True)

    def __enter__(self) -> str:
        return self._path

    def __exit__(self, *exc) -> None:
        pass


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(os.environ.get("SPARK_GRAFT_SERVE_REPS", "3"))

    from golr_loader_spark import IndexConfig, get_spark
    from golr_loader_spark.corpus import synth_corpus
    from golr_loader_spark.plans.build_index import build_index, write_index
    from golr_loader_spark.plans.documents import (
        assign_dense_ids,
        flatten_documents,
    )
    from golr_loader_spark.plans.serve import LocalSearcher, p95_latency_ms
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    spark = get_spark(
        cores=cores, shuffle_partitions=cores * 4,
        app_name="serve-bench", driver_mem="96g",
    )
    out: dict = {"n_docs": n_docs, "cores": cores, "reps": reps}
    cfg = IndexConfig(
        bucket_bits=5, id_space_bits=max(2, (n_docs - 1).bit_length())
    )
    keep_dir = os.environ.get("SPARK_GRAFT_SERVE_DIR")
    ctx = (
        tempfile.TemporaryDirectory()
        if keep_dir is None
        else _NullCtx(keep_dir)
    )
    with ctx as td:
        if not os.path.isdir(f"{td}/stats"):
            t0 = time.perf_counter()
            docs = flatten_documents(
                synth_corpus(spark, n_docs, seed=42, partitions=cores * 4)
            ).persist()
            docs.count()
            ix = build_index(assign_dense_ids(docs), cfg, n_docs=n_docs)
            write_index(ix, td, term_partitions=8)
            out["build_and_persist_s"] = round(time.perf_counter() - t0, 1)
            docs.unpersist()
        ls = LocalSearcher(td, cfg)
        for q in QUERIES:
            ls.search(q, k=10)
        out["serve_p95_ms"] = round(
            min(p95_latency_ms(ls, QUERIES, k=10) for _ in range(reps)), 1
        )
        for n_sh in (2, 4):
            sh_root = f"{td}/sh{n_sh}"
            if os.path.isdir(f"{sh_root}/shard0"):
                roots = [f"{sh_root}/shard{s}" for s in range(n_sh)]
            else:
                roots = shard_index(spark, td, sh_root, n_sh, cfg=cfg)
            ss = ShardedSearcher(roots, cfg)
            ps = ShardedSearcher(roots, cfg, parallel=True)
            for q in QUERIES:
                ss.search(q, k=10)
                ps.search(q, k=10)
            seq, par = [], []
            for _ in range(reps):
                seq.append(p95_latency_ms(ss, QUERIES, k=10))
                par.append(p95_latency_ms(ps, QUERIES, k=10))
            ps.close()
            out[f"serve_p95_ms_{n_sh}shard"] = round(min(seq), 1)
            out[f"serve_p95_ms_{n_sh}shard_par"] = round(min(par), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
