"""Benchmark harness — prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[k] parallelism (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic corpus size for the index-build
                          throughput arm (default 240000; 60000
                          through round 3)

Two arms:
  1. engine arm — build the full compressed block-max index over a
     deterministic synthetic corpus (docs/sec) and serve a 20-query
     BM25 set over it (p95 ms per query via search_batch);
  2. relational arm — headline operator queries on the driver tables.

Output: {"metric": "headline_suite_wall", "value": <total sec>,
"unit": "sec", "queries": {name: sec, ...}, "sf": <sf>, ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 240k default (was 60k through round 3): the VERDICT-r3 scale-up
    # notch — every engine metric now runs at 4x the corpus every
    # round, so a hidden superlinear term (shuffle spill, driver
    # metadata, block-table growth) shows up in the official record.
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "240000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.corpus import synth_corpus
    from golr_loader_spark.operators.relational import QUERIES
    from golr_loader_spark.plans.bm25 import search_batch
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.documents import assign_dense_ids, flatten_documents
    from golr_loader_spark.session import get_spark

    spark = get_spark(cores=cpus, app_name="bench", shuffle_partitions=cpus)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- relational arm FIRST: interleaved min-of-2 (host CPU steal
    # on this sandbox swings single measurements up to 3x; interleaving
    # keeps a noise burst from biasing one query). Runs before the
    # engine arm so ~35 s of index builds can't degrade the JVM
    # (heap fragmentation / GC pressure) under these measurements —
    # the r2 suite-ordering suspect for the q17 wall regression. ------------
    headline = [
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_region_revenue",
        "q12_sessionize",
        "q17_ngram_jaccard",
        "q24_bm25_topk",
        # round-5 additions: semantic dedup (cluster-blocked pair
        # join) and the corpus bigram-LM scoring pass
        "q41_semdedup",
        "q42_bigram_logprob",
    ]
    for rep in range(2):
        for name in headline:
            fn, _sql = QUERIES[name]
            spark.catalog.clearCache()  # q17 caches reused shingle sets
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            wall = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, wall), wall)

    # ---- engine arm: index-build throughput (best of 2 — host steal
    # on this shared sandbox swings single runs up to 2x). Builds on
    # DENSE doc_ids (the production default): the dense remap is timed
    # as part of the build. -----------------------------------------------
    cfg = IndexConfig(bucket_bits=5, id_space_bits=max(2, (n_docs - 1).bit_length()))
    # 4 waves per core regardless of corpus size (synth_corpus's
    # default is sized for small test corpora — at 240k docs it gives
    # 8 scan partitions, leaving 24 of 32 cores idle through tokenize)
    n_parts = cpus * 4
    docs = flatten_documents(
        synth_corpus(spark, n_docs, seed=42, partitions=n_parts)
    ).persist()
    docs.count()  # materialize corpus outside the timed window
    build_s = None
    ix = None
    for rep in range(2):
        if rep > 0:
            # drop ALL cached plans: Spark's CacheManager would
            # otherwise serve the second build from the first one's
            # cache (plan-identical), making the rep a no-op
            spark.catalog.clearCache()
            docs = flatten_documents(
                synth_corpus(spark, n_docs, seed=42, partitions=n_parts)
            ).persist()
            docs.count()
        t0 = time.perf_counter()
        # one action materializes the ready-to-serve index: the
        # term_stats agg reads through (and caches) the persisted
        # postings; n_docs is passed so no count job runs serially
        ix = build_index(assign_dense_ids(docs), cfg, n_docs=n_docs)
        ix.term_stats = ix.term_stats.persist()
        ix.term_stats.count()
        wall = time.perf_counter() - t0
        build_s = wall if build_s is None else min(build_s, wall)
        n_blocks = ix.postings.count()  # cached by the action above
    timings["index_build"] = round(build_s, 3)
    extras["index_docs_per_sec"] = round(n_docs / build_s, 1)
    extras["index_blocks"] = n_blocks
    extras["bench_docs"] = n_docs
    comp = ix.postings.agg(
        F.sum(F.length("doc_ids")).alias("b"), F.sum("n").alias("p")
    ).collect()[0]
    extras["id_bytes_per_posting"] = round(int(comp["b"]) / int(comp["p"]), 3)

    # ---- engine arm: BM25 batch query p95 -------------------------------
    queries = {
        i: q
        for i, q in enumerate(
            [
                "def return", "import batch", "user_data index", "getUserData",
                "zq0007", "zq0123 scan", "node_ctx merge", "http server",
                "main util scan", "query plan exec", "sort join agg",
                "def import return the", "key_val store", "tmpBuf",
                "parse json codec", "stream shard", "net sock addr",
                "row col key", "hash count total", "zq0042 zq0099",
            ]
        )
    }
    # min-of-2 genuine runs (same noise discipline as the build
    # metric; the first run also amortizes Python-worker startup)
    batch_s = []
    for _ in range(2):
        t0 = time.perf_counter()
        search_batch(ix, queries, k=10, cfg=cfg).count()
        batch_s.append(time.perf_counter() - t0)
    timings["bm25_batch20"] = round(min(batch_s), 3)

    # serving-path p95: persist the index once, then LocalSearcher
    # (pyarrow row-group-pruned reads + the same scoring kernel — no
    # Spark job per query)
    import tempfile

    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher, p95_latency_ms

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        write_index(ix, td, term_partitions=8)
        timings["index_persist"] = round(time.perf_counter() - t0, 3)
        ls = LocalSearcher(td, cfg)
        # full warm pass (mmap pages + arrow pools), then min-of-3 p95:
        # per-rep p95 on this sandbox swings up to 3x with host CPU
        # steal; the min is the honest quiet-machine number (same
        # interleaved-minima discipline as the relational arm)
        for q in queries.values():
            ls.search(q, k=10)
        extras["bm25_serve_p95_ms"] = round(
            min(
                p95_latency_ms(ls, list(queries.values()), k=10)
                for _ in range(3)
            ),
            1,
        )
        # sharded serving (plans.shard): scatter-gather p95 at 2 and
        # 4 shards over the same index — the SolrCloud-shaped path a
        # 100x corpus needs once one mmap view can't hold the postings
        from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

        for n_sh in (2, 4):
            sh_roots = shard_index(
                spark, td, f"{td}/sharded{n_sh}", n_sh, cfg=cfg
            )
            ss = ShardedSearcher(sh_roots, cfg)
            ps = ShardedSearcher(sh_roots, cfg, parallel=True)
            for q in queries.values():
                ss.search(q, k=10)
                ps.search(q, k=10)
            # interleaved A/B reps (noise-storm discipline): sequential
            # scatter vs the process-per-shard transport on identical
            # queries; min of each is the quiet-machine number
            seq_reps, par_reps = [], []
            for _ in range(3):
                seq_reps.append(
                    p95_latency_ms(ss, list(queries.values()), k=10)
                )
                par_reps.append(
                    p95_latency_ms(ps, list(queries.values()), k=10)
                )
            ps.close()
            extras[f"serve_p95_ms_{n_sh}shard"] = round(min(seq_reps), 1)
            extras[f"serve_p95_ms_{n_sh}shard_par"] = round(min(par_reps), 1)

        # vector + hybrid serving (plans.vectors): exact cosine top-k
        # and BM25⊕vector RRF over the sf embeddings table persisted
        # into the same root; min-of-3 p95 like the lexical arm
        from golr_loader_spark.plans.vectors import write_vectors

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        write_vectors(emb, td)
        ls._vectors = None  # (re)load after write
        qvecs = [
            [float(x) for x in r["embedding"]]
            for r in emb.limit(20).collect()
        ]
        ls.vector_topk(qvecs[0], k=10)  # warm: load + normalize matrix

        def _p95(fn):
            import time as _t

            walls = []
            for v in qvecs:
                t = _t.perf_counter()
                fn(v)
                walls.append((_t.perf_counter() - t) * 1000)
            walls.sort()
            return walls[max(0, int(len(walls) * 0.95) - 1)]

        extras["vector_topk_p95_ms"] = round(
            min(_p95(lambda v: ls.vector_topk(v, k=10)) for _ in range(3)), 2
        )
        hq = list(queries.values())[0]
        extras["hybrid_rrf_p95_ms"] = round(
            min(
                _p95(lambda v: ls.hybrid_rrf(hq, v, k_arms=50, top=10))
                for _ in range(3)
            ),
            2,
        )

    # ---- engine arm: positional index + phrase queries ------------------
    # one positional build (IndexConfig(positions=True)) over the SAME
    # corpus: reports the position-list cost (build overhead + bytes/
    # posting) and the wall of a 6-phrase set through the Lucene-style
    # positional matcher
    from golr_loader_spark.plans.phrase import phrase_search_positional

    cfgp = IndexConfig(
        bucket_bits=5,
        id_space_bits=max(2, (n_docs - 1).bit_length()),
        positions=True,
    )
    # min-of-2 like the base build (a single-rep positional build
    # measured 27 s in one epoch vs 12-19 s typical — host-steal
    # bursts need the same rep discipline as every other metric)
    posb_s = None
    ixp = None
    for rep in range(2):
        if rep > 0:
            docs.unpersist()
            spark.catalog.clearCache()
            docs = flatten_documents(
                synth_corpus(spark, n_docs, seed=42, partitions=n_parts)
            ).persist()
            docs.count()
        t0 = time.perf_counter()
        ixp = build_index(assign_dense_ids(docs), cfgp, n_docs=n_docs)
        ixp.term_stats = ixp.term_stats.persist()
        ixp.term_stats.count()
        wall = time.perf_counter() - t0
        posb_s = wall if posb_s is None else min(posb_s, wall)
    timings["index_build_positional"] = round(posb_s, 3)
    compp = ixp.postings.agg(
        F.sum(F.length("poss")).alias("b"), F.sum("n").alias("p")
    ).collect()[0]
    extras["pos_bytes_per_posting"] = round(int(compp["b"]) / int(compp["p"]), 3)
    phrases = [
        "def return", "user data", "parse json codec", "http server",
        "node ctx merge", "query plan exec",
    ]
    # min-of-2 (same noise discipline as every other headline metric;
    # the first rep also absorbs Python-worker startup for this plan
    # shape)
    pos6_s = []
    for _ in range(2):
        t0 = time.perf_counter()
        for ph in phrases:
            phrase_search_positional(ixp, ph, k=10, cfg=cfgp).count()
        pos6_s.append(time.perf_counter() - t0)
    timings["phrase_pos6"] = round(min(pos6_s), 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
