"""JSON Facet API (plans/jsonfacet.py): nested facets with per-bucket
aggregations — distributed result vs a brute-force python model built
from the raw document table, and serving + sharded twins pinned to the
distributed result (the sharded merge is exact, incl. unique())."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.corpus import synth_corpus
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.documents import flatten_documents
from golr_loader_spark.plans.facets import build_facets, matching_doc_ids
from golr_loader_spark.plans.jsonfacet import json_facet
from golr_loader_spark.plans.serve import LocalSearcher
from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

N_DOCS = 300
Q = "def return"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig()


@pytest.fixture(scope="module")
def setup(spark, cfg, tmp_path_factory):
    docs = flatten_documents(synth_corpus(spark, N_DOCS, seed=13)).cache()
    ix = build_index(docs, cfg)
    fx = build_facets(docs, ["lang", "repo"], cfg)
    base = tmp_path_factory.mktemp("jfix")
    root = str(base / "flat")
    write_index(
        ix, root, term_partitions=4, documents=docs,
        facets=fx, store_fields=["lang", "repo", "content_len"],
    )
    sh_roots = shard_index(spark, root, str(base / "sh"), 3, cfg=cfg)
    nums = docs.select("doc_id", "content_len")
    # brute model inputs: raw (doc_id, lang, repo, content_len) rows
    raw = {
        r["doc_id"]: (r["lang"], r["repo"], r["content_len"])
        for r in docs.select("doc_id", "lang", "repo", "content_len").collect()
    }
    mids = {
        r["doc_id"] for r in matching_doc_ids(ix, Q, cfg=cfg).collect()
    }
    return ix, fx, nums, raw, mids, root, sh_roots


SPEC = {
    "langs": {
        "type": "terms", "field": "lang", "limit": 4, "mincount": 1,
        "facet": {
            "sum_len": "sum(content_len)",
            "avg_len": "avg(content_len)",
            "min_len": "min(content_len)",
            "max_len": "max(content_len)",
            "p50_len": "percentile(content_len,50)",
            "p90_len": "percentile(content_len, 90)",
            "repos": "unique(repo)",
            "by_repo": {"type": "terms", "field": "repo", "limit": 2},
            "with_scan": {"type": "query", "q": "scan"},
        },
    },
    "scanners": {
        "type": "query", "q": "scan",
        "facet": {
            "avg_len": "avg(content_len)",
            "p50_len": "percentile(content_len,50)",
            "repos": "unique(repo)",
        },
    },
}


def pctl(xs, p):
    """Exact linear-interpolated percentile (quantile_cont)."""
    if not xs:
        return None
    xs = sorted(xs)
    pos = (p / 100.0) * (len(xs) - 1)
    lo = int(pos)
    frac = pos - lo
    v = xs[lo] if frac == 0 else xs[lo] + frac * (xs[lo + 1] - xs[lo])
    return round(float(v), 4)


def brute(raw, mids, ix, cfg, scan_ids):
    langs: dict = {}
    for d in mids:
        lang, repo, ln = raw[d]
        langs.setdefault(lang, []).append((d, repo, ln))
    buckets = []
    for v, rows in langs.items():
        lens = [ln for _d, _r, ln in rows]
        by_repo: dict = {}
        for _d, r, _ln in rows:
            by_repo[r] = by_repo.get(r, 0) + 1
        top_repos = sorted(by_repo.items(), key=lambda x: (-x[1], x[0]))[:2]
        buckets.append({
            "val": v,
            "count": len(rows),
            "sum_len": round(float(sum(lens)), 4),
            "avg_len": round(sum(lens) / len(lens), 4),
            "min_len": min(lens),
            "max_len": max(lens),
            "p50_len": pctl(lens, 50),
            "p90_len": pctl(lens, 90),
            "repos": len(by_repo),
            "by_repo": {
                "buckets": [
                    {"val": r, "count": c} for r, c in top_repos
                ]
            },
            "with_scan": {
                "count": sum(1 for d, _r, _l in rows if d in scan_ids)
            },
        })
    buckets.sort(key=lambda b: (-b["count"], b["val"]))
    both = mids & scan_ids
    lens2 = [raw[d][2] for d in both]
    return {
        "count": len(mids),
        "langs": {"buckets": buckets[:4]},
        "scanners": {
            "count": len(both),
            "avg_len": round(sum(lens2) / len(lens2), 4) if lens2 else None,
            "p50_len": pctl(lens2, 50),
            "repos": len({raw[d][1] for d in both}),
        },
    }


def test_distributed_matches_brute_model(spark, cfg, setup):
    ix, fx, nums, raw, mids, _root, _sh = setup
    scan_ids = {
        r["doc_id"] for r in matching_doc_ids(ix, "scan", cfg=cfg).collect()
    }
    got = json_facet(ix, Q, SPEC, fx, cfg=cfg, numbers=nums)
    assert got == brute(raw, mids, ix, cfg, scan_ids)


def test_serving_parity(spark, cfg, setup):
    ix, fx, nums, _raw, _mids, root, _sh = setup
    want = json_facet(ix, Q, SPEC, fx, cfg=cfg, numbers=nums)
    ls = LocalSearcher(root, cfg)
    assert ls.json_facet(Q, SPEC) == want


def test_sharded_parity(spark, cfg, setup):
    ix, fx, nums, _raw, _mids, _root, sh_roots = setup
    want = json_facet(ix, Q, SPEC, fx, cfg=cfg, numbers=nums)
    ss = ShardedSearcher(sh_roots, cfg)
    assert ss.json_facet(Q, SPEC) == want


def test_fq_and_sort_index(spark, cfg, setup):
    ix, fx, nums, raw, _m, root, _sh = setup
    spec = {"langs": {"type": "terms", "field": "lang", "sort": "index",
                      "limit": 100}}
    got = json_facet(ix, Q, spec, fx, cfg=cfg, fq="scan")
    both = {
        r["doc_id"] for r in matching_doc_ids(ix, Q, cfg=cfg).collect()
    } & {
        r["doc_id"] for r in matching_doc_ids(ix, "scan", cfg=cfg).collect()
    }
    counts: dict = {}
    for d in both:
        counts[raw[d][0]] = counts.get(raw[d][0], 0) + 1
    assert got["count"] == len(both)
    assert got["langs"]["buckets"] == [
        {"val": v, "count": c} for v, c in sorted(counts.items())
    ]
    ls = LocalSearcher(root, cfg)
    assert ls.json_facet(Q, spec, fq="scan") == got


def test_contract_errors(spark, cfg, setup):
    ix, fx, nums, _raw, _m, root, _sh = setup
    deep = {"a": {"type": "terms", "field": "lang", "facet": {
        "b": {"type": "terms", "field": "repo", "facet": {
            "c": {"type": "terms", "field": "lang"}}}}}}
    with pytest.raises(ValueError, match="one level"):
        json_facet(ix, Q, deep, fx, cfg=cfg)
    with pytest.raises(ValueError, match="one level"):
        LocalSearcher(root, cfg).json_facet(Q, deep)
    with pytest.raises(ValueError, match="unsupported aggregation"):
        json_facet(
            ix, Q,
            {"a": {"type": "terms", "field": "lang",
                   "facet": {"p": "stddev(content_len)"}}},
            fx, cfg=cfg,
        )


def test_missing_bucket(spark, cfg, setup):
    """Solr facet.missing: matching docs with NO value for the field —
    exercised against a facet table with deliberately removed rows
    (every doc has a lang, so a fresh facet table missing some docs'
    rows simulates a sparse field). Serve/shard merge sums exactly."""
    from pyspark.sql import functions as F

    ix, fx, _nums, _raw, mids, root, sh_roots = setup
    sparse = fx.filter(~((F.col("facet") == "lang") & (F.col("doc_id") % 5 == 0)))
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 100,
                      "missing": True}}
    got = json_facet(ix, Q, spec, sparse, cfg=cfg)
    want_missing = sum(1 for d in mids if d % 5 == 0)
    assert got["langs"]["missing"] == {"count": want_missing}
    assert sum(b["count"] for b in got["langs"]["buckets"]) == len(mids) - want_missing
    # serving/shard twins (full facet table → missing = 0, still emitted)
    spec2 = {"langs": {"type": "terms", "field": "lang", "limit": 100,
                       "missing": True}}
    want = json_facet(ix, Q, spec2, fx, cfg=cfg)
    assert want["langs"]["missing"] == {"count": 0}
    ls = LocalSearcher(root, cfg)
    ss = ShardedSearcher(sh_roots, cfg)
    assert ls.json_facet(Q, spec2) == want
    assert ss.json_facet(Q, spec2) == want


def test_range_facet_distributed_brute_serving_sharded(spark, cfg, setup):
    """type:"range" (round-5): fixed-width buckets over content_len —
    distributed result vs a brute python model, empty buckets
    included, aggs ride along; serving + sharded twins identical."""
    ix, fx, nums, raw, mids, root, sh_roots = setup
    spec = {"lens": {"type": "range", "field": "content_len",
                     "start": 0, "end": 600, "gap": 100,
                     "facet": {"avg_len": "avg(content_len)"}}}
    got = json_facet(ix, Q, spec, fx, cfg=cfg, numbers=nums)
    per_lo: dict = {}
    for d in mids:
        ln = raw[d][2]
        if 0 <= ln < 600:
            per_lo.setdefault(ln // 100 * 100, []).append(ln)
    want_buckets = []
    for lo in range(0, 600, 100):
        xs = per_lo.get(lo, [])
        want_buckets.append({
            "val": lo, "count": len(xs),
            "avg_len": round(sum(xs) / len(xs), 4) if xs else None,
        })
    assert got["lens"] == {"buckets": want_buckets}
    ls = LocalSearcher(root, cfg)
    ss = ShardedSearcher(sh_roots, cfg)
    assert ls.json_facet(Q, spec) == got
    assert ss.json_facet(Q, spec) == got
    # mincount drops empty buckets
    spec_mc = {"lens": {"type": "range", "field": "content_len",
                        "start": 0, "end": 600, "gap": 100, "mincount": 1}}
    got_mc = json_facet(ix, Q, spec_mc, fx, cfg=cfg, numbers=nums)
    assert all(b["count"] >= 1 for b in got_mc["lens"]["buckets"])
    assert ls.json_facet(Q, spec_mc) == got_mc


def test_numbuckets_and_allbuckets(spark, cfg, setup):
    """numBuckets (bucket count after mincount, before limit) and
    allBuckets (union reading: distinct matching docs with a value) —
    distributed vs brute, serving + sharded parity."""
    ix, fx, nums, raw, mids, root, sh_roots = setup
    spec = {"langs": {"type": "terms", "field": "lang", "limit": 2,
                      "numBuckets": True, "allBuckets": True}}
    got = json_facet(ix, Q, spec, fx, cfg=cfg, numbers=nums)
    n_langs = len({raw[d][0] for d in mids})
    assert got["langs"]["numBuckets"] == n_langs
    assert got["langs"]["allBuckets"] == {"count": len(mids)}
    assert len(got["langs"]["buckets"]) == 2
    ls = LocalSearcher(root, cfg)
    ss = ShardedSearcher(sh_roots, cfg)
    assert ls.json_facet(Q, spec) == got
    assert ss.json_facet(Q, spec) == got


def test_range_contract_errors(spark, cfg, setup):
    ix, fx, nums, _raw, _m, root, _sh = setup
    with pytest.raises(ValueError, match="gap"):
        json_facet(ix, Q, {"r": {"type": "range", "field": "content_len",
                                 "start": 0, "end": 100, "gap": 0}},
                   fx, cfg=cfg, numbers=nums)
    with pytest.raises(ValueError, match="numbers"):
        json_facet(ix, Q, {"r": {"type": "range", "field": "content_len",
                                 "start": 0, "end": 100, "gap": 10}},
                   fx, cfg=cfg)
    with pytest.raises(ValueError, match="sub-facets"):
        json_facet(ix, Q, {"r": {"type": "range", "field": "content_len",
                                 "start": 0, "end": 100, "gap": 10,
                                 "facet": {"x": {"type": "terms",
                                                 "field": "lang"}}}},
                   fx, cfg=cfg, numbers=nums)
