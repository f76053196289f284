"""Solr JoinQParserPlugin ({!join from=F to=T}subquery):
facets.join_query (distributed) vs a brute-force model vs the
serving and sharded twins."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import build_facets, join_query
from golr_loader_spark.plans.serve import LocalSearcher
from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

ROWS = [
    # (doc_id, text, grp, kind)
    (0, "spark scan agg", "g1", "a"),
    (1, "sort table",     "g1", "b"),
    (2, "spark stream",   "g2", "a"),
    (3, "agg value",      "g2", "b"),
    (4, "scan scan scan", "g3", "a"),
    (5, "value merge",    "g3", "b"),
    (6, "spark scan",     "g4", "a"),
    (7, "window",         "g4", "b"),
]


def brute_join(query_terms, mode, from_field, to_field):
    cols = {"grp": 2, "kind": 3}
    match = []
    for r in ROWS:
        toks = set(r[1].split(" "))
        ok = (
            toks >= set(query_terms)
            if mode == "and"
            else bool(toks & set(query_terms))
        )
        if ok:
            match.append(r)
    vals = {r[cols[from_field]] for r in match}
    return sorted(r[0] for r in ROWS if r[cols[to_field]] in vals)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = spark.createDataFrame(
        ROWS, "doc_id long, text string, grp string, kind string"
    )
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, id_space_bits=3, bucket_bits=2
    )
    ix = build_index(d.select("doc_id", "text"), cfg)
    fx = build_facets(d, ["grp", "kind"], cfg)
    root = str(tmp_path_factory.mktemp("join") / "ix")
    write_index(ix, root, documents=d, facets=fx, store_fields=["text"])
    ls = LocalSearcher(root)
    sh_roots = shard_index(spark, root, f"{root}_sh", 2, cfg=cfg)
    ss = ShardedSearcher(sh_roots, cfg)
    return d, cfg, ix, fx, ls, ss


CASES = [
    ("spark", "or", "grp", "grp"),      # g1,g2,g4 → docs 0,1,2,3,6,7
    ("spark scan", "and", "grp", "grp"),
    ("agg value", "and", "grp", "kind"),  # cross-field join
    ("merge", "or", "kind", "grp"),
    ("zzz", "or", "grp", "grp"),          # no match → empty
]


def test_join_matches_brute_force(setup):
    d, cfg, ix, fx, ls, ss = setup
    for q, mode, f, t in CASES:
        got = [
            r["doc_id"]
            for r in join_query(ix, fx, q, f, t, cfg=cfg, mode=mode).collect()
        ]
        assert got == brute_join(q.split(), mode, f, t), (q, mode, f, t)


def test_join_serving_and_sharded_parity(setup):
    d, cfg, ix, fx, ls, ss = setup
    for q, mode, f, t in CASES:
        want = brute_join(q.split(), mode, f, t)
        assert ls.join_query(q, f, t, mode=mode) == want, ("serve", q)
        assert ss.join_query(q, f, t, mode=mode) == want, ("shard", q)


def test_join_with_fq(setup):
    d, cfg, ix, fx, ls, ss = setup
    # match 'spark' but fq restricts to docs containing 'scan':
    # matches {0,6} → grps {g1,g4} → docs {0,1,6,7}
    got = [
        r["doc_id"]
        for r in join_query(ix, fx, "spark", "grp", "grp", cfg=cfg, fq="scan").collect()
    ]
    assert got == [0, 1, 6, 7]
    assert ls.join_query("spark", "grp", "grp", fq="scan") == [0, 1, 6, 7]
    assert ss.join_query("spark", "grp", "grp", fq="scan") == [0, 1, 6, 7]
