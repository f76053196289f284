"""Multi-select faceting (Solr {!tag}/{!ex}): each facet's counts
computed with that facet's own filters EXCLUDED — the e-commerce
refinement pattern — against a brute-force model, with serve + shard
parity."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import (
    build_facets,
    facet_counts_multiselect,
    matching_doc_ids,
)

ROWS = [
    (0, "data query red small", "red", "s"),
    (1, "data query blue small", "blue", "s"),
    (2, "data query red large", "red", "l"),
    (3, "data query blue large", "blue", "l"),
    (4, "data query green small", "green", "s"),
    (5, "unrelated words", "red", "s"),
]
SCHEMA = "doc_id long, text string, color string, size string"
Q = "data query"
FQS = {"colorfq": "red", "sizefq": "small"}
FIELDS = {"color": ["colorfq"], "size": ["sizefq"]}


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    docs = spark.createDataFrame(ROWS, SCHEMA)
    ix = build_index(docs.select("doc_id", "text"), cfg)
    fx = build_facets(docs, ["color", "size"], cfg)
    root = str(tmp_path_factory.mktemp("msix") / "flat")
    write_index(ix, root, term_partitions=2, facets=fx)
    return ix, fx, cfg, root


def test_matches_brute_model(spark, setup):
    ix, fx, cfg, _root = setup
    got = facet_counts_multiselect(ix, fx, Q, FQS, FIELDS, cfg=cfg)
    # brute: base = docs 0-4; colorfq keeps red (0,2,5∩base),
    # sizefq keeps small (0,1,4,5∩base)
    base = {0, 1, 2, 3, 4}
    red = {0, 2, 5}
    small = {0, 1, 4, 5}
    color_m = base & small          # color facet excludes colorfq
    size_m = base & red             # size facet excludes sizefq
    attrs = {d: (c, s) for d, _t, c, s in ROWS}

    def counts(m, i):
        out: dict = {}
        for d in m:
            out[attrs[d][i]] = out.get(attrs[d][i], 0) + 1
        return sorted(out.items(), key=lambda x: (-x[1], x[0]))

    assert got["color"] == counts(color_m, 0)
    assert got["size"] == counts(size_m, 1)
    # sanity: without exclusion the selected facet collapses
    plain = facet_counts_multiselect(
        ix, fx, Q, FQS, {"color": [], "size": []}, cfg=cfg
    )
    assert [v for v, _n in plain["color"]] == ["red"]


def test_serving_and_sharded_parity(spark, setup):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    ix, fx, cfg, root = setup
    want = facet_counts_multiselect(ix, fx, Q, FQS, FIELDS, cfg=cfg)
    ls = LocalSearcher(root, cfg)
    sh = ShardedSearcher(shard_index(spark, root, root + "/sh", 2, cfg=cfg), cfg)
    assert ls.facet_counts_multiselect(Q, FQS, FIELDS) == want
    assert sh.facet_counts_multiselect(Q, FQS, FIELDS) == want
