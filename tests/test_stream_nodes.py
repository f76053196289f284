"""nodes()/gatherNodes graph-traversal streaming expression: hop
semantics, frontier dedup (BFS not paths), level assignment by
nesting depth, branches/leaves scatter, per-node edge metrics,
string node-id casting, and index-less collection export."""

from __future__ import annotations

import pytest

from golr_loader_spark.plans.stream_expr import (
    StreamCollection,
    StreamContext,
    compile_stream,
    parse_expr,
)

# people -> follows edges; person 1 follows 2 and 3; 2 follows 3;
# 3 follows 4; two paths reach 3 (dedup check), 4 is two hops out
PEOPLE = [(1, "ann"), (2, "bob"), (3, "cyd"), (4, "dee")]
FOLLOWS = [(10, 1, 2), (11, 1, 3), (12, 2, 3), (13, 3, 4)]


@pytest.fixture(scope="module")
def ctx(spark):
    people = spark.createDataFrame(PEOPLE, "doc_id long, name string")
    follows = spark.createDataFrame(
        FOLLOWS, "doc_id long, src long, dst long"
    )
    return StreamContext(
        {
            "people": StreamCollection(None, people),
            "follows": StreamCollection(None, follows),
        }
    )


def _rows(df):
    return sorted(
        (r["node"], r["field"], r["level"]) for r in df.collect()
    )


def test_one_hop_leaves(ctx):
    out = compile_stream(
        'nodes(follows,'
        ' search(people, q="*:*", fl="doc_id", sort="doc_id asc", rows=1),'
        ' walk="doc_id->src", gather="dst")',
        ctx,
    )
    assert _rows(out) == [("2", "dst", 1), ("3", "dst", 1)]


def test_two_hop_dedup_and_levels(ctx):
    # frontier {1}: hop1 {2,3}; hop2 from {2,3}: 2->3, 3->4 -> {3,4}
    # (3 gathered once despite two incoming paths)
    out = compile_stream(
        'nodes(follows,'
        ' nodes(follows,'
        '  search(people, q="*:*", fl="doc_id", sort="doc_id asc", rows=1),'
        '  walk="doc_id->src", gather="dst"),'
        ' walk="node->src", gather="dst")',
        ctx,
    )
    assert _rows(out) == [("3", "dst", 2), ("4", "dst", 2)]


def test_scatter_branches_and_leaves(ctx):
    out = compile_stream(
        'nodes(follows,'
        ' search(people, q="*:*", fl="doc_id", sort="doc_id asc", rows=1),'
        ' walk="doc_id->src", gather="dst", scatter="branches,leaves")',
        ctx,
    )
    assert _rows(out) == [
        ("1", "doc_id", 0),
        ("2", "dst", 1),
        ("3", "dst", 1),
    ]


def test_gather_metrics_count_edges(ctx):
    # frontier {1,2}: edges 1->2, 1->3, 2->3 — node 3 gathered via
    # TWO edges, count(*) counts edges per gathered node
    out = compile_stream(
        'gatherNodes(follows,'
        ' search(people, q="*:*", fl="doc_id", sort="doc_id asc", rows=2),'
        ' walk="doc_id->src", gather="dst", count(*))',
        ctx,
    )
    got = {r["node"]: r["count(*)"] for r in out.collect()}
    assert got == {"2": 1, "3": 2}
    levels = {r["level"] for r in out.collect()}
    assert levels == {1}


def test_errors(ctx):
    with pytest.raises(ValueError, match="child stream"):
        compile_stream('nodes(follows, walk="a->b", gather="c")', ctx)
    with pytest.raises(ValueError, match="walk"):
        compile_stream(
            'nodes(follows, search(people, q="*:*", fl="doc_id"),'
            ' gather="dst")',
            ctx,
        )
    with pytest.raises(ValueError, match="scatter"):
        compile_stream(
            'nodes(follows, search(people, q="*:*", fl="doc_id"),'
            ' walk="doc_id->src", gather="dst", scatter="twigs")',
            ctx,
        )
    with pytest.raises(ValueError, match="leaves"):
        compile_stream(
            'nodes(follows, search(people, q="*:*", fl="doc_id"),'
            ' walk="doc_id->src", gather="dst",'
            ' scatter="branches,leaves", count(*))',
            ctx,
        )


def test_indexless_search_guards(ctx):
    with pytest.raises(ValueError, match="no index"):
        compile_stream('search(people, q="ann", fl="doc_id")', ctx)
    with pytest.raises(ValueError, match="fq unsupported"):
        compile_stream(
            'search(people, q="*:*", fq="x", fl="doc_id")', ctx
        )


def test_parse_gather_nodes_alias():
    e = parse_expr(
        'gatherNodes(follows, search(people, q="*:*", fl="doc_id"),'
        ' walk="doc_id->src", gather="dst")'
    )
    assert e.name == "gatherNodes" and e.kwargs["gather"] == "dst"
