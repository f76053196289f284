"""Solr Streaming Expressions → DataFrame compiler.

Parser shape tests plus end-to-end semantics of every supported
source/decorator over a tiny engine-indexed collection, checked
against hand-computed results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.stream_expr import (
    Expr,
    StreamCollection,
    StreamContext,
    compile_stream,
    parse_expr,
)

ROWS = [
    (0, "data spark fast", "en", "web", 10),
    (1, "data slow query", "en", "book", 20),
    (2, "query spark data", "de", "web", 30),
    (3, "other words here", "de", "web", 40),
    (4, "data data query", "fr", "book", 50),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA).cache()
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=0, id_space_bits=3,
    )
    ix = build_index(docs.select("doc_id", "text"), cfg)
    return StreamContext({"docs": StreamCollection(ix, docs, cfg)})


# ------------------------------------------------------------ parser

def test_parse_nested_kwargs_and_metrics():
    e = parse_expr(
        'rollup(search(docs, q="data", fl="doc_id,lang", sort="doc_id asc"),'
        ' over="lang", count(*), sum(n_chars))'
    )
    assert e.name == "rollup" and e.kwargs["over"] == "lang"
    inner = e.args[0]
    assert isinstance(inner, Expr) and inner.name == "search"
    assert inner.args == ["docs"] and inner.kwargs["q"] == "data"
    names = [a.name for a in e.args[1:]]
    assert names == ["count", "sum"]
    assert e.args[2].args == ["n_chars"]


def test_parse_quoted_escapes_and_errors():
    e = parse_expr('search(docs, q="a \\"b\\" c")')
    assert e.kwargs["q"] == 'a "b" c'
    with pytest.raises(ValueError):
        parse_expr("search(docs")
    with pytest.raises(ValueError):
        parse_expr('search(docs) trailing')
    with pytest.raises(ValueError):
        parse_expr("noparens")


# --------------------------------------------------------- semantics

def rows(df):
    return [tuple(r) for r in df.collect()]


def test_search_export_semantics(ctx):
    got = rows(compile_stream(
        'search(docs, q="data", fl="doc_id,lang", sort="doc_id desc")', ctx
    ))
    assert got == [(4, "fr"), (2, "de"), (1, "en"), (0, "en")]


def test_search_star_fq_rows(ctx):
    got = rows(compile_stream(
        'search(docs, q="*:*", fq="spark", fl="doc_id", sort="doc_id asc", rows=1)',
        ctx,
    ))
    assert got == [(0,)]


def test_rollup_and_having(ctx):
    got = rows(compile_stream(
        'having(rollup(search(docs, q="data", fl="doc_id,lang,n_chars"),'
        ' over="lang", count(*), sum(n_chars)), gteq(sum(n_chars), 30))',
        ctx,
    ))
    # data matches docs 0,1,2,4: en sum=30 n=2, de sum=30, fr sum=50
    assert sorted(got) == [("de", 1, 30.0), ("en", 2, 30.0), ("fr", 1, 50.0)]


def test_stats_source(ctx):
    got = rows(compile_stream(
        'stats(docs, q="data", count(*), min(n_chars), max(n_chars), avg(n_chars))',
        ctx,
    ))
    assert got == [(4, 10, 50, 27.5)]


def test_facet_source_sorted_limited(ctx):
    got = rows(compile_stream(
        'facet(docs, q="*:*", buckets="source", bucketSorts="count(*) desc",'
        ' bucketSizeLimit=1, count(*))',
        ctx,
    ))
    assert got == [("web", 3)]


def test_select_rename_unique_top(ctx):
    got = rows(compile_stream(
        'top(unique(select(search(docs, q="data", fl="doc_id,lang"),'
        ' "doc_id as id", "lang"), over="lang", sort="id asc"),'
        ' n=2, sort="id asc")',
        ctx,
    ))
    # unique keeps first id per lang: en→0, de→2, fr→4; top 2 by id
    assert got == [(0, "en"), (2, "de")]


def test_inner_join_drops_dup_key(ctx):
    df = compile_stream(
        'innerJoin(search(docs, q="data", fl="doc_id,lang"),'
        ' search(docs, q="spark", fl="doc_id,source"), on="doc_id")',
        ctx,
    )
    assert df.columns == ["doc_id", "lang", "source"]
    assert sorted(rows(df)) == [(0, "en", "web"), (2, "de", "web")]


def test_left_outer_and_hash_join_agree(ctx):
    left = 'search(docs, q="data", fl="doc_id,lang")'
    right = 'search(docs, q="spark", fl="doc_id,source")'
    outer = rows(compile_stream(
        f'sort(leftOuterJoin({left}, {right}, on="doc_id"), by="doc_id asc")', ctx
    ))
    assert outer == [
        (0, "en", "web"), (1, "en", None), (2, "de", "web"), (4, "fr", None),
    ]
    hashed = rows(compile_stream(
        f'sort(hashJoin({left}, hashed={right}, on="doc_id"), by="doc_id asc")',
        ctx,
    ))
    assert hashed == [(0, "en", "web"), (2, "de", "web")]


def test_merge_intersect_complement(ctx):
    a = 'search(docs, q="spark", fl="doc_id")'
    b = 'search(docs, q="query", fl="doc_id")'
    assert rows(compile_stream(f'merge({a}, {b}, on="doc_id asc")', ctx)) == [
        (0,), (1,), (2,), (2,), (4,),
    ]
    assert sorted(rows(compile_stream(f'intersect({a}, {b}, on="doc_id")', ctx))) == [
        (2,)
    ]
    assert sorted(rows(compile_stream(f'complement({a}, {b}, on="doc_id")', ctx))) == [
        (0,)
    ]


def test_fetch_enriches(ctx):
    got = rows(compile_stream(
        'sort(fetch(docs, search(docs, q="spark", fl="doc_id"),'
        ' fl="lang,n_chars", on="doc_id=doc_id"), by="doc_id asc")',
        ctx,
    ))
    assert got == [(0, "en", 10), (2, "de", 30)]


def test_boolean_evaluators(ctx):
    base = 'search(docs, q="*:*", fl="doc_id,lang,n_chars")'
    got = rows(compile_stream(
        f'sort(having({base}, and(gt(n_chars, 10), not(eq(lang, "de")))),'
        ' by="doc_id asc")',
        ctx,
    ))
    assert [r[0] for r in got] == [1, 4]
    got2 = rows(compile_stream(
        f'having({base}, or(eq(doc_id, 0), eq(doc_id, 3)))', ctx
    ))
    assert sorted(r[0] for r in got2) == [0, 3]


def test_unknown_operator_and_collection(ctx):
    with pytest.raises(ValueError):
        compile_stream('bogus(search(docs, q="x"))', ctx)
    with pytest.raises(ValueError):
        compile_stream('search(nope, q="x")', ctx)


# -------------------------------------------------- timeseries source

@pytest.fixture(scope="module")
def tsctx(spark):
    # days 1,1,2,4 of Jan 2024 → bucket 3 (Jan 3) is empty
    rows_ = [
        (0, "2024-01-01 06:00:00", 10.0),
        (1, "2024-01-01 18:30:00", 20.0),
        (2, "2024-01-02 00:00:00", 5.0),
        (3, "2024-01-04 23:59:59", 7.5),
        (4, "2024-01-05 00:00:00", 99.0),  # == end, excluded
        (5, "2023-12-31 23:59:59", 99.0),  # < start, excluded
    ]
    ev = spark.createDataFrame(rows_, "doc_id long, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    return StreamContext({"events": StreamCollection(None, ev)})


def test_timeseries_day_buckets(tsctx):
    got = rows(compile_stream(
        'timeseries(events, q="*:*", field="ts",'
        ' start="2024-01-01T00:00:00Z", end="2024-01-05T00:00:00Z",'
        ' gap="+1DAY", count(*), sum(value))',
        tsctx,
    ))
    # EVERY bucket in [start,end) in range order; empty day-3 count 0
    assert [r[0] for r in got] == [
        "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z",
        "2024-01-03T00:00:00Z", "2024-01-04T00:00:00Z",
    ]
    assert [r[1] for r in got] == [2, 1, 0, 1]
    assert got[0][2] == 30.0 and got[2][2] is None and got[3][2] == 7.5


def test_timeseries_hour_gap_and_default_metric(tsctx):
    got = rows(compile_stream(
        'timeseries(events, q="*:*", field="ts",'
        ' start="2024-01-01T00:00:00Z", end="2024-01-01T12:00:00Z",'
        ' gap="+6HOURS")',
        tsctx,
    ))
    assert len(got) == 2
    # 06:00 lands exactly on bucket-1's start; 18:30 is out of range
    assert [r[1] for r in got] == [0, 1]


def test_timeseries_rejects_bad_args(tsctx):
    with pytest.raises(ValueError):
        compile_stream(
            'timeseries(events, field="ts", start="2024-01-01T00:00:00Z",'
            ' end="2024-01-02T00:00:00Z", gap="+1MONTH")', tsctx)
    with pytest.raises(ValueError):
        compile_stream(
            'timeseries(events, field="ts", start="2024-01-02T00:00:00Z",'
            ' end="2024-01-01T00:00:00Z", gap="+1DAY")', tsctx)
    with pytest.raises(ValueError):
        compile_stream('timeseries(events, gap="+1DAY")', tsctx)


# ----------------------------------------------------- parallel hint

def test_parallel_compiles_to_sorted_child(ctx):
    got = rows(compile_stream(
        'parallel(docs, search(docs, q="data", fl="doc_id,lang",'
        ' sort="doc_id asc"), workers=4, sort="doc_id desc")',
        ctx,
    ))
    assert [r[0] for r in got] == [4, 2, 1, 0]
    with pytest.raises(ValueError):
        compile_stream('parallel(docs, workers=4)', ctx)


# ------------------------------------------------------ shortestPath

@pytest.fixture(scope="module")
def spctx(spark):
    # a->b->d->z (len 3), a->c->z (len 2), a->e (dead end), cycle b->a
    edge_rows = [
        ("a", "b"), ("b", "d"), ("d", "z"), ("a", "c"), ("c", "z"),
        ("a", "e"), ("b", "a"), ("c", "f"), ("f", "z"),
    ]
    ev = spark.createDataFrame(edge_rows, "src string, dst string")
    return StreamContext({"edges": StreamCollection(None, ev)})


def test_shortest_path_min_depth_all_paths(spctx):
    got = rows(compile_stream(
        'shortestPath(edges, from="a", to="z", edge="src=dst",'
        ' maxDepth="4", threads="6")',
        spctx,
    ))
    # only the length-2 path survives; a->b->d->z and a->c->f->z are
    # longer, so BFS never reports them
    assert sorted(tuple(p[0]) for p in got) == [("a", "c", "z")]


def test_shortest_path_unreachable_and_self(spctx):
    assert rows(compile_stream(
        'shortestPath(edges, from="z", to="a", edge="src=dst", maxDepth="3")',
        spctx,
    )) == []
    got = rows(compile_stream(
        'shortestPath(edges, from="a", to="a", edge="src=dst", maxDepth="3")',
        spctx,
    ))
    assert [tuple(p[0]) for p in got] == [("a",)]
    with pytest.raises(ValueError):
        compile_stream('shortestPath(edges, from="a", to="z")', spctx)


def test_shortest_path_depth_cap(spctx):
    # maxDepth=1 cannot reach z
    assert rows(compile_stream(
        'shortestPath(edges, from="a", to="z", edge="src=dst", maxDepth="1")',
        spctx,
    )) == []


# -------------------------------------------------- cartesianProduct

def test_cartesian_product_explodes(spark):
    mv = spark.createDataFrame(
        [(0, ["x", "y"]), (1, ["z"])], "doc_id long, tags array<string>"
    )
    got = rows(compile_stream(
        'cartesianProduct(search(mvsrc, q="*:*", fl="doc_id,tags"),'
        ' tags, productSort="tags desc")',
        StreamContext({"mvsrc": StreamCollection(None, mv)}),
    ))
    assert got == [(1, "z"), (0, "y"), (0, "x")]


# ------------------------------------------------- math expressions

@pytest.fixture(scope="module")
def mctx(spark):
    # y = 2x + 1 exactly → slope 2, intercept 1, r² = 1
    pts = [(i, float(i), 2.0 * i + 1.0) for i in range(1, 6)]
    df = spark.createDataFrame(pts, "doc_id long, x double, y double")
    return StreamContext({"pts": StreamCollection(None, df)})


def test_describe(mctx):
    got = rows(compile_stream(
        'describe(search(pts, q="*:*", fl="doc_id,x"), field="x")', mctx
    ))
    n, mean, stddev, lo, hi, total = got[0]
    assert (n, mean, lo, hi, total) == (5, 3.0, 1.0, 5.0, 15.0)
    assert abs(stddev - 1.581139) < 1e-6


def test_corr_and_regress(mctx):
    base = 'search(pts, q="*:*", fl="doc_id,x,y")'
    assert rows(compile_stream(
        f'corr({base}, fieldA="x", fieldB="y")', mctx
    )) == [(1.0,)]
    got = rows(compile_stream(f'regress({base}, x="x", y="y")', mctx))
    assert got == [(5, 2.0, 1.0, 1.0)]
    with pytest.raises(ValueError):
        compile_stream(f'regress({base}, x="x")', mctx)


def test_hist_bins_and_empties(mctx):
    got = rows(compile_stream(
        'hist(search(pts, q="*:*", fl="doc_id,x"), field="x", bins=4)', mctx
    ))
    # x ∈ {1..5}, width 1: bins [1,2)[2,3)[3,4)[4,5]; max lands in last
    assert [(r[0], r[3]) for r in got] == [(0, 1), (1, 1), (2, 1), (3, 2)]
    assert got[0][1] == 1.0 and got[3][2] == 5.0


# ------------------------------------------------- update() / commit()

def test_update_stream_upserts_into_root(spark, tmp_path, ctx):
    from golr_loader_spark.plans.build_index import (
        build_index,
        read_index,
        write_index,
    )
    from golr_loader_spark.plans.bm25 import search

    root = str(tmp_path / "dest")
    docs = spark.createDataFrame(
        [(10, "alpha beta"), (11, "beta gamma")], "doc_id long, text string"
    )
    cfg = IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=0,
                      id_space_bits=8)
    write_index(build_index(docs, cfg), root, documents=docs)

    dest = StreamCollection(None, docs, cfg, root=root)
    got = rows(compile_stream(
        'commit(dest, update(dest, search(docs, q="data",'
        ' fl="doc_id,text"), batchSize=100))',
        StreamContext({"dest": dest, "docs": ctx.collections["docs"]}),
    ))
    # q="data" matches docs 0,1,2,4 of the source collection — all new
    assert got == [(4, 0, 4)]
    ix = read_index(spark, root, cfg=cfg)
    hits = {r["doc_id"] for r in search(ix, "data", k=10, cfg=cfg).collect()}
    assert hits == {0, 1, 2, 4}

    # second identical update: now all 4 are overwrites
    got2 = rows(compile_stream(
        'update(dest, search(docs, q="data", fl="doc_id,text"))',
        StreamContext({"dest": dest, "docs": ctx.collections["docs"]}),
    ))
    assert got2 == [(4, 4, 0)]


def test_update_requires_root_and_child(ctx):
    with pytest.raises(ValueError):
        compile_stream('update(docs, search(docs, q="data", fl="doc_id,text"))', ctx)
    with pytest.raises(ValueError):
        compile_stream('commit(docs)', ctx)


# --------------------------------- significantTerms() and random()

def test_significant_terms_stream(ctx):
    got = rows(compile_stream(
        'significantTerms(docs, q="data", field="text", limit=5,'
        ' minDocFreq=2)',
        ctx,
    ))
    # fg = docs 0,1,2,4 (the 'data' matches). 'data' itself: fg 4/4
    # vs bg 4/5 → lift 1.25; 'query' fg 3/4 vs bg 3/5 → 1.25 — tie
    # broken by fg_df desc then term asc
    assert got[0][0] == "data" and got[0][3] == 1.25
    terms = [r[0] for r in got]
    assert "query" in terms
    with pytest.raises(ValueError):
        compile_stream('significantTerms(docs, q="data")', ctx)


def test_random_stream_deterministic(ctx):
    expr = 'random(docs, q="data", fl="doc_id", rows=2, seed=7)'
    a = rows(compile_stream(expr, ctx))
    b = rows(compile_stream(expr, ctx))
    assert a == b and len(a) == 2
    # different seed → (very likely) different order; same match set
    c = rows(compile_stream(
        'random(docs, q="data", fl="doc_id", rows=4, seed=8)', ctx
    ))
    assert sorted(r[0] for r in c) == [0, 1, 2, 4]


# ------------------------------------------------------------ topic()

def test_topic_checkpointed_consumption(spark, tmp_path):
    from golr_loader_spark.plans.build_index import build_index, write_index
    from golr_loader_spark.plans.maintenance import upsert_docs_fast

    root = str(tmp_path / "troot")
    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    cfg = IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=0,
                      id_space_bits=8)
    write_index(build_index(base, cfg), root, documents=base,
                store_fields=["text"])
    c = StreamContext({"dest": StreamCollection(None, base, cfg, root=root)})

    # default subscription starts at the current end -> empty
    assert rows(compile_stream('topic(dest, q="*:*", id="t1")', c)) == []
    # two upserts land in new segments (1 then 2)
    upsert_docs_fast(spark, root, spark.createDataFrame(
        [(3, "zeta eta")], "doc_id long, text string"), cfg)
    upsert_docs_fast(spark, root, spark.createDataFrame(
        [(3, "zeta theta"), (4, "iota kappa")], "doc_id long, text string"), cfg)
    got = rows(compile_stream(
        'topic(dest, q="*:*", id="t1", fl="doc_id,text")', c))
    # doc 3 updated twice since the checkpoint -> emitted ONCE, in its
    # NEWEST stored copy, at version (segment) 2
    assert sorted(got) == [(3, "zeta theta", 2), (4, "iota kappa", 2)]
    # consumed -> next read is empty
    assert rows(compile_stream('topic(dest, q="*:*", id="t1")', c)) == []
    # replay-from-zero on a fresh topic id sees everything
    all_rows = rows(compile_stream(
        'topic(ckpts, dest, q="*:*", id="t2", initialCheckpoint=0)',
        StreamContext({"ckpts": c.collections["dest"],
                       "dest": c.collections["dest"]})))
    assert sorted((r[0], r[1]) for r in all_rows) == [
        (1, 0), (2, 0), (3, 2), (4, 2)]
    with pytest.raises(ValueError):
        compile_stream('topic(dest, q="zeta", id="t3")', c)


# ------------------------------------------- select() evaluators

def test_select_arithmetic_and_if_evaluators(ctx):
    got = rows(compile_stream(
        'sort(select(search(docs, q="data", fl="doc_id,n_chars"),'
        ' "doc_id", add(n_chars, 5) as plus,'
        ' mult(n_chars, 2, 10) as big,'
        ' if(gt(n_chars, 25), 1, 0) as is_big), by="doc_id asc")',
        ctx,
    ))
    # docs 0,1,2,4 with n_chars 10,20,30,50
    assert got == [
        (0, 15, 200, 0), (1, 25, 400, 0), (2, 35, 600, 1), (4, 55, 1000, 1),
    ]
    with pytest.raises(ValueError):
        compile_stream(
            'select(search(docs, q="data", fl="doc_id,n_chars"),'
            ' add(n_chars, 5))', ctx)
    with pytest.raises(ValueError):
        compile_stream(
            'select(search(docs, q="data", fl="doc_id,n_chars"),'
            ' bogus(n_chars) as x)', ctx)


def test_timeseries_month_and_year_gaps(tsctx, spark):
    rows_ = [
        (0, "2024-01-15 00:00:00", 1.0),
        (1, "2024-02-01 00:00:00", 2.0),
        (2, "2024-02-29 12:00:00", 3.0),
        (3, "2024-05-31 23:59:59", 4.0),
        (4, "2024-06-01 00:00:00", 9.0),   # == end, excluded
    ]
    ev = spark.createDataFrame(rows_, "doc_id long, ts string, value double")
    ev = ev.withColumn("ts", F.to_timestamp("ts"))
    c = StreamContext({"ev": StreamCollection(None, ev)})
    got = rows(compile_stream(
        'timeseries(ev, q="*:*", field="ts", start="2024-01-01T00:00:00Z",'
        ' end="2024-06-01T00:00:00Z", gap="+2MONTHS", count(*), sum(value))',
        c,
    ))
    # buckets: [Jan,Mar) [Mar,May) [May,Jul→end) — leap Feb 29 in b0
    assert [r[0] for r in got] == [
        "2024-01-01T00:00:00Z", "2024-03-01T00:00:00Z", "2024-05-01T00:00:00Z",
    ]
    assert [r[1] for r in got] == [3, 0, 1]
    assert got[0][2] == 6.0 and got[1][2] is None and got[2][2] == 4.0
    # YEAR gap = 12 months
    got2 = rows(compile_stream(
        'timeseries(ev, q="*:*", field="ts", start="2024-01-01T00:00:00Z",'
        ' end="2025-01-01T00:00:00Z", gap="+1YEAR")',
        c,
    ))
    assert got2 == [("2024-01-01T00:00:00Z", 5)]  # every doc is in 2024
    # non-boundary start rejected, not mis-bucketed
    with pytest.raises(ValueError):
        compile_stream(
            'timeseries(ev, q="*:*", field="ts",'
            ' start="2024-01-15T00:00:00Z", end="2024-06-01T00:00:00Z",'
            ' gap="+1MONTH")', c)


def test_moving_avg_and_diff_over_timeseries(tsctx):
    base = (
        'timeseries(events, q="*:*", field="ts",'
        ' start="2024-01-01T00:00:00Z", end="2024-01-05T00:00:00Z",'
        ' gap="+1DAY", count(*), sum(value))'
    )
    got = rows(compile_stream(
        f'movingAvg({base}, field="count(*)", window=2, sort="dt asc")',
        tsctx,
    ))
    # counts 2,1,0,1 → trailing-2 avgs: null, 1.5, 0.5, 0.5
    assert [r[-1] for r in got] == [None, 1.5, 0.5, 0.5]
    got2 = rows(compile_stream(
        f'diff({base}, field="count(*)", sort="dt asc")', tsctx
    ))
    assert [r[-1] for r in got2] == [None, -1, -1, 1]
    with pytest.raises(ValueError):
        compile_stream(f'movingAvg({base}, field="count(*)")', tsctx)
