"""Faceted search (plans/facets.py) — Solr facet semantics over the
compressed index: counts over ALL matching docs, multi-valued fields
count once per (doc, value), (count desc, value asc) order,
mincount/limit knobs, tombstoned docs excluded immediately.

Brute-force twin computed with plain DataFrame ops over the raw
corpus — no index, no decode — so a codec or matcher bug can't hide
in a shared code path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.facets import (
    build_facets,
    facet_counts,
    matching_doc_ids,
)

ROWS = [
    # doc_id, text, lang, tags
    (0, "spark engine scan", "en", ["infra", "query"]),
    (1, "spark spark join", "en", ["query"]),
    (2, "delta index scan", "de", ["infra"]),
    (3, "spark index merge", "de", ["infra", "infra"]),  # dup tag: counts once
    (4, "other words here", "fr", ["misc"]),
    (5, "scan only doc", "en", None),  # null-tag doc still facets on lang
    (6, "spark scan pair", "fr", []),
]
SCHEMA = "doc_id long, text string, lang string, tags array<string>"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ix(docs, cfg):
    return build_index(docs.select("doc_id", "text"), cfg)


def _brute_matching(mode: str, terms: set[str]) -> set[int]:
    out = set()
    for doc_id, text, _lang, _tags in ROWS:
        toks = set(text.split())
        hit = terms <= toks if mode == "and" else bool(terms & toks)
        if hit:
            out.add(doc_id)
    return out


@pytest.mark.parametrize("mode,query", [("or", "spark scan"), ("and", "spark scan")])
def test_matching_doc_ids(spark, ix, cfg, mode, query):
    got = {
        r["doc_id"]
        for r in matching_doc_ids(ix, query, cfg=cfg, mode=mode).collect()
    }
    assert got == _brute_matching(mode, set(query.split()))


def test_and_mode_absent_term_is_empty(spark, ix, cfg):
    assert matching_doc_ids(ix, "spark xyzzyq", cfg=cfg, mode="and").count() == 0
    # disjunctive still matches on the present term
    assert matching_doc_ids(ix, "spark xyzzyq", cfg=cfg, mode="or").count() > 0


def test_facet_counts_match_brute_force(spark, docs, ix, cfg):
    fx = build_facets(docs, ["lang", "tags"], cfg)
    got = facet_counts(ix, fx, "spark scan", cfg=cfg, top=10)
    rows = {(r["facet"], r["value"]): (r["n"], r["rank"]) for r in got.collect()}

    matched = _brute_matching("or", {"spark", "scan"})
    brute: dict[tuple[str, str], int] = {}
    for doc_id, _t, lang, tags in ROWS:
        if doc_id not in matched:
            continue
        brute[("lang", lang)] = brute.get(("lang", lang), 0) + 1
        for tag in set(tags or []):
            brute[("tags", tag)] = brute.get(("tags", tag), 0) + 1
    assert {k: v[0] for k, v in rows.items()} == brute
    # rank = (n desc, value asc) within each facet
    for facet in {"lang", "tags"}:
        vals = sorted(
            ((v, k[1]) for k, (v, _r) in
             {k: r for k, r in rows.items() if k[0] == facet}.items()),
            key=lambda x: (-x[0], x[1]),
        )
        ranks = [rows[(facet, value)][1] for _n, value in vals]
        assert ranks == list(range(1, len(vals) + 1))


def test_min_count_and_top(spark, docs, ix, cfg):
    fx = build_facets(docs, ["lang"], cfg)
    # "spark scan" matches docs 0,1,2,3,5,6 → lang counts en=3 de=2 fr=1
    assert {
        (r["value"], r["n"])
        for r in facet_counts(ix, fx, "spark scan", cfg=cfg, min_count=2).collect()
    } == {("en", 3), ("de", 2)}
    top1 = facet_counts(ix, fx, "spark scan", cfg=cfg, top=1).collect()
    assert [(r["value"], r["n"], r["rank"]) for r in top1] == [("en", 3, 1)]


def test_local_searcher_facets_match_distributed(spark, docs, ix, cfg, tmp_path):
    """The serving path (LocalSearcher.facet_counts over the persisted
    facet table) must produce the same counts and order as the
    distributed plans.facets.facet_counts, in both modes."""
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher

    fx = build_facets(docs, ["lang", "tags"], cfg)
    root = str(tmp_path / "ix_facets")
    write_index(ix, root, term_partitions=2, facets=fx)
    ls = LocalSearcher(root, cfg)
    for mode in ("or", "and"):
        want: dict[str, list[tuple[str, int]]] = {}
        for r in facet_counts(ix, fx, "spark scan", cfg=cfg, mode=mode).orderBy(
            "facet", "rank"
        ).collect():
            want.setdefault(r["facet"], []).append((r["value"], r["n"]))
        got = ls.facet_counts("spark scan", mode=mode)
        assert got == want, mode
        # decode-only membership parity too
        import numpy as np

        dist = np.sort(
            np.array(
                [r["doc_id"] for r in matching_doc_ids(ix, "spark scan", cfg=cfg, mode=mode).collect()],
                dtype=np.int64,
            )
        )
        assert np.array_equal(ls.matching_ids("spark scan", mode=mode), dist)


def test_range_facets(spark, docs, ix, cfg):
    from pyspark.sql import functions as F

    from golr_loader_spark.plans.facets import range_facet_counts

    vals = docs.select("doc_id", F.length("text").alias("value"))
    got = {
        (r["lo"], r["n"])
        for r in range_facet_counts(ix, vals, "spark scan", width=5.0, cfg=cfg).collect()
    }
    matched = _brute_matching("or", {"spark", "scan"})
    brute: dict[float, int] = {}
    for doc_id, text, _l, _t in ROWS:
        if doc_id in matched:
            lo = (len(text) // 5) * 5.0
            brute[lo] = brute.get(lo, 0) + 1
    assert got == set(brute.items())


def test_grouped_topk_collapse(spark, docs, ix, cfg):
    """Field collapsing: in-group ranks are per-value BM25 order,
    groups ordered by their best doc, caps respected."""
    from golr_loader_spark.plans.bm25 import search
    from golr_loader_spark.plans.facets import grouped_topk

    fx = build_facets(docs, ["lang"], cfg)
    rows = grouped_topk(
        ix, fx, "lang", "spark scan", cfg=cfg, docs_per_group=2, k_groups=2
    ).collect()
    # global BM25 order for reference
    full = [
        (r["doc_id"], r["score"])
        for r in search(ix, "spark scan", k=10, cfg=cfg).collect()
    ]
    by_lang = {doc_id: lang for doc_id, _t, lang, _tags in ROWS}
    # brute: group docs by lang, rank inside by global score order
    order = {d: i for i, (d, _s) in enumerate(full)}
    want_groups: dict[str, list[int]] = {}
    for d, _s in full:
        want_groups.setdefault(by_lang[d], []).append(d)
    heads = sorted(want_groups, key=lambda v: (order[want_groups[v][0]], v))[:2]
    got_groups: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["group_rank"], r["rank"])):
        got_groups.setdefault(r["value"], []).append(r["doc_id"])
    assert list(got_groups) == heads
    for v in heads:
        assert got_groups[v] == want_groups[v][:2], v
    assert all(r["rank"] <= 2 for r in rows)


def test_tombstones_drop_from_counts(spark, docs, ix, cfg):
    import numpy as np

    fx = build_facets(docs, ["lang"], cfg)
    got = {
        (r["value"], r["n"])
        for r in facet_counts(
            ix, fx, "spark scan", cfg=cfg, exclude_ids=np.array([0, 1], dtype=np.int64)
        ).collect()
    }
    assert got == {("en", 1), ("de", 2), ("fr", 1)}


def test_suggest_terms_popularity_ranked(spark):
    """Solr spellcheck: suggestions within max_edits of the input,
    prefix-gated, ranked (df desc, term asc), input itself excluded."""
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.bm25 import suggest_terms
    from golr_loader_spark.plans.build_index import build_index

    rows = [
        (0, "query data"), (1, "query spark"), (2, "quest log"),
        (3, "quest query"), (4, "queue depth"), (5, "unrelated"),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    ix = build_index(
        spark.createDataFrame(rows, "doc_id long, text string"), cfg
    )
    got = [(r["term"], r["df"]) for r in suggest_terms(
        ix, "quer", k=5, max_edits=2, prefix_length=1, cfg=cfg
    ).collect()]
    # query: lev 1 df 3, quest: lev 2 df 2, queue: lev 2 df 1
    assert got == [("query", 3), ("quest", 2), ("queue", 1)]
    # the input term itself is excluded even when indexed
    got2 = [r["term"] for r in suggest_terms(
        ix, "query", k=5, max_edits=1, cfg=cfg
    ).collect()]
    assert "query" not in got2
    # min_df gate
    got3 = [r["term"] for r in suggest_terms(
        ix, "quer", k=5, max_edits=2, min_df=2, cfg=cfg
    ).collect()]
    assert got3 == ["query", "quest"]


def test_stats_field_matches_python(spark):
    """StatsComponent: n/min/max/sum/mean/stddev over the match set,
    fq-restricted, vs a pure-Python computation."""
    import statistics

    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.facets import stats_field

    rows = [
        (0, "data query", 10), (1, "data spark", 20), (2, "query spark", 30),
        (3, "data query spark", 40), (4, "unrelated", 50),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, value long")
    ix = build_index(df.select("doc_id", "text"), cfg)
    vals = df.select("doc_id", "value")
    r = stats_field(ix, vals, "data query", cfg=cfg).collect()[0]
    xs = [10, 20, 30, 40]  # docs matching data OR query
    assert (r["n"], r["min"], r["max"]) == (4, 10, 40)
    assert r["sum"] == sum(xs) and r["mean"] == sum(xs) / 4
    assert r["stddev"] == round(statistics.stdev(xs), 4)
    # fq drill-down: data|query docs that also contain spark
    r2 = stats_field(ix, vals, "data query", cfg=cfg, fq="spark").collect()[0]
    xs2 = [20, 30, 40]
    assert (r2["n"], r2["min"], r2["max"]) == (3, 20, 40)
    assert r2["mean"] == round(sum(xs2) / 3, 4)
    # empty match set -> n=0 row with null stats
    r3 = stats_field(ix, vals, "zzznope", cfg=cfg).collect()
    assert len(r3) == 1 and r3[0]["n"] == 0
    # stats.percentiles: exact quantile_cont over xs=[10,20,30,40]
    r4 = stats_field(
        ix, vals, "data query", cfg=cfg, percentiles=[25, 50, 99.9]
    ).collect()[0]
    assert r4["p25"] == 17.5 and r4["p50"] == 25.0
    assert r4["p99.9"] == round(30 + 10 * (0.999 * 3 - 2), 4)


def test_search_boosted_function_query(spark):
    """Solr bf/boost function queries: the combine happens on the
    UNtruncated score set (a below-top-k doc can rise), sum and
    multiply modes, neutral missing defaults."""
    import math

    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.bm25 import search, search_boosted
    from golr_loader_spark.plans.build_index import build_index

    rows = [
        (0, "data query", 1.0), (1, "data data query", 100.0),
        (2, "query other", 5.0), (3, "data noise words", 0.5),
        (4, "unrelated", 1000.0),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, pop double")
    ix = build_index(df.select("doc_id", "text"), cfg)
    bv = df.selectExpr("doc_id", "ln(1 + pop) AS boost")
    base = dict(
        (r["doc_id"], r["score"])
        for r in search(ix, "data query", k=10, cfg=cfg).collect()
    )
    got = [
        (r["doc_id"], r["score"])
        for r in search_boosted(ix, "data query", bv, k=10, cfg=cfg).collect()
    ]
    want = {d: s + math.log(1 + dict((r[0], r[2]) for r in rows)[d]) for d, s in base.items()}
    assert dict(got) == pytest.approx(want)
    # ranking respects the boost (doc 1 pop=100 outranks all)
    assert got[0][0] == 1
    # doc 4 does not match the query — boosts never create matches
    assert 4 not in dict(got)
    # multiply mode with a missing doc takes the neutral 1.0
    bv2 = spark.createDataFrame([(0, 2.0)], "doc_id long, boost double")
    got2 = dict(
        (r["doc_id"], r["score"])
        for r in search_boosted(
            ix, "data query", bv2, k=10, boost_mode="multiply", cfg=cfg
        ).collect()
    )
    assert got2[0] == pytest.approx(2.0 * base[0])
    for d in base:
        if d != 0:
            assert got2[d] == pytest.approx(base[d])
    with pytest.raises(ValueError):
        search_boosted(ix, "data", bv, boost_mode="bad", cfg=cfg)


def test_search_after_keyset_equals_offset_pages(spark):
    """CursorMark keyset paging walks the same total order as offset
    pagination (search_sorted), page by page, threading the cursor
    from each page's last row — Solr's nextCursorMark contract."""
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.facets import search_after, search_sorted

    rows = [(i, "data" if i % 3 else "data query", (i * 7) % 5) for i in range(20)]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=5
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, grp long")
    ix = build_index(df.select("doc_id", "text"), cfg)
    # walk with the cursor in pages of 6
    got, after_v, after_d = [], None, None
    while True:
        page = [
            (r["doc_id"], r["grp"])
            for r in search_after(
                ix, df, "data", "grp", after_value=after_v,
                after_doc_id=after_d, ascending=False, rows=6, cfg=cfg,
            ).collect()
        ]
        if not page:
            break
        got.extend(page)
        after_d, after_v = page[-1][0], page[-1][1]
    # search_sorted returns (pos, doc_id, grp); align shapes
    want = [(d, v) for _p, d, v in [
        (r["pos"], r["doc_id"], r["grp"])
        for r in search_sorted(
            ix, df, "data", "grp", ascending=False, start=0, rows=100, cfg=cfg
        ).collect()
    ]]
    assert got == want and len(got) == 20
    # ascending walk too
    got_a, av, ad = [], None, None
    for _ in range(10):
        page = [
            (r["doc_id"], r["grp"])
            for r in search_after(
                ix, df, "data", "grp", after_value=av, after_doc_id=ad,
                ascending=True, rows=7, cfg=cfg,
            ).collect()
        ]
        if not page:
            break
        got_a.extend(page)
        ad, av = page[-1][0], page[-1][1]
    want_a = [(d, v) for _p, d, v in [
        (r["pos"], r["doc_id"], r["grp"])
        for r in search_sorted(
            ix, df, "data", "grp", ascending=True, start=0, rows=100, cfg=cfg
        ).collect()
    ]]
    assert got_a == want_a


def test_pivot_facet_counts_two_level(spark):
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.facets import pivot_facet_counts

    rows = [
        (0, "data x", "en", "a"), (1, "data y", "en", "a"),
        (2, "data z", "en", "b"), (3, "data w", "de", "c"),
        (4, "data v", "de", "c"), (5, "data u", "de", "c"),
        (6, "other", "fr", "d"),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, src string")
    ix = build_index(df.select("doc_id", "text"), cfg)
    got = [
        tuple(r) for r in pivot_facet_counts(
            ix, df, "data", "lang", "src", cfg=cfg, top_outer=2, top_inner=2
        ).collect()
    ]
    # 'data' matches docs 0-5: de->c:3 (outer 3), en->a:2,b:1 (outer 3)
    # tie on outer count 3 -> 'de' < 'en'
    assert got == [
        ("de", 3, 1, "c", 3, 1),
        ("en", 3, 2, "a", 2, 1),
        ("en", 3, 2, "b", 1, 2),
    ]


def test_pivot_serving_parity(spark, tmp_path):
    """LocalSearcher.pivot_facet_counts returns the same ranked rows
    as the distributed facets.pivot_facet_counts over the same
    persisted root."""
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index, write_index
    from golr_loader_spark.plans.facets import build_facets, pivot_facet_counts
    from golr_loader_spark.plans.serve import LocalSearcher

    rows = [
        (0, "data x", "en", "a"), (1, "data y", "en", "a"),
        (2, "data z", "en", "b"), (3, "data w", "de", "c"),
        (4, "data v", "de", "c"), (5, "data u", "de", "c"),
        (6, "other", "fr", "d"),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, src string")
    ix = build_index(df.select("doc_id", "text"), cfg)
    fx = build_facets(df, ["lang", "src"], cfg)
    root = str(tmp_path / "pvt")
    write_index(ix, root, term_partitions=2, facets=fx)
    ls = LocalSearcher(root, cfg)
    want = [
        tuple(r) for r in pivot_facet_counts(
            ix, df, "data", "lang", "src", cfg=cfg, top_outer=2, top_inner=2
        ).collect()
    ]
    got = ls.pivot_facet_counts("data", "lang", "src", top_outer=2, top_inner=2)
    assert got == want and len(got) == 3


def test_range_and_collapse_serving_parity(spark, tmp_path):
    """Serving twins for range facets and field collapsing match the
    distributed paths over the same persisted root."""
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index, read_index, write_index
    from golr_loader_spark.plans.facets import (
        build_facets,
        grouped_topk,
        range_facet_counts,
    )
    from golr_loader_spark.plans.serve import LocalSearcher

    rows = [
        (0, "data query spark", "en", 12), (1, "data spark", "en", 27),
        (2, "query spark", "de", 31), (3, "data query", "de", 44),
        (4, "data data query", "fr", 58), (5, "other", "fr", 70),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, nval long")
    ix = build_index(df.select("doc_id", "text"), cfg)
    fx = build_facets(df, ["lang"], cfg)
    root = str(tmp_path / "rng")
    write_index(ix, root, term_partitions=2, documents=df, facets=fx,
                store_fields=["nval"])
    ls = LocalSearcher(root, cfg)
    # range facets
    want_r = [
        (r["lo"], r["n"])
        for r in range_facet_counts(
            ix, df.selectExpr("doc_id", "nval AS value"), "data query",
            width=20.0, cfg=cfg,
        ).collect()
    ]
    got_r = ls.range_facet_counts("data query", "nval", width=20.0)
    assert got_r == want_r and len(got_r) >= 2
    # field collapsing
    want_g = [
        (r["group_rank"], r["value"], r["rank"], r["doc_id"], r["score"])
        for r in grouped_topk(
            ix, fx, "lang", "data query", cfg=cfg, docs_per_group=2,
            k_groups=3, round_scores=4,
        ).collect()
    ]
    got_g = ls.grouped_topk("lang", "data query", docs_per_group=2,
                            k_groups=3, round_scores=4)
    assert got_g == want_g and len(got_g) >= 3


def test_export_matches_full_sorted_stream(spark):
    """Solr /export: complete match set in (value desc, doc_id) order,
    missing doc values last, fq restriction honored."""
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.build_index import build_index
    from golr_loader_spark.plans.facets import export_matches

    rows = [
        (0, "data query spark", 40),
        (1, "query data", 10),
        (2, "data runs", 40),
        (3, "spark only", 7),
        (4, "unrelated", 99),
        (5, "data dusty", None),
    ]
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, v int")
    ix = build_index(docs.select("doc_id", "text"), cfg)
    vals = docs.select("doc_id", F.col("v").alias("value"))
    got = [
        (r["doc_id"], r["value"])
        for r in export_matches(ix, vals, "data", cfg=cfg).collect()
    ]
    assert got == [(0, 40), (2, 40), (1, 10), (5, None)]
    got_asc = [
        r["doc_id"]
        for r in export_matches(ix, vals, "data", cfg=cfg, ascending=True).collect()
    ]
    assert got_asc == [1, 0, 2, 5]  # missing still LAST ascending
    got_fq = [
        r["doc_id"]
        for r in export_matches(ix, vals, "data", cfg=cfg, fq="spark").collect()
    ]
    assert got_fq == [0]
