"""Stored fields + highlighting (Solr stored="true" / hl=on parity):
write_index(store_fields=...), LocalSearcher.fetch / search_fetch,
and the token-exact highlighter."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.serve import LocalSearcher, highlight

ROWS = [
    (0, "spark query engine for big data workloads", "en"),
    (1, "query planner and spark catalyst internals", "en"),
    (2, "nothing relevant in this one", "de"),
    (3, "spark spark spark and more spark here", "fr"),
]
SCHEMA = "doc_id long, text string, lang string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=2)


@pytest.fixture(scope="module")
def root(spark, cfg, tmp_path_factory):
    docs = spark.createDataFrame(ROWS, SCHEMA)
    ix = build_index(docs.select("doc_id", "text"), cfg)
    root = str(tmp_path_factory.mktemp("stored") / "ix")
    write_index(
        ix, root, term_partitions=2, documents=docs, store_fields=["text", "lang"]
    )
    return root


def test_fetch_roundtrip(spark, root, cfg):
    ls = LocalSearcher(root, cfg)
    got = ls.fetch([0, 3], ["lang"])
    assert got == {0: {"lang": "en"}, 3: {"lang": "fr"}}
    full = ls.fetch([1])
    assert full[1]["text"] == ROWS[1][1] and full[1]["lang"] == "en"


def test_search_fetch_with_highlight(spark, root, cfg):
    ls = LocalSearcher(root, cfg)
    hits = ls.search_fetch(
        "spark query", k=4, fields=["lang"], highlight_field="text"
    )
    assert [h["doc_id"] for h in hits] == [
        d for d, _s in ls.search("spark query", k=4)
    ]
    by_id = {h["doc_id"]: h for h in hits}
    assert by_id[0]["lang"] == "en"
    assert "<em>spark</em>" in by_id[0]["highlight"]
    assert "<em>query</em>" in by_id[0]["highlight"]
    # stored text rides along when requested via highlight_field
    assert by_id[0]["text"] == ROWS[0][1]


def test_serve_query_types_match_distributed(spark, root, cfg):
    """LocalSearcher's boolean/prefix/fuzzy serve the SAME results as
    the distributed twins over the same persisted root."""
    from golr_loader_spark.plans.bm25 import (
        search_boolean,
        search_fuzzy,
        search_prefix,
    )
    from golr_loader_spark.plans.build_index import read_index

    ix = read_index(spark, root, cfg)
    ls = LocalSearcher(root, cfg)

    def dist(df):
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    assert ls.search_boolean(
        must=["query"], should=["spark"], must_not=["catalyst"], k=5
    ) == dist(
        search_boolean(
            ix, must=["query"], should=["spark"], must_not=["catalyst"], k=5, cfg=cfg
        )
    )
    assert ls.search_prefix("sp", k=5) == dist(search_prefix(ix, "sp", k=5, cfg=cfg))
    assert ls.search_fuzzy("quary", max_edits=1, k=5) == dist(
        search_fuzzy(ix, "quary", max_edits=1, k=5, cfg=cfg)
    )
    # guards behave like the distributed side
    assert ls.search_prefix("zzz", k=5) == []
    assert ls.search_boolean(must=["zzzmissing"], should=["spark"], k=5) == []
    with pytest.raises(ValueError):
        ls.search_fuzzy("spark", max_edits=3, max_expansions=0)


def test_highlight_fragment_selection():
    # densest window wins: the matches cluster at the end
    text = "aaa bbb ccc ddd " * 6 + "spark query spark"
    frag = highlight(text, ["spark", "query"], frag_size=30)
    assert frag.startswith("…")
    assert "<em>spark</em> <em>query</em> <em>spark</em>" in frag
    # no match → plain truncation, no markers
    assert "<em>" not in highlight("nothing here", ["spark"], frag_size=10)
    # token-exact: 'sparkly' must NOT highlight for term 'spark'
    assert "<em>" not in highlight("sparkly things", ["spark"])
    # case-insensitive on the text side
    assert "<em>Spark</em>" in highlight("Spark rules", ["spark"])


def test_search_sorted_parity_and_pagination(spark, root, cfg):
    """Solr sort=field + start/rows: distributed facets.search_sorted
    and LocalSearcher.search_sorted return identical pages."""
    from golr_loader_spark.plans.build_index import read_index
    from golr_loader_spark.plans.facets import search_sorted

    ix = read_index(spark, root, cfg)
    ls = LocalSearcher(root, cfg)
    docs = spark.createDataFrame(ROWS, SCHEMA)

    def dist(query, **kw):
        return [
            (r["pos"], r["doc_id"], r[kw.get("sort_field", "lang")])
            for r in search_sorted(
                ix, docs, query, kw.pop("sort_field", "lang"), cfg=cfg, **kw
            ).collect()
        ]

    # sort matching docs by lang asc: spark matches {0,1,3}
    want = [(1, 0, "en"), (2, 1, "en"), (3, 3, "fr")]
    assert dist("spark", ascending=True, rows=10) == want
    assert ls.search_sorted("spark", "lang", ascending=True, rows=10) == want
    # desc ordering, doc_id asc tie-break within 'en'
    want_d = [(1, 3, "fr"), (2, 0, "en"), (3, 1, "en")]
    assert dist("spark", ascending=False, rows=10) == want_d
    assert ls.search_sorted("spark", "lang", ascending=False, rows=10) == want_d
    # pagination: start=1 rows=1 → absolute pos 2
    assert dist("spark", ascending=True, start=1, rows=1) == [(2, 1, "en")]
    assert ls.search_sorted("spark", "lang", start=1, rows=1) == [(2, 1, "en")]
    # past-the-end page
    assert dist("spark", start=10, rows=5) == []
    assert ls.search_sorted("spark", "lang", start=10, rows=5) == []
    # fq restriction (non-scoring): only docs also containing 'query'
    want_fq = [(1, 0, "en"), (2, 1, "en")]
    assert dist("spark", fq="query", rows=10) == want_fq
    assert ls.search_sorted("spark", "lang", fq="query", rows=10) == want_fq
    # conjunctive matching
    assert dist("spark query", mode="and", rows=10) == want_fq
    assert ls.search_sorted("spark query", "lang", mode="and", rows=10) == want_fq


def test_serving_suggest_stats_boost_parity(spark, root, cfg):
    """Serving twins of suggest_terms / stats_field / search_boosted
    return the same results as the distributed paths over the same
    persisted root."""
    from golr_loader_spark.plans.bm25 import search_boosted, suggest_terms
    from golr_loader_spark.plans.build_index import read_index
    from golr_loader_spark.plans.facets import stats_field

    ix = read_index(spark, root, cfg)
    ls = LocalSearcher(root, cfg)
    # suggest: 'quary' -> query (df 2); 'spark' excluded (self) etc.
    want_s = [(r["term"], r["df"]) for r in suggest_terms(
        ix, "quary", k=5, max_edits=2, prefix_length=1, cfg=cfg
    ).collect()]
    assert ls.suggest("quary", k=5, max_edits=2, prefix_length=1) == want_s
    assert want_s and want_s[0][0] == "query"
    # boost parity: boosts keyed by doc_id
    boosts = {0: 2.0, 1: 0.5, 3: 1.0}
    bdf = spark.createDataFrame(
        [(d, b) for d, b in boosts.items()], "doc_id long, boost double"
    )
    want_b = [(r["doc_id"], r["score"]) for r in search_boosted(
        ix, "spark query", bdf, k=5, boost_mode="multiply", cfg=cfg
    ).collect()]
    got_b = ls.search_boosted("spark query", boosts, k=5, boost_mode="multiply")
    assert [(d, pytest.approx(s, rel=1e-12)) for d, s in want_b] == got_b


def test_serving_stats_field(spark, cfg, tmp_path):
    """stats_field serving twin over a stored numeric field."""
    from golr_loader_spark.plans.build_index import build_index, write_index
    from golr_loader_spark.plans.facets import stats_field
    from golr_loader_spark.plans.build_index import read_index

    rows = [
        (0, "data query", 10), (1, "data spark", 20),
        (2, "query spark", 30), (3, "data query spark", 40),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, nval long")
    ix = build_index(docs.select("doc_id", "text"), cfg)
    r2 = str(tmp_path / "stx")
    write_index(ix, r2, term_partitions=2, documents=docs, store_fields=["nval"])
    ls = LocalSearcher(r2, cfg)
    dist = stats_field(
        ix, docs.selectExpr("doc_id", "nval AS value"), "data query", cfg=cfg,
        fq="spark",
    ).collect()[0]
    got = ls.stats_field("data query", "nval", fq="spark")
    assert got["n"] == dist["n"] and got["min"] == dist["min"]
    assert got["max"] == dist["max"] and got["sum"] == dist["sum"]
    assert got["mean"] == dist["mean"] and got["stddev"] == dist["stddev"]
    # percentiles parity: distributed F.percentile vs serving exact
    dist_p = stats_field(
        ix, docs.selectExpr("doc_id", "nval AS value"), "data query",
        cfg=cfg, fq="spark", percentiles=[50, 90],
    ).collect()[0]
    got_p = ls.stats_field("data query", "nval", fq="spark", percentiles=[50, 90])
    assert got_p["p50"] == dist_p["p50"] and got_p["p90"] == dist_p["p90"]
    # empty match set carries the percentile keys as None
    assert ls.stats_field("zzznope", "nval", percentiles=[50])["p50"] is None


def test_serving_search_after_parity(spark, cfg, tmp_path):
    """Cursor paging serving twin walks the same pages as the
    distributed facets.search_after."""
    from golr_loader_spark.plans.build_index import build_index, read_index, write_index
    from golr_loader_spark.plans.facets import search_after

    rows = [(i, "data" if i % 3 else "data query", (i * 7) % 5) for i in range(15)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, grp long")
    cfg2 = IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=4)
    ix = build_index(docs.select("doc_id", "text"), cfg2)
    root = str(tmp_path / "cur")
    write_index(ix, root, term_partitions=2, documents=docs, store_fields=["grp"])
    ls = LocalSearcher(root, cfg2)
    av, ad = None, None
    for _page in range(5):
        want = [
            (r["doc_id"], r["grp"])
            for r in search_after(
                ix, docs, "data", "grp", after_value=av, after_doc_id=ad,
                ascending=False, rows=4, cfg=cfg2,
            ).collect()
        ]
        got = ls.search_after(
            "data", "grp", after_value=av, after_doc_id=ad,
            ascending=False, rows=4,
        )
        assert got == want, (av, ad)
        if not want:
            break
        ad, av = want[-1][0], want[-1][1]


def test_distributed_search_fetch_matches_serving(spark, root, cfg):
    """facets.search_fetch (the batch-export Spark path) returns row
    for row what LocalSearcher.search_fetch serves — same hits, same
    stored fields, same highlighter output (shared highlight())."""
    from golr_loader_spark.plans.build_index import read_index
    from golr_loader_spark.plans.facets import search_fetch

    ls = LocalSearcher(root, cfg)
    ix = read_index(spark, root, cfg)
    docs = spark.read.parquet(f"{root}/stored")
    for q, hf in [("spark query", "text"), ("catalyst", "text"), ("spark", None)]:
        want = ls.search_fetch(q, k=3, fields=["lang"], highlight_field=hf)
        got_rows = search_fetch(
            ix, docs, q, k=3, cfg=cfg, fields=["lang"], highlight_field=hf
        ).collect()
        got = []
        for r in sorted(got_rows, key=lambda r: r["rank"]):
            row = {"doc_id": r["doc_id"], "score": r["score"], "lang": r["lang"]}
            if hf:
                row[hf] = r[hf]
                row["highlight"] = r["highlight"]
            got.append(row)
        assert got == want, q
    # empty hit set
    assert search_fetch(ix, docs, "xyzzyq", k=3, cfg=cfg).count() == 0


def test_highlight_snippets_multi_fragment():
    from golr_loader_spark.plans.serve import highlight, highlight_snippets

    text = (
        "data query starts here with filler words that keep going on "
        "and on for quite a while before another data query cluster "
        "appears later in the document and then even more filler and "
        "a final data mention at the very end of it"
    )
    snips = highlight_snippets(text, ["data", "query"], n_snippets=3,
                               frag_size=40)
    assert 2 <= len(snips) <= 3
    assert all("<em>data</em>" in s or "<em>query</em>" in s for s in snips)
    # the top snippet is the single-fragment highlighter's answer
    assert snips[0] == highlight(text, ["data", "query"], frag_size=40)
    # fragments never overlap: the emphasized tokens of each snippet
    # are disjoint occurrences
    assert highlight_snippets(text, ["zzz"], n_snippets=2) == []


def test_search_fetch_multi_snippets(spark, root):
    from golr_loader_spark.config import IndexConfig
    from golr_loader_spark.plans.serve import LocalSearcher

    ls = LocalSearcher(root)
    rows = ls.search_fetch(
        "data query", k=3, highlight_field="text", n_snippets=3,
        frag_size=40,
    )
    assert rows
    for r in rows:
        if "highlights" in r:
            assert r["highlights"][0] == r["highlight"]


def test_highlight_field_col_whole_field(spark):
    from golr_loader_spark.plans.serve import highlight_field_col

    df = spark.createDataFrame(
        [(0, "Data flows to the query engine"), (1, "no match here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", highlight_field_col("text", ["data", "query"]).alias("s")
        ).collect()
    }
    # hl.fragsize=0: whole field, case-preserving markup, token-exact
    assert got[0] == "<em>Data</em> flows to the <em>query</em> engine"
    assert got[1] == "no match here"
