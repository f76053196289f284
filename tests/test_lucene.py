"""Lucene query-string surface (plans/lucene.py): parser shapes,
and executor parity with the manually-composed engine calls each
clause type maps onto (boolean / prefix / fuzzy / phrase)."""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.bm25 import (
    search,
    search_boolean,
    search_fuzzy,
    search_prefix,
)
from golr_loader_spark.plans.lucene import (
    Fuzzy,
    Phrase,
    Prefix,
    Term,
    parse_lucene,
    search_lucene,
)
from golr_loader_spark.plans.phrase import phrase_search_positional

ROWS = [
    (0, "data query spark engine"),
    (1, "query data spark"),
    (2, "data query data query runs"),
    (3, "spark streaming joins"),
    (4, "unrelated words entirely"),
    (5, "the data query"),
    (6, "sort scan data"),
    (7, "span sort query"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3,
        positions=True,
    )


@pytest.fixture(scope="module")
def ix(spark, cfg):
    return build_index(spark.createDataFrame(ROWS, SCHEMA).cache(), cfg)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_parser_shapes():
    assert parse_lucene("+a b* -c d~1") == [
        ("MUST", Term("a")),
        ("SHOULD", Prefix("b")),
        ("MUST_NOT", Term("c")),
        ("SHOULD", Fuzzy("d", 1)),
    ]
    assert parse_lucene('a AND b OR c') == [
        ("MUST", Term("a")), ("MUST", Term("b")), ("SHOULD", Term("c")),
    ]
    assert parse_lucene('NOT a "x y"~3') == [
        ("MUST_NOT", Term("a")), ("SHOULD", Phrase("x y", 3)),
    ]
    for bad in ['(a b', 'a)', '"open', '1bad:x', 'f:(a b)']:
        with pytest.raises(ValueError):
            parse_lucene(bad)
    # mid-pattern wildcards parse to Wildcard nodes (WildcardQuery)
    from golr_loader_spark.plans.lucene import Wildcard

    assert parse_lucene("mid*dle t?st f:a*b^2") == [
        ("SHOULD", Wildcard("mid*dle")),
        ("SHOULD", Wildcard("t?st")),
        ("SHOULD", Wildcard("a*b", field="f", boost=2.0)),
    ]
    # trailing-* with no other wildcard stays the cheaper Prefix
    assert parse_lucene("b* b?*") == [
        ("SHOULD", Prefix("b")),
        ("SHOULD", Wildcard("b?*")),
    ]


def test_parser_groups_and_ranges():
    from golr_loader_spark.plans.lucene import Group, TermRange

    assert parse_lucene("(a OR b) AND c") == [
        ("MUST", Group((("SHOULD", Term("a")), ("SHOULD", Term("b"))))),
        ("MUST", Term("c")),
    ]
    assert parse_lucene("+(a b)^2 -c") == [
        ("MUST", Group((("SHOULD", Term("a")), ("SHOULD", Term("b"))), boost=2.0)),
        ("MUST_NOT", Term("c")),
    ]
    # nesting
    assert parse_lucene("((a) b)") == [
        ("SHOULD", Group((
            ("SHOULD", Group((("SHOULD", Term("a")),))),
            ("SHOULD", Term("b")),
        ))),
    ]
    assert parse_lucene("f:[10 TO 20] {a TO z}^2 [x TO *]") == [
        ("SHOULD", TermRange("10", "20", True, True, field="f")),
        ("SHOULD", TermRange("a", "z", False, False, boost=2.0)),
        ("SHOULD", TermRange("x", None, True, True)),
    ]


def test_disjunction_matches_search(ix, cfg):
    assert rows(search_lucene(ix, "data spark", k=10, cfg=cfg)) == rows(
        search(ix, "data spark", k=10, cfg=cfg)
    )


def test_boolean_matches_search_boolean(ix, cfg):
    got = rows(search_lucene(ix, "+data +query -spark", k=10, cfg=cfg))
    want = rows(
        search_boolean(
            ix, must=["data", "query"], must_not=["spark"], k=10, cfg=cfg
        )
    )
    assert got == want and {d for d, _s in got} == {2, 5}


def test_prefix_and_fuzzy_match_their_functions(ix, cfg):
    assert rows(search_lucene(ix, "s*", k=10, cfg=cfg)) == rows(
        search_prefix(ix, "s", k=10, cfg=cfg)
    )
    assert rows(search_lucene(ix, "quera~1", k=10, cfg=cfg)) == rows(
        search_fuzzy(ix, "quera", max_edits=1, k=10, cfg=cfg)
    )


def test_phrase_clause_matches_positional(ix, cfg):
    assert rows(search_lucene(ix, '"data query"', k=10, cfg=cfg)) == rows(
        phrase_search_positional(ix, "data query", k=10, cfg=cfg)
    )
    # sloppy form
    assert rows(search_lucene(ix, '"data spark"~2', k=10, cfg=cfg)) == rows(
        phrase_search_positional(ix, "data spark", k=10, slop=2, cfg=cfg)
    )


def test_must_prefix_is_any_of_group(ix, cfg):
    # +sp* : docs containing ANY sp-term (spark, span) — required
    # disjunction, not conjunction over expansions
    got = {d for d, _s in rows(search_lucene(ix, "+sp*", k=10, cfg=cfg))}
    assert got == {0, 1, 3, 7}
    # conjunction with another MUST still intersects
    got2 = {d for d, _s in rows(search_lucene(ix, "+sp* +data", k=10, cfg=cfg))}
    assert got2 == {0, 1}


def test_mixed_must_term_and_phrase(ix, cfg):
    """+data "data query": docs must contain data AND the phrase;
    score = boolean(data) + PhraseWeight(data query)."""
    got = dict(rows(search_lucene(ix, '+data "data query"', k=10, cfg=cfg)))
    # engine semantics here: MUST term + MUST-joined... phrase is
    # SHOULD, so docs with 'data' but no phrase stay (score = term only)
    bool_part = dict(rows(search_boolean(ix, must=["data"], k=10, cfg=cfg)))
    ph = dict(rows(phrase_search_positional(ix, "data query", k=10, cfg=cfg)))
    want = {d: s + ph.get(d, 0.0) for d, s in bool_part.items()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_should_term_plus_must_phrase(ix, cfg):
    """'engine +"data query"': the MUST phrase defines the match set
    (Lucene BooleanQuery); docs matching the phrase but not the
    optional 'engine' term are kept with should-score 0."""
    got = dict(rows(search_lucene(ix, 'engine +"data query"', k=10, cfg=cfg)))
    assert set(got) == {0, 2, 5}
    eng = dict(rows(search(ix, "engine", k=10, cfg=cfg)))
    ph = dict(rows(phrase_search_positional(ix, "data query", k=10, cfg=cfg)))
    for d in got:
        assert got[d] == pytest.approx(eng.get(d, 0.0) + ph[d], rel=1e-12)


def test_must_phrase_admits_only_unprohibited(ix, cfg):
    """Docs admitted through the MUST phrase (outside the boolean
    match set) must still respect term-level MUST_NOTs."""
    # phrase docs {0,2,5}; 'spark' docs {0,1,3}; engine matches {0}
    got = {
        d for d, _s in rows(
            search_lucene(ix, 'engine -spark +"data query"', k=10, cfg=cfg)
        )
    }
    assert got == {2, 5}
    # same leak through a SHOULD phrase when the boolean side is empty
    got2 = {
        d for d, _s in rows(
            search_lucene(ix, 'engine -spark "data query"', k=10, cfg=cfg)
        )
    }
    assert got2 == {2, 5}


def test_not_phrase_and_pure_negative(ix, cfg):
    got = {d for d, _s in rows(search_lucene(ix, 'data -"data query"', k=10, cfg=cfg))}
    # docs with 'data' minus docs containing the phrase {0, 2, 5}
    assert got == {1, 6}
    assert rows(search_lucene(ix, "-data", k=10, cfg=cfg)) == []
    # phrase-only positive with term negation
    got2 = {d for d, _s in rows(search_lucene(ix, '"data query" -engine', k=10, cfg=cfg))}
    assert got2 == {2, 5}


def test_group_and_term(ix, cfg):
    """'(data OR engine) AND sort': the group's sub-match set joins
    the MUST term relationally; score = term score + sub score."""
    got = dict(rows(search_lucene(ix, "(data OR engine) AND sort", k=10, cfg=cfg)))
    assert set(got) == {6}  # doc 6: 'sort scan data'
    s_sort = dict(rows(search(ix, "sort", k=10, cfg=cfg)))
    s_de = dict(rows(search(ix, "data engine", k=10, cfg=cfg)))
    assert got[6] == pytest.approx(s_sort[6] + s_de[6], rel=1e-12)


def test_group_must_not(ix, cfg):
    """'data -(spark engine)': subtract docs matching the group."""
    got = dict(rows(search_lucene(ix, "data -(spark engine)", k=10, cfg=cfg)))
    assert set(got) == {2, 5, 6}
    s_data = dict(rows(search(ix, "data", k=10, cfg=cfg)))
    for d in got:
        assert got[d] == pytest.approx(s_data[d], rel=1e-12)


def test_group_boost_scales(ix, cfg):
    base = dict(rows(search_lucene(ix, "(data query)", k=10, cfg=cfg)))
    boosted = dict(rows(search_lucene(ix, "(data query)^2", k=10, cfg=cfg)))
    assert set(base) == set(boosted)
    for d in base:
        assert boosted[d] == pytest.approx(2.0 * base[d], rel=1e-12)


def test_nested_groups(ix, cfg):
    """'((data OR engine) AND sort) OR runs' — two-level nesting."""
    got = {d for d, _s in rows(search_lucene(
        ix, "((data OR engine) AND sort) OR runs", k=10, cfg=cfg
    ))}
    assert got == {6, 2}  # 6 from the inner conjunction, 2 has 'runs'


def test_range_query_matches_expansion(ix, cfg):
    # [sc TO sp] expands to {scan, sort} ('span' > 'sp' lexicographic)
    assert rows(search_lucene(ix, "[sc TO sp]", k=10, cfg=cfg)) == rows(
        search(ix, "scan sort", k=10, cfg=cfg)
    )
    # inclusive/exclusive and open endpoints
    assert rows(search_lucene(ix, "[e TO er]", k=10, cfg=cfg)) == rows(
        search(ix, "engine entirely", k=10, cfg=cfg)
    )
    got_open = {d for d, _s in rows(search_lucene(ix, "[z TO *]", k=10, cfg=cfg))}
    assert got_open == set()
    with pytest.raises(ValueError, match="TooManyClauses"):
        search_lucene(ix, "[* TO *]", k=10, cfg=cfg, max_expansions=3)


def test_fq_restricts_without_rescoring(ix, cfg):
    full = rows(search_lucene(ix, "data query", k=10, cfg=cfg))
    got = rows(search_lucene(ix, "data query", k=10, cfg=cfg, fq="spark"))
    spark_docs = {0, 1, 3}
    assert got == [(d, s) for d, s in full if d in spark_docs]
    # rich fq (phrase) takes the executor path
    got2 = rows(search_lucene(ix, "data query", k=10, cfg=cfg, fq='"data query"'))
    assert got2 == [(d, s) for d, s in full if d in {0, 2, 5}]
    # fq composed of MUST terms intersects
    got3 = rows(search_lucene(ix, "data", k=10, cfg=cfg, fq="+data +spark"))
    assert {d for d, _s in got3} == {0, 1}


def test_fq_on_plain_search(ix, cfg):
    from golr_loader_spark.plans.bm25 import search as bsearch

    full = rows(bsearch(ix, "data query", k=10, cfg=cfg))
    got = rows(bsearch(ix, "data query", k=10, cfg=cfg, fq="spark"))
    assert got == [(d, s) for d, s in full if d in {0, 1, 3}]


def test_serving_query_parity(tmp_path, ix, cfg):
    """LocalSearcher.query mirrors search_lucene clause-for-clause."""
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "lucix")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    for q in [
        "data spark",
        "+data +query -spark",
        "s*",
        "quera~1",
        '"data query"',
        '+data "data query"',
        'data -"data query"',
        '"data query" -engine',
        "+sp* +data",
        '-"data query" data',
        'engine +"data query"',
        'engine -spark +"data query"',
        'engine -spark "data query"',
        "(data OR engine) AND sort",
        "data -(spark engine)",
        "(data query)^2",
        "((data OR engine) AND sort) OR runs",
        "[sc TO sp]",
        "[e TO er] -data",
        '+(data engine) "data query"',
    ]:
        want = rows(search_lucene(ix, q, k=10, cfg=cfg))
        got = ls.query(q, k=10)
        assert got == want, q
    # fq parity
    for q, fq in [
        ("data query", "spark"),
        ("data query", '"data query"'),
        ("data", "+data +spark"),
    ]:
        want = rows(search_lucene(ix, q, k=10, cfg=cfg, fq=fq))
        got = ls.query(q, k=10, fq=fq)
        assert got == want, (q, fq)


# ------------------------------------------------- field: and ^boost

FROWS = [
    (0, "data query spark", "alpha build"),
    (1, "query data", "beta data"),
    (2, "spark joins", "alpha data"),
    (3, "data engine", "gamma tools"),
]
FSCHEMA = "doc_id long, text string, tag string"


@pytest.fixture(scope="module")
def fcfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0), "tag": ("simple", 1.0)},
        bucket_bits=2, id_space_bits=3, positions=True,
    )


@pytest.fixture(scope="module")
def fix(spark, fcfg):
    return build_index(spark.createDataFrame(FROWS, FSCHEMA).cache(), fcfg)


def test_parser_field_and_boost():
    assert parse_lucene("tag:alpha text:pre* f:x~1") == [
        ("SHOULD", Term("alpha", field="tag")),
        ("SHOULD", Prefix("pre", field="text")),
        ("SHOULD", Fuzzy("x", 1, field="f")),
    ]
    assert parse_lucene('data^2 "a b"^1.5 tag:"x y"~2') == [
        ("SHOULD", Term("data", boost=2.0)),
        ("SHOULD", Phrase("a b", 0, boost=1.5)),
        ("SHOULD", Phrase("x y", 2, field="tag")),
    ]


def test_field_selector_restricts_matching(fix, fcfg):
    # 'alpha' only ever appears in tag; 'data' appears in both fields
    got = {d for d, _s in rows(search_lucene(fix, "+tag:alpha", k=10, cfg=fcfg))}
    assert got == {0, 2}
    # tag:data matches docs whose TAG holds data (1, 2) — not doc 0/3
    got2 = {d for d, _s in rows(search_lucene(fix, "+tag:data", k=10, cfg=fcfg))}
    assert got2 == {1, 2}
    # unrestricted +data matches any field
    got3 = {d for d, _s in rows(search_lucene(fix, "+data", k=10, cfg=fcfg))}
    assert got3 == {0, 1, 2, 3}
    # field-restricted MUST_NOT: docs with data in TEXT, minus tag-alpha
    got4 = {
        d for d, _s in rows(
            search_lucene(fix, "+text:data -tag:alpha", k=10, cfg=fcfg)
        )
    }
    assert got4 == {1, 3}
    with pytest.raises(ValueError, match="unknown field"):
        search_lucene(fix, "nope:data", k=10, cfg=fcfg).collect()


def test_field_restricted_scoring(fix, fcfg):
    """text:data scores only the text field's contribution."""
    both = dict(rows(search_lucene(fix, "data", k=10, cfg=fcfg)))
    text_only = dict(rows(search_lucene(fix, "text:data", k=10, cfg=fcfg)))
    tag_only = dict(rows(search_lucene(fix, "tag:data", k=10, cfg=fcfg)))
    # doc 1 has data in both fields: unrestricted = sum of the parts
    assert both[1] == pytest.approx(text_only[1] + tag_only[1], rel=1e-12)
    assert set(text_only) == {0, 1, 3} and set(tag_only) == {1, 2}


def test_boost_scales_linearly(fix, fcfg):
    base = dict(rows(search_lucene(fix, "spark", k=10, cfg=fcfg)))
    boosted = dict(rows(search_lucene(fix, "spark^3", k=10, cfg=fcfg)))
    assert set(base) == set(boosted)
    for d in base:
        assert boosted[d] == pytest.approx(3.0 * base[d], rel=1e-12)
    # phrase boost
    pb = dict(rows(search_lucene(fix, '"data query"^2', k=10, cfg=fcfg)))
    p1 = dict(rows(search_lucene(fix, '"data query"', k=10, cfg=fcfg)))
    for d in p1:
        assert pb[d] == pytest.approx(2.0 * p1[d], rel=1e-12)


def test_field_phrase(fix, fcfg):
    got = {d for d, _s in rows(search_lucene(fix, 'tag:"alpha data"', k=10, cfg=fcfg))}
    assert got == {2}  # phrase in the TAG field only


def test_serving_field_boost_parity(tmp_path, fix, fcfg):
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "flucix")
    write_index(fix, root, term_partitions=2)
    ls = LocalSearcher(root, fcfg)
    for q in [
        "+tag:alpha",
        "+text:data -tag:alpha",
        "text:data",
        "spark^3 data",
        'tag:"alpha data"',
        '"data query"^2 -tag:beta',
    ]:
        want = rows(search_lucene(fix, q, k=10, cfg=fcfg))
        got = ls.query(q, k=10)
        assert got == want, q


def test_explain_lucene_pins_search_scores(ix, cfg):
    """explain_lucene's total reproduces search_lucene's score for
    every returned doc on mixed-clause queries (Solr debugQuery over
    every clause type), and explains non-matches with a reason."""
    from golr_loader_spark.plans.lucene import explain_lucene

    for q in [
        '+data s* "data query"',
        'engine +"data query"',
        "(data OR engine) AND sort",
        'data -(spark engine)',
        '(data query)^2 -streaming',
        "[sc TO sp] runs~1",
    ]:
        got = dict(rows(search_lucene(ix, q, k=10, cfg=cfg)))
        assert got, q
        for d, s in got.items():
            ex = explain_lucene(ix, q, d, cfg=cfg)
            assert ex["matches"], (q, d, ex.get("reason"))
            assert ex["score"] == pytest.approx(s, rel=1e-12), (q, d)
            assert ex["clauses"], (q, d)
    # non-match reasons
    ex = explain_lucene(ix, "+data +query", 4, cfg=cfg)  # doc 4 unrelated
    assert not ex["matches"] and "MUST" in ex["reason"]
    ex2 = explain_lucene(ix, "data -spark", 0, cfg=cfg)  # doc 0 has spark
    assert not ex2["matches"] and "prohibited" in ex2["reason"]
    ex3 = explain_lucene(ix, 'data +"data query"', 1, cfg=cfg)  # no phrase in doc 1
    assert not ex3["matches"]
    # per-term entries carry the fold components
    ex4 = explain_lucene(ix, "data query", 0, cfg=cfg)
    assert {e["term"] for e in ex4["clauses"][0]["terms"]} == {"data", "query"}
    for e in ex4["clauses"][0]["terms"]:
        assert e["tf"] >= 1 and e["contribution"] > 0


def test_explain_query_serving_parity(tmp_path, ix, cfg):
    """LocalSearcher.explain_query mirrors lucene.explain_lucene:
    same totals, same match/no-match decisions, pinned to the serving
    query() scores."""
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.lucene import explain_lucene
    from golr_loader_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "exq")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    for q in [
        '+data s* "data query"',
        "(data OR engine) AND sort",
        'data -(spark engine)',
        "[sc TO sp] runs~1",
    ]:
        got = dict(ls.query(q, k=10))
        assert got, q
        for d, s in got.items():
            exl = ls.explain_query(q, d)
            exd = explain_lucene(ix, q, d, cfg=cfg)
            assert exl["matches"] and exd["matches"], (q, d)
            assert exl["score"] == pytest.approx(s, rel=1e-12), (q, d)
            assert exl["score"] == pytest.approx(exd["score"], rel=1e-12)
    # non-match parity
    for q, d in [("+data +query", 4), ("data -spark", 0)]:
        assert not ls.explain_query(q, d)["matches"]
        assert not explain_lucene(ix, q, d, cfg=cfg)["matches"]


# ------------------------------------------- randomized query fuzz

def _random_queries(seed: int, n: int) -> list[str]:
    """Deterministic pseudo-random query strings over the ROWS vocab
    plus junk terms, exercising every clause type the grammar
    supports (occurs, boosts, phrases with slop, prefixes, fuzzies,
    ranges, nested groups)."""
    import random

    rng = random.Random(seed)
    vocab = ["data", "query", "spark", "engine", "runs", "sort", "scan",
             "span", "streaming", "zzznope", "qx"]

    def term(depth=0):
        w = rng.choice(vocab)
        r = rng.random()
        if r < 0.12:
            return w[: max(1, len(w) // 2)] + "*"
        if r < 0.22:
            return w + "~1"
        if r < 0.30:
            return f"{w}^{rng.choice(['2', '0.5', '3'])}"
        if r < 0.38:
            lo, hi = sorted(rng.sample(vocab, 2))
            lb, rb = rng.choice("[{"), rng.choice("]}")
            return f"{lb}{lo} TO {hi}{rb}"
        if r < 0.50:
            ph = " ".join(rng.sample(vocab[:8], rng.randint(2, 3)))
            slop = rng.choice(["", "~1", "~2"])
            return f'"{ph}"{slop}'
        if r < 0.58 and depth < 2:
            inner = " ".join(clause(depth + 1) for _ in range(rng.randint(1, 3)))
            return f"({inner})"
        return w

    def clause(depth=0):
        occ = rng.choice(["", "", "", "+", "-"])
        return occ + term(depth)

    out = []
    for _ in range(n):
        parts = [clause() for _ in range(rng.randint(1, 4))]
        if rng.random() < 0.3:
            parts.insert(1 if len(parts) > 1 else 0, rng.choice(["AND", "OR"]))
        out.append(" ".join(parts))
    return out


def test_fuzz_query_strings_serving_parity(tmp_path, ix, cfg):
    """Randomized grammar fuzz: every generated query either raises
    the same ValueError on both paths or returns IDENTICAL results
    from search_lucene and LocalSearcher.query — the strongest
    whole-surface property we can assert without a second engine."""
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "fz")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    checked = 0
    for q in _random_queries(seed=7, n=30):
        try:
            want = rows(search_lucene(ix, q, k=10, cfg=cfg))
            d_err = None
        except ValueError as e:
            want, d_err = None, str(e)
        try:
            got = ls.query(q, k=10)
            s_err = None
        except ValueError as e:
            got, s_err = None, str(e)
        assert (d_err is None) == (s_err is None), (q, d_err, s_err)
        if d_err is None:
            assert got == want, q
            checked += 1
    assert checked >= 20  # the grammar mostly generates executable queries
