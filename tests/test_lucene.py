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
    for bad in ['(a b)', 'f:x', 'mid*dle', '"open']:
        with pytest.raises(ValueError):
            parse_lucene(bad)


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


def test_not_phrase_and_pure_negative(ix, cfg):
    got = {d for d, _s in rows(search_lucene(ix, 'data -"data query"', k=10, cfg=cfg))}
    # docs with 'data' minus docs containing the phrase {0, 2, 5}
    assert got == {1, 6}
    assert rows(search_lucene(ix, "-data", k=10, cfg=cfg)) == []
    # phrase-only positive with term negation
    got2 = {d for d, _s in rows(search_lucene(ix, '"data query" -engine', k=10, cfg=cfg))}
    assert got2 == {2, 5}


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
    ]:
        want = rows(search_lucene(ix, q, k=10, cfg=cfg))
        got = ls.query(q, k=10)
        assert got == want, q
