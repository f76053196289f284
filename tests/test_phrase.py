"""Phrase search (plans/phrase.py): consecutive-token semantics,
rank identity with the exact scorer on the verified doc set, strict
empties, and the code-analyzer guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.phrase import decode_postings, phrase_search

ROWS = [
    (0, "data query spark engine"),      # contains "data query"
    (1, "query data spark"),             # both terms, wrong order
    (2, "data query data query runs"),   # phrase twice
    (3, "big data  query gap"),          # double space → empty token between
    (4, "unrelated words entirely"),
    (5, "the data query"),               # phrase at end
    (6, "a a a"),                        # self-overlap corpus
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ix(docs, cfg):
    return build_index(docs, cfg)


def test_phrase_membership(spark, docs, ix, cfg):
    got = [r["doc_id"] for r in phrase_search(ix, docs, "data query", k=10, cfg=cfg).collect()]
    # docs 0, 2, 5 contain the consecutive pair; 1 (order), 3 (empty
    # token between), 4 (absent) must not
    assert set(got) == {0, 2, 5}


def test_phrase_scores_match_exact_fold(spark, docs, ix, cfg):
    """Scores equal the conjunctive BM25 of the phrase terms computed
    from raw tokens (the score_exact discipline), restricted to the
    phrase-verified docs — decode + semi-join must not perturb tf/dl
    or the float fold order."""
    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.bm25 import score_exact

    got = {
        r["doc_id"]: r["score"]
        for r in phrase_search(ix, docs, "data query", k=10, cfg=cfg).collect()
    }
    toks = tokenize(docs, cfg)
    exact = {
        r["doc_id"]: r["score"]
        for r in score_exact(
            toks, None, ix.n_docs, ix.avgdl_by_field, ["data", "query"], cfg, k=10
        ).collect()
        if r["doc_id"] in got
    }
    assert got == exact  # bit-identical floats, not approx


def test_phrase_overlap_and_empties(spark, docs, ix, cfg):
    # self-overlapping phrase: "a a" occurs in "a a a"
    assert {r["doc_id"] for r in phrase_search(ix, docs, "a a", k=10, cfg=cfg).collect()} == {6}
    # absent term → empty (conjunctive candidate gen is strict)
    assert phrase_search(ix, docs, "data xyzzyq", k=10, cfg=cfg).count() == 0
    assert phrase_search(ix, docs, "   ", k=10, cfg=cfg).count() == 0


def test_code_analyzer_guard(spark, docs):
    cfg_code = IndexConfig(fields={"text": ("code", 1.0)}, bucket_bits=2, id_space_bits=3)
    ix2 = build_index(docs, cfg_code)
    with pytest.raises(NotImplementedError):
        phrase_search(ix2, docs, "data query", cfg=cfg_code)


def test_prefix_search_matches_exact_expansion(spark, docs, ix, cfg):
    """search_prefix == score_exact over the terms the prefix expands
    to (SCORING_BOOLEAN rewrite), bit-identical floats; hot prefixes
    trip the TooManyClauses guard."""
    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.bm25 import score_exact, search_prefix

    # 'd' expands to {data} (ROWS vocabulary); 'q' to {query, quit?}
    got = {
        r["doc_id"]: r["score"]
        for r in search_prefix(ix, "da", k=10, cfg=cfg).collect()
    }
    toks = tokenize(docs, cfg)
    vocab = sorted(
        r["term"] for r in toks.select("term").distinct().collect()
        if r["term"].startswith("da")
    )
    exact = {
        r["doc_id"]: r["score"]
        for r in score_exact(
            toks, None, ix.n_docs, ix.avgdl_by_field, vocab, cfg, k=10
        ).collect()
    }
    assert got == exact and len(got) > 0
    with pytest.raises(ValueError):
        # every ROWS term starts with one of a..z — expanding '' is
        # nonsense, but a 1-term cap must trip on any multi-term prefix
        search_prefix(ix, "d", k=5, cfg=cfg, max_expansions=0)
    assert search_prefix(ix, "zzz", k=5, cfg=cfg).count() == 0


def test_fuzzy_search_matches_exact_expansion(spark, docs, ix, cfg):
    """search_fuzzy == score_exact over the edit-distance-expanded
    vocabulary (SCORING_BOOLEAN rewrite), incl. the prefix_length
    pushdown and the max_expansions guard."""
    import re

    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.bm25 import score_exact, search_fuzzy

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    toks = tokenize(docs, cfg)
    vocab = [r["term"] for r in toks.select("term").distinct().collect()]
    expanded = sorted(t for t in vocab if lev("dta", t) <= 1)
    assert "data" in expanded  # the expansion is non-trivial
    got = {
        r["doc_id"]: r["score"]
        for r in search_fuzzy(ix, "dta", max_edits=1, k=10, cfg=cfg).collect()
    }
    exact = {
        r["doc_id"]: r["score"]
        for r in score_exact(
            toks, None, ix.n_docs, ix.avgdl_by_field, expanded, cfg, k=10
        ).collect()
    }
    assert got == exact and len(got) > 0
    # prefix_length=1 restricts the dictionary slice to 'd*'
    got_p = {
        r["doc_id"]: r["score"]
        for r in search_fuzzy(
            ix, "dta", max_edits=1, prefix_length=1, k=10, cfg=cfg
        ).collect()
    }
    exp_p = sorted(t for t in expanded if t.startswith("d"))
    exact_p = {
        r["doc_id"]: r["score"]
        for r in score_exact(
            toks, None, ix.n_docs, ix.avgdl_by_field, exp_p, cfg, k=10
        ).collect()
    }
    assert got_p == exact_p
    with pytest.raises(ValueError):
        search_fuzzy(ix, "dta", max_edits=3, k=5, cfg=cfg, max_expansions=1)
    assert search_fuzzy(ix, "zzzzzzzz", max_edits=1, k=5, cfg=cfg).count() == 0


def test_expansion_cap_trips_before_any_collect(monkeypatch, ix, cfg):
    """The TooManyClauses guard must fire DISTRIBUTED-side: a
    pathological expansion raises before any .collect() pulls the
    expansion to the driver (the cap check runs as a bounded
    distinct-limit-count job)."""
    from pyspark.sql import DataFrame

    from golr_loader_spark.plans.bm25 import search_fuzzy, search_prefix
    from golr_loader_spark.plans.lucene import search_lucene

    def no_collect(self):
        raise AssertionError("collect() called before the cap check")

    monkeypatch.setattr(DataFrame, "collect", no_collect)
    with pytest.raises(ValueError, match="TooManyClauses"):
        search_prefix(ix, "d", k=5, cfg=cfg, max_expansions=0)
    with pytest.raises(ValueError, match="TooManyClauses"):
        search_fuzzy(ix, "dta", max_edits=3, k=5, cfg=cfg, max_expansions=1)
    with pytest.raises(ValueError, match="TooManyClauses"):
        search_lucene(ix, "d*", k=5, cfg=cfg, max_expansions=0)


def test_more_like_this_selection_and_exclusion(spark, docs, ix, cfg):
    """MLT picks the source doc's top tf×idf terms, respects the
    doc-frequency gates, and masks the source doc from results."""
    from golr_loader_spark.plans.bm25 import more_like_this

    got = more_like_this(ix, docs, 0, k=10, cfg=cfg).collect()
    ids = [r["doc_id"] for r in got]
    assert 0 not in ids  # exclude_self
    # doc 0 = "data query spark engine": docs sharing its terms rank
    assert set(ids) >= {2, 5}  # both contain data+query
    with_self = more_like_this(ix, docs, 0, k=10, cfg=cfg, exclude_self=False).collect()
    assert 0 in [r["doc_id"] for r in with_self]  # and it ranks (it matches itself)
    # max_doc_freq gate: every ROWS term has df <= 4; a cap of 0 kills all
    assert (
        more_like_this(ix, docs, 0, k=10, cfg=cfg, max_doc_freq=0).count() == 0
    )
    # max_query_terms=1 keeps only the single MOST interesting term —
    # for doc 0 that is 'engine' (tf=1, df=1 → max idf), which only
    # the source itself contains: with exclude_self the result is
    # empty, without it exactly the source
    assert more_like_this(ix, docs, 0, k=10, cfg=cfg, max_query_terms=1).count() == 0
    assert [
        r["doc_id"]
        for r in more_like_this(
            ix, docs, 0, k=10, cfg=cfg, max_query_terms=1, exclude_self=False
        ).collect()
    ] == [0]
    # missing source doc → empty
    assert more_like_this(ix, docs, 999, k=10, cfg=cfg).count() == 0


def test_boolean_query_semantics(spark, docs, ix, cfg):
    """search_boolean: MUST gates+scores, SHOULD scores, MUST_NOT
    disqualifies; scores equal the exact fold over the doc's matching
    scoring terms."""
    from golr_loader_spark.functions.tokenize import tokenize
    from golr_loader_spark.plans.bm25 import score_exact, search_boolean

    # corpus recap: 0 "data query spark engine", 1 "query data spark",
    # 2 "data query data query runs", 3 "big data  query gap",
    # 4 "unrelated words entirely", 5 "the data query", 6 "a a a"
    got = {
        r["doc_id"]: r["score"]
        for r in search_boolean(
            ix, must=["data"], should=["query"], must_not=["spark"], k=10, cfg=cfg
        ).collect()
    }
    # docs with data but NOT spark: 2, 3, 5
    assert set(got) == {2, 3, 5}
    toks = tokenize(docs, cfg)
    exact = {
        r["doc_id"]: r["score"]
        for r in score_exact(
            toks, None, ix.n_docs, ix.avgdl_by_field, ["data", "query"], cfg, k=10
        ).collect()
        if r["doc_id"] in got
    }
    assert got == exact  # bit-identical
    # MUST with no postings → empty; empty scoring clauses → empty
    assert search_boolean(ix, must=["xyzzyq"], should=["data"], k=5, cfg=cfg).count() == 0
    assert search_boolean(ix, must_not=["data"], k=5, cfg=cfg).count() == 0
    # pure SHOULD + MUST_NOT
    only_not = {
        r["doc_id"]
        for r in search_boolean(
            ix, should=["query"], must_not=["runs", "the"], k=10, cfg=cfg
        ).collect()
    }
    assert only_not == {0, 1, 3}


def test_decode_postings_roundtrip(spark, docs, ix, cfg):
    """decode_postings inverts the block encoder for the chosen terms:
    (doc_id, tf, dl) rows equal the tokenizer's output."""
    from golr_loader_spark.functions.tokenize import tokenize

    flat = decode_postings(ix, ["data", "query"], cfg)
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in flat.collect()
    }
    toks = tokenize(docs, cfg).filter(F.col("term").isin(["data", "query"]))
    want = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in toks.collect()
    }
    assert got == want
