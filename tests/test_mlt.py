"""MoreLikeThis (plans/mlt.py): interesting-term selection gates,
boost normalization, composition with the Lucene executor, seed
exclusion, and serving/sharded parity."""

from __future__ import annotations

import math

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.mlt import (
    mlt_query_string,
    more_like_this,
    more_like_this_doc,
    seed_term_freqs,
    select_interesting_terms,
)

ROWS = [
    (0, "data query spark engine data query"),
    (1, "query data spark planner"),
    (2, "data query data query runs nightly"),
    (3, "spark streaming joins windows"),
    (4, "unrelated words entirely here"),
    (5, "the data query engine"),
    (6, "sort scan data engine"),
    (7, "span sort query planner"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@pytest.fixture(scope="module")
def ix(docs, cfg):
    return build_index(docs, cfg)


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _idf(n, df):
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def test_selection_gates_and_normalization():
    tf = {"a": 3, "b": 2, "c": 1, "dd": 2, "ee": 2, "ff": 2}
    df = {"a": 5, "b": 2, "c": 5, "dd": 1, "ee": 80, "ff": 5}
    sel = dict(
        select_interesting_terms(
            tf, df, 100, min_tf=2, min_df=2, max_df=50, min_word_len=0
        )
    )
    assert "c" not in sel  # tf gate
    assert "dd" not in sel  # df gate
    assert "ee" not in sel  # max_df gate
    assert set(sel) == {"a", "b", "ff"}
    # best term carries boost 1.0; others score-proportional
    scores = {t: tf[t] * _idf(100, df[t]) for t in sel}
    best = max(scores.values())
    for t in sel:
        assert sel[t] == pytest.approx(scores[t] / best, rel=1e-12)
    # word-length gates
    sel2 = dict(
        select_interesting_terms(tf, df, 100, min_tf=2, min_df=2, min_word_len=2)
    )
    assert set(sel2) == {"ee", "ff"}  # 1-char terms and df<2 'dd' gated out
    # max_query_terms keeps the top by (score desc, term asc)
    sel3 = select_interesting_terms(
        tf, df, 100, max_query_terms=1, min_tf=2, min_df=2
    )
    assert len(sel3) == 1 and sel3[0][0] == max(scores, key=lambda t: scores[t])
    # boost=False → all clause boosts 1
    sel4 = select_interesting_terms(tf, df, 100, min_tf=2, min_df=2, boost=False)
    assert all(b == 1.0 for _t, b in sel4)


def test_query_string_round_trips_boosts():
    from golr_loader_spark.plans.lucene import parse_lucene

    sel = [("alpha", 1.0), ("beta", 0.8333333333333334), ("gamma", 1.5e-05)]
    qs = mlt_query_string(sel, "text")
    clauses = parse_lucene(qs)
    got = {n.text: n.boost for _o, n in clauses}
    for t, b in sel:
        assert got[t] == b, (t, got[t], b)  # bit-exact round trip
    assert mlt_query_string([], "text") is None


def test_seed_term_freqs_matches_analyzer():
    assert seed_term_freqs("Data query data", "simple") == {
        "data": 2, "query": 1,
    }


def test_mlt_equals_weighted_lucene_query(ix, cfg):
    """more_like_this == search_lucene on the generated query string
    minus the seed doc — the composition is exact."""
    from golr_loader_spark.plans.lucene import search_lucene
    from golr_loader_spark.plans.mlt import _df_map_distributed

    seed_text = ROWS[0][1]
    tf = seed_term_freqs(seed_text, "simple")
    df = _df_map_distributed(ix, sorted(tf), "text")
    sel = select_interesting_terms(tf, df, ix.n_docs, min_tf=1, min_df=2)
    qs = mlt_query_string(sel, "text")
    want = [
        (d, s)
        for d, s in rows(search_lucene(ix, qs, k=20, cfg=cfg))
        if d != 0
    ][:10]
    got = rows(
        more_like_this(
            ix, seed_text, "text", k=10, seed_doc_id=0, min_tf=1, min_df=2,
            cfg=cfg,
        )
    )
    assert got == want
    assert all(d != 0 for d, _s in got)  # seed excluded
    # similar docs (sharing data/query/engine) rank above unrelated
    ranked = [d for d, _s in got]
    assert 4 not in ranked or ranked.index(4) > 2


def test_mlt_doc_fetches_seed(ix, docs, cfg):
    got = rows(
        more_like_this_doc(
            ix, docs, 2, text_col="text", field="text", k=5, min_tf=1,
            min_df=2, cfg=cfg,
        )
    )
    want = rows(
        more_like_this(
            ix, ROWS[2][1], "text", k=5, seed_doc_id=2, min_tf=1, min_df=2,
            cfg=cfg,
        )
    )
    assert got == want
    with pytest.raises(ValueError, match="not found"):
        more_like_this_doc(ix, docs, 99, cfg=cfg)


def test_mlt_no_terms_survive(ix, cfg):
    assert rows(more_like_this(ix, "zzz qqq", "text", cfg=cfg)) == []
    # min_df high enough to kill every term
    assert (
        rows(more_like_this(ix, ROWS[0][1], "text", min_tf=1, min_df=99, cfg=cfg))
        == []
    )


def test_mlt_serving_and_sharded_parity(tmp_path, spark, ix, docs, cfg):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    root = str(tmp_path / "mlt")
    write_index(ix, root, term_partitions=2, documents=docs, store_fields=["text"])
    ls = LocalSearcher(root, cfg)
    sroots = shard_index(spark, root, str(tmp_path / "mlts"), 2, cfg)
    ss = ShardedSearcher(sroots, cfg)
    for seed in (0, 2, 5):
        want = rows(
            more_like_this(
                ix, ROWS[seed][1], "text", k=5, seed_doc_id=seed, min_tf=1,
                min_df=2, cfg=cfg,
            )
        )
        got_l = ls.more_like_this(doc_id=seed, k=5, min_tf=1, min_df=2)
        got_s = ss.more_like_this(doc_id=seed, k=5, min_tf=1, min_df=2)
        assert got_l == want, ("local", seed)
        assert got_s == want, ("sharded", seed)
    # text-seeded variant needs no stored fetch and keeps every hit
    t = "data query engine"
    want = rows(more_like_this(ix, t, "text", k=5, min_tf=1, min_df=2, cfg=cfg))
    assert ls.more_like_this(text=t, k=5, min_tf=1, min_df=2) == want
    assert ss.more_like_this(text=t, k=5, min_tf=1, min_df=2) == want
