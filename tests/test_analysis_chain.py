"""Solr-style analysis chain (functions/analysis.py): stopwords with
position gaps, minimal-english plural stemming, index-time synonym
injection — distributed/query-side/serving-side agreement, plus the
pure-function twins (scalar vs vectorized stemmer)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.analysis import (
    build_chain,
    stem_minimal_english,
    stem_series,
)
from golr_loader_spark.functions.codec import varint_decode
from golr_loader_spark.functions.tokenize import (
    _code_tokens,
    _simple_tokens,
    analyze_phrase,
    analyze_query,
    analyze_with_tf,
    tokenize,
)

STEM_CASES = [
    ("tests", "test"),
    ("queries", "query"),
    ("flies", "fly"),
    ("dogs", "dog"),
    ("ties", "tie"),          # len-4 'ies' takes the plain-s rule
    ("class", "class"),       # *ss kept
    ("status", "status"),     # *us kept
    ("axis", "axis"),         # *is kept
    ("as", "as"),             # too short
    ("its", "its"),           # len 3: untouched
    ("user_data", "user_data"),  # non-alpha: untouched
    ("GETS", "GETS"),         # uppercase: untouched (analyzers lowercase first)
    ("", ""),
]

CHAIN = IndexConfig(
    fields={"text": ("simple", 1.0)},
    stopwords=("the", "a"),
    stem="minimal_english",
    synonyms=(("big", "large"),),
).chain


def _positions(blob) -> list[int]:
    return list(np.cumsum(varint_decode(bytes(blob))))


def test_stemmer_rules_scalar_and_vector_twin_agree():
    for w, want in STEM_CASES:
        assert stem_minimal_english(w) == want, w
    got = stem_series(pd.Series([w for w, _ in STEM_CASES]))
    assert list(got) == [want for _, want in STEM_CASES]


def test_stem_sql_twin_matches_python():
    import duckdb

    from golr_loader_spark.functions.analysis import STEM_SQL

    words = [w for w, _ in STEM_CASES if w] + [
        "mass", "vius", "basis", "bases", "companies", "applies", "gas",
        "miss", "abcs", "données", "x1s", "ss", "ies", "aies",
    ]
    expr = STEM_SQL.format(t="w")
    rows = duckdb.sql(
        f"SELECT w, {expr} AS s FROM (SELECT unnest(?) AS w)", params=[words]
    ).fetchall()
    for w, s in rows:
        assert s == stem_minimal_english(w), (w, s)


def test_chain_noop_when_unconfigured():
    assert IndexConfig().chain is None
    # min_term_len alone does not activate a chain (outer filter owns it)
    assert IndexConfig(min_term_len=3).chain is None


def test_build_chain_rejects_bad_config():
    with pytest.raises(ValueError):
        build_chain((), "porter", (), 1)
    with pytest.raises(ValueError):
        build_chain((), None, (("big", "very large"),), 1)  # multi-word
    with pytest.raises(ValueError):
        build_chain((), None, (("big", "user_data"),), 1)  # compound


def test_simple_analyzer_chain_positions_and_dl():
    out = _simple_tokens(
        pd.Series(["the big tests of queries"]), positional=True, chain=CHAIN
    )
    by_term = out.set_index("term")
    # 'the' dropped; 'of' kept (not a stopword here)... 'of' IS kept
    assert set(by_term.index) == {"big", "large", "test", "of", "query"}
    # stopword gap: positions are the ORIGINAL slots
    assert _positions(by_term.loc["big", "positions"]) == [1]
    assert _positions(by_term.loc["large", "positions"]) == [1]  # posinc=0
    assert _positions(by_term.loc["test", "positions"]) == [2]
    assert _positions(by_term.loc["query", "positions"]) == [4]
    # dl counts kept + injected tokens (big, large, test, of, query)
    assert set(by_term["dl"]) == {5}
    # positional and non-positional agree on tf/dl
    flat = _simple_tokens(
        pd.Series(["the big tests of queries"]), positional=False, chain=CHAIN
    )
    a = flat.sort_values(["pos", "term"]).reset_index(drop=True)
    b = (
        out[["pos", "term", "tf", "dl"]]
        .sort_values(["pos", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_code_analyzer_chain_stems_subwords_and_injects_synonyms():
    out = _code_tokens(
        pd.Series(["getUserTests the BigCo"]), positional=True, chain=CHAIN
    )
    terms = set(out["term"])
    # subword 'tests' stems to 'test'; compound 'getusertests' keeps its
    # trailing s? no — it is pure alpha after lowercasing, so it stems too
    assert "test" in terms and "tests" not in terms
    assert "getusertest" in terms and "getusertests" not in terms
    assert "the" not in terms
    assert "large" in terms  # injected from 'big' (BigCo subword)
    by_term = out.set_index("term")
    assert _positions(by_term.loc["big", "positions"]) == _positions(
        by_term.loc["large", "positions"]
    )


def test_query_side_matches_index_side():
    assert analyze_query("the big tests", "simple", CHAIN) == ["big", "test"]
    # synonyms are NOT expanded query-side (index-time injection)
    assert analyze_query("large", "simple", CHAIN) == ["large"]
    assert analyze_phrase("the big tests", "simple", 1, CHAIN) == [
        ("big", 1),
        ("test", 2),
    ]
    assert analyze_with_tf("tests test the", "simple", CHAIN) == {"test": 2}


def test_config_roundtrip_carries_chain():
    cfg = IndexConfig(
        stopwords=("the",), stem="minimal_english", synonyms=(("big", "large"),)
    )
    back = IndexConfig.from_dict(cfg.to_dict())
    assert back == cfg
    assert back.chain is not None
    assert back.chain.transform("tests") == "test"
    assert back.chain.transform("the") is None


@pytest.fixture(scope="module")
def chain_corpus(spark):
    rows = [
        (0, "the big data tables"),        # big → +large; tables → table
        (1, "a large query engine"),       # large → +big
        (2, "small fast scans the table"), # scans → scan
        (3, "queries run on tables"),
        (4, "the the the big big"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def chain_cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)},
        id_space_bits=3,
        bucket_bits=2,
        positions=True,
        stopwords=("the", "a"),
        stem="minimal_english",
        synonyms=(("big", "large"),),
    )


@pytest.fixture(scope="module")
def chain_index(spark, chain_corpus, chain_cfg):
    from golr_loader_spark.plans.build_index import build_index

    return build_index(chain_corpus, chain_cfg)


def test_distributed_search_through_chain(spark, chain_corpus, chain_cfg, chain_index):
    from golr_loader_spark.plans.bm25 import search

    # 'larges' stems to 'large'; docs 0/1/4 match via injection or text
    hits = {
        r["doc_id"]
        for r in search(chain_index, "larges", k=10, cfg=chain_cfg).collect()
    }
    assert hits == {0, 1, 4}
    # stopword-only query matches nothing
    assert search(chain_index, "the a", k=10, cfg=chain_cfg).count() == 0
    # stemmed query term matches stemmed index term
    hits = {
        r["doc_id"]
        for r in search(chain_index, "tables", k=10, cfg=chain_cfg).collect()
    }
    assert hits == {0, 2, 3}


def test_phrase_across_stopword_gap(spark, chain_corpus, chain_cfg, chain_index):
    from golr_loader_spark.plans.phrase import phrase_search_positional

    # doc 2: 'small fast scans the table' → positions small@0 fast@1
    # scan@2 [gap]@3 table@4. The phrase 'scans the table' analyzes to
    # scan@0, table@2 — the exact gap must be enforced across the
    # dropped stopword.
    hits = {
        r["doc_id"]
        for r in phrase_search_positional(
            chain_index, "scans the table", k=10, cfg=chain_cfg
        ).collect()
    }
    assert hits == {2}
    # without the gap the phrase must NOT match
    assert (
        phrase_search_positional(
            chain_index, "scans table", k=10, cfg=chain_cfg
        ).count()
        == 0
    )
    # synonym injection carries positions: 'large data' matches doc 0
    # ('big data' indexed, large injected at big's slot)
    hits = {
        r["doc_id"]
        for r in phrase_search_positional(
            chain_index, "large data", k=10, cfg=chain_cfg
        ).collect()
    }
    assert hits == {0}


def test_serving_parity_through_manifest_roundtrip(
    spark, chain_corpus, chain_cfg, chain_index, tmp_path
):
    from golr_loader_spark.plans.bm25 import search
    from golr_loader_spark.plans.build_index import write_index
    from golr_loader_spark.plans.serve import LocalSearcher

    root = str(tmp_path / "chainix")
    write_index(chain_index, root, term_partitions=2)
    # cfg restored from the persisted config.json — the chain rides it
    ls = LocalSearcher(root)
    assert ls.cfg == chain_cfg
    assert ls.cfg.chain is not None
    for q in ["larges", "tables", "big data", "the", "queries run"]:
        local = ls.search(q, k=10)
        dist = [
            (r["doc_id"], r["score"])
            for r in search(chain_index, q, k=10, cfg=chain_cfg).collect()
        ]
        assert local == dist, q


def test_tokenize_df_chain_matches_pandas(spark, chain_corpus, chain_cfg):
    got = (
        tokenize(chain_corpus, chain_cfg)
        .select("doc_id", "term", "tf", "dl")
        .toPandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    texts = {r["doc_id"]: r["text"] for r in chain_corpus.collect()}
    pdf = pd.Series([texts[i] for i in sorted(texts)])
    want = _simple_tokens(pdf, positional=True, chain=chain_cfg.chain)
    want = want.rename(columns={"pos": "doc_id"})[["doc_id", "term", "tf", "dl"]]
    want["doc_id"] = want["doc_id"].map(dict(enumerate(sorted(texts))))
    want = want.sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int32", "dl": "int32"}),
        want.astype({"tf": "int32", "dl": "int32"}),
    )
