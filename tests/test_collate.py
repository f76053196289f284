"""spellcheck.collate (bm25.collate + serving/sharded twins): Solr's
SpellCheckCollator — dictionary words kept, misspelled words replaced
by popularity-ranked corrections, every rewrite VERIFIED with a
conjunctive hit count, first max_collations hit-producing rewrites in
try order (suggestion-rank sum, then string)."""

from __future__ import annotations

import itertools

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.bm25 import collate, suggest_terms
from golr_loader_spark.plans.build_index import build_index, write_index
from golr_loader_spark.plans.facets import matching_doc_ids

ROWS = [
    (0, "data query spark engine"),
    (1, "query data spark"),
    (2, "data query data query runs"),
    (3, "spark streaming joins"),
    (4, "dart dusty words"),
    (5, "the data query"),
    (6, "sort scan data"),
    (7, "span sort query"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def cfg():
    return IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=2, id_space_bits=3
    )


@pytest.fixture(scope="module")
def ix(spark, cfg):
    return build_index(spark.createDataFrame(ROWS, SCHEMA).cache(), cfg)


def got_rows(df):
    return [(r["collation"], r["hits"]) for r in df.collect()]


def brute(ix, cfg, query, max_collations=3, max_tries=10, k_suggestions=3):
    vocab = sorted({t for _d, txt in ROWS for t in txt.split()})
    words = query.lower().split()
    cands = []
    for w in words:
        if w in vocab:
            cands.append([(w, 0)])
            continue
        sugg = [
            r["term"]
            for r in suggest_terms(ix, w, k=k_suggestions, cfg=cfg).collect()
        ]
        if not sugg:
            return []
        cands.append([(t, r + 1) for r, t in enumerate(sugg)])
    combos = sorted(
        (
            (" ".join(t for t, _r in c), sum(r for _t, r in c))
            for c in itertools.product(*cands)
        ),
        key=lambda x: (x[1], x[0]),
    )[:max_tries]
    out = []
    for phrase, _r in combos:
        hits = matching_doc_ids(ix, phrase, cfg=cfg, mode="and").count()
        if hits:
            out.append((phrase, hits))
        if len(out) == max_collations:
            break
    return out


@pytest.mark.parametrize(
    "q", ["datx quary", "datx quary spark", "dara", "sprk strcaming"]
)
def test_matches_brute_model(spark, ix, cfg, q):
    assert got_rows(collate(ix, q, cfg=cfg)) == brute(ix, cfg, q), q


def test_dictionary_words_kept_and_hits_are_conjunctive(spark, ix, cfg):
    out = got_rows(collate(ix, "datx query", cfg=cfg))
    assert out, "expected at least one collation"
    top, hits = out[0]
    assert top.split()[1] == "query"  # in-dictionary word untouched
    want = matching_doc_ids(ix, top, cfg=cfg, mode="and").count()
    assert hits == want


def test_hopeless_word_yields_nothing(spark, ix, cfg):
    assert got_rows(collate(ix, "data zzzzzzzzq", cfg=cfg)) == []


def test_serving_and_sharded_parity(spark, ix, cfg, tmp_path):
    from golr_loader_spark.plans.serve import LocalSearcher
    from golr_loader_spark.plans.shard import ShardedSearcher, shard_index

    root = str(tmp_path / "ix")
    write_index(ix, root, term_partitions=2)
    ls = LocalSearcher(root, cfg)
    sh = ShardedSearcher(shard_index(spark, root, root + "/sh", 2, cfg=cfg), cfg)
    for q in ("datx quary", "datx quary spark", "dara", "data zzzzzzzzq"):
        want = got_rows(collate(ix, q, cfg=cfg))
        assert ls.collate(q) == want, q
        assert sh.collate(q) == want, q
