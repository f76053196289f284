"""Exact-substring dedup (Lee et al. 2021 EXACTSUBSTR) vs a
brute-force python model: duplicated k-token windows, keep-first
canonical policy, per-doc interval merge, and the span-cut rewrite."""

from __future__ import annotations

import pytest

from golr_loader_spark.operators.dedup import (
    exact_substring_dedup,
    exact_substring_spans,
)


def brute_spans(texts: dict[int, str], k: int, keep_first: bool = True):
    """Reference model: every k-window occurrence, duplicated hashes,
    drop the (id, pos)-min occurrence, merge intervals per doc."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for did in sorted(texts):
        toks = texts[did].lower().split(" ")
        for pos in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[pos: pos + k]), []).append((did, pos))
    dup: dict[int, list[tuple[int, int]]] = {}
    for gram, places in occ.items():
        if len(places) < 2:
            continue
        first = min(places)
        for did, pos in places:
            if keep_first and (did, pos) == first:
                continue
            dup.setdefault(did, []).append((pos, pos + k))
    merged = {}
    for did, ivals in dup.items():
        out = []
        for s, e in sorted(ivals):
            if out and s <= out[-1][1]:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([s, e])
        merged[did] = [(s, e) for s, e in out]
    return merged


CORPUS = {
    0: "a b c d e f g h i j",
    1: "x y a b c d e f q r s t",          # shares a 6-gram with doc 0
    2: "x y a b c d e f q r s t",          # full copy of doc 1
    3: "one two three four five six seven",
    4: "p q one two three four five six z a b c d e f w",
    5: "m m m m m m m m m m m m",          # internal repetition
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "doc_id long, text string"
    )


@pytest.mark.parametrize("k", [3, 5, 6])
def test_spans_match_brute_force(spark, docs_df, k):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in exact_substring_spans(docs_df, k=k).collect()
    }
    want = {
        (did, s, e, e - s)
        for did, ivals in brute_spans(CORPUS, k).items()
        for s, e in ivals
    }
    assert got == want


def test_keep_first_false_marks_every_occurrence(spark, docs_df):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(docs_df, k=5, keep_first=False).collect()
    }
    want = {
        (did, s, e)
        for did, ivals in brute_spans(CORPUS, 5, keep_first=False).items()
        for s, e in ivals
    }
    assert got == want
    # the canonical occurrences are marked too, so keep_first=False
    # output strictly covers the keep_first=True output
    kept = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(docs_df, k=5).collect()
    }
    for did, s, e in kept:
        assert any(d == did and s >= s2 and e <= e2 for d, s2, e2 in want)


def test_dedup_cuts_spans_and_keeps_first(spark, docs_df):
    out = {
        r["doc_id"]: r
        for r in exact_substring_dedup(docs_df, k=5).collect()
    }
    spans = brute_spans(CORPUS, 5)
    for did, text in CORPUS.items():
        toks = text.split(" ")
        cut = {
            i for s, e in spans.get(did, []) for i in range(s, e)
        }
        want_text = " ".join(t for i, t in enumerate(toks) if i not in cut)
        r = out[did]
        assert r["text"] == want_text, did
        assert r["total_tokens"] == len(toks)
        assert r["dup_tokens"] == len(cut)
    # doc 1 is the first copy of the 1<->2 pair: its copy-span
    # survives in full while doc 2 loses the whole duplicated range
    assert out[1]["dup_tokens"] < out[2]["dup_tokens"]
    assert out[2]["dup_tokens"] == len(CORPUS[2].split(" "))


def test_no_duplicates_passthrough(spark):
    df = spark.createDataFrame(
        [(0, "entirely unique words only here"),
         (1, "another completely different sentence")],
        "doc_id long, text string",
    )
    assert exact_substring_spans(df, k=3).count() == 0
    rows = {r["doc_id"]: r for r in exact_substring_dedup(df, k=3).collect()}
    assert rows[0]["text"] == "entirely unique words only here"
    assert rows[0]["dup_tokens"] == 0
