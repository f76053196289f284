"""BPE trainer/encoder: hand-computed merge sequences, determinism,
encode/train consistency, and the classic low/lower/newest corpus."""

from __future__ import annotations

from golr_loader_spark.operators.bpe import (
    _encode_word,
    bpe_encode,
    train_bpe,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merges_match_hand_computation(spark):
    # Sennrich's running example shape: {low:5, lower:2, newest:6,
    # widest:3} — first merges come from 'est</w>' mass
    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    merges = train_bpe(_df(spark, rows), "text", n_merges=4, min_freq=2)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t','</w>') 9,
    # ('l','o') 7, ('o','w') 7 ... tie on 9 → lexicographic: ('e','s')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_training_is_deterministic_and_stops_below_min_freq(spark):
    rows = [(0, "ab ab cd")]
    m1 = train_bpe(_df(spark, rows), "text", n_merges=50, min_freq=2)
    m2 = train_bpe(_df(spark, rows), "text", n_merges=50, min_freq=2)
    assert m1 == m2
    # only 'ab' reaches freq 2; its chars merge then merging stops
    assert ("a", "b") in m1
    assert all(p != ("c", "d") for p in m1)


def test_encode_word_applies_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", "</w>"): 2, ("l", "o"): 3}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert _encode_word("lo", ranks) == ["lo", "</w>"]
    assert _encode_word("xyz", {}) == ["x", "y", "z", "</w>"]


def test_encode_dataframe_roundtrip(spark):
    rows = [(i, "low lower newest") for i in range(4)]
    df = _df(spark, rows)
    merges = train_bpe(df, "text", n_merges=6, min_freq=2)
    out = {r["doc_id"]: r for r in bpe_encode(df, "doc_id", "text", merges).collect()}
    assert len(out) == 4
    toks = out[0]["tokens"]
    assert out[0]["n_bpe_tokens"] == len(toks)
    # detokenization: join and split on the end-of-word marker
    words = "".join(toks).split("</w>")
    assert [w for w in words if w] == ["low", "lower", "newest"]
    # trained merges compress vs raw chars (+EOW per word)
    raw = sum(len(w) + 1 for w in "low lower newest".split())
    assert out[0]["n_bpe_tokens"] < raw
