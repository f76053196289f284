"""gopher_rules (Gopher A1.1 + C4 heuristic filters): hand-computed
features on multi-line fixtures — bullet/ellipsis/terminal-punct line
fractions, symbol ratio, distinct-stopword hits, sentence count,
lorem-ipsum flag, and both pass flags including every threshold
direction."""

from __future__ import annotations

import pytest

from golr_loader_spark.operators.textstats import gopher_rules

GOOD = " ".join(
    ["the data and table that have rows with keys be of use"] * 5
) + "."
# 5×12 words + trailing '.' on the last word: 60 words, all alpha,
# 7 distinct Gopher stopwords, one sentence char
BULLETY = "- one thing\n- two thing\n- three thing\nplain line"
ELLIPSY = "first part...\nsecond part...\nthird line here"
SYMBOLS = "a # b # c ... d"  # 2 '#' + 1 '...' over 7 words
LOREM = "Lorem ipsum dolor sit. Amet consectetur! Adipiscing elit?"

ROWS = [
    (0, GOOD),
    (1, BULLETY),
    (2, ELLIPSY),
    (3, SYMBOLS),
    (4, LOREM),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {int(r["id"]): r.asDict() for r in gopher_rules(df, "doc_id", "text").collect()}


def test_word_features(out):
    g = out[0]
    assert g["n_words"] == 60
    assert g["alpha_word_frac"] == 1.0
    assert g["n_stop_hits"] == 7  # the and that have with be of
    assert g["n_sentences"] == 1


def test_gopher_pass_good_doc(out):
    # 60 words, mean len in [3,10], no symbols, no bullets, all-alpha,
    # 7 stopwords -> passes Gopher; only 1 sentence -> fails C4
    assert out[0]["gopher_pass"] == 1
    assert out[0]["c4_pass"] == 0


def test_bullet_lines(out):
    b = out[1]
    assert b["bullet_line_frac"] == 0.75  # 3 of 4 lines
    assert b["ellipsis_line_frac"] == 0.0
    assert b["gopher_pass"] == 0  # too few words


def test_ellipsis_lines(out):
    e = out[2]
    assert e["ellipsis_line_frac"] == round(2 / 3, 6)
    assert e["term_punct_line_frac"] == round(2 / 3, 6)  # '...' ends '.'


def test_symbol_ratio(out):
    s = out[3]
    assert s["n_words"] == 7
    assert s["symbol_ratio"] == round(3 / 7, 6)  # 2 hashes + 1 ellipsis


def test_c4_lorem_and_sentences(out):
    l = out[4]
    assert l["has_lorem"] == 1
    assert l["n_sentences"] == 3  # . ! ?
    assert l["c4_pass"] == 0  # lorem kills it despite 3 sentences
    # a no-lorem doc with >=3 sentence chars passes C4
    assert out[2]["n_sentences"] == 6  # ELLIPSY: two '...' runs
    assert out[2]["c4_pass"] == 1


def test_terminal_punct(out):
    assert out[4]["term_punct_line_frac"] == 1.0  # one line ending '?'
