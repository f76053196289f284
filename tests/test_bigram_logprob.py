"""bigram_logprob (CCNet-style perplexity-proxy scoring): exact
hand-computed probabilities on a tiny corpus; docs without bigrams
are excluded; ranking separates typical from garbled text."""

from __future__ import annotations

import math

import pytest

from golr_loader_spark.operators.textstats import bigram_logprob

ROWS = [
    (0, "a b a b"),   # bigrams (a,b),(b,a),(a,b)
    (1, "a b c"),     # (a,b),(b,c)
    (2, "c"),         # no bigrams — excluded
]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        int(r["id"]): (int(r["n_bigrams"]), float(r["avg_logprob"]))
        for r in bigram_logprob(df).collect()
    }


def test_exact_probabilities(out):
    # corpus: C(a,b)=3 C(b,a)=1 C(b,c)=1; C(a·)=3 C(b·)=2; V=3; α=.5
    p_ab = math.log(3.5 / 4.5)
    p_ba = math.log(1.5 / 3.5)
    p_bc = math.log(1.5 / 3.5)
    assert set(out) == {0, 1}          # doc 2 has no bigrams
    assert out[0][0] == 3 and out[1][0] == 2
    assert out[0][1] == round((2 * p_ab + p_ba) / 3, 6)
    assert out[1][1] == round((p_ab + p_bc) / 2, 6)


def test_garbled_text_scores_lower(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    rows.append((99, "zxq vvk qqj pla zxo mmt"))
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        int(r["id"]): float(r["avg_logprob"])
        for r in bigram_logprob(df).collect()
    }
    assert got[99] < got[0]            # rare bigrams → lower log-prob
