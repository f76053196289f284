"""dsir_weights (DSIR importance resampling, Xie et al. 2023): exact
hand-computed log weights on a tiny corpus; target-like docs outrank
off-domain docs; unigram+bigram feature construction."""

from __future__ import annotations

import math

import pytest

from golr_loader_spark.operators.textstats import dsir_weights

# target docs talk about "a b", the off-domain doc about "c d"
ROWS = [
    (0, "a b", True),
    (1, "a b", True),
    (2, "c d", False),
    (3, "a c", False),  # mixed: one target-ish token, one off
]
SCHEMA = "doc_id long, text string, is_target boolean"

ALPHA = 0.5


def model():
    """Pure-python twin: unigram+bigram counts, smoothing, log ratio."""
    feats = {
        0: ["a", "b", "a b"],
        1: ["a", "b", "a b"],
        2: ["c", "d", "c d"],
        3: ["a", "c", "a c"],
    }
    tgt = {0, 1}
    raw_c: dict = {}
    tgt_c: dict = {}
    for d, fs in feats.items():
        for f in fs:
            raw_c[f] = raw_c.get(f, 0) + 1
            if d in tgt:
                tgt_c[f] = tgt_c.get(f, 0) + 1
    nr = sum(raw_c.values())
    nt = sum(len(feats[d]) for d in tgt)
    v = len(raw_c)
    out = {}
    for d, fs in feats.items():
        w = sum(
            math.log((tgt_c.get(f, 0) + ALPHA) / (nt + ALPHA * v))
            - math.log((raw_c[f] + ALPHA) / (nr + ALPHA * v))
            for f in fs
        )
        out[d] = (len(fs), round(w, 6))
    return out


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        int(r["id"]): (int(r["n_feats"]), float(r["log_weight"]))
        for r in dsir_weights(df).collect()
    }


def test_exact_weights(out):
    assert out == model()


def test_target_docs_outrank(out):
    # pure-target docs > mixed > pure-off-domain
    assert out[0][1] == out[1][1]
    assert out[0][1] > out[3][1] > out[2][1]


def test_feature_counts(out):
    # 2 unigrams + 1 bigram per 2-token doc
    assert all(n == 3 for n, _w in out.values())
