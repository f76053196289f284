"""rrf_fuse (Reciprocal Rank Fusion, Cormack et al. 2009): exact
fusion arithmetic, missing-arm zero contribution, symmetric-rank tie
broken by id, top truncation, 3-arm fusion, input validation."""

from __future__ import annotations

import pytest

from golr_loader_spark.operators.similarity import rrf_fuse


def _arm(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def _fused(spark, arms, **kw):
    out = rrf_fuse([_arm(spark, a) for a in arms], **kw)
    return {r["id"]: r.asDict() for r in out.collect()}


def test_fusion_arithmetic_and_missing_arm(spark):
    got = _fused(
        spark,
        [[(1, 1), (2, 2)], [(2, 1), (3, 2)]],
    )
    # doc 2 in both arms, docs 1/3 in one arm each
    assert got[2]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    assert got[1]["rrf_score"] == round(1 / 61, 6)
    assert got[3]["rrf_score"] == round(1 / 62, 6)
    assert got[1]["r1"] is None and got[3]["r0"] is None
    # both-arms doc beats either single-arm doc
    assert got[2]["rrf_score"] > got[1]["rrf_score"] > got[3]["rrf_score"]


def test_symmetric_ranks_tie_break_by_id(spark):
    # (lex 1, vec 2) and (lex 2, vec 1) have equal sums -> id asc wins
    got = rrf_fuse(
        [_arm(spark, [(7, 1), (5, 2)]), _arm(spark, [(5, 1), (7, 2)])],
        top=1,
    ).collect()
    assert len(got) == 1 and got[0]["id"] == 5


def test_top_truncation_and_k(spark):
    got = _fused(
        spark,
        [[(i, i) for i in range(1, 8)]],
        k=10,
        top=3,
    )
    assert set(got) == {1, 2, 3}
    assert got[1]["rrf_score"] == round(1 / 11, 6)


def test_three_arms(spark):
    got = _fused(
        spark,
        [[(1, 1)], [(1, 2)], [(1, 3), (2, 1)]],
    )
    assert got[1]["rrf_score"] == round(1 / 61 + 1 / 62 + 1 / 63, 6)
    assert got[2]["rrf_score"] == round(1 / 61, 6)


def test_empty_arms_rejected(spark):
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
