"""SemDeDup (Abbas et al. 2023): cluster-blocked semantic dedup.

Pins: argmax-cosine assignment with lowest-cid tie-break, within-
cluster cosine ≥ tau marks the HIGHER id as dup (keep-lowest-id),
cross-cluster near-identical vectors are NOT compared (the documented
approximation of the published design), every input vector appears in
the output exactly once.
"""

from __future__ import annotations

import math

import pytest

from golr_loader_spark.operators.similarity import semdedup


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


# two orthogonal "topics" (e1-ish and e2-ish) plus distinct outliers
ROWS = [
    (0, _unit([1.0, 0.02, 0.0, 0.0])),   # topic A — canonical keeper
    (1, _unit([1.0, 0.03, 0.01, 0.0])),  # ≈ dup of 0
    (2, _unit([0.0, 1.0, 0.02, 0.0])),   # topic B — keeper
    (3, _unit([0.01, 1.0, 0.03, 0.0])),  # ≈ dup of 2
    (4, _unit([0.0, 0.0, 1.0, 0.0])),    # unique
    (5, _unit([1.0, 0.02, 0.001, 0.0])), # ≈ dup of 0 (and of 1)
    (6, _unit([0.5, 0.5, 0.5, 0.5])),    # unique diagonal
]
SCHEMA = "vec_id long, embedding array<double>"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


def run(emb, **kw):
    return {
        int(r["vec_id"]): (int(r["cluster"]), bool(r["is_dup"]))
        for r in semdedup(emb, **kw).collect()
    }


def test_semdedup_marks_within_cluster_dups(emb):
    # centroids = first 2 vectors: cid 0 ≈ topic A, cid 1 ≈ topic A too
    # — use explicit orthogonal centroids for a clean split
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    got = run(emb, centroids=cents, tau=0.97)
    assert set(got) == {0, 1, 2, 3, 4, 5, 6}
    # topic A: 0 keeps, 1 and 5 dup; topic B: 2 keeps, 3 dups
    assert got[0] == (0, False)
    assert got[1][1] and got[5][1]
    assert got[2][1] is False and got[3][1] is True
    # uniques survive whatever their cluster
    assert got[4][1] is False and got[6][1] is False
    # clusters: A-ish vectors on cid 0, B-ish on cid 1
    assert got[1][0] == 0 and got[5][0] == 0 and got[3][0] == 1


def test_default_centroids_first_k(emb):
    # default centroids = first 2 vectors by id (both topic-A): all
    # topic-A vectors land on cid 0 (tie to LOWEST cid among equal
    # rounded cosines happens only on exact ties) and dup marking
    # still keeps exactly one per near-identical group
    got = run(emb, n_clusters=2, tau=0.97)
    keepers = [v for v, (_c, d) in got.items() if not d]
    dups = [v for v, (_c, d) in got.items() if d]
    assert 0 in keepers and set(dups) >= {5}
    # every dup has a lower-id same-cluster keeper-or-dup witness
    for v in dups:
        assert any(u < v and got[u][0] == got[v][0] for u in got)


def test_tau_one_marks_nothing(emb):
    got = run(emb, n_clusters=2, tau=1.0001)
    assert all(not d for _c, d in got.values())


def test_cross_cluster_twins_not_compared(spark):
    # two identical vectors forced into different clusters by
    # explicit centroids: SemDeDup does NOT compare across clusters
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])]
    emb2 = spark.createDataFrame(rows, SCHEMA)
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    got = {
        int(r["vec_id"]): (int(r["cluster"]), bool(r["is_dup"]))
        for r in semdedup(emb2, centroids=cents, tau=0.99).collect()
    }
    # same cluster (both argmax to cid 0) → higher id IS a dup here
    assert got[0] == (0, False) and got[1] == (0, True)
