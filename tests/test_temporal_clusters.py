"""Edge-case tests for the q28-q30 operator family: connected
components (duplicate clusters) and the as-of join."""

from __future__ import annotations

from golr_loader_spark.operators.dedup import connected_components
from golr_loader_spark.operators.temporal import asof_join


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_converges_on_cycle(spark):
    pairs = spark.createDataFrame([(5, 6), (6, 7), (7, 5)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")], "k long, ts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 60, 5.0), (1, 40, 3.0)], "k long, ts long, v double"
    )
    return left, right


def test_asof_join_backward_with_exact_match(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, keys=["k"], ts="ts", payload=["v"])
    got = {(r["k"], r["ts"]): (r["asof_v"], r["tag"]) for r in out.collect()}
    # exact-ts right row matches; unmatched keys produce nulls;
    # left payload columns survive the union-marker roundtrip
    assert got == {(1, 100): (7.0, "a"), (1, 50): (3.0, "b"), (2, 10): (None, "c")}


def test_asof_join_strict_inequality(spark):
    left, right = _fixture(spark)
    out = asof_join(left, right, keys=["k"], ts="ts", payload=["v"], allow_exact=False)
    got = {(r["k"], r["ts"]): r["asof_v"] for r in out.collect()}
    assert got == {(1, 100): 5.0, (1, 50): 3.0, (2, 10): None}


def test_asof_join_tiebreak_picks_larger(spark):
    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 90, 11, 1.0), (1, 90, 12, 2.0)], "k long, ts long, rid long, v double"
    )
    out = asof_join(
        left, right, keys=["k"], ts="ts", payload=["rid", "v"], right_tiebreak="rid"
    ).collect()[0]
    assert (out["asof_rid"], out["asof_v"]) == (12, 2.0)


def test_connected_components_chain_logarithmic_rounds(spark):
    # adversarial 100-node chain: min-label propagation needs ~100
    # rounds (and would blow past max_iter=50); the alternating
    # large-star/small-star algorithm must converge in O(log n)
    # alternations with the same min-id labels
    from golr_loader_spark.operators import dedup as dd

    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in dd.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(n)}
    assert dd.LAST_CC_ROUNDS <= 10


def test_connected_components_pair_order_and_selfloop(spark):
    # reversed/duplicated/self pairs: canonicalization must not change
    # the fixpoint
    from golr_loader_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(9, 3), (3, 9), (3, 1), (7, 7)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 3: 1, 9: 1, 7: 7}
