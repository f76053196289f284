"""Graph closure operators — the Spark-native restatement of the
reference's signature computation (ClosureUtil.getClosure BFS,
/root/reference/src/main/java/org/monarch/golr/ClosureUtil.java:88-114,
and its collectors, ClosureUtil.java:116-161).

The reference walks a Neo4j graph node-at-a-time with a Guava cache
(ClosureUtil.java:50-57); here the closure of EVERY seed is computed
in one set-oriented iterative-join fixpoint — the decorrelated form
(SURVEY.md §4.1 "subquery decorrelation"). Works on any
``edges(src, dst)`` DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_closure(
    edges: DataFrame,
    seeds: DataFrame,
    max_iter: int | None = None,
    direction: str = "out",
) -> DataFrame:
    """All-pairs reachability from each seed → (start, node, depth).

    ``seeds`` must have one column ``id``. depth 0 = the seed itself
    (the reference includes the start node in its closure,
    ClosureTest.java:25-26). depth = BFS discovery depth (min over
    paths). Bounded iteration (J2's ``*0..1``) via ``max_iter``;
    unbounded = loop to fixpoint.

    Each iteration is one equi-join frontier⋈edges + an anti-join
    against the accumulated set (global node uniqueness — the
    reference's ``Uniqueness.NODE_GLOBAL``, ClosureUtil.java:96).
    """
    src, dst = ("src", "dst") if direction == "out" else ("dst", "src")
    acc = seeds.select(
        F.col("id").alias("start"), F.col("id").alias("node"), F.lit(0).alias("depth")
    ).localCheckpoint(eager=True)
    frontier = acc
    depth = 0
    while max_iter is None or depth < max_iter:
        depth += 1
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select("start", F.col(dst).alias("node"), F.lit(depth).alias("depth"))
            .distinct()
        )
        # global-uniqueness pruning: drop nodes already reached
        nxt = nxt.join(acc, ["start", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        if nxt.isEmpty():
            break
        acc = acc.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return acc


def closure_fields(
    closure: DataFrame, labels: DataFrame | None = None
) -> DataFrame:
    """Per-seed golr-style closure field family: the collectors of
    ClosureUtil.java:116-161 (collectIdClosure / collectLabelClosure /
    collectClosureMap) as one aggregation.

    closure: (start, node, depth); labels: (id, label) optional.
    Output per start: closure_ids (BFS order: depth, then node),
    closure_labels (label falls back to id — ClosureUtil.java:70-72),
    closure_map (JSON string id→label, SolrDocUtil.java:86-88).
    """
    c = closure
    if labels is not None:
        c = c.join(labels.withColumnRenamed("id", "node"), "node", "left")
    else:
        c = c.withColumn("label", F.lit(None).cast("string"))
    c = c.withColumn("label", F.coalesce(F.col("label"), F.col("node")))
    agg = c.groupBy("start").agg(
        F.sort_array(F.collect_list(F.struct("depth", "node", "label"))).alias("p")
    )
    return agg.select(
        "start",
        F.col("p.node").alias("closure_ids"),
        F.col("p.label").alias("closure_labels"),
        F.to_json(F.map_from_arrays(F.col("p.node"), F.col("p.label"))).alias(
            "closure_map"
        ),
    )
