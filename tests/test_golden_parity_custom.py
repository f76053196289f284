"""Parity with fixtures/customClosureQuery.json — the reference's
richest golden doc (GolrLoaderTest.java:95-106): gene→anatomy match
with a custom object-closure spec, equivalence closures, gene and
ortholog traversals. Closure arrays here are asserted as SETS — the
reference dedups through a HashSet (SolrDocUtil.java:72-76) and
JSONAssert NON_EXTENSIBLE is order-insensitive.

Graph: the anatomy/gene half of GolrLoadSetup.populateGraph
(GolrLoadSetup.java:66-113), tabular re-encoding per FIXTURES.md B.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golr_loader_spark.operators.golr_docs import (
    closure_quints,
    equivalence_closure,
    gene_closure,
    ortholog_closure,
)

UB = "http://purl.obolibrary.org/obo/UBERON_"
NODES = [
    (10, "http://x.org/gene", None, ["gene"]),            # gene (w/ ortholog)
    (11, "http://x.org/gene_ortholog", None, ["gene"]),
    (12, "http://x.org/gene", None, ["gene"]),            # foo (same iri — reference quirk)
    (13, f"{UB}0001890", None, ["forebrain", "anatomical entity"]),
    (14, "x:forebrain", None, []),
    (15, f"{UB}0000955", None, ["brain", "anatomical entity"]),
    (16, f"{UB}0001049", None, ["neural tube", "anatomical entity"]),
    (17, f"{UB}0000033", None, ["head", "anatomical entity"]),
    (18, "http://x.org/body_part", None, ["body part", "anatomical entity"]),
    (19, f"{UB}0001062", None, ["anatomical entity"]),
]
EDGES = [
    (10, 11, "http://purl.obolibrary.org/obo/RO_HOM0000017", None),
    (12, 13, "http://purl.obolibrary.org/obo/RO_0002206", "http://purl.obolibrary.org/obo/RO_0002206"),
    (13, 14, "equivalentClass", None),
    (13, 15, "http://purl.obolibrary.org/obo/BFO_0000050", "http://purl.obolibrary.org/obo/BFO_0000050"),
    (15, 16, "http://purl.obolibrary.org/obo/RO_0002202", None),
    (15, 17, "http://purl.obolibrary.org/obo/BFO_0000050", None),
    (17, 18, "subClassOf", None),
    (18, 19, "subClassOf", None),
]

OBJECT_CLOSURE_SPEC = [
    "subClassOf",
    "http://purl.obolibrary.org/obo/BFO_0000050",
    "equivalentClass",
    "sameAs",
]


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        NODES, "id long, iri string, label string, labels array<string>"
    )
    edges = spark.createDataFrame(EDGES, "src long, dst long, type string, iri string")
    return nodes, edges


def test_object_closure_with_custom_spec(spark, graph):
    nodes, edges = graph
    seeds = spark.createDataFrame([(13,)], "id long")  # object = forebrain
    quint = closure_quints(nodes, edges, seeds, OBJECT_CLOSURE_SPEC, {}).collect()[0]
    # fixture object_closure (set): forebrain, x:forebrain, brain, head,
    # body_part, anatomical entity — neural tube excluded (RO_0002202
    # not in the closure spec)
    assert sorted(quint["closure"]) == sorted(
        [
            f"{UB}0001890",
            "x:forebrain",
            f"{UB}0000955",
            f"{UB}0000033",
            "http://x.org/body_part",
            f"{UB}0001062",
        ]
    )
    assert f"{UB}0001049" not in quint["closure"]
    assert quint["curie"] == f"{UB}0001890"  # seed first (BFS order)


def test_equivalence_closures(spark, graph):
    nodes, edges = graph
    obj = equivalence_closure(
        nodes, edges, spark.createDataFrame([(13,)], "id long")
    ).collect()[0]
    assert sorted(obj["eq"]) == sorted([f"{UB}0001890", "x:forebrain"])
    subj = equivalence_closure(
        nodes, edges, spark.createDataFrame([(12,)], "id long")
    ).collect()[0]
    assert subj["eq"] == ["http://x.org/gene"]


def test_ortholog_and_gene_traversals(spark, graph):
    nodes, edges = graph
    orth = ortholog_closure(
        nodes, edges, spark.createDataFrame([(10,)], "id long")
    ).collect()
    assert len(orth) == 1
    assert orth[0]["ortholog_closure"] == ["http://x.org/gene_ortholog"]
    # foo (12) has no homology edges → no row (reference emits nothing)
    assert (
        ortholog_closure(nodes, edges, spark.createDataFrame([(12,)], "id long")).count()
        == 0
    )
    g = gene_closure(nodes, edges, spark.createDataFrame([(12,)], "id long")).collect()[0]
    assert g["gene_iri"] == "http://x.org/gene"  # the seed itself is the gene


def test_anatomy_path_join_shape(spark, graph):
    """The MATCH (subject:gene)-[:RO_0002206]->(object:`anatomical
    entity`) pattern as a DataFrame join (J1)."""
    nodes, edges = graph
    subj = nodes.filter(F.array_contains("labels", "gene")).select(
        F.col("id").alias("sid"), F.col("iri").alias("subject")
    )
    obj = nodes.filter(F.array_contains("labels", "anatomical entity")).select(
        F.col("id").alias("oid"), F.col("iri").alias("object")
    )
    match = (
        edges.filter(F.col("type") == "http://purl.obolibrary.org/obo/RO_0002206")
        .join(subj, F.col("src") == F.col("sid"))
        .join(obj, F.col("dst") == F.col("oid"))
        .select("subject", "object")
        .distinct()
    )
    rows = match.collect()
    assert len(rows) == 1
    assert rows[0]["subject"] == "http://x.org/gene"
    assert rows[0]["object"] == f"{UB}0001890"


def test_taxon_and_chromosome_traversals(spark):
    """T4/T5 on a SimpleLoadSetup-like mini graph
    (SimpleLoadSetup.java:41-76: gene SHH —sameAs→ eq, gene —inTaxon→
    human; variant —location→ chr1 region —reference→ chr1)."""
    from golr_loader_spark.operators.golr_docs import (
        IN_TAXON,
        chromosome_closure,
        taxon_closure,
    )

    nodes = spark.createDataFrame(
        [
            (1, "http://x.org/shh", "SHH", ["gene"]),
            (2, "http://x.org/shh_eq", None, ["gene"]),
            (3, "http://x.org/human", "human", ["taxon"]),
            (4, "http://x.org/variant1", None, ["variant"]),
            (5, "http://x.org/region1", None, ["region"]),
            (6, "http://x.org/chr1", "chr1", ["chromosome"]),
        ],
        "id long, iri string, label string, labels array<string>",
    )
    edges = spark.createDataFrame(
        [
            (1, 2, "sameAs", None),
            (2, 3, IN_TAXON, None),      # taxon reached via the equivalent
            (4, 1, "variant", None),      # variant → gene (walkable)
            (4, 5, "location", None),
            (5, 6, "reference", None),
        ],
        "src long, dst long, type string, iri string",
    )
    # taxon of the SEED gene: walk sameAs to the equivalent, then the
    # final inTaxon edge lands on human
    t = taxon_closure(nodes, edges, spark.createDataFrame([(1,)], "id long")).collect()
    assert len(t) == 1 and t[0]["taxon_closure"] == ["http://x.org/human"]
    # a node with no inTaxon anywhere in its closure → no row
    assert taxon_closure(nodes, edges, spark.createDataFrame([(5,)], "id long")).count() == 0

    chrom_set = nodes.filter("array_contains(labels, 'chromosome')").select("id")
    c = chromosome_closure(
        nodes, edges, spark.createDataFrame([(4,)], "id long"), chrom_set
    ).collect()
    assert len(c) == 1 and c[0]["chromosome_closure"] == ["http://x.org/chr1"]
