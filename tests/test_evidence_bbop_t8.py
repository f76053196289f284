"""BBOP evidence-graph structure + T8 multi-branch union traversal.

The evidence fixture graph re-encodes the association subgraph of
GolrLoadSetup.populateGraph (/root/reference/src/test/java/org/monarch/
golr/GolrLoadSetup.java:57-64: a_assn —has_subject→ d, —has_object→ e,
—RO_0002558→ a_evidence). The T8 graph exercises all three branches of
disease.cypher:1-12.
"""

from __future__ import annotations

import json

import pytest

from golr_loader_spark.operators.golr_docs import (
    disease_style_lookup,
    evidence_bbop_graph,
)

CURIE_MAP = {"X": "http://x.org/a_"}

HAS_EVIDENCE = "http://purl.obolibrary.org/obo/RO_0002558"
HAS_SUBJECT = "http://purl.org/oban/association_has_subject"
HAS_OBJECT = "http://purl.org/oban/association_has_object"


def test_evidence_graph_is_bbop_shaped(spark):
    assoc_edges = spark.createDataFrame(
        [
            ("X:d", "X:e", "http://x.org/a_assn", HAS_SUBJECT, "http://x.org/a_d"),
            ("X:d", "X:e", "http://x.org/a_assn", HAS_OBJECT, "http://x.org/a_e"),
            ("X:d", "X:e", "http://x.org/a_assn", HAS_EVIDENCE, "http://x.org/a_evidence"),
        ],
        "subject string, object string, sub_iri string, pred_iri string, obj_iri string",
    )
    nodes = spark.createDataFrame(
        [
            ("http://x.org/a_assn", None, 0.8),
            ("http://x.org/a_d", "D label", None),
            ("http://x.org/a_e", None, None),
            ("http://x.org/a_evidence", "traceable author statement", None),
        ],
        "iri string, label string, confidence_score double",
    )
    out = evidence_bbop_graph(assoc_edges, nodes, CURIE_MAP).collect()
    assert len(out) == 1
    blob = json.loads(out[0]["evidence_graph"])

    # top-level BBOP shape: nodes[], edges[], meta{}
    assert set(blob) == {"nodes", "edges", "meta"}
    assert blob["meta"] == {}

    by_id = {n["id"]: n for n in blob["nodes"]}
    assert set(by_id) == {"X:assn", "X:d", "X:e", "X:evidence"}
    # node props projected to {label→lbl, confidence_score in meta};
    # everything else excluded (EvidenceProcessor.java:78-88)
    assert by_id["X:d"]["lbl"] == "D label" and by_id["X:d"].get("meta", {}) == {}
    assert by_id["X:assn"]["meta"] == {"confidence_score": 0.8}
    assert by_id["X:e"].get("meta", {}) == {}

    edges = {(e["sub"], e["pred"], e["obj"]) for e in blob["edges"]}
    assert edges == {
        ("X:assn", HAS_SUBJECT, "X:d"),
        ("X:assn", HAS_OBJECT, "X:e"),
        ("X:assn", HAS_EVIDENCE, "X:evidence"),
    }
    # edge lists sorted deterministically
    trip = [(e["sub"], e["pred"], e["obj"]) for e in blob["edges"]]
    assert trip == sorted(trip)


def test_evidence_graph_meta_query_tag(spark):
    assoc_edges = spark.createDataFrame(
        [("s", "o", "http://x.org/a_x", "p", "http://x.org/a_y")],
        "subject string, object string, sub_iri string, pred_iri string, obj_iri string",
    )
    nodes = spark.createDataFrame(
        [("http://x.org/a_x", None, None)],
        "iri string, label string, confidence_score double",
    )
    blob = json.loads(
        evidence_bbop_graph(assoc_edges, nodes, CURIE_MAP, meta_query="disease.cypher")
        .collect()[0]["evidence_graph"]
    )
    # EvidenceProcessor.java:89-92
    assert blob["meta"] == {"query": "monarch:cypher/disease.cypher"}


# ------------------------------------------------------------------ T8

# graph: three subjects, one disease each reachable via a DIFFERENT
# branch of disease.cypher, plus a decoy non-disease target
T8_NODES = [
    # (id, iri, labels)
    (1, "http://x.org/gene1", ["gene"]),
    (2, "http://x.org/variant1", ["variant"]),          # –410→ gene1
    (3, "http://x.org/disease1", ["disease"]),          # branch 1 hit
    (4, "http://x.org/gene2", ["gene"]),
    (5, "http://x.org/variant2", ["variant"]),
    (6, "http://x.org/genotype2", ["genotype"]),        # –BFO51→ variant2
    (7, "http://x.org/disease2", ["disease"]),          # branch 2 hit
    (8, "http://x.org/gene3", ["gene"]),
    (9, "http://x.org/variant3", ["variant"]),
    (10, "http://x.org/genotype3", ["genotype"]),
    (11, "http://x.org/person3", ["person"]),           # –222→ genotype3
    (12, "http://x.org/disease3", ["disease"]),         # branch 3 hit
    (13, "http://x.org/not_a_disease", ["phenotype"]),  # label-filtered out
    (14, "http://x.org/variant2b", ["variant"]),        # sameAs variant2
]

T8_EDGES = [
    # branch 1: gene1 ← variant1 → disease1
    (2, 1, "GENO:0000410"),
    (2, 3, "RO:0002200"),
    (2, 13, "RO:0002200"),  # decoy: right edge, wrong label
    # branch 2: gene2 ← variant2 (sameAs variant2b) ← genotype2 → disease2
    (5, 4, "GENO:0000410"),
    (5, 14, "sameAs"),
    (6, 14, "BFO:0000051"),  # genotype2 has-part variant2b
    (6, 7, "RO:0002610"),
    # branch 3: gene3 ← variant3 ← genotype3 ← person3 → disease3
    (9, 8, "GENO:0000410"),
    (10, 9, "BFO:0000051"),
    (11, 10, "GENO:0000222"),
    (11, 12, "RO:0002200"),
]


@pytest.fixture(scope="module")
def t8_graph(spark):
    nodes = spark.createDataFrame(T8_NODES, "id long, iri string, labels array<string>")
    edges = spark.createDataFrame(T8_EDGES, "src long, dst long, type string")
    return nodes, edges


def test_disease_lookup_covers_all_three_branches(spark, t8_graph):
    nodes, edges = t8_graph
    seeds = spark.createDataFrame([(1,), (4,), (8,)], "id long")
    got = {
        (r["start"], r["target_iri"])
        for r in disease_style_lookup(nodes, edges, seeds).collect()
    }
    assert got == {
        (1, "http://x.org/disease1"),   # branch 1 (direct variant edge)
        (4, "http://x.org/disease2"),   # branch 2 (genotype via sameAs+BFO51)
        (8, "http://x.org/disease3"),   # branch 3 (person)
    }


def test_disease_lookup_union_is_distinct(spark, t8_graph):
    """A target reachable via several branches appears once (UNION
    semantics of disease.cypher, not UNION ALL)."""
    nodes, edges = t8_graph
    extra = spark.createDataFrame(
        [(6, 3, "RO:0002200"), (2, 14, "sameAs"), (6, 14, "BFO:0000051")],
        "src long, dst long, type string",
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    got = disease_style_lookup(nodes, edges.unionAll(extra), seeds).collect()
    pairs = [(r["start"], r["target_iri"]) for r in got]
    assert len(pairs) == len(set(pairs))
    assert (1, "http://x.org/disease1") in set(pairs)
