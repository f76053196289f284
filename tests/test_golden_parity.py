"""Golden-output parity with the reference's own fixtures.

The graph below is the tabular re-encoding (FIXTURES.md B) of
GolrLoadSetup.populateGraph (/root/reference/src/test/java/org/monarch/
golr/GolrLoadSetup.java:37-114; addRelationship(parent, child) creates
a child→parent edge). Expected values are the reference's golden JSON
fixtures (src/test/resources/fixtures/*.json), asserted with the same
semantics as its JSONAssert NON_EXTENSIBLE checks: closure arrays
order-insensitive at minimum — we assert the stronger BFS order, which
ClosureTest.java:25-26 pins — and closure maps compared as parsed
dicts.
"""

from __future__ import annotations

import json

import pytest

from golr_loader_spark.operators.golr_docs import (
    golr_flatten,
    relationship_closure,
)

CURIE_MAP = {"X": "http://x.org/a_"}

# node id → (iri, label, labels)
NODES = [
    (1, "http://x.org/a_a", "A", ["Class"]),
    (2, "http://x.org/a_b", None, ["Class"]),
    (3, "http://x.org/a_c", "C", ["Class"]),
    (4, "http://x.org/a_d", None, ["Class"]),
    (5, "http://x.org/a_e", None, ["Class"]),
    (6, "http://x.org/a_f", None, ["Class"]),
    (7, "_:anon", None, ["Class"]),
    (8, "http://x.org/a_causes", None, ["Class"]),
    (9, "http://x.org/a_causes_parent", None, ["Class"]),
]

# child→parent edges (src, dst, type, iri)
EDGES = [
    (2, 1, "subClassOf", None),     # a_b ⊑ a_a
    (3, 2, "subClassOf", None),     # a_c ⊑ a_b
    (4, 3, "type", None),           # a_d : a_c
    (4, 5, "CAUSES", "http://x.org/a_causes"),
    (5, 6, "partOf", None),         # a_e partOf a_f
    (2, 7, "subClassOf", None),     # a_b ⊑ _:anon  (pruned)
    (8, 9, "subPropertyOf", None),  # a_causes ⊑p a_causes_parent
]


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        NODES, "id long, iri string, label string, labels array<string>"
    )
    edges = spark.createDataFrame(EDGES, "src long, dst long, type string, iri string")
    return nodes, edges


def test_default_closures_match_simpleResult_fixture(spark, graph):
    """fixtures/simpleResult.json — MATCH (thing)-[:CAUSES]->(otherThing)."""
    nodes, edges = graph
    results = spark.createDataFrame([(4, 5)], "thing_id long, other_id long")
    doc = golr_flatten(
        results,
        {"thing": "thing_id", "otherThing": "other_id"},
        nodes,
        edges,
        CURIE_MAP,
    ).collect()[0]

    assert doc["thing"] == "X:d"
    assert doc["thing_label"] == "X:d"
    assert doc["thing_closure"] == ["X:d", "X:c", "X:b", "X:a"]  # BFS order
    assert doc["thing_closure_label"] == ["X:d", "C", "X:b", "A"]
    assert json.loads(doc["thing_closure_map"]) == {
        "X:c": "C", "X:b": "X:b", "X:d": "X:d", "X:a": "A",
    }
    # anonymous parent (_:anon of a_b) pruned: not in closure ✓ (above)
    assert doc["otherThing"] == "X:e"
    assert doc["otherThing_closure"] == ["X:e"]  # partOf not a default type
    assert json.loads(doc["otherThing_closure_map"]) == {"X:e": "X:e"}


def test_custom_closure_types_match_customClosureTypeResult(spark, graph):
    """fixtures/customClosureTypeResult.json — otherThing closes over
    partOf OUTGOING (the YAML types override, GolrLoaderTest.java:81-93)."""
    nodes, edges = graph
    results = spark.createDataFrame([(4, 5)], "thing_id long, other_id long")
    doc = golr_flatten(
        results,
        {"thing": "thing_id", "otherThing": "other_id"},
        nodes,
        edges,
        CURIE_MAP,
        closure_overrides={"otherThing": ["partOf"]},
    ).collect()[0]
    assert doc["thing_closure"] == ["X:d", "X:c", "X:b", "X:a"]
    assert doc["otherThing_closure"] == ["X:e", "X:f"]
    assert doc["otherThing_closure_label"] == ["X:e", "X:f"]
    assert json.loads(doc["otherThing_closure_map"]) == {"X:e": "X:e", "X:f": "X:f"}


def test_relationship_closure_matches_relationshipResult(spark, graph):
    """fixtures/relationshipResult.json — MATCH ()-[relationship:CAUSES]->():
    the relationship resolves to the node bearing its IRI, closed over
    subPropertyOf (GolrLoader.java:688-692)."""
    nodes, edges = graph
    results = spark.createDataFrame(
        [("http://x.org/a_causes",)], "rel_iri string"
    )
    doc = relationship_closure("rel_iri", results, nodes, edges, CURIE_MAP).collect()[0]
    assert doc["relationship"] == "X:causes"
    assert doc["relationship_label"] == "X:causes"
    assert doc["relationship_closure"] == ["X:causes", "X:causes_parent"]
    assert doc["relationship_closure_label"] == ["X:causes", "X:causes_parent"]
    assert json.loads(doc["relationship_closure_map"]) == {
        "X:causes_parent": "X:causes_parent", "X:causes": "X:causes",
    }


def test_primitives_pass_through(spark, graph):
    """fixtures/primitives.json — scalar columns serialize unchanged
    (ResultSerializer.java:82-127's type dispatch is a no-op for a
    static schema)."""
    nodes, edges = graph
    results = spark.createDataFrame(
        [("foo", True, 1, 1, 1.0, 1.0)],
        "string string, boolean boolean, int int, long long, float float, double double",
    )
    doc = golr_flatten(results, {}, nodes, edges, CURIE_MAP).collect()[0]
    assert doc["string"] == "foo" and doc["boolean"] is True
    assert doc["int"] == 1 and doc["long"] == 1
    assert doc["float"] == 1.0 and doc["double"] == 1.0
