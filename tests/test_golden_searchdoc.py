"""Whole-doc golden parity with the reference's SimpleLoader fixture.

The graph is the tabular re-encoding of SimpleLoadSetup.populateGraph
(/root/reference/src/test/java/org/monarch/golr/SimpleLoadSetup.java:
41-76); EXPECTED is fixtures/searchDoc.json verbatim. The reference
test asserts with JSONAssert NON_EXTENSIBLE (SimpleLoaderTest.java:
27-32) — arrays order-insensitive — so multi-valued fields are
compared as sets here.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.operators.simple_docs import simple_search_docs

IN_TAXON = "http://purl.obolibrary.org/obo/RO_0002162"
INTERACTS = "http://purl.obolibrary.org/obo/RO_0002435"
HAS_PHENOTYPE = "http://purl.obolibrary.org/obo/RO_0002200"

CURIE_MAP = {"X": "http://x.org/"}
EQ_CURIE_MAP = {"X": ["Y"]}

# (id, iri, labels, label-props, definition, abbreviation, synonym)
NODES = [
    (1, "http://x.org/geneA", ["gene", "Node", "cliqueLeader"], ["SHH"], [], [], []),
    (2, "http://x.org/taxa", ["organism", "cliqueLeader"], ["Homo sapiens"], [], [], []),
    (3, "http://x.org/geneB", [], [], [], [], []),
    (4, "http://x.org/phenotype", ["phenotype"], [], [], [], []),
    (5, "_:1234", ["cliqueLeader"], ["some bnode"], [], [], []),
    (
        6,
        "https://monarchinitiative.org/.well-known/genid/121002-41751VL",
        ["cliqueLeader"],
        ["bnode variant"],
        [],
        [],
        [],
    ),
    (7, "http://x.org/eqGeneA", [], [], [], [], ["GeneAish"]),
]

EDGES = [
    (1, 2, IN_TAXON),
    (1, 3, INTERACTS),
    (1, 4, HAS_PHENOTYPE),
    (1, 7, "sameAs"),
]

# fixtures/searchDoc.json, keyed by id (arrays as sets per JSONAssert)
EXPECTED = {
    "X:geneA": {
        "prefix": "X",
        "label": {"SHH"},
        "definition": set(),
        "synonym": {"GeneAish"},
        "abbreviation": set(),
        "has_phenotype": True,
        "edges": 4,
        "taxon": "X:taxa",
        "taxon_label": "Homo sapiens",
        "taxon_label_synonym": set(),
        "category": {"gene"},
        "equivalent_curie": {"X:eqGeneA", "Y:eqGeneA", "Y:geneA"},
        "leaf": True,
    },
    "X:taxa": {
        "prefix": "X",
        "label": {"Homo sapiens"},
        "definition": set(),
        "synonym": set(),
        "abbreviation": set(),
        "has_phenotype": False,
        "edges": 1,
        "taxon": "",
        "taxon_label": "",
        "taxon_label_synonym": set(),
        "category": {"organism"},
        "equivalent_curie": {"Y:taxa"},
        "leaf": True,
    },
}

ARRAY_FIELDS = {
    "label",
    "definition",
    "synonym",
    "abbreviation",
    "taxon_label_synonym",
    "category",
    "equivalent_curie",
}


@pytest.fixture(scope="module")
def docs(spark):
    nodes = spark.createDataFrame(
        NODES,
        "id long, iri string, labels array<string>, label array<string>, "
        "definition array<string>, abbreviation array<string>, "
        "synonym array<string>",
    )
    edges = spark.createDataFrame(EDGES, "src long, dst long, type string")
    return {
        r["id"]: r.asDict()
        for r in simple_search_docs(nodes, edges, CURIE_MAP, EQ_CURIE_MAP).collect()
    }


def test_exactly_the_fixture_docs_emitted(docs):
    """Blank node, genid node, unlabeled and non-clique-leader nodes
    are all skipped (SimpleLoader.java:77-101)."""
    assert set(docs) == set(EXPECTED)


def test_searchdoc_fields_match_fixture(docs):
    for doc_id, want in EXPECTED.items():
        got = docs[doc_id]
        for field, val in want.items():
            if field in ARRAY_FIELDS:
                assert set(got[field]) == val, (doc_id, field, got[field])
            else:
                assert got[field] == val, (doc_id, field, got[field])
