"""CURIE function parity tests — semantics mirror the reference
(ClosureUtil.java:60-72, GolrLoader.java:551-557, SimpleLoader.java:82-85)."""

from __future__ import annotations

from pyspark.sql import functions as F

from golr_loader_spark.functions.curie import (
    compact_iri_udf,
    expand_curie_udf,
    is_blank_node,
    label_or_curie,
    parse_entailment,
)

CURIE_MAP = {
    "X": "http://x.org/a_",
    "XO": "http://x.org/",  # shorter namespace: X must win on a_ IRIs
    "UBERON": "http://purl.obolibrary.org/obo/UBERON_",
}


def test_compact_longest_prefix_wins(spark):
    df = spark.createDataFrame(
        [
            ("http://x.org/a_b",),
            ("http://x.org/gene",),
            ("http://purl.obolibrary.org/obo/UBERON_0001890",),
            ("http://unmapped.org/z",),
            (None,),
        ],
        "iri string",
    )
    fn = compact_iri_udf(spark, CURIE_MAP)
    got = [r["c"] for r in df.select(fn(F.col("iri")).alias("c")).collect()]
    assert got == [
        "X:b",  # longest namespace (http://x.org/a_) wins over XO
        "XO:gene",
        "UBERON:0001890",
        "http://unmapped.org/z",  # fallback: IRI passes through
        None,
    ]


def test_expand_roundtrip(spark):
    df = spark.createDataFrame(
        [("X:b",), ("UBERON:0001890",), ("NOPREFIX:z",), ("plain",)], "c string"
    )
    fn = expand_curie_udf(spark, CURIE_MAP)
    got = [r["i"] for r in df.select(fn(F.col("c")).alias("i")).collect()]
    assert got == [
        "http://x.org/a_b",
        "http://purl.obolibrary.org/obo/UBERON_0001890",
        "NOPREFIX:z",
        "plain",
    ]


def test_label_fallback_and_blank_nodes(spark):
    df = spark.createDataFrame(
        [("A", "X:a", "_:anon1"), (None, "X:b", "http://x.org/b")],
        "label string, curie string, iri string",
    )
    rows = df.select(
        label_or_curie(F.col("label"), F.col("curie")).alias("l"),
        is_blank_node(F.col("iri")).alias("b"),
    ).collect()
    assert [(r["l"], r["b"]) for r in rows] == [("A", True), ("X:b", False)]


def test_parse_entailment():
    # GolrLoaderTest custom closure spec shapes
    assert parse_entailment("[c:CAUSES!]") == {
        "key": "c",
        "types": ["CAUSES"],
        "entailed": True,
        "reflexive": False,
    }
    got = parse_entailment("[r:`A`|B*]")
    assert got["types"] == ["A", "B"] and got["reflexive"] and not got["entailed"]
    assert parse_entailment("not a spec") is None
