"""S4: YAML query-config round-trip (YamlSerializationTest.java:32-40
analog — the reference parses a literal YAML spec into the query bean;
here the spec carries the query name, per-field analyzer/boost, and
closure overrides)."""

from __future__ import annotations

from golr_loader_spark.config import IndexConfig, QuerySpec


def test_yaml_literal_parse():
    spec = QuerySpec.from_yaml(
        "query: q24_bm25_topk\n"
        "fields:\n"
        "  content: {analyzer: code, boost: 1.0}\n"
        "  path: {analyzer: path, boost: 2.0}\n"
        "bucket_bits: 5\n"
        "closure_overrides:\n"
        "  category:\n"
        "    - subClassOf\n"
    )
    assert spec.query == "q24_bm25_topk"
    assert spec.config.fields == {"content": ("code", 1.0), "path": ("path", 2.0)}
    assert spec.config.bucket_bits == 5
    assert spec.config.k1 == 1.2  # defaults preserved
    assert spec.closure_overrides == {"category": ["subClassOf"]}


def test_yaml_roundtrip_identity(tmp_path):
    spec = QuerySpec(
        query="engine_bm25_wand",
        config=IndexConfig(
            fields={"text": ("simple", 1.0)},
            bucket_bits=6,
            id_space_bits=17,
            min_term_len=2,
        ),
        closure_overrides={"taxon": ["inTaxon", "subClassOf"]},
    )
    p = tmp_path / "spec.yaml"
    spec.save(str(p))
    again = QuerySpec.load(str(p))
    assert again == spec
    # and the re-dump is stable (no drift on second round-trip)
    assert again.to_yaml() == spec.to_yaml()


def test_yaml_partial_spec_uses_defaults():
    spec = QuerySpec.from_yaml("query: q01_pricing_summary\n")
    assert spec.config == IndexConfig()
    assert spec.closure_overrides == {}
