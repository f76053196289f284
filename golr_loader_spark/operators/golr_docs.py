"""Golr-document flattening over graph tables — the set-oriented
restatement of the reference's row serializer
(GolrLoader.serializerRow, GolrLoader.java:571-703 +
SolrDocUtil.addClosures, SolrDocUtil.java:25-89).

Where the reference walks one Cypher result row at a time, computing
per-node closures through a Guava cache, this operator computes the
closure quint (id, label, id-closure, label-closure, closure-map) for
EVERY seed in one iterative-join dataflow and joins it back onto the
result rows — the decorrelated plan (SURVEY.md §4.1).

Graph tables (FIXTURES.md B):
  nodes(id long, iri string, label string?, labels array<string>)
  edges(src long, dst long, type string, iri string?)
Edges point child→parent (the reference's OUTGOING direction for
subClassOf/type/subPropertyOf hierarchies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.functions.curie import compact_iri_udf, is_blank_node
from golr_loader_spark.operators.closures import bfs_closure

# ResultSerializer.java:39-50 — default closure edge types for nodes;
# relationships close over subPropertyOf (GolrLoader.java:688-692).
DEFAULT_CLOSURE_TYPES = ["subClassOf", "type", "equivalentClass", "sameAs"]
REL_CLOSURE_TYPES = ["subPropertyOf"]


def closure_quints(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    closure_types: list[str] | None = None,
    curie_map: dict[str, str] | None = None,
) -> DataFrame:
    """Per-seed closure quint → (start, curie, label, closure,
    closure_label, closure_map).

    * closure arrays are in BFS discovery order (depth, then node id —
      ClosureTest.java:25-26 asserts discovery order);
    * anonymous nodes are EXCLUDE_AND_PRUNE'd (ClosureUtil.java:94-105):
      edges into blank nodes are dropped before the walk;
    * labels fall back to the CURIE (ClosureUtil.java:70-72);
    * closure_map is the id→label JSON string (SolrDocUtil.java:86-88).

    ``seeds``: one column ``id`` (node ids).
    """
    spark = nodes.sparkSession
    closure_types = closure_types or DEFAULT_CLOSURE_TYPES

    anon = nodes.filter(is_blank_node(F.col("iri"))).select("id")
    walk_edges = (
        edges.filter(F.col("type").isin(closure_types))
        .select("src", "dst")
        .join(anon.withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    closure = bfs_closure(walk_edges, seeds)

    compact = compact_iri_udf(spark, curie_map or {})
    labeled = (
        closure.join(
            nodes.select(F.col("id").alias("node"), "iri", "label"), "node"
        )
        .withColumn("curie", compact(F.col("iri")))
        .withColumn("clabel", F.coalesce(F.col("label"), F.col("curie")))
    )
    agg = labeled.groupBy("start").agg(
        F.sort_array(
            F.collect_list(F.struct("depth", "node", "curie", "clabel"))
        ).alias("p")
    )
    return agg.select(
        F.col("start"),
        F.element_at(F.col("p.curie"), 1).alias("curie"),
        F.element_at(F.col("p.clabel"), 1).alias("label"),
        F.col("p.curie").alias("closure"),
        F.col("p.clabel").alias("closure_label"),
        F.to_json(F.map_from_arrays(F.col("p.curie"), F.col("p.clabel"))).alias(
            "closure_map"
        ),
    )


def golr_flatten(
    results: DataFrame,
    var_bindings: dict[str, str],
    nodes: DataFrame,
    edges: DataFrame,
    curie_map: dict[str, str] | None = None,
    closure_overrides: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Flatten result rows into golr docs.

    ``results``: one row per (future) document; node-valued columns
    hold node ids. ``var_bindings``: output field name → results
    column. Per-variable closure-type overrides mirror the YAML
    ``types`` multimap (GolrCypherQuery.java:23, X3). Non-node
    (primitive) columns of ``results`` pass through unchanged — the
    P4 type dispatch collapses at compile time because the schema is
    static.

    Output per variable v: ``v, v_label, v_closure, v_closure_label,
    v_closure_map`` (single-valued fields kept scalar; the reference
    emits them as 1-element arrays into Solr's multi-valued fields —
    an encoding detail of the sink, not the data).
    """
    overrides = closure_overrides or {}
    out = results
    for var, col in var_bindings.items():
        seeds = results.select(F.col(col).alias("id")).distinct()
        quints = closure_quints(
            nodes, edges, seeds, overrides.get(var), curie_map
        )
        q = quints.select(
            F.col("start").alias(col),
            F.col("curie").alias(var),
            F.col("label").alias(f"{var}_label"),
            F.col("closure").alias(f"{var}_closure"),
            F.col("closure_label").alias(f"{var}_closure_label"),
            F.col("closure_map").alias(f"{var}_closure_map"),
        )
        out = out.join(q, col, "left")
    return out.drop(*{c for c in var_bindings.values()})


def evidence_merge(associations: DataFrame) -> DataFrame:
    """A1+A2: merge association rows into one doc per (subject,
    object) with the union of their evidence.

    The reference does this as a sort-based streaming merge that
    REQUIRES the Cypher query to emit rows ordered by subject, object
    (GolrLoader.java:76-79, 376-463), accumulating evidence in a
    byte-serialized TinkerGraph between rows (EvidenceGraphInfo.java:
    63-81). Here it is one groupBy — Catalyst picks hash or sort
    aggregation itself, no input-order contract, no serialization
    round-trip; the evidence "graph" is the deduped edge set rendered
    to a JSON blob (the BBOP-blob analog, EvidenceProcessor.java:93-99).

    associations: (subject, object, evidence_id, source, defined_by,
    is_ontology bool, …). P10: ontology-ontology rows contribute no
    evidence fields (GolrLoader.java:476-488).
    """
    ev = F.when(F.col("is_ontology"), F.lit(None)).otherwise(F.col("evidence_id"))
    src = F.when(F.col("is_ontology"), F.lit(None)).otherwise(F.col("source"))
    dby = F.when(F.col("is_ontology"), F.lit(None)).otherwise(F.col("defined_by"))
    return (
        associations.groupBy("subject", "object")
        .agg(
            F.sort_array(F.array_distinct(F.collect_list(ev))).alias("evidence"),
            F.sort_array(F.array_distinct(F.collect_list(src))).alias("source"),
            # A4: distinct isDefinedBy over all evidence edges
            F.sort_array(F.array_distinct(F.collect_list(dby))).alias("defined_bys"),
            F.count("*").alias("n_rows"),
        )
        .withColumn(
            "evidence_graph",
            F.to_json(F.struct("subject", "object", "evidence", "source")),
        )
    )


def evidence_bbop_graph(
    assoc_edges: DataFrame,
    nodes: DataFrame,
    curie_map: dict[str, str] | None = None,
    meta_query: str | None = None,
) -> DataFrame:
    """BBOP-graph evidence blob per association — the structural analog
    of EvidenceProcessor.getEvidenceGraph (EvidenceProcessor.java:
    75-100): the association's evidence subgraph serialized as
    ``{"nodes": [{"id", "lbl", "meta"}], "edges": [{"sub", "pred",
    "obj", "meta"}], "meta": {}}`` with node properties PROJECTED to
    {label, confidence_score} (TinkerGraphUtil.project at :84-88 —
    label becomes ``lbl``, confidence_score is the only meta key, so
    most nodes carry an empty meta) and all ids/preds compacted to
    curies.

    ``assoc_edges``: one row per evidence-graph edge per association —
    (subject, object, sub_iri, pred_iri, obj_iri).
    ``nodes``: (iri, label, confidence_score double?).
    Output: (subject, object, evidence_graph json string); node list
    sorted by id, edge list by (sub, pred, obj) — deterministic like
    the reference's fixture serialization.
    """
    spark = assoc_edges.sparkSession
    compact = compact_iri_udf(spark, curie_map or {})

    e = assoc_edges.select(
        "subject",
        "object",
        compact(F.col("sub_iri")).alias("sub"),
        compact(F.col("pred_iri")).alias("pred"),
        compact(F.col("obj_iri")).alias("obj"),
    )
    empty_smeta = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    # maps are not orderable: dedupe/sort the bare triples, then attach
    # the (empty) edge meta in a transform
    edge_lists = (
        e.groupBy("subject", "object")
        .agg(
            F.sort_array(
                F.array_distinct(F.collect_list(F.struct("sub", "pred", "obj")))
            ).alias("e3")
        )
        .withColumn(
            "edges",
            F.transform(
                "e3",
                lambda x: F.struct(
                    x["sub"].alias("sub"),
                    x["pred"].alias("pred"),
                    x["obj"].alias("obj"),
                    empty_smeta.alias("meta"),
                ),
            ),
        )
        .drop("e3")
    )

    endpoints = assoc_edges.select(
        "subject",
        "object",
        F.explode(F.array("sub_iri", "obj_iri")).alias("iri"),
    ).distinct()
    node_props = nodes.select(
        "iri",
        F.col("label").alias("lbl"),
        F.col("confidence_score").cast("double").alias("conf"),
    )
    node_lists = (
        endpoints.join(node_props, "iri", "left")
        .select(
            "subject",
            "object",
            F.struct(
                compact(F.col("iri")).alias("id"), F.col("lbl"), F.col("conf")
            ).alias("n"),
        )
        .groupBy("subject", "object")
        .agg(F.sort_array(F.collect_list("n")).alias("n3"))
        .withColumn(
            "nodes",
            F.transform(
                "n3",
                lambda x: F.struct(
                    x["id"].alias("id"),
                    x["lbl"].alias("lbl"),
                    # projected meta: confidence_score only, absent → {}
                    F.when(
                        x["conf"].isNotNull(),
                        F.map_from_arrays(
                            F.array(F.lit("confidence_score")), F.array(x["conf"])
                        ),
                    )
                    .otherwise(
                        F.map_from_arrays(
                            F.array().cast("array<string>"),
                            F.array().cast("array<double>"),
                        )
                    )
                    .alias("meta"),
                ),
            ),
        )
        .drop("n3")
    )

    graph_meta = (
        F.map_from_arrays(
            F.array(F.lit("query")), F.array(F.lit(f"monarch:cypher/{meta_query}"))
        )
        if meta_query  # EvidenceProcessor.java:89-92
        else F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    )
    return node_lists.join(edge_lists, ["subject", "object"]).select(
        "subject",
        "object",
        F.to_json(
            F.struct("nodes", "edges", graph_meta.alias("meta"))
        ).alias("evidence_graph"),
    )


# GolrLoader.java:157-174 / 649-665 — specialized traversal edge sets
EQ_CLOSURE_TYPES = ["equivalentClass", "sameAs"]  # T3
ORTHOLOG_TYPES = [
    "http://purl.obolibrary.org/obo/RO_HOM0000017",
    "http://purl.obolibrary.org/obo/RO_HOM0000020",
]  # T7
GENE_WALK_TYPES = [
    "sameAs",
    "equivalentClass",
    "partOf",
    "http://purl.obolibrary.org/obo/GENO_0000418",
    "variant",
    "hasGenotype",
    "derivesFrom",
]  # T6 (GolrLoader.java:199-210)


def equivalence_closure(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame
) -> DataFrame:
    """T3: equivalentClass+sameAs closure → (start, eq array of iris)
    (GolrLoader.java:649-665; symmetric edges walked both ways)."""
    sym = edges.filter(F.col("type").isin(EQ_CLOSURE_TYPES)).select("src", "dst")
    both = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    cl = bfs_closure(both, seeds)
    labeled = cl.join(nodes.select(F.col("id").alias("node"), "iri"), "node")
    return labeled.groupBy("start").agg(
        F.col("start"),
        F.array_distinct(
            F.sort_array(F.collect_list(F.struct("depth", "node", "iri")))["iri"]
        ).alias("eq"),
    ).select("start", "eq")


def ortholog_closure(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame
) -> DataFrame:
    """T7: depth-1 walk over homology edges; keep gene-labeled
    endpoints other than the seed (GolrLoader.java:184-187,271-279)."""
    hom = edges.filter(F.col("type").isin(ORTHOLOG_TYPES)).select("src", "dst")
    both = hom.union(hom.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    hits = (
        seeds.join(both, seeds["id"] == both["src"])
        .join(
            nodes.select(
                F.col("id").alias("dst"), F.col("iri").alias("ortholog_iri"), "labels"
            ),
            "dst",
        )
        .filter(F.array_contains(F.col("labels"), "gene") & (F.col("dst") != F.col("id")))
    )
    return hits.groupBy(F.col("id").alias("start")).agg(
        F.sort_array(F.collect_set("ortholog_iri")).alias("ortholog_closure")
    )


TAXON_WALK_TYPES = [
    "equivalentClass",
    "sameAs",
    "subClassOf",
    "type",
    "partOf",
    "subSequenceOf",
    "variant",
    "hasGenotype",
    "derivesFrom",
]  # T4 walk set (GolrLoader.java:157-174)
IN_TAXON = "http://purl.obolibrary.org/obo/RO_0002162"
CHROMOSOME_WALK_TYPES = [
    "equivalentClass",
    "sameAs",
    "subClassOf",
    "type",
    "location",
    "begin",
    "reference",
]  # T5 walk set (GolrLoader.java:176-182)


def taxon_closure(nodes: DataFrame, edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """T4: walk the taxon edge set from each seed; a node is the
    seed's taxon iff it is reached by a FINAL inTaxon edge from any
    closure node (GolrLoader.java:157-174,240-247 — 'accept paths
    whose last relationship is inTaxon')."""
    walk = edges.filter(F.col("type").isin(TAXON_WALK_TYPES)).select("src", "dst")
    cl = bfs_closure(walk, seeds)
    taxon_edges = edges.filter(F.col("type") == IN_TAXON).select(
        F.col("src").alias("node"), F.col("dst").alias("taxon_id")
    )
    hits = cl.join(taxon_edges, "node").join(
        nodes.select(F.col("id").alias("taxon_id"), F.col("iri").alias("taxon_iri")),
        "taxon_id",
    )
    return hits.groupBy("start").agg(
        F.sort_array(F.collect_set("taxon_iri")).alias("taxon_closure")
    )


def chromosome_closure(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame, chromosome_ids: DataFrame
) -> DataFrame:
    """T5: walk the location edge set; accept closure nodes that are in
    the entailed chromosome set (GolrLoader.java:176-197,249-258 —
    membership via semi-join against the entailment set rather than a
    per-node Cypher probe)."""
    walk = edges.filter(F.col("type").isin(CHROMOSOME_WALK_TYPES)).select("src", "dst")
    cl = bfs_closure(walk, seeds)
    hits = cl.join(
        chromosome_ids.withColumnRenamed("id", "node"), "node", "left_semi"
    ).join(nodes.select(F.col("id").alias("node"), "iri"), "node")
    return hits.groupBy("start").agg(
        F.sort_array(F.collect_set("iri")).alias("chromosome_closure")
    )


def gene_closure(nodes: DataFrame, edges: DataFrame, seeds: DataFrame) -> DataFrame:
    """T6: walk the gene-resolution edge set; first gene-labeled node
    in discovery order (GolrLoader.java:199-210,262-269)."""
    walk = edges.filter(F.col("type").isin(GENE_WALK_TYPES)).select("src", "dst")
    cl = bfs_closure(walk, seeds)
    genes = cl.join(
        nodes.select(F.col("id").alias("node"), "iri", "labels"), "node"
    ).filter(F.array_contains(F.col("labels"), "gene"))
    first = genes.groupBy("start").agg(
        F.min(F.struct("depth", "node", "iri")).alias("m")
    )
    return first.select("start", F.col("m.iri").alias("gene_iri"))


# disease.cypher:1-12 / phenotype.cypher:1-16 edge vocabulary
GENO_ALLELE_OF = "GENO:0000410"
PHENO_RELS = ["RO:0002200", "RO:0002610", "RO:0002326"]
HAS_PART = "BFO:0000051"
GENO_HAS_PERSON = "GENO:0000222"


def disease_style_lookup(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    target_label: str = "disease",
    pheno_rels: list[str] | None = None,
) -> DataFrame:
    """T8: the reference's 3-branch UNION lookup (disease.cypher:1-12,
    dispatched per-subject by GolrLoader.java:281-305), decorrelated
    into one dataflow for ALL subjects → distinct (start, target_iri):

    1. subject ←GENO:0000410*0..1– variant –sameAs*0..1– ve
       –[pheno_rel]→ target:label
    2. … ve ←BFO:0000051*– genotype –[pheno_rel]→ target
    3. … genotype ←GENO:0000222– person –RO:0002200→ target

    Each Cypher ``*0..1`` hop is a union of the identity set with one
    equi-join; the unbounded ``BFO:0000051*`` is the iterative BFS.
    The reference runs this query once per subject id ({id} parameter);
    here every branch is evaluated set-at-a-time and the per-subject
    grouping falls out of the carried ``start`` key.
    """
    pheno_rels = pheno_rels or PHENO_RELS

    # subject ←GENO:0000410 *0..1
    e410 = edges.filter(F.col("type") == GENO_ALLELE_OF).select("src", "dst")
    v0 = seeds.select(F.col("id").alias("start"), F.col("id").alias("node"))
    v1 = seeds.join(e410, seeds["id"] == e410["dst"]).select(
        F.col("id").alias("start"), F.col("src").alias("node")
    )
    variants = v0.unionAll(v1)

    # –sameAs*0..1– (symmetric single hop)
    sa = edges.filter(F.col("type") == "sameAs").select("src", "dst")
    sa_both = sa.unionAll(
        sa.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ve = variants.unionAll(
        variants.join(sa_both, variants["node"] == sa_both["src"]).select(
            "start", F.col("dst").alias("node")
        )
    ).distinct()

    targets = nodes.filter(F.array_contains("labels", target_label)).select(
        F.col("id").alias("t_id"), F.col("iri").alias("target_iri")
    )
    prel = edges.filter(F.col("type").isin(pheno_rels)).select("src", "dst")

    def hits(frontier: DataFrame, rel: DataFrame) -> DataFrame:
        return (
            frontier.join(rel, frontier["node"] == rel["src"])
            .join(targets, F.col("dst") == F.col("t_id"))
            .select("start", "target_iri")
        )

    b1 = hits(ve, prel)

    # ←BFO:0000051*– genotype : unbounded incoming part-of closure
    po_rev = edges.filter(F.col("type") == HAS_PART).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    ve_ids = ve.select(F.col("node").alias("id")).distinct()
    geno_cl = bfs_closure(po_rev, ve_ids).filter(F.col("depth") > 0)
    genotypes = ve.join(
        geno_cl.select(F.col("start").alias("node"), F.col("node").alias("g")),
        "node",
    ).select("start", F.col("g").alias("node")).distinct()
    b2 = hits(genotypes, prel)

    # ←GENO:0000222– person –RO:0002200→ target
    e222 = edges.filter(F.col("type") == GENO_HAS_PERSON).select("src", "dst")
    persons = genotypes.join(e222, genotypes["node"] == e222["dst"]).select(
        "start", F.col("src").alias("node")
    )
    b3 = hits(persons, edges.filter(F.col("type") == "RO:0002200").select("src", "dst"))

    return b1.unionAll(b2).unionAll(b3).distinct()


def relationship_closure(
    rel_iri_col: str,
    results: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    curie_map: dict[str, str] | None = None,
) -> DataFrame:
    """J4: resolve a relationship's IRI to the node carrying it, then
    close over subPropertyOf (GolrLoader.java:688-692) → fields
    ``relationship, relationship_label, relationship_closure, ...``."""
    rel_nodes = results.select(F.col(rel_iri_col).alias("iri")).distinct().join(
        nodes, "iri"
    )
    quints = closure_quints(
        nodes, edges, rel_nodes.select("id"), REL_CLOSURE_TYPES, curie_map
    )
    q = rel_nodes.select(F.col("iri").alias(rel_iri_col), F.col("id").alias("start")).join(
        quints, "start"
    )
    return results.join(
        q.select(
            rel_iri_col,
            F.col("curie").alias("relationship"),
            F.col("label").alias("relationship_label"),
            F.col("closure").alias("relationship_closure"),
            F.col("closure_label").alias("relationship_closure_label"),
            F.col("closure_map").alias("relationship_closure_map"),
        ),
        rel_iri_col,
        "left",
    ).drop(rel_iri_col)
