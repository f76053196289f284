"""SimpleLoader search-doc pipeline — the reference's second loader
(SimpleLoader.java:64-247) restated set-oriented.

Where the reference iterates clique-leader nodes one at a time inside
a Neo4j transaction — per-node property reads, a depth-first taxon
walk, a per-node Cypher ``LIMIT 1`` phenotype probe, a BFS equivalence
walk — this operator computes every per-doc field for ALL clique
leaders in one dataflow of joins and aggregations:

* eligibility filter (cliqueLeader ∧ has label ∧ not blank/genid ∧
  curie-resolvable with a ``prefix:reference`` split,
  SimpleLoader.java:77-101);
* ``edges`` = relationship count in both directions (getEdgeCount,
  SimpleLoader.java:239-246 counts Direction.BOTH);
* ``taxon`` via the in-taxon walk (SimpleLoader.java:127-136) — the
  reference takes the depth-first FIRST hit; set-oriented we take the
  nearest by (depth, iri), identical on tree-shaped taxon edges;
* ``has_phenotype`` — the per-row ``MATCH … LIMIT 1`` probe
  (SimpleLoader.java:259-273) decorrelated into one semi-join flag;
* ``category`` = node labels minus the unwanted set
  (SimpleLoader.java:38-41, 282-293);
* equivalence closure over sameAs+equivalentClass BOTH directions
  (SimpleLoader.java:180-188), synonyms unioned across the clique
  (:195-224), ``equivalent_curie`` assembled from the closure plus the
  eq-prefix rewrite map (:190-193, 209-220);
* ``leaf`` = no incoming subClassOf (:229-234).

Graph tables: nodes(id, iri, labels array, label array, definition
array, abbreviation array, synonym array), edges(src, dst, type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.functions.curie import compact_iri_udf
from golr_loader_spark.operators.closures import bfs_closure

# SimpleLoader.java:38-41
UNWANTED_LABELS = ["cliqueLeader", "Node", "Class", "NamedIndividual"]
IN_TAXON = "http://purl.obolibrary.org/obo/RO_0002162"  # :62-63
HAS_PHENOTYPE = "http://purl.obolibrary.org/obo/RO_0002200"  # :261-263
EQ_TYPES = ["sameAs", "equivalentClass"]  # :181-183
SUBCLASS = "subClassOf"  # :229
GENID_NS = "https://monarchinitiative.org/.well-known/genid/"  # :84


def _eligible(nodes: DataFrame, curie_map: dict[str, str]) -> DataFrame:
    """Clique leaders that survive SimpleLoader's skip rules, with
    (curie, prefix, reference) attached."""
    compact = compact_iri_udf(nodes.sparkSession, curie_map)
    return (
        nodes.filter(F.array_contains("labels", "cliqueLeader"))
        .filter(F.size("label") > 0)  # :81 requires a LABEL property
        .filter(
            ~F.col("iri").startswith("_:") & ~F.col("iri").startswith(GENID_NS)
        )
        .withColumn("curie", compact(F.col("iri")))
        # :89-92 — skip IRIs the curie map cannot resolve (compaction
        # passes unmatched IRIs through unchanged, so equality means
        # "no prefix matched")
        .filter(F.col("curie") != F.col("iri"))
        .withColumn("prefix", F.split(F.col("curie"), ":", 2).getItem(0))
        .withColumn("reference", F.split(F.col("curie"), ":", 2).getItem(1))
        # :95-100 — curie must have a reference part
        .filter(F.col("reference").isNotNull() & (F.col("reference") != ""))
    )


def _edge_counts(edges: DataFrame) -> DataFrame:
    """(id, edges) — degree over both directions (:119-121, 239-246)."""
    ends = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    return ends.groupBy("id").agg(F.count("*").cast("int").alias("edges"))


def _nearest_taxon(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame, curie_map: dict[str, str]
) -> DataFrame:
    """(id, taxon, taxon_label, taxon_label_synonym) for seeds with a
    taxon. The reference walks outgoing in-taxon edges depth-first and
    keeps the first node at depth > 0 (:127-136); nearest-(depth, iri)
    is the set-oriented equivalent (identical whenever the taxon
    relation is a function/tree, the data's invariant)."""
    compact = compact_iri_udf(nodes.sparkSession, curie_map)
    walk = edges.filter(F.col("type") == IN_TAXON).select("src", "dst")
    cl = bfs_closure(walk, seeds).filter(F.col("depth") > 0)
    hit = cl.join(
        nodes.select(
            F.col("id").alias("node"),
            F.col("iri").alias("t_iri"),
            F.col("label").alias("t_labels"),
            F.col("synonym").alias("t_syn"),
        ),
        "node",
    )
    first = hit.groupBy("start").agg(
        F.min(F.struct("depth", "t_iri", "t_labels", "t_syn")).alias("m")
    )
    return first.select(
        F.col("start").alias("id"),
        compact(F.col("m.t_iri")).alias("taxon"),
        # :141-147 — first label or ""
        F.coalesce(F.element_at("m.t_labels", 1), F.lit("")).alias("taxon_label"),
        F.coalesce("m.t_syn", F.array()).alias("taxon_label_synonym"),
    )


def _phenotype_flags(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(id,) of nodes with an RO_0002200 edge (either direction) to a
    :phenotype node — the decorrelated LIMIT-1 probe (:259-273)."""
    ph = edges.filter(F.col("type") == HAS_PHENOTYPE).select("src", "dst")
    both = ph.unionAll(ph.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pheno_nodes = nodes.filter(F.array_contains("labels", "phenotype")).select(
        F.col("id").alias("dst")
    )
    return both.join(pheno_nodes, "dst", "left_semi").select(
        F.col("src").alias("id")
    ).distinct()


def _equivalence_sets(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame
) -> DataFrame:
    """(start, eq_id) — sameAs/equivalentClass closure, both directions,
    depth > 0 (:180-188)."""
    sym = edges.filter(F.col("type").isin(EQ_TYPES)).select("src", "dst")
    both = sym.unionAll(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        bfs_closure(both, seeds)
        .filter(F.col("depth") > 0)
        .select("start", F.col("node").alias("eq_id"))
    )


def simple_search_docs(
    nodes: DataFrame,
    edges: DataFrame,
    curie_map: dict[str, str],
    eq_curie_map: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One search doc per eligible clique leader — the full
    SimpleLoader.generate field set (fixture:
    src/test/resources/fixtures/searchDoc.json)."""
    spark = nodes.sparkSession
    compact = compact_iri_udf(spark, curie_map)
    eq_curie_map = eq_curie_map or {}

    base = _eligible(nodes, curie_map).cache()
    seeds = base.select("id")

    # --- equivalence closure: curies, eq-prefix rewrites, synonyms
    eq = _equivalence_sets(nodes, edges, seeds).join(
        nodes.select(
            F.col("id").alias("eq_id"),
            F.col("iri").alias("eq_iri"),
            F.col("synonym").alias("eq_syn"),
        ),
        "eq_id",
    ).withColumn("eq_curie", compact(F.col("eq_iri")))

    # equivalent_curie part 1: the closure members' own curies
    # (:209-211; unresolvable IRIs are skipped, :95-100 analog)
    ec_closure = eq.filter(F.col("eq_curie") != F.col("eq_iri")).select(
        F.col("start").alias("id"), F.col("eq_curie").alias("ec")
    )

    # parts 2+3: the eq-prefix rewrite map applied to the base curie
    # (:190-193) and to each closure curie (:212-220)
    rows = [(p, e) for p, eqs in eq_curie_map.items() for e in eqs]
    if rows:
        eqmap = F.broadcast(
            spark.createDataFrame(rows, "prefix string, eq_prefix string")
        )
        ec_base = base.join(eqmap, "prefix").select(
            "id", F.concat("eq_prefix", F.lit(":"), "reference").alias("ec")
        )
        ec_eq = (
            ec_closure.withColumnRenamed("ec", "c")
            .withColumn("prefix", F.split(F.col("c"), ":", 2).getItem(0))
            .withColumn("reference", F.split(F.col("c"), ":", 2).getItem(1))
            .join(eqmap, "prefix")
            .select("id", F.concat("eq_prefix", F.lit(":"), "reference").alias("ec"))
        )
        all_ec = ec_closure.unionAll(ec_base).unionAll(ec_eq)
    else:
        all_ec = ec_closure
    equivalent_curies = all_ec.groupBy("id").agg(
        F.sort_array(F.array_distinct(F.collect_list("ec"))).alias(
            "equivalent_curie"
        )
    )

    # synonyms: own + every clique member's (:195-207), as a set
    eq_syns = eq.select(F.col("start").alias("id"), F.explode("eq_syn").alias("s"))
    own_syns = base.select("id", F.explode("synonym").alias("s"))
    synonyms = (
        own_syns.unionAll(eq_syns)
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("s")).alias("synonym_all"))
    )

    taxon = _nearest_taxon(nodes, edges, seeds, curie_map)
    pheno = _phenotype_flags(nodes, edges).withColumn("has_phenotype", F.lit(True))
    degrees = _edge_counts(edges)
    non_leaf = (
        edges.filter(F.col("type") == SUBCLASS)
        .select(F.col("dst").alias("id"))
        .distinct()
        .withColumn("non_leaf", F.lit(True))
    )

    return (
        base.join(degrees, "id", "left")
        .join(taxon, "id", "left")
        .join(pheno, "id", "left")
        .join(equivalent_curies, "id", "left")
        .join(synonyms, "id", "left")
        .join(non_leaf, "id", "left")
        .select(
            F.col("curie").alias("doc_id"),
            "prefix",
            F.col("label"),
            F.coalesce("definition", F.array()).alias("definition"),
            F.coalesce("abbreviation", F.array()).alias("abbreviation"),
            F.coalesce("edges", F.lit(0)).alias("edges"),
            F.coalesce("taxon", F.lit("")).alias("taxon"),
            F.coalesce("taxon_label", F.lit("")).alias("taxon_label"),
            F.coalesce("taxon_label_synonym", F.array()).alias(
                "taxon_label_synonym"
            ),
            F.coalesce("has_phenotype", F.lit(False)).alias("has_phenotype"),
            F.array_except("labels", F.array(*[F.lit(x) for x in UNWANTED_LABELS])).alias(
                "category"
            ),
            F.coalesce("synonym_all", F.array()).alias("synonym"),
            F.coalesce("equivalent_curie", F.array()).alias("equivalent_curie"),
            (~F.coalesce("non_leaf", F.lit(False))).alias("leaf"),
        )
        .withColumnRenamed("doc_id", "id")
    )
