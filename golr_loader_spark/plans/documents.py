"""Corpus → denormalized indexable documents.

The analog of golr-loader's row flattener
(GolrLoader.serializerRow, /root/reference/src/main/java/org/monarch/
golr/GolrLoader.java:571-703): each input row becomes one flat
document carrying the base fields plus *closure* multi-valued fields,
mirroring the reference's ``field`` / ``field_closure`` convention
(SolrDocUtil.java:25-44). Closures here are hierarchical expansions
of code metadata:

  * path_closure — every path prefix (``a/b/c.py`` → ``a``, ``a/b``,
    ``a/b/c.py``), the partonomy analog of ClosureUtil's BFS closure
    (ClosureUtil.java:88-114) for the strictly-hierarchical path case;
  * repo_closure — ``org`` and ``org/repo`` ancestry;
  * lang_closure — language + language family.

All pure Catalyst expressions: no shuffle, no Python. ``doc_id`` is
``xxhash64(repo, path, commit)`` — deterministic under any
partitioning (SURVEY.md §7 stage 2; ``monotonically_increasing_id``
would not be stable across runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language → family, the lang→lang-family closure edge set
LANG_FAMILY = {
    "py": "scripting",
    "js": "scripting",
    "java": "jvm",
    "scala": "jvm",
    "c": "native",
    "go": "native",
    "rs": "native",
    "md": "docs",
}


def path_closure(col: Column) -> Column:
    """All '/'-prefixes of a path, shortest→longest (BFS-order analog:
    ClosureTest.java:25-26 asserts discovery order; for a chain the
    discovery order is depth order)."""
    segs = F.split(col, "/")
    return F.transform(
        F.sequence(F.lit(1), F.size(segs)),
        lambda i: F.array_join(F.slice(segs, F.lit(1), i), "/"),
    )


def flatten_documents(corpus: DataFrame) -> DataFrame:
    """(repo, path, commit, lang, content) → documents.

    Adds: doc_id, content_sha256 (per-row invariant vs the reference,
    BASELINE.json input_hint), doc closures, char length.
    """
    lang_family = F.element_at(
        F.create_map(*[F.lit(x) for kv in LANG_FAMILY.items() for x in kv]),
        F.col("lang"),
    )
    org = F.split_part(F.col("repo"), F.lit("/"), F.lit(1))
    return corpus.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.array(org, F.col("repo")).alias("repo_closure"),
        path_closure(F.col("path")).alias("path_closure"),
        F.array_distinct(
            F.array(F.col("lang"), F.coalesce(lang_family, F.col("lang")))
        ).alias("lang_closure"),
        F.length("content").alias("content_len"),
    )


def check_doc_id_collisions(documents: DataFrame) -> int:
    """Return number of colliding doc_ids (expected 0; SURVEY.md §7
    risk (3) — hash-based ids must be collision-checked)."""
    return (
        documents.groupBy("doc_id").count().filter(F.col("count") > 1).count()
    )
