"""golr_loader_spark — a PySpark-native fulltext-index + BM25 engine.

A from-scratch re-expression of SciGraph/golr-loader's capabilities
(reference at /root/reference) as an idiomatic Spark engine:

* document flattening with closure-style multi-valued fields
  (analog of GolrLoader.serializerRow, GolrLoader.java:571-703),
* the inverted index itself — salted posting-list construction,
  delta+varint block-max compression (the half the reference
  delegated to Solr, GolrLoader.java:498-515),
* BM25 (k1=1.2, b=0.75) top-k via block-max WAND, rank-identical
  to an exact DataFrame-only scorer,
* checkpointed, manifest-tracked resumable index builds.

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-vectorized pandas UDFs / applyInPandas / mapInArrow bodies.
"""

__version__ = "0.1.0"

from golr_loader_spark.config import IndexConfig  # noqa: F401
from golr_loader_spark.session import get_spark  # noqa: F401
