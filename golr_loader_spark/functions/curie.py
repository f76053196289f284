"""CURIE / IRI scalar functions — parity with the reference's
identifier handling:

* compaction  (F1): IRI → ``PREFIX:reference`` via longest-prefix
  match over the curie map, fallback to the IRI
  (ClosureUtil.java:60-63, GolrLoader.java:630-631)
* expansion   (F2): CURIE → IRI (GolrLoader.java:557)
* label fallback (F3): label if present else CURIE
  (ClosureUtil.java:70-72)
* entailment spec parse (F5): ``[key:value!*]`` regex of
  GolrLoader.java:119-120,551-557
* blank-node predicates (P5/F6): SimpleLoader.java:82-85

Compaction/expansion are vectorized pandas UDFs over a broadcast
prefix dict (the reference's CurieUtil, driver-wired per
QueriesSanityCheck.java:61-63); everything else is pure Catalyst.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# GolrLoader.java:119-120 — entailment/closure override syntax
ENTAILMENT_RE = re.compile(r"^\[([\w]*):?([\w:\|\.\/#`]*)([!\*\.\d]*)\]$")


def compact_iri_udf(spark: SparkSession, curie_map: dict[str, str]):
    """Column function: IRI → CURIE (longest-namespace match wins,
    unmatched IRIs pass through). ``curie_map``: prefix → namespace."""
    # longest namespace first, so nested namespaces compact correctly
    items = sorted(curie_map.items(), key=lambda kv: -len(kv[1]))
    bc = spark.sparkContext.broadcast(items)

    @F.pandas_udf("string")
    def compact(batch: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pairs = bc.value
        for s in batch:
            out = s.copy()
            remaining = pd.Series(True, index=s.index)
            for prefix, ns in pairs:
                hit = remaining & s.str.startswith(ns, na=False)
                if hit.any():
                    out[hit] = prefix + ":" + s[hit].str.slice(len(ns))
                    remaining &= ~hit
            yield out

    return compact


def expand_curie_udf(spark: SparkSession, curie_map: dict[str, str]):
    """Column function: CURIE → IRI (unknown prefixes pass through)."""
    bc = spark.sparkContext.broadcast(dict(curie_map))

    @F.pandas_udf("string")
    def expand(batch: Iterator[pd.Series]) -> Iterator[pd.Series]:
        m = bc.value
        for s in batch:
            parts = s.str.split(":", n=1, expand=True)
            if parts.shape[1] < 2:
                yield s
                continue
            ns = parts[0].map(m)
            yield (ns + parts[1]).where(ns.notna(), s)

    return expand


def label_or_curie(label: Column, curie: Column) -> Column:
    """F3 label fallback (ClosureUtil.java:70-72)."""
    return F.coalesce(label, curie)


def is_blank_node(iri: Column, genid_ns: str = "http://ontology.neuinfo.org/anon/") -> Column:
    """P5 blank-node predicate (SimpleLoader.java:82-85)."""
    return iri.startswith("_:") | iri.startswith(genid_ns)


def parse_entailment(spec: str) -> dict | None:
    """F5: parse ``[prefix:types!]`` closure-override spec →
    {key, types: [..], entailed: bool, reflexive: bool}. Mirrors
    GolrLoader.resolveRelationships' regex + split("|") + backtick
    strip (GolrLoader.java:551-557)."""
    m = ENTAILMENT_RE.match(spec)
    if not m:
        return None
    key, types, flags = m.groups()
    tl = [re.sub(r"^`|`$", "", t) for t in types.split("|") if t]
    return {
        "key": key,
        "types": tl,
        "entailed": "!" in flags,
        "reflexive": "*" in flags,
    }


def compact_column(
    df: DataFrame, col: str, curie_map: dict[str, str], out: str | None = None
) -> DataFrame:
    """Convenience: add a compacted-CURIE column."""
    fn = compact_iri_udf(df.sparkSession, curie_map)
    return df.withColumn(out or f"{col}_curie", fn(F.col(col)))
