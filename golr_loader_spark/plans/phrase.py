"""Phrase queries over the compressed index (Lucene PhraseQuery
analog — the other core query type of the Solr engine the reference
loads into; golr's search UI issues quoted-phrase queries against the
same cores the loader fills).

Strategy: **match + verify + index-backed scoring** — the standard
shape for engines without positional postings:

1. candidate generation from the index — conjunctive membership
   (``facets.matching_doc_ids`` mode="and"): only docs containing
   every phrase term can contain the phrase, and that set is read by
   decoding doc_id streams only (no tf/dl decode, no scoring);
2. verification against the corpus — a (bucket, doc_id) equi-join of
   the candidates to the documents table plus a substring test on the
   analyzer's token stream. For the ``simple`` analyzer the token
   stream IS ``lower(text)`` split on single spaces, so consecutive
   tokens ⇔ ``' '||lower(text)||' '`` contains ``' t1 t2 … '`` — a
   pure JVM-side ``contains``, bit-identical to its ANSI-SQL twin;
3. scoring from the index — ``decode_postings`` flattens ONLY the
   phrase terms' posting blocks back to (doc_id, tf, dl) rows,
   semi-joined to the verified set, then the exact BM25 fold
   (contributions summed in sorted (field, term) order — the module
   float-determinism discipline) and a distributed
   TakeOrderedAndProject top-k. idf/avgdl are corpus-level stats from
   the index, NOT the candidate subset — same weights as
   ``bm25.search``.

At 100 TB: candidates of a selective phrase are a tiny fraction of
the corpus; every join here is a (bucket, doc_id) equi-join that AQE
broadcasts when the candidate side is small, and the decode touches
only the phrase terms' blocks. No driver-side materialization
anywhere.

Positions-in-the-index (decode-free verification) would change the
block format; this composition keeps the single-pass build and gets
exact phrase semantics certified by the DuckDB oracle (SQL_Q37).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.codec import varint_decode
from golr_loader_spark.functions.tokenize import analyze_query
from golr_loader_spark.plans.bm25 import _idf_table, query_analyzer
from golr_loader_spark.plans.build_index import InvertedIndex, bucket_of
from golr_loader_spark.plans.facets import matching_doc_ids


def decode_postings(
    index: InvertedIndex,
    terms: list[str],
    cfg: IndexConfig | None = None,
    exclude_ids=None,
) -> DataFrame:
    """Flatten the given terms' posting blocks back to row form →
    (term, field, bucket, doc_id, tf, dl). Reads only the matching
    blocks (parquet row-group pruning via the term predicate); useful
    for index introspection and for scoring an externally-filtered
    doc set without re-tokenizing the corpus. ``exclude_ids`` (either
    bm25._norm_excl shape) masks tombstoned/superseded postings by
    each block's segment — a fast-upserted doc decodes from its newest
    copy only."""
    from golr_loader_spark.plans.bm25 import _live_of, _norm_excl

    cfg = cfg or index.cfg
    excl = _norm_excl(exclude_ids)
    sel = ["term", "field", "bucket", "doc_id_first", "doc_ids", "tfs", "dls"]
    if "segment" in index.postings.columns:
        sel.append("segment")
    cand = index.postings.filter(
        F.col("term").isin(list(terms)) & F.col("field").isin(list(cfg.fields))
    ).select(*sel)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for r in pdf.itertuples(index=False):
                ids = np.cumsum(varint_decode(r.doc_ids).astype(np.int64)) + np.int64(
                    r.doc_id_first
                )
                tfs = varint_decode(r.tfs).astype(np.int32)
                dls = varint_decode(r.dls).astype(np.int32)
                if excl is not None:
                    seg = np.int64(getattr(r, "segment", 0))
                    keep = _live_of(ids, np.full(len(ids), seg), excl)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                if not len(ids):
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "term": r.term,
                            "field": r.field,
                            "bucket": np.int32(r.bucket),
                            "doc_id": ids,
                            "tf": tfs,
                            "dl": dls,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return cand.mapInPandas(
        run,
        schema="term string, field string, bucket int, doc_id long, tf int, dl int",
    )


def phrase_search(
    index: InvertedIndex,
    documents: DataFrame,
    phrase: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
    id_col: str = "doc_id",
    exclude_ids=None,
) -> DataFrame:
    """Top-k BM25 over docs containing ``phrase`` as consecutive
    tokens → (doc_id, score). Scores are the conjunctive BM25 of the
    phrase's terms (idf/avgdl from the whole corpus), tie-break
    (score desc, doc_id asc) — identical discipline to ``bm25.search``.

    Requires a single-``simple``-analyzer config: only there is the
    token stream a literal substring of the text (code/path analyzers
    reorder and duplicate subtokens, so consecutive-token semantics
    need positional postings — not implemented)."""
    cfg = cfg or index.cfg
    if query_analyzer(cfg) != "simple":
        raise NotImplementedError(
            "phrase_search requires a single-'simple'-analyzer config; "
            "code/path analyzers need positional postings"
        )
    spark = index.postings.sparkSession
    terms = [t for t in phrase.lower().split(" ") if t]
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    cand = matching_doc_ids(
        index, phrase, cfg=cfg, mode="and", exclude_ids=exclude_ids
    )
    needle = " " + " ".join(terms) + " "
    text_col = next(iter(cfg.fields))
    verified = (
        documents.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
        )
        .withColumn(
            "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
        )
        .join(cand, on=["bucket", "doc_id"], how="left_semi")
        .filter(
            F.concat(F.lit(" "), F.lower(F.col("_text")), F.lit(" ")).contains(needle)
        )
        .select("bucket", "doc_id")
    )

    idf = _idf_table(index, terms)
    weights = [
        (t, f, (cfg.fields[f][1] * i) * (cfg.k1 + 1.0))
        for (t, f), i in idf.items()
        if f in cfg.fields
    ]
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    wdf = spark.createDataFrame(weights, "term string, field string, wt double")
    avgdl = index.avgdl_by_field
    avgdl_map = F.create_map(*[F.lit(x) for kv in avgdl.items() for x in kv])

    flat = decode_postings(index, terms, cfg, exclude_ids=exclude_ids).join(
        verified, on=["bucket", "doc_id"], how="left_semi"
    )
    contrib = (
        flat.join(F.broadcast(wdf), on=["term", "field"])
        .withColumn(
            "contrib",
            F.col("wt")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(cfg.k1)
                * (
                    F.lit(1.0 - cfg.b)
                    + F.lit(cfg.b) * F.col("dl") / F.element_at(avgdl_map, F.col("field"))
                )
            ),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("field", "term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
