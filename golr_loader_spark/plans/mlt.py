"""MoreLikeThis (Solr MoreLikeThisComponent / Lucene ``MoreLikeThis``
analog — the last classic Solr handler the reference's cores served
that the engine lacked; reference context: the golr UIs query the
cores loaded by GolrLoader.java:498-515).

Two stages, like Lucene:

1. **Interesting-term selection** (``select_interesting_terms``):
   analyze the seed text with the field's analyzer, keep terms passing
   the ``min_tf`` / ``min_df`` / ``max_df`` / word-length gates, score
   each ``tf_seed × idf`` and keep the top ``max_query_terms`` by
   (score desc, term asc). With ``boost=True`` each kept term carries
   the normalized clause boost ``score / best_score`` (Lucene
   ``MoreLikeThis.setBoost``); Solr's default is boost=false — this
   engine defaults to True because the boosted ranking is strictly
   more informative and the flag is exposed. Divergence (documented):
   Lucene's MLT selection idf is the classic ``log(N/(df+1))+1``;
   this engine uses its own BM25 idf everywhere for consistency —
   selection ORDER can differ from Lucene on pathological df ties.

2. **Query execution**: the selected terms become a Lucene
   query string of SHOULD clauses ``field:term^boost`` executed by the
   vetted ``search_lucene`` / ``LocalSearcher.query`` /
   ``ShardedSearcher.query`` executors (SCORING_BOOLEAN semantics —
   each clause scores BM25 × boost, summed in sorted-term order).
   The seed doc is requested as k+1 and dropped, so "more like this"
   never returns the doc itself.

Selection is a driver-side computation over ONE document's terms
(≤ a few hundred) — the df lookup is a pruned term_stats read, the
scale-relevant work (scoring the match set) stays in the distributed
executor. Boosts are serialized with
``np.format_float_positional(trim='-')`` — shortest round-trip
positional decimals, so the parsed double is bit-identical to the
computed one (the boost grammar does not accept scientific notation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.tokenize import analyze_phrase
from golr_loader_spark.plans.bm25 import _df_sums, bm25_idf
from golr_loader_spark.plans.build_index import InvertedIndex


def seed_term_freqs(
    text: str, analyzer: str, min_term_len: int = 1, chain=None
) -> dict[str, int]:
    """term → tf of the seed text under the FIELD's analyzer (the
    same tokenization — and analysis chain — the index saw)."""
    tf: dict[str, int] = {}
    for t, _p in analyze_phrase(text, analyzer, min_term_len, chain):
        tf[t] = tf.get(t, 0) + 1
    return tf


def select_interesting_terms(
    tf_map: dict[str, int],
    df_map: dict[str, int],
    n_docs: int,
    max_query_terms: int = 25,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: int | None = None,
    min_word_len: int = 0,
    max_word_len: int = 0,
    boost: bool = True,
) -> list[tuple[str, float]]:
    """[(term, clause_boost)] — Lucene MLT's interesting-term gate +
    tf×idf ranking + best-score normalization (module docstring)."""
    scored: list[tuple[str, float]] = []
    for t, tf in tf_map.items():
        if tf < min_tf:
            continue
        df = df_map.get(t, 0)
        if df < min_df or df <= 0:
            continue
        if max_df is not None and df > max_df:
            continue
        if min_word_len and len(t) < min_word_len:
            continue
        if max_word_len and len(t) > max_word_len:
            continue
        scored.append((t, float(tf) * bm25_idf(n_docs, df)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    scored = scored[:max_query_terms]
    if not scored:
        return []
    if not boost:
        return [(t, 1.0) for t, _s in scored]
    best = scored[0][1]
    return [(t, s / best) for t, s in scored]


def mlt_query_string(
    selected: list[tuple[str, float]], field: str
) -> str | None:
    """Selected terms → the SHOULD-clause Lucene query string
    ``field:t1^b1 field:t2^b2 …`` (None when nothing selected).
    Analyzed terms are word characters only, so no escaping is
    needed; boosts serialize round-trip-exact (module docstring)."""
    if not selected:
        return None
    return " ".join(
        f"{field}:{t}^{np.format_float_positional(b, trim='-')}"
        for t, b in selected
    )


def _drop_seed(rows: list, seed_doc_id, k: int) -> list:
    if seed_doc_id is None:
        return rows[:k]
    return [r for r in rows if r[0] != seed_doc_id][:k]


def more_like_this(
    index: InvertedIndex,
    text: str,
    field: str | None = None,
    k: int = 10,
    seed_doc_id: int | None = None,
    max_query_terms: int = 25,
    min_tf: int = 2,
    min_df: int = 5,
    max_df: int | None = None,
    min_word_len: int = 0,
    max_word_len: int = 0,
    boost: bool = True,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Distributed MoreLikeThis: docs most similar to ``text`` →
    top-k (doc_id, score). ``seed_doc_id`` (when the text came from an
    indexed doc) is excluded from the result. Plan shape: selection is
    a driver-side lookup over one doc's terms; execution is ONE
    ``search_lucene`` call — the single-exchange bucket-scorer plan."""
    from golr_loader_spark.plans.lucene import search_lucene

    cfg = cfg or index.cfg
    field = field or next(iter(cfg.fields))
    if field not in cfg.fields:
        raise ValueError(f"field {field!r} not in config ({list(cfg.fields)})")
    spark = index.postings.sparkSession
    tf_map = seed_term_freqs(text, cfg.fields[field][0], cfg.min_term_len, cfg.chain)
    df_map = _df_map_distributed(index, sorted(tf_map), field)
    selected = select_interesting_terms(
        tf_map, df_map, index.n_docs, max_query_terms, min_tf, min_df,
        max_df, min_word_len, max_word_len, boost,
    )
    qs = mlt_query_string(selected, field)
    if qs is None:
        return spark.createDataFrame([], "doc_id long, score double")
    fetch = k if seed_doc_id is None else k + 1
    hits = search_lucene(index, qs, k=fetch, cfg=cfg)
    if seed_doc_id is not None:
        hits = (
            hits.filter(F.col("doc_id") != F.lit(int(seed_doc_id)))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    return hits


def more_like_this_doc(
    index: InvertedIndex,
    docs: DataFrame,
    doc_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """MoreLikeThis seeded by an indexed document: fetch the seed row
    from ``docs`` (pushed-down point filter — one row crosses to the
    driver) and delegate to ``more_like_this`` with the seed
    excluded."""
    row = (
        docs.filter(F.col(id_col) == F.lit(int(doc_id)))
        .select(text_col)
        .collect()
    )
    if not row:
        raise ValueError(f"doc_id {doc_id} not found in docs")
    return more_like_this(
        index, row[0][0] or "", seed_doc_id=int(doc_id), **kwargs
    )


def _df_map_distributed(
    index: InvertedIndex, terms: list[str], field: str
) -> dict[str, int]:
    """term → Σdf for the seed's terms in ``field`` (pruned term_stats
    read, bounded by one doc's distinct terms)."""
    if not terms:
        return {}
    rows = (
        index.term_stats.filter(
            F.col("term").isin(terms) & (F.col("field") == F.lit(field))
        )
        .select("term", "field", "df")
        .collect()
    )
    return {t: d for (t, _f), d in _df_sums(rows).items()}
