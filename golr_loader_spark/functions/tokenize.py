"""Arrow-vectorized code-aware tokenizer.

The UDTF-shaped stage (one document row → many ``(doc_id, field,
term, tf)`` rows) that replaces Solr's analyzer chain — the half of
the pipeline golr-loader delegated at GolrLoader.java:498-515. Runs
as ``mapInPandas``; inside, all string work is pandas ``str`` ops
(findall / explode / groupby-size) — no per-row Python loops.

Analyzers (IndexConfig.fields):
  * ``code`` / ``path`` — extract identifier/number tokens, split
    snake_case and camelCase into subtokens, lowercase; compound
    identifiers are ALSO emitted whole (the base-field + closure-field
    convention of SolrDocUtil.java:25-44 collapsed into one term
    space: ``user_data`` indexes as ``user_data``, ``user``, ``data``).
  * ``simple`` — whitespace split + lowercase (ANSI-SQL-expressible;
    used for the DuckDB oracle parity queries).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from golr_loader_spark.config import IndexConfig

TOKENS_SCHEMA = "doc_id long, field string, term string, tf int, dl int"

# raw lexical tokens: identifiers (incl. _) or integer literals
_RAW_TOKEN = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+"
# subword split: ALLCAPS runs, CamelCase words, lowercase/digit runs
_SUBWORD = r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+"


def _code_tokens(texts: pd.Series) -> pd.DataFrame:
    """Vectorized: Series[str] indexed by doc position → DataFrame
    (doc index, term) with one row per token occurrence.

    The subword split runs only on the batch's UNIQUE raw tokens
    (factorize), then expands back by occurrence with numpy repeats —
    a corpus has millions of occurrences but only thousands of
    distinct identifiers, so this removes ~99% of the regex work."""
    raw = texts.str.findall(_RAW_TOKEN).explode().dropna()
    if raw.empty:
        return pd.DataFrame({"pos": [], "term": [], "tf": [], "dl": []})
    positions = raw.index.to_numpy(np.int64)
    codes, uniques = pd.factorize(raw.to_numpy(), sort=False)

    # subword split of the unique identifiers, all in pandas str ops:
    # per-unique term list = lowercased subwords, plus the compound
    # identifier itself when it split into >1 subword
    usr = pd.Series(uniques)
    subs = usr.str.findall(_SUBWORD)
    nsubs = subs.str.len().to_numpy(np.int64)
    sub_flat = subs.explode().dropna()
    sub_low = sub_flat.str.lower().to_numpy()
    sub_owner = sub_flat.index.to_numpy(np.int64)
    lens = nsubs + (nsubs > 1)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    flat_uniq_terms = np.empty(int(offsets[-1]), dtype=object)
    within_sub = np.arange(len(sub_owner)) - np.repeat(
        np.concatenate([[0], np.cumsum(nsubs)])[:-1], nsubs
    )
    flat_uniq_terms[offsets[sub_owner] + within_sub] = sub_low
    compound = np.flatnonzero(nsubs > 1)
    flat_uniq_terms[offsets[compound] + nsubs[compound]] = (
        usr.iloc[compound].str.lower().to_numpy()
    )

    counts = lens[codes]
    total = int(counts.sum())
    out_pos = np.repeat(positions, counts)
    starts = np.repeat(offsets[codes], counts)
    within = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)])[:-1], counts
    )
    # canonical term codes: identical term strings from different raw
    # identifiers must share one code ("user" from getUserData AND
    # user_data), else tf under-counts and posting lists get duplicate
    # doc_ids
    term_codes_flat, term_vocab = pd.factorize(flat_uniq_terms, sort=False)
    tkey = term_codes_flat[starts + within]

    # tf/dl aggregation on integer keys (pos, tkey) — no string groupby
    L = len(term_vocab)
    combined = out_pos * L + tkey
    uniq_keys, tf = np.unique(combined, return_counts=True)
    agg_pos = uniq_keys // L
    agg_term = term_vocab[uniq_keys % L]
    dl = np.bincount(out_pos, minlength=int(positions.max()) + 1 if len(positions) else 0)
    return pd.DataFrame(
        {
            "pos": agg_pos,
            "term": agg_term,
            "tf": tf.astype(np.int32),
            "dl": dl[agg_pos].astype(np.int32),
        }
    )


def _simple_tokens(texts: pd.Series) -> pd.DataFrame:
    # literal single-space split (keeps empty tokens), exactly
    # string_split(lower(text), ' ') — the analyzer must be
    # bit-identical to its ANSI-SQL twin, not merely close
    t = texts.str.lower().str.split(" ").explode().dropna()
    tok = pd.DataFrame({"pos": t.index, "term": t.values})
    tf = tok.groupby(["pos", "term"], sort=False).size().reset_index(name="tf")
    tf["dl"] = tf.groupby("pos", sort=False)["tf"].transform("sum").to_numpy(np.int32)
    tf["tf"] = tf["tf"].astype(np.int32)
    return tf


_ANALYZERS = {"code": _code_tokens, "path": _code_tokens, "simple": _simple_tokens}


def analyze_query(text: str, analyzer: str = "code") -> list[str]:
    """Driver-side query analysis — same token rules as the distributed
    tokenizer (plain ``re`` on one string). Returns sorted distinct
    terms (query term multiplicity is ignored, the Lucene default)."""
    import re

    terms: set[str] = set()
    if analyzer == "simple":
        terms.update(t for t in text.lower().split(" ") if t)
    else:
        for tok in re.findall(_RAW_TOKEN, text):
            subs = re.findall(_SUBWORD, tok)
            terms.update(s.lower() for s in subs)
            if len(subs) > 1:
                terms.add(tok.lower())
    return sorted(terms)


def analyze_with_tf(text: str, analyzer: str = "code") -> dict[str, int]:
    """Driver-side analysis of ONE string keeping term frequencies —
    the term-vector read that More-Like-This needs (Lucene re-analyzes
    stored text when term vectors are absent; same here). Token rules
    are identical to the distributed tokenizer's."""
    import re
    from collections import Counter

    tf: Counter[str] = Counter()
    if analyzer == "simple":
        tf.update(t for t in text.lower().split(" ") if t)
    else:
        for tok in re.findall(_RAW_TOKEN, text):
            subs = re.findall(_SUBWORD, tok)
            tf.update(s.lower() for s in subs)
            if len(subs) > 1:
                tf[tok.lower()] += 1
    return dict(tf)


def tokenize(documents: DataFrame, cfg: IndexConfig | None = None) -> DataFrame:
    """documents → (doc_id, field, term, tf, dl).

    Each configured field name must be a string column of
    ``documents``. tf is complete per output row because one document
    occupies exactly one input row of the Arrow batch; dl (the doc's
    token count in that field) rides along so downstream BM25 stages
    never join a separate doc-length table — one fewer wide shuffle
    in the index build.
    """
    cfg = cfg or IndexConfig()
    field_spec = [(f, a) for f, (a, _b) in cfg.fields.items()]
    min_len = cfg.min_term_len
    cols = ["doc_id"] + [f for f, _ in field_spec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            out = []
            for fname, analyzer in field_spec:
                agg = _ANALYZERS[analyzer](pdf[fname])
                if not len(agg):
                    continue
                if min_len > 1:
                    agg = agg[agg["term"].str.len() >= min_len]
                    # INVARIANT: dl ≡ Σ tf over the kept rows — the
                    # document's length in INDEXED tokens. Derived
                    # corpus stats (avgdl = Σ tf_sum / n_docs over
                    # posting blocks) rely on this, so dl is
                    # recomputed after the filter.
                    agg = agg.copy()
                    agg["dl"] = (
                        agg.groupby("pos", sort=False)["tf"]
                        .transform("sum")
                        .to_numpy(np.int32)
                    )
                pos = agg["pos"].to_numpy(np.int64)
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"].to_numpy()[pos],
                            "field": fname,
                            "term": agg["term"].to_numpy(),
                            "tf": agg["tf"].to_numpy(np.int32),
                            "dl": agg["dl"].to_numpy(np.int32),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return documents.select(*cols).mapInPandas(run, schema=TOKENS_SCHEMA)
