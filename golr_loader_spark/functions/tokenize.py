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

TOKENS_SCHEMA = "doc_id long, field string, term string, tf int"

# raw lexical tokens: identifiers (incl. _) or integer literals
_RAW_TOKEN = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+"
# subword split: ALLCAPS runs, CamelCase words, lowercase/digit runs
_SUBWORD = r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+"


def _code_tokens(texts: pd.Series) -> pd.DataFrame:
    """Vectorized: Series[str] indexed by doc position → DataFrame
    (doc index, term) with one row per token occurrence."""
    raw = texts.str.findall(_RAW_TOKEN).explode().dropna()
    if raw.empty:
        return pd.DataFrame({"pos": [], "term": []})
    sub = raw.str.findall(_SUBWORD)
    nsub = sub.str.len()
    # whole compound identifiers are additionally emitted as terms
    compound = raw[nsub > 1]
    flat_sub = sub.explode()
    terms = pd.concat([flat_sub, compound]).str.lower()
    return pd.DataFrame({"pos": terms.index, "term": terms.values})


def _simple_tokens(texts: pd.Series) -> pd.DataFrame:
    t = texts.str.lower().str.split().explode().dropna()
    return pd.DataFrame({"pos": t.index, "term": t.values})


_ANALYZERS = {"code": _code_tokens, "path": _code_tokens, "simple": _simple_tokens}


def analyze_query(text: str, analyzer: str = "code") -> list[str]:
    """Driver-side query analysis — same token rules as the distributed
    tokenizer (plain ``re`` on one string). Returns sorted distinct
    terms (query term multiplicity is ignored, the Lucene default)."""
    import re

    terms: set[str] = set()
    if analyzer == "simple":
        terms.update(text.lower().split())
    else:
        for tok in re.findall(_RAW_TOKEN, text):
            subs = re.findall(_SUBWORD, tok)
            terms.update(s.lower() for s in subs)
            if len(subs) > 1:
                terms.add(tok.lower())
    return sorted(terms)


def tokenize(documents: DataFrame, cfg: IndexConfig | None = None) -> DataFrame:
    """documents → (doc_id, field, term, tf).

    Each configured field name must be a string column of
    ``documents``. tf is complete per output row because one document
    occupies exactly one input row of the Arrow batch.
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
                tok = _ANALYZERS[analyzer](pdf[fname])
                if not len(tok):
                    continue
                if min_len > 1:
                    tok = tok[tok["term"].str.len() >= min_len]
                tf = (
                    tok.groupby(["pos", "term"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": pdf["doc_id"].to_numpy()[
                                tf["pos"].to_numpy(np.int64)
                            ],
                            "field": fname,
                            "term": tf["term"].to_numpy(),
                            "tf": tf["tf"].to_numpy(np.int32),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return documents.select(*cols).mapInPandas(run, schema=TOKENS_SCHEMA)
