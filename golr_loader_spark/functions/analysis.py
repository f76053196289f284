"""Solr-style analysis chain: stopwords, minimal plural stemming,
and index-time synonym expansion.

The reference delegated all of this to Solr's per-fieldType analyzer
chains (schema.xml ``StopFilterFactory`` / ``EnglishMinimalStemFilter``
/ ``SynonymGraphFilterFactory`` — the serving side of the documents
golr-loader POSTs at GolrLoader.java:498-515). Here the chain is a
frozen config (`IndexConfig.stopwords/stem/synonyms`) applied in TWO
places that must agree exactly:

  * distributed, inside the tokenizer's flat per-occurrence arrays
    (`functions/tokenize.py`) — vectorized pandas/numpy, no per-row
    Python;
  * driver-side, in `analyze_query`/`analyze_phrase`/`analyze_with_tf`
    via `AnalysisChain.transform` — one token at a time on the tiny
    query string.

Semantics (each documented where it diverges from a Lucene default):

  * **Stopwords** drop the token but PRESERVE position gaps
    (Lucene ``enablePositionIncrements=true``): the phrase matcher
    enforces the exact gap across a dropped stopword.
  * **Stemming** (``stem="minimal_english"``) is a minimal plural
    stemmer in the spirit of Lucene's ``EnglishMinimalStemFilter``:
    only pure-alpha lowercase tokens of length ≥ 4 are touched;
    ``*ss/*us/*is`` endings are kept; ``*ies`` (length ≥ 5) →
    ``*y``; otherwise a single trailing ``s`` is dropped. The rule
    set is deliberately small enough to restate in ANSI SQL, so the
    DuckDB oracle can replay the whole chain bit-exactly.
  * **Synonyms** are single-token groups expanded at INDEX time
    (Lucene ``SynonymFilter`` with posinc=0): every occurrence of a
    member also emits the other members at the SAME position, so
    every query path — term, conjunctive, phrase, dismax — matches
    synonyms with zero query-side logic. Groups are matched against
    the POST-stem token stream, so configure members in analyzed
    form. Injected tokens DO count toward document length (documented
    divergence from Lucene's ``discountOverlaps`` default): the
    engine derives avgdl from posting-block ``Σ tf_sum`` without a
    raw-token pass, so dl and avgdl must see the same token stream —
    and the SQL twin replays exactly that definition.

Filter order (replayed identically in the SQL twins):
``tokenize → length(min_term_len, pre-stem) → stopwords(pre-stem) →
stem → synonyms``.

Known sharp edge, inherited from composing WordDelimiter-style
splitting with synonym injection (Lucene has the same one): a synonym
target that collides with the compound-identifier overlay at the same
position (e.g. group ``("get", "getuserdata")`` over the text
``getUserData``) would duplicate a (doc, term, position) triple. The
positional path dedupes such triples; the non-positional path can
overcount that tf by ≤ 1 per pathological occurrence. Don't configure
a group containing both an identifier's first subword and its own
compound form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_ALPHA = r"[a-z]+"
_MEMBER = r"[a-z0-9]+"


def stem_minimal_english(t: str) -> str:
    """Minimal plural stemmer, scalar form. Mirrors `stem_series`
    and the SQL CASE expression in the oracle twins — all three must
    stay rule-for-rule identical."""
    import re

    if len(t) < 4 or not re.fullmatch(_ALPHA, t):
        return t
    if t.endswith(("ss", "us", "is")):
        return t
    if len(t) >= 5 and t.endswith("ies"):
        return t[:-3] + "y"
    if t.endswith("s"):
        return t[:-1]
    return t


def stem_series(s: pd.Series) -> pd.Series:
    """Vectorized `stem_minimal_english` over a string Series."""
    s = s.astype(object)
    alpha = s.str.fullmatch(_ALPHA, na=False)
    n = s.str.len()
    eligible = alpha & (n >= 4) & ~s.str.endswith(("ss", "us", "is"), na=False)
    ies = eligible & (n >= 5) & s.str.endswith("ies", na=False)
    plain = eligible & ~ies & s.str.endswith("s", na=False)
    out = s.copy()
    out[ies] = s[ies].str.slice(0, -3) + "y"
    out[plain] = s[plain].str.slice(0, -1)
    return out


# the SQL twin of the stemmer, for composing oracle queries. {t} is
# the token expression. DuckDB + ANSI string functions only.
STEM_SQL = """CASE
  WHEN NOT regexp_matches({t}, '^[a-z]+$') THEN {t}
  WHEN length({t}) < 4 THEN {t}
  WHEN {t} LIKE '%ss' OR {t} LIKE '%us' OR {t} LIKE '%is' THEN {t}
  WHEN length({t}) >= 5 AND {t} LIKE '%ies'
       THEN substr({t}, 1, length({t}) - 3) || 'y'
  WHEN {t} LIKE '%s' THEN substr({t}, 1, length({t}) - 1)
  ELSE {t} END"""


@dataclass(frozen=True)
class AnalysisChain:
    """Resolved filter chain (built by ``IndexConfig.chain``).

    ``synonyms`` is the merged member→other-members map: a term in
    several groups maps to the union of its group-mates.
    """

    stopwords: frozenset = frozenset()
    stem: bool = False
    synonyms: dict = field(default_factory=dict)
    min_term_len: int = 1

    # ---- driver-side (query analysis), one token at a time ----

    def transform(self, t: str) -> str | None:
        """length → stop → stem. None = token dropped (callers keep
        the position gap, as with min_term_len)."""
        if len(t) < self.min_term_len or t in self.stopwords:
            return None
        return stem_minimal_english(t) if self.stem else t

    # ---- distributed side (tokenizer flat arrays) ----

    def map_vocab(self, vocab: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per-vocab-entry (keep mask, transformed strings). Length
        and stopword checks run on the PRE-stem form (filter order
        above); the returned strings are post-stem."""
        s = pd.Series(vocab, dtype=object)
        keep = s.str.len() >= self.min_term_len
        if self.stopwords:
            keep &= ~s.isin(self.stopwords)
        out = stem_series(s) if self.stem else s
        return keep.to_numpy(bool), out.to_numpy(object)

    def expansion(self, vocab: np.ndarray):
        """Index-time synonym expansion plan over a (post-stem)
        vocab: returns (ext_vocab, counts, flat_targets) where
        ``counts[i]`` is how many extra terms vocab entry ``i``
        injects and ``flat_targets`` are their codes into
        ``ext_vocab`` (vocab plus any members absent from it),
        concatenated in vocab order. Returns None when no vocab entry
        participates in any group."""
        if not self.synonyms:
            return None
        idx = {t: i for i, t in enumerate(vocab)}
        ext = list(vocab)
        counts = np.zeros(len(vocab), dtype=np.int64)
        flat: list[int] = []
        hit = False
        for i, t in enumerate(vocab):
            mates = self.synonyms.get(t)
            if not mates:
                continue
            hit = True
            counts[i] = len(mates)
            for m in mates:
                j = idx.get(m)
                if j is None:
                    j = idx[m] = len(ext)
                    ext.append(m)
                flat.append(j)
        if not hit:
            return None
        return (
            np.asarray(ext, dtype=object),
            counts,
            np.asarray(flat, dtype=np.int64),
        )


def build_chain(
    stopwords: tuple, stem: str | None, synonyms: tuple, min_term_len: int
) -> AnalysisChain | None:
    """IndexConfig fields → AnalysisChain, or None when the chain is
    a no-op (every existing config: zero overhead, identical plans)."""
    if not stopwords and not stem and not synonyms:
        return None
    if stem not in (None, "minimal_english"):
        raise ValueError(f"unknown stemmer {stem!r}")
    import re

    merged: dict[str, tuple] = {}
    groups: dict[str, set] = {}
    for group in synonyms:
        for m in group:
            if not re.fullmatch(_MEMBER, m):
                raise ValueError(
                    f"synonym member {m!r} must be a single analyzed "
                    "token ([a-z0-9]+) — multi-word and compound "
                    "members are not supported"
                )
            groups.setdefault(m, set()).update(x for x in group if x != m)
    for m, mates in groups.items():
        merged[m] = tuple(sorted(mates))
    return AnalysisChain(
        stopwords=frozenset(stopwords),
        stem=bool(stem),
        synonyms=merged,
        min_term_len=min_term_len,
    )
