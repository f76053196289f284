"""Lucene/Solr query-string surface (classic QueryParser subset).

The reference loads documents INTO a Solr core precisely so users can
issue Lucene-syntax queries against it; this module gives the engine
the same front door. Supported syntax:

* bare terms — analyzed with the index's query analyzer; OR by
  default (Solr ``q.op=OR``);
* ``+term`` / ``-term`` — MUST / MUST_NOT (Lucene occurs);
* ``a AND b`` / ``a OR b`` / ``NOT a`` / ``&&`` ``||`` ``!`` — the
  classic parser's flat simplification: AND marks both neighbours
  MUST, NOT marks the next clause MUST_NOT, OR is the default;
* ``"quoted phrase"`` and ``"quoted phrase"~N`` — (sloppy)
  PhraseQuery, positional index required;
* ``prefix*`` — PrefixQuery (SCORING_BOOLEAN rewrite);
* ``term~`` / ``term~1`` — FuzzyQuery (Levenshtein expansion,
  default max edits 2, like Lucene).

Unsupported (clear ``ValueError``): parentheses/nesting, ``field:``
selectors, range queries, boosts (``^``), wildcards other than a
trailing ``*``.

Execution maps onto the engine's existing machinery, so every clause
type keeps its already-oracled semantics:

* term clauses → ``bm25._score_bucket_factory`` (one bucket-grouped
  job); MUST prefix/fuzzy become required ANY-OF GROUPS over their
  expansions — exactly Lucene's rewrite of a MUST multi-term query
  into a required disjunction;
* MUST_NOT prefix/fuzzy → their expansions join the prohibited set
  (decoded for membership in-bucket, no extra shuffle);
* phrase clauses → ``phrase.phrase_search_positional`` (PhraseWeight
  scoring), combined relationally: MUST phrases inner-join and add
  their score, SHOULD phrases outer/left-join and add, MUST_NOT
  phrases anti-join. Phrase clause sets are complete (k = corpus
  size): at scale these are selective semi/anti joins, the shape AQE
  broadcasts.

Scores are Lucene BooleanQuery semantics: the sum of the matching
clauses' scores; ranking (score desc, doc_id asc) as everywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.functions.tokenize import analyze_query
from golr_loader_spark.plans.bm25 import (
    _avgdl,
    _df_sums,
    _score_bucket_factory,
    bm25_idf,
    query_analyzer,
)
from golr_loader_spark.plans.build_index import InvertedIndex

MUST, SHOULD, MUST_NOT = "MUST", "SHOULD", "MUST_NOT"


@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class Phrase:
    text: str
    slop: int = 0


@dataclass(frozen=True)
class Prefix:
    text: str


@dataclass(frozen=True)
class Fuzzy:
    text: str
    max_edits: int = 2


_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<phrase>"(?P<ptext>[^"]*)"(?:~(?P<pslop>\d+))?)
    | (?P<and>AND|&&)
    | (?P<or>OR|\|\|)
    | (?P<not>NOT|!)
    | (?P<plus>\+)
    | (?P<minus>-)
    | (?P<word>[^\s+\-!"()][^\s"()]*)
    | (?P<bad>[()])
    )
    """,
    re.VERBOSE,
)


def parse_lucene(query: str) -> list[tuple[str, object]]:
    """Query string → flat clause list [(occur, node)].

    Classic-parser flat semantics: explicit ``+``/``-`` win; ``AND``
    promotes both neighbours to MUST; ``NOT`` makes the next clause
    MUST_NOT; everything else is SHOULD."""
    if query.count('"') % 2:
        raise ValueError("unbalanced quotes in query")
    clauses: list[list] = []  # [occur, node, explicit]
    pending_occur: str | None = None
    pending_explicit = False
    and_prev = False
    pos = 0
    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if not m or m.end() == pos:
            if query[pos:].strip():
                raise ValueError(f"cannot parse query at: {query[pos:]!r}")
            break
        pos = m.end()
        if m.group("bad"):
            raise ValueError(
                "parentheses / nested boolean queries are not supported"
            )
        if m.group("and"):
            if clauses and not clauses[-1][2]:
                clauses[-1][0] = MUST
            and_prev = True
            continue
        if m.group("or"):
            and_prev = False
            continue
        if m.group("not"):
            pending_occur, pending_explicit = MUST_NOT, True
            continue
        if m.group("plus"):
            pending_occur, pending_explicit = MUST, True
            continue
        if m.group("minus"):
            pending_occur, pending_explicit = MUST_NOT, True
            continue

        if m.group("phrase") is not None:
            node: object = Phrase(
                m.group("ptext"), int(m.group("pslop") or 0)
            )
        else:
            w = m.group("word")
            if ":" in w:
                raise ValueError("field: selectors are not supported")
            fm = re.fullmatch(r"(.+?)~(\d?)", w)
            if fm:
                node = Fuzzy(fm.group(1), int(fm.group(2) or 2))
            elif w.endswith("*") and len(w) > 1 and "*" not in w[:-1]:
                node = Prefix(w[:-1])
            elif "*" in w:
                raise ValueError(
                    "only trailing-* wildcards are supported"
                )
            else:
                node = Term(w)
        occur = pending_occur or (MUST if and_prev else SHOULD)
        explicit = pending_explicit or and_prev
        clauses.append([occur, node, explicit])
        pending_occur, pending_explicit, and_prev = None, False, False
    return [(occ, node) for occ, node, _e in clauses]


def _expand_prefix(
    index: InvertedIndex, cfg: IndexConfig, p: str, max_expansions: int
) -> list:
    rows = (
        index.term_stats.filter(
            F.col("term").startswith(p.lower())
            & F.col("field").isin(list(cfg.fields))
        )
        .select("term", "field", "df")
        .collect()
    )
    if len({r["term"] for r in rows}) > max_expansions:
        raise ValueError(
            f"prefix '{p}' expands to >{max_expansions} terms "
            "(Lucene TooManyClauses analog)"
        )
    return rows


def _expand_fuzzy(
    index: InvertedIndex, cfg: IndexConfig, t: str, max_edits: int,
    max_expansions: int,
) -> list:
    rows = (
        index.term_stats.filter(
            F.col("field").isin(list(cfg.fields))
            & (F.levenshtein(F.col("term"), F.lit(t.lower())) <= max_edits)
        )
        .select("term", "field", "df")
        .collect()
    )
    if len({r["term"] for r in rows}) > max_expansions:
        raise ValueError(
            f"fuzzy '{t}'~{max_edits} expands to >{max_expansions} terms"
        )
    return rows


def search_lucene(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
    exclude_ids=None,
    max_expansions: int = 1024,
) -> DataFrame:
    """Execute a Lucene query string → top-k (doc_id, score).

    See the module docstring for syntax and the execution mapping.
    Pure negative queries (only MUST_NOT clauses) return no rows,
    like Lucene."""
    from golr_loader_spark.plans.phrase import phrase_search_positional

    cfg = cfg or index.cfg
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    clauses = parse_lucene(query)
    if not clauses:
        return empty
    qan = query_analyzer(cfg)

    should_terms: set[str] = set()
    groups: list[set[str]] = []  # MUST any-of groups
    prohibited: set[str] = set()
    expansion_rows: list = []  # term_stats rows for expanded terms
    phrases: list[tuple[str, Phrase]] = []
    for occur, node in clauses:
        if isinstance(node, Phrase):
            phrases.append((occur, node))
            continue
        if isinstance(node, Term):
            terms = set(analyze_query(node.text, qan))
        else:
            rows = (
                _expand_prefix(index, cfg, node.text, max_expansions)
                if isinstance(node, Prefix)
                else _expand_fuzzy(
                    index, cfg, node.text, node.max_edits, max_expansions
                )
            )
            terms = {r["term"] for r in rows}
            if occur != MUST_NOT:
                expansion_rows.extend(rows)
        if not terms:
            if occur == MUST and isinstance(node, (Prefix, Fuzzy, Term)):
                return empty  # a MUST clause matching nothing
            continue
        if occur == MUST_NOT:
            prohibited |= terms
        elif occur == MUST:
            # one analyzed query word can yield several index terms
            # (code analyzer subwords) — any of them satisfies the
            # clause, all of them score
            groups.append(terms)
            should_terms |= terms
        else:
            should_terms |= terms

    if not should_terms and not phrases:
        return empty  # nothing positive to match (pure negation)

    bool_df = None
    if should_terms:
        from golr_loader_spark.plans.bm25 import _idf_table

        idf = _idf_table(index, sorted(should_terms))
        for (t, f), d in _df_sums(expansion_rows).items():
            idf.setdefault((t, f), bm25_idf(index.n_docs, d))
        weights = {
            (t, f): (cfg.fields[f][1] * i) * (cfg.k1 + 1.0)
            for (t, f), i in idf.items()
            if f in cfg.fields and t in should_terms
        }
        avail = {t for (t, _f) in weights}
        if any(not (g & avail) for g in groups):
            return empty  # a MUST group has no indexed term
        groups = [g & avail for g in groups]
        cand = index.postings.filter(
            F.col("term").isin(sorted(should_terms | prohibited))
            & F.col("field").isin(list(cfg.fields))
        )
        fn = _score_bucket_factory(
            weights,
            _avgdl(index),
            cfg,
            k if not phrases else index.n_docs,
            exclude_ids=exclude_ids,
            prohibited_terms=prohibited or None,
            required_groups=groups or None,
        )
        bool_df = cand.groupBy("bucket").applyInPandas(
            fn, schema="doc_id long, score double"
        )

    out = bool_df
    has_must = bool(groups)
    # positives first: a MUST_NOT phrase must subtract from the final
    # positive set regardless of its position in the query string
    phrases.sort(key=lambda c: c[0] == MUST_NOT)
    for occur, ph in phrases:
        pdf = phrase_search_positional(
            index, ph.text, k=index.n_docs, slop=ph.slop, cfg=cfg,
            exclude_ids=exclude_ids,
        ).withColumnRenamed("score", "_ps")
        if occur == MUST_NOT:
            if out is not None:
                out = out.join(pdf.select("doc_id"), on="doc_id", how="left_anti")
            continue
        if out is None:
            out = pdf.withColumnRenamed("_ps", "score")
            if occur == MUST:
                has_must = True
            continue
        if occur == MUST:
            out = (
                out.join(pdf, on="doc_id", how="inner")
                .withColumn("score", F.col("score") + F.col("_ps"))
                .drop("_ps")
            )
            has_must = True
        else:  # SHOULD phrase
            how = "left_outer" if has_must else "full_outer"
            out = (
                out.join(pdf, on="doc_id", how=how)
                .withColumn(
                    "score",
                    F.coalesce(F.col("score"), F.lit(0.0))
                    + F.coalesce(F.col("_ps"), F.lit(0.0)),
                )
                .drop("_ps")
            )
    if out is None:
        return empty
    if prohibited and bool_df is None:
        # phrase-only positive part: apply term MUST_NOTs relationally
        # (decode only the prohibited terms' doc_id streams)
        from golr_loader_spark.plans.phrase import decode_postings

        neg = decode_postings(
            index, sorted(prohibited), cfg, exclude_ids=exclude_ids
        ).select("doc_id").distinct()
        out = out.join(neg, on="doc_id", how="left_anti")
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
