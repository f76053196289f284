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
  default max edits 2, like Lucene);
* ``field:term`` / ``field:"a phrase"`` — field selectors: the
  clause scores, matches, and (for MUST/MUST_NOT) gates on that
  field only; the field must exist in the IndexConfig;
* ``term^2`` / ``"a phrase"^1.5`` — clause boosts (multiply the
  clause's score contribution; clauses hitting the same (term,
  field) sum, scoring being linear in the weight);
* ``(a OR b) AND c`` — parenthesized sub-queries nest arbitrarily
  (``Group`` nodes; a group's boost ``(...)^2`` scales every score
  it contributes). A MUST/SHOULD/MUST_NOT group combines
  relationally exactly like a phrase clause: its complete sub-match
  set joins the accumulated result;
* ``field:[a TO b]`` / ``{a TO b}`` — TermRangeQuery: lexicographic
  term-dictionary slice (``*`` endpoint = open; brackets pick
  inclusive/exclusive per side), scored under the SCORING_BOOLEAN
  rewrite like prefix/fuzzy (Lucene defaults ranges to
  constant-score; this engine scores expansions uniformly —
  documented divergence);
* wildcard clauses ``te*t`` / ``t?st`` / ``*ark`` (Lucene
  WildcardQuery) — anchored-regex dictionary expansion with the
  literal prefix pushed down; trailing-``*``-only patterns parse to
  the cheaper ``Prefix``;
* ``fq=`` (on ``search_lucene`` / ``facet_counts``) — Solr filter
  query: a non-scoring match-set restriction (semi-join); bare-term
  fqs match by decoding doc_id streams only.

Unsupported (clear ``ValueError``): ``field:(...)`` grouped field
queries, conditional mm specs.

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
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    text: str
    slop: int = 0
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix:
    text: str
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    text: str
    max_edits: int = 2
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    """Lucene WildcardQuery: ``te*t`` / ``t?st`` / ``*ark`` — ``*``
    any sequence, ``?`` one char, anywhere in the pattern. Trailing-*
    only patterns parse to the cheaper ``Prefix`` instead; everything
    else lands here and expands via the dictionary regex scan with the
    literal prefix pushed down (bm25.wildcard_regex /
    wildcard_literal_prefix)."""

    text: str
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class TermRange:
    """Lucene TermRangeQuery: ``field:[lo TO hi]`` (inclusive) /
    ``{lo TO hi}`` (exclusive; brackets mix). ``*`` endpoint = open.
    Lexicographic term-dictionary range, scored under the
    SCORING_BOOLEAN rewrite like Prefix/Fuzzy (Lucene defaults ranges
    to constant-score; this engine scores every expansion for
    consistency with its other multi-term queries — documented)."""

    lo: str | None
    hi: str | None
    include_lo: bool = True
    include_hi: bool = True
    field: str | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class Group:
    """A parenthesized sub-query: ``(a OR b) AND c``. Carries its own
    clause list with the same flat classic-parser semantics; groups
    nest arbitrarily."""

    clauses: tuple  # tuple[(occur, node), ...]
    boost: float = 1.0


_TOKEN = re.compile(
    r"""
    \s*(?:
      (?P<phrase>(?P<pfield>[A-Za-z_]\w*:)?
                 "(?P<ptext>[^"]*)"
                 (?:~(?P<pslop>\d+))?
                 (?:\^(?P<pboost>\d+(?:\.\d+)?))?)
    | (?P<range>(?P<rfield>[A-Za-z_]\w*:)?
                (?P<rlb>[\[\{])\s*(?P<rlo>[^\s\]\}]+)\s+TO\s+(?P<rhi>[^\s\]\}]+)\s*(?P<rrb>[\]\}])
                (?:\^(?P<rboost>\d+(?:\.\d+)?))?)
    | (?P<lparen>(?P<lfield>[A-Za-z_]\w*:)?\()
    | (?P<rparen>\))
    | (?P<and>AND|&&)
    | (?P<or>OR|\|\|)
    | (?P<not>NOT|!)
    | (?P<plus>\+)
    | (?P<minus>-)
    | (?P<word>[^\s+\-!"()][^\s"()]*)
    )
    """,
    re.VERBOSE,
)

_BOOST_SUFFIX = re.compile(r"\^(\d+(?:\.\d+)?)")


def synonym_rules(synonyms) -> list[tuple[tuple[str, ...], list[str]]]:
    """(source, target) pairs → longest-source-first match rules with
    same-source targets merged: [(source_tokens, [target, …]), …].
    Sources/targets are lowercased; either side may be multi-word."""
    merged: dict[tuple[str, ...], list[str]] = {}
    for src, tgt in synonyms:
        key = tuple(src.lower().split())
        if not key:
            raise ValueError("empty synonym source")
        tgt = " ".join(tgt.lower().split())
        if not tgt:
            raise ValueError("empty synonym target")
        bucket = merged.setdefault(key, [])
        if tgt not in bucket:
            bucket.append(tgt)
    return sorted(merged.items(), key=lambda kv: -len(kv[0]))


def expand_synonyms(
    clauses: list[tuple[str, object]], synonyms
) -> list[tuple[str, object]]:
    """Query-time synonym expansion — the SynonymGraphFilter +
    QueryBuilder graph-query analog (Solr runs SynonymGraphFilter on
    the QUERY analyzer precisely because multi-word rules cannot be
    injected at index time; reference context: the golr documents
    were served by production Solr, README.md:3-24).

    Matching: runs of consecutive un-fielded, boost-1 ``Term``
    clauses are scanned for source sequences (longest source first,
    case-insensitive). Multi-token sources only match all-SHOULD runs
    (a ``+``/``-`` inside a span is an explicit user override);
    single-token matches keep their clause's occur. A matched span is
    replaced by ONE group of SHOULD alternatives — the original span
    (a 0-slop Phrase when multi-word) and each target (Term, or
    Phrase when multi-word) — carrying the span's occur. Because
    boolean scoring sums SHOULD clauses and a boost-1 group is
    transparent, a SHOULD-only expansion scores exactly like the
    flat query over all alternatives (the property the DuckDB oracle
    replays). Groups recurse; every other clause type passes through
    untouched."""
    rules = synonym_rules(synonyms)
    if not rules:
        return clauses
    out: list[tuple[str, object]] = []
    i = 0
    n = len(clauses)

    def plain_term(j: int) -> str | None:
        occ, node = clauses[j][0], clauses[j][1]
        if isinstance(node, Term) and node.field is None and node.boost == 1.0:
            return node.text.lower()
        return None

    while i < n:
        occ, node = clauses[i][0], clauses[i][1]
        if isinstance(node, Group):
            out.append(
                (occ, Group(
                    tuple(expand_synonyms(list(node.clauses), synonyms)),
                    boost=node.boost,
                ))
            )
            i += 1
            continue
        matched = False
        word0 = plain_term(i)
        if word0 is not None:
            for src, targets in rules:
                L = len(src)
                if i + L > n or word0 != src[0]:
                    continue
                span = [plain_term(i + d) for d in range(L)]
                if any(w is None for w in span) or tuple(span) != src:
                    continue
                if L > 1 and any(clauses[i + d][0] != SHOULD for d in range(L)):
                    continue
                alts: list[tuple[str, object]] = [
                    (SHOULD, Term(span[0]) if L == 1 else Phrase(" ".join(span)))
                ]
                for tgt in targets:
                    words = tgt.split()
                    alts.append(
                        (SHOULD, Term(words[0]) if len(words) == 1
                         else Phrase(tgt))
                    )
                out.append((occ if L == 1 else SHOULD, Group(tuple(alts))))
                i += L
                matched = True
                break
        if not matched:
            out.append(clauses[i])
            i += 1
    return out


def parse_lucene(query: str) -> list[tuple[str, object]]:
    """Query string → clause list [(occur, node)].

    Classic-parser flat semantics per nesting level: explicit ``+``/
    ``-`` win; ``AND`` promotes both neighbours to MUST; ``NOT``
    makes the next clause MUST_NOT; everything else is SHOULD.
    Parenthesized sub-queries become ``Group`` nodes (recursively),
    ``[lo TO hi]`` / ``{lo TO hi}`` become ``TermRange``."""
    if query.count('"') % 2:
        raise ValueError("unbalanced quotes in query")
    clauses, pos = _parse_level(query, 0, depth=0)
    if query[pos:].strip():
        raise ValueError(f"cannot parse query at: {query[pos:]!r}")
    return clauses


def _parse_level(
    query: str, pos: int, depth: int
) -> tuple[list[tuple[str, object]], int]:
    clauses: list[list] = []  # [occur, node, explicit]
    pending_occur: str | None = None
    pending_explicit = False
    and_prev = False

    def flush(node: object) -> None:
        nonlocal pending_occur, pending_explicit, and_prev
        occur = pending_occur or (MUST if and_prev else SHOULD)
        explicit = pending_explicit or and_prev
        clauses.append([occur, node, explicit])
        pending_occur, pending_explicit, and_prev = None, False, False

    while pos < len(query):
        m = _TOKEN.match(query, pos)
        if not m or m.end() == pos:
            if query[pos:].strip():
                raise ValueError(f"cannot parse query at: {query[pos:]!r}")
            pos = len(query)
            break
        pos = m.end()
        if m.group("rparen"):
            if depth == 0:
                raise ValueError("unbalanced ')' in query")
            return [(o, n) for o, n, _e in clauses], pos
        if m.group("lparen"):
            if m.group("lfield"):
                raise ValueError(
                    "field:(...) grouped field queries are not supported — "
                    "write the field on each clause"
                )
            sub, pos = _parse_level(query, pos, depth + 1)
            boost = 1.0
            bm = _BOOST_SUFFIX.match(query, pos)
            if bm:
                boost, pos = float(bm.group(1)), bm.end()
            flush(Group(tuple(sub), boost=boost))
            continue
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
            pf = m.group("pfield")
            node: object = Phrase(
                m.group("ptext"),
                int(m.group("pslop") or 0),
                field=pf[:-1] if pf else None,
                boost=float(m.group("pboost") or 1.0),
            )
        elif m.group("range") is not None:
            rf = m.group("rfield")
            lo, hi = m.group("rlo"), m.group("rhi")
            node = TermRange(
                lo=None if lo == "*" else lo.lower(),
                hi=None if hi == "*" else hi.lower(),
                include_lo=m.group("rlb") == "[",
                include_hi=m.group("rrb") == "]",
                field=rf[:-1] if rf else None,
                boost=float(m.group("rboost") or 1.0),
            )
        else:
            w = m.group("word")
            field = None
            if ":" in w:
                field, _, w = w.partition(":")
                if not re.fullmatch(r"[A-Za-z_]\w*", field) or not w:
                    raise ValueError(f"bad field selector: {field!r}")
            boost = 1.0
            bm = re.fullmatch(r"(.+)\^(\d+(?:\.\d+)?)", w)
            if bm:
                w, boost = bm.group(1), float(bm.group(2))
            fm = re.fullmatch(r"(.+?)~(\d?)", w)
            if fm:
                node = Fuzzy(
                    fm.group(1), int(fm.group(2) or 2), field=field,
                    boost=boost,
                )
            elif (
                w.endswith("*")
                and len(w) > 1
                and "*" not in w[:-1]
                and "?" not in w
            ):
                node = Prefix(w[:-1], field=field, boost=boost)
            elif "*" in w or "?" in w:
                node = Wildcard(w, field=field, boost=boost)
            else:
                node = Term(w, field=field, boost=boost)
        flush(node)
    if depth > 0:
        raise ValueError("unbalanced '(' in query")
    return [(occ, node) for occ, node, _e in clauses], pos


def _expand_prefix(
    index: InvertedIndex, cfg: IndexConfig, p: str, max_expansions: int,
    fields: list[str] | None = None,
) -> list:
    from golr_loader_spark.plans.bm25 import _guard_expansion

    base = index.term_stats.filter(
        F.col("term").startswith(p.lower())
        & F.col("field").isin(list(fields or cfg.fields))
    )
    _guard_expansion(base, max_expansions, f"prefix '{p}'")
    return base.select("term", "field", "df").collect()


def _expand_fuzzy(
    index: InvertedIndex, cfg: IndexConfig, t: str, max_edits: int,
    max_expansions: int, fields: list[str] | None = None,
) -> list:
    from golr_loader_spark.plans.bm25 import _guard_expansion

    q = t.lower()
    # length pre-band evaluates before the costlier levenshtein and
    # prunes most of the vocabulary scan (see bm25.search_fuzzy)
    base = index.term_stats.filter(
        F.col("field").isin(list(fields or cfg.fields))
        & F.length(F.col("term")).between(len(q) - max_edits, len(q) + max_edits)
        & (F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
    )
    _guard_expansion(base, max_expansions, f"fuzzy '{t}'~{max_edits}")
    return base.select("term", "field", "df").collect()


def _expand_wildcard(
    index: InvertedIndex, cfg: IndexConfig, pattern: str,
    max_expansions: int, fields: list[str] | None = None,
) -> list:
    """Lucene WildcardQuery expansion: anchored regex over the term
    dictionary with the literal prefix pushed down as a range seek
    (CompiledAutomaton.commonPrefix analog), cap-guarded
    distributed-side like prefix/fuzzy/range."""
    from golr_loader_spark.plans.bm25 import (
        _guard_expansion,
        wildcard_literal_prefix,
        wildcard_regex,
    )

    p = pattern.lower()
    cond = F.col("term").rlike(wildcard_regex(p)) & F.col("field").isin(
        list(fields or cfg.fields)
    )
    pref = wildcard_literal_prefix(p)
    if pref:
        cond &= F.col("term").startswith(pref)
    base = index.term_stats.filter(cond)
    _guard_expansion(base, max_expansions, f"wildcard '{p}'")
    return base.select("term", "field", "df").collect()


def _expand_range(
    index: InvertedIndex, cfg: IndexConfig, tr: TermRange,
    max_expansions: int, fields: list[str] | None = None,
) -> list:
    """Lucene TermRangeQuery expansion: lexicographic term-dictionary
    slice (the Spark analog of TermsEnum.seekCeil + walk-to-upper),
    cap-guarded distributed-side like prefix/fuzzy. Both bounds open
    (``[* TO *]``) matches the whole vocabulary — guarded by the same
    cap."""
    from golr_loader_spark.plans.bm25 import _guard_expansion

    c = F.col("term")
    cond = F.col("field").isin(list(fields or cfg.fields))
    if tr.lo is not None:
        cond &= (c >= tr.lo) if tr.include_lo else (c > tr.lo)
    if tr.hi is not None:
        cond &= (c <= tr.hi) if tr.include_hi else (c < tr.hi)
    base = index.term_stats.filter(cond)
    _guard_expansion(
        base, max_expansions,
        f"range [{tr.lo or '*'} TO {tr.hi or '*'}]",
    )
    return base.select("term", "field", "df").collect()


def search_lucene(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
    exclude_ids=None,
    max_expansions: int = 1024,
    fq=None,
) -> DataFrame:
    """Execute a Lucene query string → top-k (doc_id, score).

    See the module docstring for syntax and the execution mapping.
    Pure negative queries (only MUST_NOT clauses) return no rows,
    like Lucene. ``fq``: optional non-scoring filter query (Solr fq —
    any supported query string); the result set is restricted to fq's
    match set via a semi-join but scores come from ``query`` alone —
    the standard Solr search-then-drill-down composition."""
    cfg = cfg or index.cfg
    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    clauses = parse_lucene(query)
    if cfg.query_synonyms:
        clauses = expand_synonyms(clauses, cfg.query_synonyms)
    if not clauses:
        return empty
    # Under fq the complete match set must be scored BEFORE the filter
    # intersects it: fq-passing docs ranked below k among pre-filter
    # matches would otherwise be lost (mirrors bm25.search's
    # `k if fq is None else n_docs` invariant).
    out = _exec(
        index, clauses, cfg, exclude_ids, max_expansions,
        k if fq is None else None,
    )
    if out is None:
        return empty
    if fq is not None:
        out = out.join(
            fq_doc_ids(
                index, fq, cfg=cfg, exclude_ids=exclude_ids,
                max_expansions=max_expansions,
            ).select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def fq_doc_ids(
    index: InvertedIndex,
    fq,
    cfg: IndexConfig | None = None,
    exclude_ids=None,
    max_expansions: int = 1024,
) -> DataFrame:
    """Solr fq (non-scoring filter query) → (bucket, doc_id) match
    set. ``fq`` is any supported Lucene query string (or pre-parsed
    clause list). Fast path: an fq of bare unfielded terms — the
    common drill-down shape — matches by decoding ONLY doc_id streams
    (``facets.matching_doc_ids``, no scoring); anything richer
    (phrases, prefixes, groups, field selectors) runs the full
    executor and keeps just the ids. Either way the result is the
    COMPLETE match set (no top-k truncation), suitable for semi-joins
    from ``search_lucene`` / ``facet_counts``."""
    from golr_loader_spark.plans.build_index import bucket_of
    from golr_loader_spark.plans.facets import matching_doc_ids

    cfg = cfg or index.cfg
    spark = index.postings.sparkSession
    clauses = parse_lucene(fq) if isinstance(fq, str) else list(fq)
    if cfg.query_synonyms and isinstance(fq, str):
        # Solr runs the query analyzer (incl. SynonymGraphFilter) on
        # fq strings too; pre-parsed clause lists are taken verbatim
        clauses = expand_synonyms(clauses, cfg.query_synonyms)
    if not clauses:
        return spark.createDataFrame([], "bucket int, doc_id long")
    occurs = {occ for occ, _n in clauses}
    if occurs == {MUST_NOT}:
        # Solr explicitly supports pure-negative filter queries by
        # implying *:* (SolrQueryParser's all-negative rewrite): the
        # match set is the live doc universe minus the negated match
        # set. Flip the clauses positive, execute, and anti-join from
        # all_doc_ids.
        from golr_loader_spark.plans.facets import all_doc_ids

        flipped = [(SHOULD, n) for _o, n in clauses]
        neg = _exec(index, flipped, cfg, exclude_ids, max_expansions, None)
        universe = all_doc_ids(index, cfg=cfg, exclude_ids=exclude_ids)
        if neg is None:
            return universe
        return universe.join(
            neg.select("doc_id"), on="doc_id", how="left_anti"
        ).select("bucket", "doc_id")
    all_bare_terms = all(
        isinstance(n, Term) and n.field is None for _o, n in clauses
    )
    if all_bare_terms and (occurs == {SHOULD} or occurs == {MUST}):
        q = " ".join(n.text for _o, n in clauses)
        mode = "and" if occurs == {MUST} else "or"
        return matching_doc_ids(
            index, q, cfg=cfg, mode=mode, exclude_ids=exclude_ids
        )
    out = _exec(index, clauses, cfg, exclude_ids, max_expansions, None)
    if out is None:
        return spark.createDataFrame([], "bucket int, doc_id long")
    return out.select("doc_id").withColumn(
        "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
    ).select("bucket", "doc_id")


def _exec(
    index: InvertedIndex,
    clauses: list[tuple[str, object]],
    cfg: IndexConfig,
    exclude_ids,
    max_expansions: int,
    k: int | None,
) -> DataFrame | None:
    """Execute a clause list → full (doc_id, score) match set, or
    None when nothing positive matches. ``k`` is a truncation hint
    honored only when the result needs no relational post-joins
    (callers needing the complete set — nested groups, fq — pass
    None)."""
    from golr_loader_spark.plans.phrase import phrase_search_positional

    spark = index.postings.sparkSession
    empty = spark.createDataFrame([], "doc_id long, score double")
    qan = query_analyzer(cfg)

    # (occur, terms, fields, boost) per term-like clause; a clause
    # with field: restricts both its scoring AND its MUST/MUST_NOT
    # membership test to that field
    term_clauses: list[tuple[str, set[str], list[str], float]] = []
    rel: list[tuple[str, object]] = []  # Phrase and Group clauses
    for occur, node in clauses:
        if isinstance(node, Group):
            rel.append((occur, node))
            continue
        nf = getattr(node, "field", None)
        if nf is not None and nf not in cfg.fields:
            raise ValueError(f"unknown field {nf!r} (config: {list(cfg.fields)})")
        if isinstance(node, Phrase):
            rel.append((occur, node))
            continue
        fields = [nf] if nf else list(cfg.fields)
        if isinstance(node, Term):
            an = cfg.fields[nf][0] if nf else qan
            terms = set(analyze_query(node.text, an, cfg.chain))
        elif isinstance(node, TermRange):
            rows = _expand_range(index, cfg, node, max_expansions, fields)
            terms = {r["term"] for r in rows}
        elif isinstance(node, Wildcard):
            rows = _expand_wildcard(
                index, cfg, node.text, max_expansions, fields
            )
            terms = {r["term"] for r in rows}
        else:
            rows = (
                _expand_prefix(index, cfg, node.text, max_expansions, fields)
                if isinstance(node, Prefix)
                else _expand_fuzzy(
                    index, cfg, node.text, node.max_edits, max_expansions,
                    fields,
                )
            )
            terms = {r["term"] for r in rows}
        if not terms:
            if occur == MUST:
                return None  # a MUST clause matching nothing
            continue
        term_clauses.append((occur, terms, fields, node.boost))

    should_terms: set[str] = set()
    groups: list[set] = []  # members: bare term or (term, field)
    prohibited: set = set()
    for occur, terms, fields, _boost in term_clauses:
        restricted = len(fields) < len(cfg.fields)
        members = (
            {(t, f) for t in terms for f in fields} if restricted
            else set(terms)
        )
        if occur == MUST_NOT:
            prohibited |= members
        else:
            should_terms |= terms
            if occur == MUST:
                # one analyzed query word can yield several index
                # terms (code analyzer subwords) — any satisfies the
                # clause, all of them score
                groups.append(members)

    if not should_terms and not any(o != MUST_NOT for o, _n in rel):
        return None  # nothing positive to match (pure negation)

    bool_df = None
    if should_terms:
        from golr_loader_spark.plans.bm25 import _idf_table

        idf = _idf_table(index, sorted(should_terms))
        # clause-additive weights (Lucene clause boosts; two clauses
        # hitting the same (term, field) sum — scoring is linear in
        # the weight)
        weights: dict[tuple[str, str], float] = {}
        for occur, terms, fields, boost in term_clauses:
            if occur == MUST_NOT:
                continue
            for t in terms:
                for f in fields:
                    i = idf.get((t, f))
                    if i is None or f not in cfg.fields:
                        continue
                    weights[(t, f)] = weights.get((t, f), 0.0) + (
                        boost * cfg.fields[f][1] * i * (cfg.k1 + 1.0)
                    )
        avail = set(weights) | {t for (t, _f) in weights}
        if any(not (g & avail) for g in groups):
            return None  # a MUST group has no indexed term
        groups = [g & avail for g in groups]
        prohib_terms = {m if isinstance(m, str) else m[0] for m in prohibited}
        cand = index.postings.filter(
            F.col("term").isin(sorted(should_terms | prohib_terms))
            & F.col("field").isin(list(cfg.fields))
        )
        fn = _score_bucket_factory(
            weights,
            _avgdl(index),
            cfg,
            k if (k is not None and not rel) else index.n_docs,
            exclude_ids=exclude_ids,
            prohibited_terms=prohibited or None,
            required_groups=groups or None,
        )
        bool_df = cand.groupBy("bucket").applyInPandas(
            fn, schema="doc_id long, score double"
        )

    out = bool_df
    has_must = bool(groups)
    # True once `out` holds docs the bucket scorer never emitted (and
    # therefore never checked against term-level MUST_NOTs) — those
    # need the relational prohibited anti-join at the end
    unvetted = False
    # positives first: a MUST_NOT phrase/group must subtract from the
    # final positive set regardless of its position in the query
    rel.sort(key=lambda c: c[0] == MUST_NOT)
    for occur, node in rel:
        if isinstance(node, Phrase):
            pdf = (
                phrase_search_positional(
                    index, node.text, k=index.n_docs, slop=node.slop,
                    cfg=cfg, exclude_ids=exclude_ids, field=node.field,
                )
                .withColumnRenamed("score", "_ps")
                .withColumn("_ps", F.col("_ps") * F.lit(float(node.boost)))
            )
        else:  # nested Group: recurse for its COMPLETE match set
            sub = _exec(
                index, list(node.clauses), cfg, exclude_ids,
                max_expansions, None,
            )
            if sub is None:
                if occur == MUST:
                    # a required subquery matching nothing empties the
                    # whole result, like any MUST clause
                    return None
                continue
            pdf = sub.withColumnRenamed("score", "_ps").withColumn(
                "_ps", F.col("_ps") * F.lit(float(node.boost))
            )
        if occur == MUST_NOT:
            if out is not None:
                out = out.join(pdf.select("doc_id"), on="doc_id", how="left_anti")
            continue
        if out is None:
            out = pdf.withColumnRenamed("_ps", "score")
            unvetted = True
            if occur == MUST:
                has_must = True
            continue
        if occur == MUST:
            if has_must:
                # the accumulated side is already MUST-gated: the
                # phrase/group intersects it (both clauses required)
                out = (
                    out.join(pdf, on="doc_id", how="inner")
                    .withColumn("score", F.col("score") + F.col("_ps"))
                    .drop("_ps")
                )
            else:
                # accumulated side is SHOULD-only: Lucene BooleanQuery
                # semantics make the MUST clause define the match set;
                # keep EVERY clause doc, coalescing the optional
                # boolean contribution to 0
                out = (
                    out.join(pdf, on="doc_id", how="right_outer")
                    .withColumn(
                        "score",
                        F.coalesce(F.col("score"), F.lit(0.0))
                        + F.col("_ps"),
                    )
                    .drop("_ps")
                )
                unvetted = True
            has_must = True
        else:  # SHOULD phrase/group
            how = "left_outer" if has_must else "full_outer"
            if how == "full_outer":
                unvetted = True
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
        return None
    if prohibited and (bool_df is None or unvetted):
        # `out` holds docs the bucket scorer never vetted (phrase/
        # group-only positives, or joins that admitted docs outside
        # the boolean match set): apply term MUST_NOTs relationally
        # (decode only the prohibited terms' doc_id streams). Docs the
        # scorer DID emit hold no prohibited term, so re-filtering
        # them is a no-op.
        from golr_loader_spark.plans.phrase import decode_postings

        bare = sorted(m for m in prohibited if isinstance(m, str))
        pairs = sorted(m for m in prohibited if not isinstance(m, str))
        neg = decode_postings(
            index,
            sorted({*bare, *(t for t, _f in pairs)}),
            cfg,
            exclude_ids=exclude_ids,
        )
        cond = F.col("term").isin(bare) if bare else F.lit(False)
        for t, f in pairs:
            cond = cond | ((F.col("term") == t) & (F.col("field") == f))
        neg = neg.filter(cond).select("doc_id").distinct()
        out = out.join(neg, on="doc_id", how="left_anti")
    return out


def _phrase_doc_score(
    index: InvertedIndex,
    ph: Phrase,
    doc_id: int,
    cfg: IndexConfig,
    exclude_ids,
) -> float | None:
    """Phrase score of ONE doc (None when the doc doesn't contain the
    phrase): run the positional bucket matcher over the doc's OWN
    bucket only — a point lookup like ``bm25.explain``, not a corpus
    query."""
    from golr_loader_spark.functions.tokenize import analyze_phrase
    from golr_loader_spark.plans.bm25 import _idf_table, _norm_excl
    from golr_loader_spark.plans.build_index import bucket_of
    from golr_loader_spark.plans.phrase import _phrase_bucket_factory

    field = ph.field or next(iter(cfg.fields))
    seq = analyze_phrase(ph.text, cfg.fields[field][0], cfg.min_term_len, cfg.chain)
    if not seq:
        return None
    uterms = sorted({t for t, _p in seq})
    fn = _phrase_bucket_factory(
        seq, _idf_table(index, uterms), field, index.avgdl_by_field[field],
        cfg, index.n_docs, ph.slop, "phrase", _norm_excl(exclude_ids),
    )
    if fn is None:
        return None
    pdf = (
        index.postings.filter(
            F.col("term").isin(uterms)
            & (F.col("field") == F.lit(field))
            & (
                F.col("bucket")
                == bucket_of(
                    F.lit(int(doc_id)), cfg.bucket_bits, cfg.id_space_bits
                )
            )
        )
        .toPandas()
    )
    if not len(pdf):
        return None
    res = fn(pdf)
    hit = res[res["doc_id"] == doc_id]
    if not len(hit):
        return None
    return float(hit["score"].iloc[0])


def explain_lucene(
    index: InvertedIndex,
    query: str,
    doc_id: int,
    cfg: IndexConfig | None = None,
    exclude_ids=None,
    max_expansions: int = 1024,
) -> dict:
    """Lucene Explanation for a FULL query string (Solr debugQuery=on
    over every clause type — ``bm25.explain`` covers plain term
    queries): per-clause breakdown of ``doc_id``'s score under
    ``query``, including boolean term clauses (with per-(term, field)
    tf/dl/idf/weight entries), prefix/fuzzy/range expansions (their
    expanded terms appear as term entries), phrase clauses, and
    nested groups (recursive explanations). ``matches`` is False —
    with a ``reason`` — when the doc fails a MUST clause or contains
    a MUST_NOT member; the score then reflects Lucene's "did not
    match" (0.0). When it matches, summing in the reported clause
    order reproduces ``search_lucene``'s score for the doc."""
    cfg = cfg or index.cfg
    return _explain_clauses(
        index, parse_lucene(query), int(doc_id), cfg, exclude_ids,
        max_expansions,
    )


def _explain_clauses(
    index: InvertedIndex,
    clauses: list[tuple[str, object]],
    doc_id: int,
    cfg: IndexConfig,
    exclude_ids,
    max_expansions: int,
) -> dict:
    from golr_loader_spark.plans.bm25 import _avgdl, _idf_table
    from golr_loader_spark.plans.build_index import bucket_of
    from golr_loader_spark.plans.phrase import decode_postings

    out: dict = {
        "doc_id": doc_id, "matches": True, "score": 0.0, "clauses": [],
    }
    qan = query_analyzer(cfg)
    term_clauses: list[tuple[str, set[str], list[str], float]] = []
    rel: list[tuple[str, object]] = []
    for occur, node in clauses:
        if isinstance(node, Group):
            rel.append((occur, node))
            continue
        nf = getattr(node, "field", None)
        if nf is not None and nf not in cfg.fields:
            raise ValueError(f"unknown field {nf!r} (config: {list(cfg.fields)})")
        if isinstance(node, Phrase):
            rel.append((occur, node))
            continue
        fields = [nf] if nf else list(cfg.fields)
        if isinstance(node, Term):
            an = cfg.fields[nf][0] if nf else qan
            terms = set(analyze_query(node.text, an, cfg.chain))
        elif isinstance(node, TermRange):
            terms = {
                r["term"]
                for r in _expand_range(index, cfg, node, max_expansions, fields)
            }
        elif isinstance(node, Prefix):
            terms = {
                r["term"]
                for r in _expand_prefix(index, cfg, node.text, max_expansions, fields)
            }
        elif isinstance(node, Wildcard):
            terms = {
                r["term"]
                for r in _expand_wildcard(
                    index, cfg, node.text, max_expansions, fields
                )
            }
        else:
            terms = {
                r["term"]
                for r in _expand_fuzzy(
                    index, cfg, node.text, node.max_edits, max_expansions, fields
                )
            }
        if not terms:
            if occur == MUST:
                out["matches"] = False
                out["reason"] = f"MUST clause {node!r} matches no indexed term"
                return out
            continue
        term_clauses.append((occur, terms, fields, node.boost))

    # point lookup: decode this doc's (term, field) postings only
    all_terms = sorted({t for _o, ts, _f, _b in term_clauses for t in ts})
    tfdl: dict[tuple[str, str], tuple[int, int]] = {}
    if all_terms:
        flat = (
            decode_postings(index, all_terms, cfg, exclude_ids=exclude_ids)
            .filter(
                (F.col("doc_id") == doc_id)
                & (
                    F.col("bucket")
                    == bucket_of(
                        F.lit(doc_id), cfg.bucket_bits, cfg.id_space_bits
                    )
                )
            )
            .collect()
        )
        tfdl = {
            (r["term"], r["field"]): (int(r["tf"]), int(r["dl"])) for r in flat
        }

    # clause-additive weights, exactly _exec's
    idf = _idf_table(index, all_terms) if all_terms else {}
    weights: dict[tuple[str, str], float] = {}
    for occur, terms, fields, boost in term_clauses:
        if occur == MUST_NOT:
            continue
        for t in terms:
            for f in fields:
                i = idf.get((t, f))
                if i is None or f not in cfg.fields:
                    continue
                weights[(t, f)] = weights.get((t, f), 0.0) + (
                    boost * cfg.fields[f][1] * i * (cfg.k1 + 1.0)
                )

    # MUST_NOT term membership disqualifies
    for occur, terms, fields, _boost in term_clauses:
        if occur != MUST_NOT:
            continue
        for (t, f) in tfdl:
            if t in terms and f in fields:
                out["matches"] = False
                out["reason"] = f"doc contains prohibited term {t!r} in {f!r}"
                out["score"] = 0.0
                return out

    # term MUST groups: any member (term in any listed field) present
    for occur, terms, fields, _boost in term_clauses:
        if occur != MUST:
            continue
        if not any(t in terms and f in fields for (t, f) in tfdl):
            out["matches"] = False
            out["reason"] = (
                f"MUST clause over {sorted(terms)[:5]} not matched"
            )
            out["score"] = 0.0
            return out

    avgdl = _avgdl(index)
    term_entries = []
    bool_score = 0.0
    for (t, f) in sorted(tfdl, key=lambda x: (x[1], x[0])):
        wt = weights.get((t, f))
        if wt is None:
            continue
        tf, dl = tfdl[(t, f)]
        contrib = wt * tf / (
            tf + cfg.k1 * ((1.0 - cfg.b) + cfg.b * dl / avgdl[f])
        )
        bool_score += contrib
        term_entries.append(
            {
                "term": t, "field": f, "tf": tf, "dl": dl,
                "avgdl": avgdl[f], "weight": wt, "contribution": contrib,
            }
        )
    if term_entries:
        out["clauses"].append(
            {"kind": "terms", "score": bool_score, "terms": term_entries}
        )
    total = bool_score
    matched_any = bool(term_entries)

    rel.sort(key=lambda c: c[0] == MUST_NOT)
    for occur, node in rel:
        if isinstance(node, Phrase):
            ps = _phrase_doc_score(index, node, doc_id, cfg, exclude_ids)
            ps = None if ps is None else ps * float(node.boost)
            entry = {
                "kind": "phrase", "text": node.text, "slop": node.slop,
                "field": node.field, "occur": occur,
                "matched": ps is not None, "score": ps or 0.0,
            }
        else:
            sub = _explain_clauses(
                index, list(node.clauses), doc_id, cfg, exclude_ids,
                max_expansions,
            )
            ps = (
                sub["score"] * float(node.boost)
                if sub["matches"] and (sub["clauses"] or sub["score"])
                else None
            )
            # a group that structurally matches with score 0 still
            # counts as matched when any sub-clause matched
            if sub["matches"] and sub["clauses"]:
                ps = sub["score"] * float(node.boost)
            entry = {
                "kind": "group", "occur": occur, "boost": node.boost,
                "matched": ps is not None, "score": ps or 0.0,
                "explanation": sub,
            }
        if occur == MUST_NOT:
            if ps is not None:
                out["matches"] = False
                out["reason"] = f"doc matches prohibited {entry['kind']}"
                out["score"] = 0.0
                return out
            continue
        if occur == MUST and ps is None:
            out["matches"] = False
            out["reason"] = f"MUST {entry['kind']} not matched"
            out["score"] = 0.0
            return out
        out["clauses"].append(entry)
        if ps is not None:
            total += ps
            matched_any = True

    if not matched_any:
        out["matches"] = False
        out["reason"] = "no positive clause matched"
        out["score"] = 0.0
        return out
    out["score"] = total
    return out


def search_elevated(
    index: InvertedIndex,
    query: str,
    elevate: list[int] | None = None,
    exclude: list[int] | None = None,
    k: int = 10,
    cfg: IndexConfig | None = None,
    exclude_ids=None,
    max_expansions: int = 1024,
) -> DataFrame:
    """Solr QueryElevationComponent (elevate.xml): editorial pinning —
    ``elevate`` doc_ids appear FIRST in the given order regardless of
    their organic rank (forceElevation: even a non-matching doc is
    pinned, with score 0.0 like Solr's elevated-but-unscored docs),
    ``exclude`` doc_ids vanish, everything else follows by organic
    (score desc, doc_id asc). Scores of elevated docs are their
    organic scores when they match — Solr keeps the real score and
    marks ``[elevated]``; the marker here is position.

    Plan: one complete-set pass of the organic query (the fq
    invariant), the pinned page assembled driver-side from ≤|elevate|
    point lookups (a broadcast semi-join when the list is long), the
    tail a TakeOrdered over the remainder."""
    cfg = cfg or index.cfg
    spark = index.postings.sparkSession
    elevate = [int(d) for d in (elevate or [])]
    excl_set = {int(d) for d in (exclude or [])}
    base = _exec(
        index, parse_lucene(query), cfg, exclude_ids, max_expansions, None
    )
    if base is None:
        base = spark.createDataFrame([], "doc_id long, score double")
    pinned_ids = [d for d in elevate if d not in excl_set][:k]
    drop = excl_set | set(elevate)
    if drop:
        tail = base.filter(~F.col("doc_id").isin([int(d) for d in drop]))
    else:
        tail = base
    n_tail = max(0, k - len(pinned_ids))
    tail_rows = (
        tail.orderBy(F.desc("score"), F.asc("doc_id")).limit(n_tail).collect()
        if n_tail
        else []
    )
    pinned_scores = {}
    if pinned_ids:
        for r in base.filter(F.col("doc_id").isin(pinned_ids)).collect():
            pinned_scores[int(r["doc_id"])] = float(r["score"])
    out = [(d, pinned_scores.get(d, 0.0)) for d in pinned_ids]
    out += [(int(r["doc_id"]), float(r["score"])) for r in tail_rows]
    return spark.createDataFrame(out[:k], "doc_id long, score double")


def elevate_lists(
    base: dict[int, float],
    elevate: list[int] | None,
    exclude: list[int] | None,
    k: int,
) -> list[tuple[int, float]]:
    """Serving/shard kernel for QueryElevation over a complete
    {doc_id: score} match set — identical page-assembly rule as
    ``search_elevated`` (pinned in elevation order, score 0.0 when
    unmatched, excluded gone, organic tail)."""
    excl = {int(d) for d in (exclude or [])}
    elev = [int(d) for d in (elevate or [])]
    pinned = [d for d in elev if d not in excl][:k]
    out = [(d, float(base.get(d, 0.0))) for d in pinned]
    drop = excl | set(elev)
    rest = sorted(
        ((int(d), float(s)) for d, s in base.items() if int(d) not in drop),
        key=lambda x: (-x[1], x[0]),
    )
    out += rest[: max(0, k - len(out))]
    return out
