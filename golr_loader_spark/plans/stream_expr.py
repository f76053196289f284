"""Solr Streaming Expressions → Catalyst plans.

The serving stack the reference feeds (Solr — GolrLoader.java posts
documents for it to serve) ships a parallel-SQL layer, the Streaming
Expression API (``/stream``): composable ``search(...)`` sources
wrapped by ``rollup``/``innerJoin``/``unique``/``top``/… decorators,
executed as a streaming relational algebra over the cluster. This
module re-expresses that surface on Spark: one recursive-descent
parser for the published expression grammar, and a compiler that maps
every decorator to the DataFrame operator it IS — which is the
Spark-first answer: Solr streams exist to fake a distributed query
engine on top of an index, and Catalyst already is one.

Supported (the /stream core):

* sources — ``search(coll, q=, fq=, fl=, sort=, rows=)`` (qt=/export
  semantics: the COMPLETE non-scored match set in sort order; rows
  caps it), ``facet(coll, q=, buckets=, bucketSorts=, bucketSizeLimit=,
  metrics…)``, ``stats(coll, q=, metrics…)``.
* decorators — ``select(s, "f as g", …)``, ``sort(s, by=)``,
  ``unique(s, over=[, sort=])``, ``top(s, n=, sort=)``,
  ``rollup(s, over=, metrics…)``, ``having(s, boolOp)``,
  ``innerJoin/leftOuterJoin/hashJoin(l, r, on=)``,
  ``merge(l, r, on=)``, ``intersect(l, r, on=)``,
  ``complement(l, r, on=)``, ``fetch(coll, s, fl=, on=)``,
  ``nodes/gatherNodes(coll, s, walk=, gather=, scatter=, metrics…)``
  (graph traversal — one equi-join hop per nesting level).
* metrics — ``count(*)``, ``sum(f)``, ``min(f)``, ``max(f)``,
  ``avg(f)``; output field names are Solr's literal ``sum(f)`` style.
* boolean evaluators (having) — ``eq/gt/lt/gteq/lteq(f, v)``,
  ``and(a,b)``, ``or(a,b)``, ``not(a)``.

Deviations, documented: Solr streams carry an implicit tuple ORDER
and ``unique`` keeps the first tuple of the incoming order; DataFrames
are unordered sets, so ``unique`` takes the tie-break as an explicit
``sort=`` param (default: the over fields asc) and ``merge`` is
union-then-sort (same result set and final order as Solr's ordered
merge). ``search`` does not emit ``score`` (export semantics — the
scored path is ``plans.bm25/lucene``).

Plan shape at 100 TB: ``search`` is the engine's decode-only match
(posting blocks pruned to the query terms) joined to the stored table
on the co-located (bucket, doc_id) key; every decorator is the native
Catalyst operator (groupBy-agg with map-side combine for rollup,
equi-join for the join family — broadcast hint for hashJoin's hashed
side, TakeOrdered for top/rows). Nothing collects driver-side; the
composed expression is ONE lazy plan Catalyst optimizes whole.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import InvertedIndex, bucket_of

# ----------------------------------------------------------- parser

_BARE_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789_.*:+-/!{}^~?"
)


@dataclass
class Expr:
    """One ``name(arg, key=value, …)`` node of a streaming expression."""

    name: str
    args: list = field(default_factory=list)      # str | Expr
    kwargs: dict = field(default_factory=dict)    # str -> (str | Expr)


class _P:
    def __init__(self, s: str):
        self.s, self.i = s, 0

    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def _bare(self) -> str:
        j = self.i
        while j < len(self.s) and self.s[j] in _BARE_CHARS:
            j += 1
        if j == self.i:
            raise ValueError(
                f"stream expression: expected token at {self.i}: {self.s[self.i:self.i+20]!r}"
            )
        out = self.s[self.i : j]
        self.i = j
        return out

    def _quoted(self) -> str:
        assert self.s[self.i] == '"'
        self.i += 1
        out = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s):
                out.append(self.s[self.i + 1])
                self.i += 2
                continue
            if c == '"':
                self.i += 1
                return "".join(out)
            out.append(c)
            self.i += 1
        raise ValueError("stream expression: unterminated string")

    def _value(self):
        """quoted string | nested expr | bare word."""
        self._ws()
        if self._peek() == '"':
            return self._quoted()
        w = self._bare()
        self._ws()
        if self._peek() == "(":
            return self._call(w)
        return w

    def _call(self, name: str) -> Expr:
        assert self._peek() == "("
        self.i += 1  # consume (
        e = Expr(name)
        self._ws()
        if self._peek() == ")":
            self.i += 1
            return e
        while True:
            self._ws()
            if self._peek() == '"':
                e.args.append(self._quoted())
            else:
                w = self._bare()
                self._ws()
                if self._peek() == "(":
                    e.args.append(self._call(w))
                    # optional `as <name>` after a nested call —
                    # select()'s computed-field alias syntax; any
                    # other bare word here is a syntax error anyway
                    save = self.i
                    self._ws()
                    if self._peek() in _BARE_CHARS:
                        w2 = self._bare()
                        if w2 == "as":
                            self._ws()
                            e.args.append("as")
                            e.args.append(self._bare())
                        else:
                            self.i = save
                elif self._peek() == "=":
                    self.i += 1
                    e.kwargs[w] = self._value()
                else:
                    e.args.append(w)
            self._ws()
            if self._peek() == ",":
                self.i += 1
                continue
            if self._peek() == ")":
                self.i += 1
                return e
            raise ValueError(
                f"stream expression: expected ',' or ')' at {self.i}: "
                f"{self.s[self.i:self.i+20]!r}"
            )


def parse_expr(s: str) -> Expr:
    p = _P(s)
    p._ws()
    name = p._bare()
    p._ws()
    if p._peek() != "(":
        raise ValueError("stream expression must be name(...)")
    e = p._call(name)
    p._ws()
    if p.i != len(p.s):
        raise ValueError(f"stream expression: trailing input at {p.i}")
    return e


# ------------------------------------------------------ collections


@dataclass
class StreamCollection:
    """One named 'collection': engine index + stored-fields table.

    ``index=None`` makes a stored-fields-only collection (Solr
    collections with no text fields still serve /export and graph
    walks): ``search`` then supports only ``q="*:*"`` (pure export),
    and ``nodes`` joins the documents table directly. The documents
    table must carry the unique key as ``doc_id``."""

    index: InvertedIndex | None
    documents: DataFrame
    cfg: IndexConfig | None = None
    root: str | None = None        # persisted index root (update() dest)

    @property
    def config(self) -> IndexConfig:
        if self.cfg is not None:
            return self.cfg
        if self.index is not None:
            return self.index.cfg
        return IndexConfig()


class StreamContext:
    def __init__(self, collections: dict[str, StreamCollection]):
        self.collections = collections

    def collection(self, name) -> StreamCollection:
        if not isinstance(name, str) or name not in self.collections:
            raise ValueError(f"unknown collection {name!r}")
        return self.collections[name]


# --------------------------------------------------------- helpers

_METRICS = {"sum", "min", "max", "avg", "count"}
_BOOL_OPS = {"eq", "gt", "lt", "gteq", "lteq", "and", "or", "not"}


def _sort_cols(df: DataFrame, spec: str) -> list[Column]:
    out = []
    for part in spec.split(","):
        toks = part.split()
        if not toks:
            continue
        fname = toks[0]
        desc = len(toks) > 1 and toks[1].lower() == "desc"
        c = df[fname]
        out.append(c.desc() if desc else c.asc())
    if not out:
        raise ValueError(f"empty sort spec {spec!r}")
    return out


def _csv(spec: str) -> list[str]:
    return [x.strip() for x in spec.split(",") if x.strip()]


def _on_pairs(spec: str) -> list[tuple[str, str]]:
    out = []
    for part in _csv(spec):
        if "=" in part:
            a, b = part.split("=", 1)
            out.append((a.strip(), b.strip()))
        else:
            out.append((part, part))
    return out


def _metric_col(m: Expr) -> Column:
    if m.name == "count":
        return F.count("*").cast("long").alias("count(*)")
    (col,) = m.args
    fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[m.name]
    c = fn(col)
    if m.name in ("sum", "avg"):
        c = c.cast("double")
    return c.alias(f"{m.name}({col})")


def _lit_value(v: str):
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


def _bool_cond(df: DataFrame, e: Expr) -> Column:
    if e.name == "and":
        out = _bool_cond(df, e.args[0])
        for sub in e.args[1:]:
            out = out & _bool_cond(df, sub)
        return out
    if e.name == "or":
        out = _bool_cond(df, e.args[0])
        for sub in e.args[1:]:
            out = out | _bool_cond(df, sub)
        return out
    if e.name == "not":
        return ~_bool_cond(df, e.args[0])
    fname, raw = e.args
    if isinstance(fname, Expr):
        # a metric reference (sum(f), count(*)) names the rollup's
        # literal output field — map the parsed call back to it
        fname = f"{fname.name}({fname.args[0] if fname.args else ''})"
    c, v = df[fname], F.lit(_lit_value(raw))
    return {
        "eq": c == v, "gt": c > v, "lt": c < v, "gteq": c >= v, "lteq": c <= v,
    }[e.name]


def _match_ids(coll: StreamCollection, q: str, fq: str | None) -> DataFrame:
    """Decode-only match set (doc_id) for a /export-style source."""
    from golr_loader_spark.plans.facets import all_doc_ids
    from golr_loader_spark.plans.lucene import fq_doc_ids

    cfg = coll.config
    if coll.index is None:
        if q.strip() != "*:*":
            raise ValueError(
                f"collection has no index: only q='*:*' supported, got {q!r}"
            )
        ids = coll.documents.select("doc_id")
    elif q.strip() == "*:*":
        ids = all_doc_ids(coll.index, cfg=cfg).select("doc_id")
    else:
        ids = fq_doc_ids(coll.index, q, cfg=cfg).select("doc_id")
    if fq is not None:
        if coll.index is None:
            raise ValueError("collection has no index: fq unsupported")
        ids = ids.join(
            fq_doc_ids(coll.index, fq, cfg=cfg).select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
    return ids


def _stored_join(coll: StreamCollection, ids: DataFrame, cols: list[str]) -> DataFrame:
    cfg = coll.config
    bucketed = coll.documents.select(
        "doc_id", *[c for c in cols if c != "doc_id"]
    ).withColumn(
        "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
    )
    withb = ids.withColumn(
        "bucket", bucket_of(F.col("doc_id"), cfg.bucket_bits, cfg.id_space_bits)
    )
    return withb.join(bucketed, on=["bucket", "doc_id"]).select(*cols)


def _export_rows(
    coll: StreamCollection, q: str, fq: str | None, cols: list[str]
) -> DataFrame:
    """Match set + stored-field retrieval for an /export-style source.
    Index-less collections at q='*:*' short-circuit to the stored
    frame directly: the id round-trip would be a pure self-join —
    one wasted shuffle, and a row multiplier if the caller's doc_ids
    are not unique."""
    if coll.index is None and q.strip() == "*:*" and fq is None:
        return coll.documents.select(*cols)
    ids = _match_ids(coll, q, fq)
    return _stored_join(coll, ids, cols)


# -------------------------------------------------------- compilers


def _c_search(e: Expr, ctx: StreamContext) -> DataFrame:
    coll = ctx.collection(e.args[0] if e.args else None)
    q = e.kwargs.get("q", "*:*")
    fl = _csv(e.kwargs.get("fl", "doc_id"))
    out = _export_rows(
        coll, q, e.kwargs.get("fq"), fl if "doc_id" in fl else ["doc_id"] + fl
    )
    if "doc_id" not in fl:
        out = out.select(*fl)
    if "sort" in e.kwargs:
        out = out.orderBy(*_sort_cols(out, e.kwargs["sort"]))
    if "rows" in e.kwargs:
        out = out.limit(int(e.kwargs["rows"]))
    return out


def _c_stats(e: Expr, ctx: StreamContext) -> DataFrame:
    coll = ctx.collection(e.args[0] if e.args else None)
    metrics = [a for a in e.args[1:] if isinstance(a, Expr) and a.name in _METRICS]
    if not metrics:
        raise ValueError("stats() needs at least one metric")
    need = sorted({m.args[0] for m in metrics if m.name != "count"})
    base = _export_rows(
        coll, e.kwargs.get("q", "*:*"), e.kwargs.get("fq"), ["doc_id"] + need
    )
    return base.agg(*[_metric_col(m) for m in metrics])


def _c_facet(e: Expr, ctx: StreamContext) -> DataFrame:
    coll = ctx.collection(e.args[0] if e.args else None)
    metrics = [a for a in e.args[1:] if isinstance(a, Expr) and a.name in _METRICS]
    if not metrics:
        metrics = [Expr("count", ["*"])]
    buckets = _csv(e.kwargs["buckets"])
    need = sorted(
        set(buckets) | {m.args[0] for m in metrics if m.name != "count"}
    )
    base = _export_rows(
        coll, e.kwargs.get("q", "*:*"), e.kwargs.get("fq"), ["doc_id"] + need
    )
    out = base.groupBy(*buckets).agg(*[_metric_col(m) for m in metrics])
    sort_spec = e.kwargs.get(
        "bucketSorts", ", ".join(f"{b} asc" for b in buckets)
    )
    out = out.orderBy(*_sort_cols(out, sort_spec))
    if "bucketSizeLimit" in e.kwargs:
        out = out.limit(int(e.kwargs["bucketSizeLimit"]))
    return out


_ARITH = {"add", "sub", "mult", "div"}


def _eval_col(df: DataFrame, x) -> Column:
    """Solr stream-evaluator → Column: field names, numeric literals,
    arithmetic add/sub/mult/div (variadic like Solr's), and
    if(boolOp, then, else) — all compiled to Catalyst expressions."""
    if not isinstance(x, Expr):
        v = _lit_value(x)
        return F.lit(v) if isinstance(v, (int, float)) else df[x]
    if x.name in _ARITH:
        cols = [_eval_col(df, a) for a in x.args]
        if len(cols) < 2:
            raise ValueError(f"{x.name}() needs at least two operands")
        out = cols[0]
        for c in cols[1:]:
            if x.name == "add":
                out = out + c
            elif x.name == "sub":
                out = out - c
            elif x.name == "mult":
                out = out * c
            else:
                out = out / c
        return out
    if x.name == "if":
        cond, then, els = x.args
        return F.when(_bool_cond(df, cond), _eval_col(df, then)).otherwise(
            _eval_col(df, els)
        )
    raise ValueError(f"unknown select evaluator {x.name!r}")


def _c_select(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``select(stream, "a", "b as c", evaluator(...) as d)``:
    projection, renames, and computed fields. Evaluator args parse as
    nested Expr nodes followed by the bare tokens ``as``/``name`` —
    reassembled here; everything compiles to one Catalyst select."""
    df = compile_stream(e.args[0], ctx)
    cols: list[Column] = []
    rest = list(e.args[1:])
    i = 0
    while i < len(rest):
        spec = rest[i]
        if isinstance(spec, Expr):
            if i + 2 < len(rest) and rest[i + 1] == "as":
                cols.append(_eval_col(df, spec).alias(str(rest[i + 2])))
                i += 3
                continue
            raise ValueError(f"evaluator {spec.name}(...) needs 'as <name>'")
        parts = spec.split(" as ")
        if len(parts) == 2:
            cols.append(df[parts[0].strip()].alias(parts[1].strip()))
        else:
            cols.append(df[spec.strip()])
        i += 1
    return df.select(*cols)


def _c_sort(e: Expr, ctx: StreamContext) -> DataFrame:
    df = compile_stream(e.args[0], ctx)
    return df.orderBy(*_sort_cols(df, e.kwargs["by"]))


def _c_unique(e: Expr, ctx: StreamContext) -> DataFrame:
    from pyspark.sql import Window

    df = compile_stream(e.args[0], ctx)
    over = _csv(e.kwargs["over"])
    sort_spec = e.kwargs.get("sort", ", ".join(f"{c} asc" for c in over))
    w = Window.partitionBy(*over).orderBy(*_sort_cols(df, sort_spec))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _c_top(e: Expr, ctx: StreamContext) -> DataFrame:
    df = compile_stream(e.args[0], ctx)
    return df.orderBy(*_sort_cols(df, e.kwargs["sort"])).limit(int(e.kwargs["n"]))


def _c_rollup(e: Expr, ctx: StreamContext) -> DataFrame:
    df = compile_stream(e.args[0], ctx)
    metrics = [a for a in e.args[1:] if isinstance(a, Expr) and a.name in _METRICS]
    if not metrics:
        raise ValueError("rollup() needs at least one metric")
    over = _csv(e.kwargs["over"])
    return (
        df.groupBy(*over)
        .agg(*[_metric_col(m) for m in metrics])
        .orderBy(*[F.asc(c) for c in over])
    )


def _c_having(e: Expr, ctx: StreamContext) -> DataFrame:
    df = compile_stream(e.args[0], ctx)
    conds = [a for a in e.args[1:] if isinstance(a, Expr)]
    if len(conds) != 1:
        raise ValueError("having() takes exactly one boolean operation")
    return df.filter(_bool_cond(df, conds[0]))


def _join_dfs(e: Expr, ctx: StreamContext, how: str, broadcast_right: bool):
    left = compile_stream(e.args[0], ctx)
    right_expr = e.args[1] if len(e.args) > 1 else e.kwargs.get("hashed")
    right = compile_stream(right_expr, ctx)
    pairs = _on_pairs(e.kwargs["on"])
    if broadcast_right:
        right = F.broadcast(right)
    cond = None
    for l, r in pairs:
        c = left[l] == right[r]
        cond = c if cond is None else (cond & c)
    joined = left.join(right, on=cond, how=how)
    # Solr emits each field once when the on-clause names are equal —
    # drop the right-side duplicate of every equi-named join key
    for l, r in pairs:
        if l == r:
            joined = joined.drop(right[r])
    return joined


def _c_inner_join(e: Expr, ctx: StreamContext) -> DataFrame:
    return _join_dfs(e, ctx, "inner", broadcast_right=False)


def _c_left_join(e: Expr, ctx: StreamContext) -> DataFrame:
    return _join_dfs(e, ctx, "left", broadcast_right=False)


def _c_hash_join(e: Expr, ctx: StreamContext) -> DataFrame:
    return _join_dfs(e, ctx, "inner", broadcast_right=True)


def _c_merge(e: Expr, ctx: StreamContext) -> DataFrame:
    streams = [compile_stream(a, ctx) for a in e.args]
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out.orderBy(*_sort_cols(out, e.kwargs["on"]))


def _c_intersect(e: Expr, ctx: StreamContext) -> DataFrame:
    left = compile_stream(e.args[0], ctx)
    right = compile_stream(e.args[1], ctx)
    pairs = _on_pairs(e.kwargs["on"])
    return left.join(
        right.select(*[right[r].alias(l) for l, r in pairs]).distinct(),
        on=[l for l, _ in pairs],
        how="left_semi",
    )


def _c_complement(e: Expr, ctx: StreamContext) -> DataFrame:
    left = compile_stream(e.args[0], ctx)
    right = compile_stream(e.args[1], ctx)
    pairs = _on_pairs(e.kwargs["on"])
    return left.join(
        right.select(*[right[r].alias(l) for l, r in pairs]).distinct(),
        on=[l for l, _ in pairs],
        how="left_anti",
    )


def _c_fetch(e: Expr, ctx: StreamContext) -> DataFrame:
    coll = ctx.collection(e.args[0] if e.args else None)
    df = compile_stream(e.args[1], ctx)
    fl = _csv(e.kwargs["fl"])
    (pair,) = _on_pairs(e.kwargs.get("on", "doc_id=doc_id"))
    doc_key, stream_key = pair
    stored = coll.documents.select(
        F.col(doc_key).alias(stream_key),
        *[c for c in fl if c != doc_key],
    )
    return df.join(stored, on=stream_key, how="left")


_TS_GAP_RE = re.compile(r"^\+(\d+)(SECOND|MINUTE|HOUR|DAY|MONTH|YEAR)S?$")
_GAP_SECS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _c_timeseries(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``timeseries(coll, q=, field=, start=, end=, gap=,
    metrics…)`` source: fixed-gap date buckets over the match set
    with per-bucket metrics; EVERY bucket in [start, end) is emitted
    in range order, empty ones with count 0 / null metrics (the Solr
    contract). Gaps: fixed-width ``+N SECOND/MINUTE/HOUR/DAY`` date
    math via epoch arithmetic, and calendar ``+N MONTH/YEAR`` gaps via
    month-ordinal arithmetic (start/end must sit on month boundaries —
    the Solr date-math rounding ``/MONTH`` produces; arbitrary-day
    month anchoring is rejected rather than silently mis-bucketed).
    Output: (dt ISO-8601 bucket start, metrics…).

    Plan shape: ONE groupBy on the bucket ordinal (floor((epoch-
    start)/gap) — map-side combinable), left-joined to a
    spark.range(n_buckets) grid (bucket count bounded by the REQUEST,
    never by the data); no collect, no window."""
    from datetime import datetime

    coll = ctx.collection(e.args[0] if e.args else None)
    field = e.kwargs.get("field")
    gap = e.kwargs.get("gap", "")
    if not field or "start" not in e.kwargs or "end" not in e.kwargs:
        raise ValueError("timeseries needs field=, start=, end=, gap=")
    m = _TS_GAP_RE.match(gap.replace(" ", ""))
    if not m:
        raise ValueError(
            f"unsupported gap {gap!r} (+N SECOND/MINUTE/HOUR/DAY/MONTH/YEAR)"
        )
    unit = m.group(2)

    def _dt(s: str) -> datetime:
        return datetime.fromisoformat(s.replace("Z", "+00:00"))

    sdt, edt = _dt(e.kwargs["start"]), _dt(e.kwargs["end"])
    if edt <= sdt:
        raise ValueError("timeseries end must be after start")
    calendar = unit in ("MONTH", "YEAR")
    if calendar:
        months = int(m.group(1)) * (12 if unit == "YEAR" else 1)
        for d, name in ((sdt, "start"), (edt, "end")):
            if (d.day, d.hour, d.minute, d.second) != (1, 0, 0, 0):
                raise ValueError(
                    f"calendar gaps need {name} on a month boundary"
                )
        base = sdt.year * 12 + sdt.month - 1
        end_mo = edt.year * 12 + edt.month - 1
        nb = -(-(end_mo - base) // months)
    else:
        secs = int(m.group(1)) * _GAP_SECS[unit]
        start, end = sdt.timestamp(), edt.timestamp()
        nb = int(-(-(end - start) // secs))
    metrics = [a for a in e.args[1:] if isinstance(a, Expr)]
    mexprs = [_metric_col(mtr) for mtr in metrics] or [
        F.count("*").cast("long").alias("count(*)")
    ]
    mfields = sorted(
        {
            mtr.args[0]
            for mtr in metrics
            # count(*)'s "*" is not a field — letting it through would
            # select("doc_id", field, "*") and drag every stored column
            # through the pre-aggregation join
            if mtr.args and isinstance(mtr.args[0], str) and mtr.args[0] != "*"
        }
    )
    rows = _export_rows(
        coll, e.kwargs.get("q", "*:*"), e.kwargs.get("fq"),
        ["doc_id", field, *mfields],
    )
    if calendar:
        ts = F.col(field).cast("timestamp_ltz")
        mo = F.year(ts) * 12 + F.month(ts) - 1
        ordinal = F.floor((mo - F.lit(base)) / F.lit(months)).cast("long")
        # the last bucket may extend past end in ordinal space —
        # exclude the end month itself (end is a month boundary)
        in_range = (mo >= F.lit(base)) & (mo < F.lit(end_mo))
    else:
        ep = F.col(field).cast("timestamp_ltz").cast("double")
        ordinal = F.floor((ep - F.lit(start)) / F.lit(float(secs))).cast("long")
        in_range = None
    binned = rows.withColumn("_i", ordinal).filter(
        (F.col("_i") >= 0) & (F.col("_i") < nb)
    )
    if in_range is not None:
        binned = binned.filter(in_range)
    aggd = binned.groupBy("_i").agg(*mexprs)
    grid = rows.sparkSession.range(nb).select(F.col("id").alias("_i"))
    out = grid.join(aggd, on="_i", how="left")
    # counts are 0 for empty buckets (Solr); other metrics stay null
    fixed = [
        F.coalesce(F.col(f"`{c}`"), F.lit(0)).cast("long").alias(c)
        if c.startswith("count(") else F.col(f"`{c}`")
        for c in out.columns if c != "_i"
    ]
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    if calendar:
        label = F.date_format(
            F.add_months(
                F.lit(sdt.strftime("%Y-%m-%d")).cast("date"),
                F.col("_i").cast("int") * months,
            ).cast("timestamp_ltz"),
            fmt,
        )
    else:
        label = F.date_format(
            (F.lit(start) + F.col("_i") * F.lit(float(secs))).cast(
                "timestamp_ltz"
            ),
            fmt,
        )
    return out.orderBy("_i").select(label.alias("dt"), *fixed)


def _c_describe(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr Math Expressions ``describe()``: distribution summary of a
    numeric field. Solr's math expressions materialize streams into
    node memory via let()/col(); the engine keeps the same statistics
    but computes them as ONE lazy columnar aggregation — no
    materialization, map-side combinable at any scale."""
    df = compile_stream(e.args[0], ctx)
    fname = e.kwargs.get("field")
    if not fname:
        raise ValueError("describe needs field=")
    c = F.col(fname)
    return df.agg(
        F.count(c).cast("long").alias("n"),
        F.round(F.avg(c), 6).alias("mean"),
        F.round(F.stddev_samp(c), 6).alias("stddev"),
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        F.round(F.sum(c), 6).alias("sum"),
    )


def _c_corr(e: Expr, ctx: StreamContext) -> DataFrame:
    """Math Expressions ``corr()``: Pearson correlation of two numeric
    fields over the stream — one map-side-combinable aggregate."""
    df = compile_stream(e.args[0], ctx)
    fx, fy = e.kwargs.get("fieldA"), e.kwargs.get("fieldB")
    if not fx or not fy:
        raise ValueError("corr needs fieldA=, fieldB=")
    return df.agg(F.round(F.corr(fx, fy), 6).alias("corr"))


def _c_regress(e: Expr, ctx: StreamContext) -> DataFrame:
    """Math Expressions ``regress()``: simple OLS of y on x. slope =
    covar_pop/var_pop, intercept = ȳ − slope·x̄, RSquared = corr² —
    all population moments from ONE aggregate pass. ``roundTo=`` sets
    the single output rounding (default 6): callers that re-round to a
    coarser precision must pass it here instead — double rounding
    (6 then 4) can disagree with a single round-to-4 oracle on values
    near a 4-dp halfway boundary."""
    df = compile_stream(e.args[0], ctx)
    fx, fy = e.kwargs.get("x"), e.kwargs.get("y")
    if not fx or not fy:
        raise ValueError("regress needs x=, y=")
    round_to = int(e.kwargs.get("roundTo", 6))
    m = df.agg(
        F.count("*").cast("long").alias("n"),
        F.covar_pop(fx, fy).alias("_cov"),
        F.var_pop(fx).alias("_varx"),
        F.avg(fx).alias("_mx"),
        F.avg(fy).alias("_my"),
        F.corr(fx, fy).alias("_r"),
    )
    slope = F.col("_cov") / F.col("_varx")
    return m.select(
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(F.col("_my") - slope * F.col("_mx"), round_to).alias("intercept"),
        F.round(F.col("_r") * F.col("_r"), round_to).alias("RSquared"),
    )


def _c_hist(e: Expr, ctx: StreamContext) -> DataFrame:
    """Math Expressions ``hist()``: equal-width histogram of a numeric
    field. Two bounded passes: ONE min/max aggregate (a single driver
    row) fixes the bin geometry, then ONE map-side-combinable groupBy
    on the bin ordinal, left-joined to a request-bounded bin grid so
    empty bins appear with count 0."""
    df = compile_stream(e.args[0], ctx)
    fname = e.kwargs.get("field")
    bins = int(e.kwargs.get("bins", 10))
    if not fname or bins < 1:
        raise ValueError("hist needs field= and bins>=1")
    c = F.col(fname).cast("double")
    lo, hi = df.agg(F.min(c), F.max(c)).collect()[0]
    if lo is None:
        return df.sparkSession.createDataFrame(
            [], "bin long, lo double, hi double, count long"
        )
    width = (hi - lo) / bins if hi > lo else 1.0
    ordinal = F.least(
        F.floor((c - F.lit(lo)) / F.lit(width)).cast("long"), F.lit(bins - 1)
    )
    counts = df.select(ordinal.alias("bin")).groupBy("bin").agg(
        F.count("*").cast("long").alias("count")
    )
    grid = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    return (
        grid.join(counts, on="bin", how="left")
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            F.coalesce("count", F.lit(0)).cast("long").alias("count"),
        )
        .orderBy("bin")
    )


def _c_moving_avg(e: Expr, ctx: StreamContext) -> DataFrame:
    """Math Expressions ``movingAvg()`` adapted to streams: a trailing
    ``window=N`` average of ``field`` over the child stream in
    ``sort=`` order, null until the window fills (Solr's array form
    emits len-N+1 points; the stream form keeps row alignment).
    The window is UNPARTITIONED by design — the child is a bucketed
    series whose length is bounded by the REQUEST (timeseries/facet
    output), never by the corpus."""
    from pyspark.sql import Window

    df = compile_stream(e.args[0], ctx)
    fname = e.kwargs.get("field")
    n = int(e.kwargs.get("window", 3))
    if not fname or n < 1 or "sort" not in e.kwargs:
        raise ValueError("movingAvg needs field=, window>=1, sort=")
    w = (
        Window.orderBy(*_sort_cols(df, e.kwargs["sort"]))
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    full = F.count(fname).over(w) >= n
    return df.withColumn(
        f"movingAvg({fname})",
        F.when(full, F.round(F.avg(fname).over(w), 6)),
    )


def _c_diff(e: Expr, ctx: StreamContext) -> DataFrame:
    """Math Expressions ``diff()`` adapted to streams: first-order
    difference of ``field`` in ``sort=`` order (null first row).
    Unpartitioned window over a request-bounded series, like
    movingAvg."""
    from pyspark.sql import Window

    df = compile_stream(e.args[0], ctx)
    fname = e.kwargs.get("field")
    if not fname or "sort" not in e.kwargs:
        raise ValueError("diff needs field=, sort=")
    w = Window.orderBy(*_sort_cols(df, e.kwargs["sort"]))
    return df.withColumn(
        f"diff({fname})",
        F.round(F.col(fname) - F.lag(fname).over(w), 6),
    )


def _c_cartesian_product(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``cartesianProduct(stream, field, productSort=)``: one
    output tuple per element of the multivalued ``field`` (the
    single-field cartesian product) — Catalyst's explode, keeping the
    exploded value under the same field name. Zero-shuffle unless
    productSort asks for an order."""
    df = compile_stream(e.args[0], ctx)
    fields = [a for a in e.args[1:] if isinstance(a, str)]
    if len(fields) != 1:
        raise ValueError("cartesianProduct(stream, field) takes one field")
    (fname,) = fields
    others = [c for c in df.columns if c != fname]
    out = df.select(*others, F.explode(fname).alias(fname)).select(*df.columns)
    if "productSort" in e.kwargs:
        out = out.orderBy(*_sort_cols(out, e.kwargs["productSort"]))
    return out


def _c_shortest_path(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``shortestPath(coll, from=, to=, edge="srcField=dstField",
    maxDepth=)`` (/graph): breadth-first search over the edge
    collection (every document IS one edge), returning ALL paths of
    the minimum length from ``from`` to ``to`` as array<string>
    ``path`` tuples — the Solr contract. ``threads=``/
    ``partitionSize=`` are accepted and ignored: Spark's partitioning
    IS the parallel traversal.

    Plan shape: classic iterative frontier BFS — per level ONE
    equi-join frontier×edges plus ONE anti-join against the visited
    set, lineage cut with localCheckpoint (the bfs_closure pattern,
    operators/closures.py). Level count is bounded by the REQUEST's
    maxDepth, never by the data; visited-set pruning keeps the
    frontier from re-expanding earlier levels, which is exactly what
    makes BFS yield shortest paths."""
    coll = ctx.collection(e.args[0] if e.args else None)
    src, dst = e.kwargs.get("from"), e.kwargs.get("to")
    if not src or not dst or "edge" not in e.kwargs:
        raise ValueError("shortestPath needs from=, to=, edge=")
    max_depth = int(e.kwargs.get("maxDepth", 4))
    (pair,) = _on_pairs(e.kwargs["edge"])
    fr_f, to_f = pair
    spark = coll.documents.sparkSession
    if src == dst:
        return spark.createDataFrame([([src],)], "path array<string>")

    edges = (
        coll.documents.select(
            F.col(fr_f).cast("string").alias("_src"),
            F.col(to_f).cast("string").alias("_dst"),
        )
        .filter(F.col("_src").isNotNull() & F.col("_dst").isNotNull())
        .distinct()
    )
    frontier = spark.createDataFrame(
        [(src, [src])], "node string, path array<string>"
    )
    visited = frontier.select("node")
    empty = spark.createDataFrame([], "path array<string>")
    for _ in range(max_depth):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["_src"])
            .select(
                F.col("_dst").alias("node"),
                F.concat("path", F.array("_dst")).alias("path"),
            )
            .join(visited, on="node", how="left_anti")
            .distinct()
            .localCheckpoint()
        )
        hits = nxt.filter(F.col("node") == dst)
        if hits.limit(1).count() > 0:
            return hits.select("path")
        if nxt.limit(1).count() == 0:
            return empty
        visited = visited.union(nxt.select("node").distinct()).localCheckpoint()
        frontier = nxt
    return empty



def _c_topic(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``topic(checkpoints, coll, q=, id=, fl=,
    initialCheckpoint=)``: checkpointed pub-sub — each read returns
    the documents ADDED OR UPDATED since the last read for this topic
    id, then advances the checkpoint. Solr checkpoints _version_ per
    shard into a checkpoint collection; the engine checkpoints the
    segment high-water mark of the destination root (segments are the
    engine's version axis: every upsert batch appends one), storing it
    under ``{root}/topics/{id}.json``.

    Default start is Solr's: the CURRENT high-water mark (first read
    returns nothing, later reads return what arrived after
    subscription); ``initialCheckpoint=0`` replays from the beginning.
    A doc updated twice between reads is emitted once, in its newest
    copy (max-segment join, distributed). EAGER like update(): the
    returned rows are localCheckpoint-materialized (bounded by the
    new-segment batch size) before the watermark advances, so a crash
    before materialization never skips documents."""
    import json
    import os

    # Solr's form is topic(checkpointCollection, collection, ...);
    # the engine keeps checkpoints inside the data collection's root,
    # so a leading checkpoint-collection name is accepted and unused —
    # the DATA collection is the last positional name.
    names = [a for a in e.args if isinstance(a, str)]
    coll = ctx.collection(names[-1] if names else None)
    if coll.root is None:
        raise ValueError("topic() collection has no root=")
    topic_id = e.kwargs.get("id")
    if not topic_id or not topic_id.replace("_", "").isalnum():
        raise ValueError("topic() needs an alphanumeric id=")
    if e.kwargs.get("q", "*:*").strip() != "*:*":
        raise ValueError("topic() supports q='*:*' (match-all consumption)")
    if not os.path.isdir(f"{coll.root}/stored"):
        raise ValueError(
            "topic() reads stored documents — the collection root has "
            "no stored-fields table (write_index(store_fields=[...]))"
        )
    fl = _csv(e.kwargs.get("fl", "doc_id"))

    spark = coll.documents.sparkSession
    docs = spark.read.option("mergeSchema", "true").parquet(
        f"{coll.root}/stored"
    )
    seg = (
        F.coalesce(F.col("_seg"), F.lit(0)) if "_seg" in docs.columns
        else F.lit(0)
    )
    docs = docs.withColumn("_seg", seg.cast("long"))
    row = docs.agg(F.max("_seg")).collect()[0]
    cur_max = int(row[0]) if row[0] is not None else 0

    ckpt_path = os.path.join(coll.root, "topics", f"{topic_id}.json")
    if os.path.exists(ckpt_path):
        start = int(json.load(open(ckpt_path))["seg"])
    elif "initialCheckpoint" in e.kwargs:
        start = int(e.kwargs["initialCheckpoint"]) - 1
    else:
        start = cur_max  # Solr default: subscribe at the current end

    # emit the NEWEST stored copy of each doc added/updated since the
    # checkpoint, plus _version (the segment — Solr topics emit
    # _version_): max-segment resolution, same rule as serve.fetch
    fresh = docs.filter(F.col("_seg") > start)
    latest = fresh.groupBy("doc_id").agg(F.max("_seg").alias("_seg"))
    cols = fl if "doc_id" in fl else ["doc_id"] + fl
    out = (
        fresh.join(latest, on=["doc_id", "_seg"])
        .select(*cols, F.col("_seg").alias("_version"))
        .localCheckpoint()
    )
    os.makedirs(os.path.dirname(ckpt_path), exist_ok=True)
    # atomic checkpoint advance: write-then-rename so a crash mid-write
    # can never leave a truncated/corrupt topics/{id}.json behind (the
    # materialize-before-advance crash-safety contract)
    tmp_path = ckpt_path + ".tmp"
    with open(tmp_path, "w") as f:
        json.dump({"seg": cur_max}, f)
    os.replace(tmp_path, ckpt_path)
    return out


def _c_significant_terms(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``significantTerms(coll, q=, field=, limit=,
    minDocFreq=)``: terms overrepresented in the q match set vs the
    whole collection. Rides the engine's significant-terms kernel
    (operators.textstats.significant_terms — one explode+distinct
    feeding two map-side-combinable doc-frequency aggregations,
    foreground broadcast when small); output (term, fg_df, bg_df,
    lift) ranked lift desc / fg_df desc / term asc, limit-bounded."""
    from golr_loader_spark.operators.textstats import significant_terms

    coll = ctx.collection(e.args[0] if e.args else None)
    fname = e.kwargs.get("field")
    if not fname:
        raise ValueError("significantTerms needs field=")
    fg = _match_ids(coll, e.kwargs.get("q", "*:*"), e.kwargs.get("fq"))
    return significant_terms(
        coll.documents,
        fg,
        "doc_id",
        fname,
        k=int(e.kwargs.get("limit", 10)),
        min_fg=int(e.kwargs.get("minDocFreq", 2)),
    )


def _c_random(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``random(coll, q=, fl=, rows=, seed=)``: a pseudo-random
    sample of the match set. Deterministic variant (documented
    deviation — Solr reseeds per request unless seeded): rank by a
    Knuth multiplicative hash of (doc_id + seed) — reproducible
    across runs, engines, and partitionings, SQL-replayable — and cut
    at rows IN THE PLAN (TakeOrdered, no full sort materialization)."""
    coll = ctx.collection(e.args[0] if e.args else None)
    fl = _csv(e.kwargs.get("fl", "doc_id"))
    rows_n = int(e.kwargs.get("rows", 10))
    seed = int(e.kwargs.get("seed", 0))
    out = _export_rows(
        coll, e.kwargs.get("q", "*:*"), e.kwargs.get("fq"),
        fl if "doc_id" in fl else ["doc_id"] + fl,
    )
    u = F.pmod((F.col("doc_id") + F.lit(seed)) * F.lit(2654435761), F.lit(4294967296))
    return out.orderBy(u.asc(), F.col("doc_id").asc()).limit(rows_n).select(*fl)


def _c_update(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``update(destCollection, stream, batchSize=)``: push the
    child stream's tuples into the destination collection as
    add/overwrite updates. The engine routes this to the Lucene-style
    fast upsert (``maintenance.upsert_docs_fast`` — O(batch) segment
    append + segment-scoped liveDocs, never O(index)); ``batchSize``
    is accepted and ignored (Spark's partitioning IS the batching).
    The destination must be a collection opened with a persisted
    ``root``. EAGER by contract: Solr's update stream indexes as it is
    read, so compiling one executes the write and returns the one-row
    result stream ({batchIndexed, updated, added} — Solr's per-batch
    result tuple shape)."""
    from golr_loader_spark.plans.maintenance import upsert_docs_fast

    coll = ctx.collection(e.args[0] if e.args else None)
    if coll.root is None:
        raise ValueError("update() destination collection has no root=")
    child = next((a for a in e.args if isinstance(a, Expr)), None)
    if child is None:
        raise ValueError("update(collection, <stream>) needs a child stream")
    df = compile_stream(child, ctx)
    res = upsert_docs_fast(df.sparkSession, coll.root, df, coll.config)
    return df.sparkSession.createDataFrame(
        [(int(res["updated"]) + int(res["added"]),
          int(res["updated"]), int(res["added"]))],
        "batchIndexed long, updated long, added long",
    )


def _c_commit(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``commit(destCollection, stream)``: wraps an update stream
    and forces a commit per batch. The engine's upserts are durably
    visible at write time (parquet segment append + atomic stats
    swap), so commit() compiles to its child unchanged."""
    child = next((a for a in e.args if isinstance(a, Expr)), None)
    if child is None:
        raise ValueError("commit(collection, <stream>) needs a child stream")
    return compile_stream(child, ctx)


def _nodes_depth(e) -> int:
    """Structural traversal level of a nodes() node: 1 + the depth of
    its child stream (Solr assigns level by gatherNodes nesting)."""
    if isinstance(e, Expr) and e.name in ("nodes", "gatherNodes"):
        child = e.args[1] if len(e.args) > 1 else None
        return 1 + _nodes_depth(child)
    return 0


def _c_nodes(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr graph traversal (``nodes``/``gatherNodes``): expand the
    incoming stream's frontier ONE hop through this collection —
    ``walk="srcField->matchField"`` matches the child tuples' src
    values against the collection's match field, ``gather="f"`` emits
    the distinct gathered values as (node, field, level) tuples;
    ``scatter="branches,leaves"`` controls whether the incoming
    frontier (branches, level-1) and/or the gathered set (leaves,
    level) are emitted — Solr's defaults (leaves only) apply. Metric
    args (``count(*)``, ``sum(f)``…) aggregate over gathered EDGES
    per node, Solr-style, and require leaves-only scatter.

    Node values are cast to string (Solr node ids are strings), so
    multi-level walks (``walk="node->fk"``) compare exact decimal
    renderings — never a lossy numeric coercion. Plan shape: each
    hop is one distinct + one equi-join on the string key; a k-level
    traversal is k chained joins in ONE lazy plan, no driver loop,
    frontier dedup keeps the join input minimal (BFS frontier, not
    multiset paths)."""
    coll = ctx.collection(e.args[0] if e.args else None)
    if len(e.args) < 2 or not isinstance(e.args[1], Expr):
        raise ValueError("nodes(collection, <stream>, ...) needs a child stream")
    child = compile_stream(e.args[1], ctx)
    walk = e.kwargs.get("walk")
    gather = e.kwargs.get("gather")
    if not walk or "->" not in walk or not gather:
        raise ValueError('nodes needs walk="src->match" and gather="field"')
    src, match = (x.strip() for x in walk.split("->", 1))
    gather = gather.strip()
    scatter = {s.strip() for s in e.kwargs.get("scatter", "leaves").split(",")}
    if not scatter <= {"branches", "leaves"}:
        raise ValueError(f"bad scatter {e.kwargs.get('scatter')!r}")
    metrics = [a for a in e.args[2:] if isinstance(a, Expr)]
    if metrics and scatter != {"leaves"}:
        raise ValueError("nodes metrics require scatter='leaves'")
    lvl = _nodes_depth(e)
    frontier = (
        child.select(F.col(src).cast("string").alias("node")).distinct()
    )
    docs = coll.documents
    joined = docs.join(
        frontier, docs[match].cast("string") == frontier["node"], "inner"
    )
    gathered = joined.select(F.col(gather).cast("string").alias("node"))
    if metrics:
        gathered_m = joined.groupBy(
            F.col(gather).cast("string").alias("node")
        ).agg(*[_metric_col(m) for m in metrics])
        mcols = [c for c in gathered_m.columns if c != "node"]
        leaves = gathered_m.select(
            "node",
            F.lit(gather).alias("field"),
            F.lit(lvl).alias("level"),
            *mcols,
        )
    else:
        leaves = gathered.distinct().select(
            "node", F.lit(gather).alias("field"), F.lit(lvl).alias("level")
        )
    if scatter == {"leaves"}:
        return leaves
    branches = frontier.select(
        "node", F.lit(src).alias("field"), F.lit(lvl - 1).alias("level")
    )
    if scatter == {"branches"}:
        return branches
    return branches.unionByName(leaves)


def _c_parallel(e: Expr, ctx: StreamContext) -> DataFrame:
    """Solr ``parallel(coll, expr, workers=, sort=)``: route the inner
    expression to N workers and merge by sort. Spark's answer is the
    partitioning itself — the compiled child plan already executes
    data-parallel across executors — so parallel() compiles to its
    child (plus the merge sort when given): the workers= hint is
    honored by the cluster scheduler, not re-implemented above it."""
    child = next((a for a in e.args if isinstance(a, Expr)), None)
    if child is None:
        raise ValueError("parallel(collection, <stream>, ...) needs a child")
    df = compile_stream(child, ctx)
    if "sort" in e.kwargs:
        df = df.orderBy(*_sort_cols(df, e.kwargs["sort"]))
    return df


_COMPILERS = {
    "search": _c_search,
    "stats": _c_stats,
    "facet": _c_facet,
    "select": _c_select,
    "sort": _c_sort,
    "unique": _c_unique,
    "top": _c_top,
    "rollup": _c_rollup,
    "having": _c_having,
    "innerJoin": _c_inner_join,
    "leftOuterJoin": _c_left_join,
    "hashJoin": _c_hash_join,
    "merge": _c_merge,
    "intersect": _c_intersect,
    "complement": _c_complement,
    "fetch": _c_fetch,
    "nodes": _c_nodes,
    "gatherNodes": _c_nodes,
    "timeseries": _c_timeseries,
    "parallel": _c_parallel,
    "shortestPath": _c_shortest_path,
    "cartesianProduct": _c_cartesian_product,
    "update": _c_update,
    "commit": _c_commit,
    "significantTerms": _c_significant_terms,
    "random": _c_random,
    "topic": _c_topic,
    "describe": _c_describe,
    "movingAvg": _c_moving_avg,
    "diff": _c_diff,
    "corr": _c_corr,
    "regress": _c_regress,
    "hist": _c_hist,
}


def compile_stream(expr: str | Expr, ctx: StreamContext) -> DataFrame:
    """Parse (if needed) and compile a streaming expression to ONE
    lazy DataFrame plan over the context's collections."""
    e = parse_expr(expr) if isinstance(expr, str) else expr
    if not isinstance(e, Expr):
        raise ValueError(f"not a stream expression: {expr!r}")
    if e.name not in _COMPILERS:
        raise ValueError(f"unknown stream operator {e.name!r}")
    return _COMPILERS[e.name](e, ctx)
