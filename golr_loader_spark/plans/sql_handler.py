"""Solr Parallel SQL (/sql handler) — SQL compiled onto Streaming
Expressions, which compile onto Catalyst.

Solr's /sql handler does not execute SQL itself: Apache Calcite
parses the statement and plans it as a streaming expression that the
/stream machinery runs (map_reduce mode sorts+rolls up on the worker
collections). This module reproduces that architecture — a
recursive-descent parser for the supported SQL subset and a
translator that emits the equivalent streaming-expression STRING,
which ``plans.stream_expr.compile_stream`` then turns into ONE lazy
DataFrame plan. Nothing here touches rows: the SQL text becomes
``search/stats/rollup/having/unique/select/sort/top`` nodes, so every
Catalyst optimization (pushdown, map-side partial aggregation,
broadcast) applies unchanged, and the plan shape is identical to the
hand-written streaming expression a Solr user would have composed.

Reference provenance: the reference feeds documents to a Solr
instance whose SQL surface is this handler (solr-ref-guide
parallel-sql-interface; GolrLoader emits the collections it queries —
``GolrLoader.java:498-515``). Supported subset (the /sql handler's
own documented core):

  SELECT [DISTINCT] col | agg(col|*) [AS alias], ...
  FROM <collection>
  [WHERE <boolean tree of comparisons>]
  [GROUP BY col, ...] [HAVING <boolean tree over aggs>]
  [ORDER BY expr [ASC|DESC], ...] [LIMIT n]

WHERE handling mirrors Solr's split: equality predicates on INDEXED
fields push into the search ``q`` as fielded Lucene queries
(``field = 'a b'`` → ``field:(a b)``, the translation the Solr docs
give); every other comparison compiles to stream boolean evaluators
(``having(...)`` with eq/gt/lt/gteq/lteq/and/or/not) — Catalyst
filters either way, evaluated distributed-side. Aggregates without
GROUP BY become ``stats()``; GROUP BY becomes ``rollup()`` (one
map-side-combinable groupBy); DISTINCT becomes ``unique()``;
LIMIT becomes ``top()`` (rank-and-cut in the plan, never a driver
collect).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from golr_loader_spark.plans.stream_expr import StreamContext, compile_stream

_AGGS = {"count", "sum", "min", "max", "avg"}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')          |
        (?P<num>-?\d+(?:\.\d+)?)         |
        (?P<id>[A-Za-z_][A-Za-z0-9_]*)   |
        (?P<op><>|!=|<=|>=|=|<|>)        |
        (?P<punct>[(),*])
    )""",
    re.VERBOSE,
)


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"SQL syntax error at: {sql[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "id":
            kw = text.upper()
            if kw in _KEYWORDS:
                out.append(("kw", kw))
                continue
        out.append((kind, text))
    return out


_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "WHERE", "GROUP", "BY", "HAVING",
    "ORDER", "LIMIT", "AND", "OR", "NOT", "AS", "ASC", "DESC", "IN",
    "BETWEEN",
}


# ------------------------------------------------------------- AST


@dataclass
class Comparison:
    field: str
    op: str          # = <> < > <= >=
    value: object    # int | float | str
    is_string: bool


@dataclass
class BoolNode:
    op: str          # and | or | not
    children: list


@dataclass
class SelectItem:
    agg: str | None  # None for a plain column
    arg: str         # column name, or "*" for count(*)
    alias: str | None

    @property
    def expr_name(self) -> str:
        if self.agg is None:
            return self.arg
        return f"{self.agg}({self.arg})"

    @property
    def out_name(self) -> str:
        return self.alias or self.expr_name


@dataclass
class Statement:
    items: list
    distinct: bool
    table: str
    where: object | None
    group_by: list
    having: object | None
    order_by: list      # [(name, "asc"|"desc")]
    limit: int | None


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    # token helpers -------------------------------------------------
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, kind, text=None):
        k, v = self.next()
        if k != kind or (text is not None and v != text):
            raise ValueError(f"expected {text or kind}, got {v!r}")
        return v

    def accept(self, kind, text=None) -> bool:
        k, v = self.peek()
        if k == kind and (text is None or v == text):
            self.i += 1
            return True
        return False

    # grammar -------------------------------------------------------
    def statement(self) -> Statement:
        self.expect("kw", "SELECT")
        distinct = self.accept("kw", "DISTINCT")
        items = [self.select_item()]
        while self.accept("punct", ","):
            items.append(self.select_item())
        self.expect("kw", "FROM")
        table = self.expect("id")
        where = self.bool_expr() if self.accept("kw", "WHERE") else None
        group_by: list[str] = []
        if self.accept("kw", "GROUP"):
            self.expect("kw", "BY")
            group_by.append(self.expect("id"))
            while self.accept("punct", ","):
                group_by.append(self.expect("id"))
        having = self.bool_expr() if self.accept("kw", "HAVING") else None
        order_by: list[tuple[str, str]] = []
        if self.accept("kw", "ORDER"):
            self.expect("kw", "BY")
            order_by.append(self.order_item())
            while self.accept("punct", ","):
                order_by.append(self.order_item())
        limit = None
        if self.accept("kw", "LIMIT"):
            limit = int(self.expect("num"))
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing tokens at {self.peek()[1]!r}")
        return Statement(
            items, distinct, table, where, group_by, having, order_by, limit
        )

    def select_item(self) -> SelectItem:
        k, v = self.next()
        if k == "punct" and v == "*":
            return SelectItem(None, "*", None)
        if k != "id":
            raise ValueError(f"expected column or aggregate, got {v!r}")
        agg, arg = None, v
        if v.lower() in _AGGS and self.accept("punct", "("):
            agg = v.lower()
            if self.accept("punct", "*"):
                if agg != "count":
                    raise ValueError(f"{agg}(*) is not supported")
                arg = "*"
            else:
                arg = self.expect("id")
            self.expect("punct", ")")
        alias = None
        if self.accept("kw", "AS"):
            alias = self.expect("id")
        return SelectItem(agg, arg, alias)

    def order_item(self) -> tuple[str, str]:
        name = self.expect("id")
        # ORDER BY count(*) / sum(col) — the literal metric name
        if name.lower() in _AGGS and self.accept("punct", "("):
            if self.accept("punct", "*"):
                inner = "*"
            else:
                inner = self.expect("id")
            self.expect("punct", ")")
            name = f"{name.lower()}({inner})"
        direction = "asc"
        if self.accept("kw", "DESC"):
            direction = "desc"
        else:
            self.accept("kw", "ASC")
        return name, direction

    def bool_expr(self):
        node = self.bool_and()
        while self.accept("kw", "OR"):
            rhs = self.bool_and()
            if isinstance(node, BoolNode) and node.op == "or":
                node.children.append(rhs)
            else:
                node = BoolNode("or", [node, rhs])
        return node

    def bool_and(self):
        node = self.bool_unary()
        while self.accept("kw", "AND"):
            rhs = self.bool_unary()
            if isinstance(node, BoolNode) and node.op == "and":
                node.children.append(rhs)
            else:
                node = BoolNode("and", [node, rhs])
        return node

    def bool_unary(self):
        if self.accept("kw", "NOT"):
            return BoolNode("not", [self.bool_unary()])
        if self.accept("punct", "("):
            node = self.bool_expr()
            self.expect("punct", ")")
            return node
        return self.comparison()

    def comparison(self):
        field = self.expect("id")
        if field.lower() in _AGGS and self.accept("punct", "("):
            if self.accept("punct", "*"):
                inner = "*"
            else:
                inner = self.expect("id")
            self.expect("punct", ")")
            field = f"{field.lower()}({inner})"
        negate = self.accept("kw", "NOT")
        if self.accept("kw", "IN"):
            # IN (v, ...) desugars to an OR tree of equalities
            self.expect("punct", "(")
            alts = [self._literal_cmp(field, "=")]
            while self.accept("punct", ","):
                alts.append(self._literal_cmp(field, "="))
            self.expect("punct", ")")
            node = alts[0] if len(alts) == 1 else BoolNode("or", alts)
            return BoolNode("not", [node]) if negate else node
        if self.accept("kw", "BETWEEN"):
            # BETWEEN a AND b desugars to (>= a AND <= b)
            lo = self._literal_cmp(field, ">=")
            self.expect("kw", "AND")
            hi = self._literal_cmp(field, "<=")
            node = BoolNode("and", [lo, hi])
            return BoolNode("not", [node]) if negate else node
        if negate:
            raise ValueError(f"expected IN or BETWEEN after {field} NOT")
        op = self.expect("op")
        return self._literal_cmp(field, op)

    def _literal_cmp(self, field: str, op: str) -> Comparison:
        k, v = self.next()
        if k == "str":
            return Comparison(field, op, v[1:-1].replace("''", "'"), True)
        if k == "num":
            return Comparison(
                field, op, float(v) if "." in v else int(v), False
            )
        raise ValueError(f"expected literal after {field} {op}, got {v!r}")


def parse_sql(sql: str) -> Statement:
    return _Parser(sql).statement()


# ----------------------------------------------------- translation


def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _eval_value(c: Comparison) -> str:
    if c.is_string:
        return _quote(str(c.value))
    return str(c.value)


def _to_evaluator(node) -> str:
    """Boolean tree → stream boolean-evaluator text (having())."""
    if isinstance(node, BoolNode):
        inner = ", ".join(_to_evaluator(ch) for ch in node.children)
        return f"{node.op}({inner})"
    ops = {"=": "eq", "<": "lt", ">": "gt", "<=": "lteq", ">=": "gteq"}
    if node.op in ("<>", "!="):
        return f"not(eq({node.field}, {_eval_value(node)}))"
    return f"{ops[node.op]}({node.field}, {_eval_value(node)})"


def _pushable(node, indexed: set[str]) -> bool:
    """True when the whole subtree is index-expressible: equality
    predicates on indexed fields combined with AND/OR."""
    if isinstance(node, Comparison):
        return node.op == "=" and node.is_string and node.field in indexed
    if node.op == "not":
        return False
    return all(_pushable(ch, indexed) for ch in node.children)


def _to_lucene(node) -> str:
    if isinstance(node, Comparison):
        # Solr translates field = 'a b' to field:(a b) — the default-
        # OR multi-term field query; the engine's parser wants the
        # field written on each clause, so expand the group here
        words = str(node.value).split()
        if len(words) == 1:
            return f"{node.field}:{words[0]}"
        return "(" + " OR ".join(f"{node.field}:{w}" for w in words) + ")"
    joiner = " AND " if node.op == "and" else " OR "
    return "(" + joiner.join(_to_lucene(ch) for ch in node.children) + ")"


def _split_where(where, indexed: set[str]):
    """Solr's predicate split: top-level AND conjuncts that are fully
    index-expressible push into q; the rest stay evaluator-side."""
    if where is None:
        return None, None
    conjuncts = (
        where.children
        if isinstance(where, BoolNode) and where.op == "and"
        else [where]
    )
    q_parts = [c for c in conjuncts if _pushable(c, indexed)]
    rest = [c for c in conjuncts if not _pushable(c, indexed)]
    q = " AND ".join(_to_lucene(c) for c in q_parts) if q_parts else None
    residue = (
        None if not rest else (rest[0] if len(rest) == 1 else BoolNode("and", rest))
    )
    return q, residue


def _metric_refs(node) -> set[str]:
    """Aggregate-call references (``count(*)``, ``sum(col)``) inside a
    boolean tree — the metrics a HAVING clause needs computed."""
    if node is None:
        return set()
    if isinstance(node, Comparison):
        return {node.field} if "(" in node.field else set()
    out: set[str] = set()
    for ch in node.children:
        out |= _metric_refs(ch)
    return out


def _referenced_fields(node) -> set[str]:
    if node is None:
        return set()
    if isinstance(node, Comparison):
        return {node.field} if "(" not in node.field else set()
    out: set[str] = set()
    for ch in node.children:
        out |= _referenced_fields(ch)
    return out


def sql_to_stream(sql: str, ctx: StreamContext) -> str:
    """Translate a SQL statement into the equivalent streaming
    expression (Solr's Calcite planning step, as text). The context
    supplies the schema facts Solr gets from the collection: the
    indexed-field set (for WHERE pushdown) and the stored columns
    (for ``SELECT *``)."""
    st = parse_sql(sql)
    coll = ctx.collection(st.table)
    indexed = set(coll.config.fields) if coll.index is not None else set()
    stored_cols = coll.documents.columns

    # SELECT * expansion
    items = st.items
    if any(i.agg is None and i.arg == "*" for i in items):
        if len(items) != 1 or st.group_by:
            raise ValueError("SELECT * cannot mix with other items")
        items = [SelectItem(None, c, None) for c in stored_cols]

    aggs = [i for i in items if i.agg is not None]
    plain = [i for i in items if i.agg is None]
    if aggs and not st.group_by:
        if plain:
            raise ValueError("aggregates without GROUP BY cannot mix columns")
    if st.group_by:
        extra = [i.arg for i in plain if i.arg not in st.group_by]
        if extra:
            raise ValueError(f"non-grouped columns in SELECT: {extra}")
    if st.having is not None and not st.group_by:
        raise ValueError("HAVING requires GROUP BY")

    q, residue = _split_where(st.where, indexed)
    q_text = q or "*:*"

    # columns the search stream must export
    need = set(st.group_by) | _referenced_fields(residue)
    need |= {i.arg for i in aggs if i.arg != "*"}
    need |= {i.arg for i in plain}
    for m in _metric_refs(st.having):
        arg = m[m.index("(") + 1 : -1]
        if arg != "*":
            need.add(arg)
    fl = ["doc_id"] + sorted(c for c in need if c != "doc_id")

    if aggs and not st.group_by:
        # global aggregate → stats(); evaluator residue has no
        # pre-aggregation hook in the stream algebra
        if residue is not None:
            raise ValueError(
                "global aggregates support only index-pushable WHERE "
                "predicates (equality on indexed fields)"
            )
        metrics = ", ".join(i.expr_name for i in aggs)
        expr = f"stats({st.table}, q={_quote(q_text)}, {metrics})"
    else:
        expr = f"search({st.table}, q={_quote(q_text)}, fl={_quote(','.join(fl))})"
        if residue is not None:
            expr = f"having({expr}, {_to_evaluator(residue)})"
        if st.group_by:
            # HAVING may reference aggregates not in SELECT — compute
            # them in the rollup too; the projection drops them after
            mset = [i.expr_name for i in aggs]
            for m in sorted(_metric_refs(st.having)):
                if m not in mset:
                    mset.append(m)
            metrics = ", ".join(mset) or "count(*)"
            expr = (
                f"rollup({expr}, over={_quote(','.join(st.group_by))}, {metrics})"
            )
            if st.having is not None:
                expr = f"having({expr}, {_to_evaluator(st.having)})"

    # projection + aliases (skip when SELECT already matches the
    # stream's natural output exactly)
    out_specs = [
        i.expr_name if i.alias is None else f"{i.expr_name} as {i.alias}"
        for i in items
    ]
    natural = (
        not st.group_by
        and not aggs
        and all(i.alias is None for i in items)
        and [i.arg for i in items] == fl
    )
    if not natural:
        specs = ", ".join(_quote(s) for s in out_specs)
        expr = f"select({expr}, {specs})"

    if st.distinct:
        over = ",".join(i.out_name for i in items)
        expr = f"unique({expr}, over={_quote(over)})"

    order = st.order_by or [(items[0].out_name, "asc")]
    # ORDER BY may name either the alias or the raw expression
    alias_of = {i.expr_name: i.out_name for i in items}
    sort_spec = ", ".join(f"{alias_of.get(n, n)} {d}" for n, d in order)
    if st.limit is not None:
        expr = f"top({expr}, n={st.limit}, sort={_quote(sort_spec)})"
    elif st.order_by:
        expr = f"sort({expr}, by={_quote(sort_spec)})"
    return expr


def search_sql(sql: str, ctx: StreamContext) -> DataFrame:
    """Execute a /sql statement: translate to a streaming expression,
    compile to one lazy DataFrame plan."""
    return compile_stream(sql_to_stream(sql, ctx), ctx)
