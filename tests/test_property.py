"""Property-based tests (hypothesis) for the pure-Python/numpy kernels
— the randomized-testing layer the reference lacks (SURVEY.md §5.5)."""

from __future__ import annotations

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from golr_loader_spark.functions.codec import (
    decode_block,
    encode_block,
    varint_decode,
    varint_encode,
)
from golr_loader_spark.functions.tokenize import analyze_query


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_any_uint64(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    st.data(),
)
def test_block_roundtrip_any_sorted_ids(ids, data):
    ids = np.array(sorted(ids), dtype=np.int64)
    tfs = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=2**31 - 1),
                min_size=len(ids),
                max_size=len(ids),
            )
        ),
        dtype=np.int64,
    )
    first, idbuf, tfbuf, max_tf = encode_block(ids, tfs)
    rids, rtfs = decode_block(first, idbuf, tfbuf)
    assert np.array_equal(rids, ids)
    assert np.array_equal(rtfs, tfs)
    assert max_tf == int(tfs.max())


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_analyze_query_total_and_idempotent(text):
    """Never crashes on arbitrary text; output terms are lowercase,
    distinct, sorted; re-analyzing the joined terms loses nothing."""
    terms = analyze_query(text)
    assert terms == sorted(set(terms))
    assert all(t == t.lower() for t in terms)
    assert all(re.fullmatch(r"[a-z0-9_]+", t) for t in terms)
    # terms of terms ⊆ terms ∪ (nothing new beyond re-splitting)
    again = analyze_query(" ".join(terms))
    assert set(terms) <= set(again) | set(terms)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,12}", fullmatch=True),
        min_size=1,
        max_size=30,
    )
)
def test_analyze_query_covers_every_identifier(idents):
    """Every identifier in the text contributes at least one term."""
    terms = set(analyze_query(" ".join(idents)))
    for ident in idents:
        subs = re.findall(r"[A-Z]+(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+", ident)
        if subs:
            assert any(s.lower() in terms for s in subs), ident


# ---------------------------------------------- stream-expression parser

def _render(e) -> str:
    """Serialize an Expr back to expression text (quoting all string
    values — always legal in the grammar)."""
    from golr_loader_spark.plans.stream_expr import Expr

    parts = []
    for a in e.args:
        parts.append(_render(a) if isinstance(a, Expr) else _q(a))
    for k, v in e.kwargs.items():
        parts.append(f"{k}={_render(v) if isinstance(v, Expr) else _q(v)}")
    return f"{e.name}({', '.join(parts)})"


def _q(s: str) -> str:
    return '"' + str(s).replace("\\", "\\\\").replace('"', '\\"') + '"'


_name = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,8}", fullmatch=True)
_sval = st.text(
    st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=12,
)


def _expr_strategy():
    from golr_loader_spark.plans.stream_expr import Expr

    def build(children):
        return st.builds(
            lambda n, args, kwargs: Expr(n, list(args), dict(kwargs)),
            _name,
            st.lists(st.one_of(_sval, children), max_size=3),
            st.dictionaries(_name, st.one_of(_sval, children), max_size=3),
        )

    return st.recursive(build(st.nothing()), build, max_leaves=8)


@settings(max_examples=300, deadline=None)
@given(_expr_strategy())
def test_stream_expr_print_parse_roundtrip(e):
    """parse(render(tree)) reproduces the tree exactly — the parser
    and the quoting/escaping rules are mutual inverses for every
    value, including quotes, backslashes, commas, parens, unicode."""
    from golr_loader_spark.plans.stream_expr import parse_expr

    def eq(a, b):
        from golr_loader_spark.plans.stream_expr import Expr

        if isinstance(a, Expr) != isinstance(b, Expr):
            return False
        if not isinstance(a, Expr):
            return a == b
        return (
            a.name == b.name
            and len(a.args) == len(b.args)
            and all(eq(x, y) for x, y in zip(a.args, b.args))
            and set(a.kwargs) == set(b.kwargs)
            and all(eq(a.kwargs[k], b.kwargs[k]) for k in a.kwargs)
        )

    assert eq(parse_expr(_render(e)), e)
