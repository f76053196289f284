"""Solr Parallel SQL (/sql) → streaming-expression translation.

Parser/translator shape tests plus end-to-end semantics over the same
tiny engine-indexed collection the stream-expression tests use,
checked against hand-computed results.
"""

from __future__ import annotations

import pytest

from golr_loader_spark.config import IndexConfig
from golr_loader_spark.plans.build_index import build_index
from golr_loader_spark.plans.sql_handler import (
    parse_sql,
    search_sql,
    sql_to_stream,
)
from golr_loader_spark.plans.stream_expr import StreamCollection, StreamContext

ROWS = [
    (0, "data spark fast", "en", "web", 10),
    (1, "data slow query", "en", "book", 20),
    (2, "query spark data", "de", "web", 30),
    (3, "other words here", "de", "web", 40),
    (4, "data data query", "fr", "book", 50),
]
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.createDataFrame(ROWS, SCHEMA).cache()
    cfg = IndexConfig(
        fields={"text": ("simple", 1.0)}, bucket_bits=0, id_space_bits=3,
    )
    ix = build_index(docs.select("doc_id", "text"), cfg)
    return StreamContext({"docs": StreamCollection(ix, docs, cfg)})


def rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------------------ parser

def test_parse_statement_shape():
    st = parse_sql(
        "SELECT lang, count(*) AS n FROM docs WHERE text = 'data' "
        "AND n_chars > 10 GROUP BY lang HAVING count(*) >= 1 "
        "ORDER BY n DESC, lang LIMIT 5"
    )
    assert [i.out_name for i in st.items] == ["lang", "n"]
    assert st.table == "docs" and st.limit == 5
    assert st.group_by == ["lang"]
    assert st.order_by == [("n", "desc"), ("lang", "asc")]


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_sql("SELECT sum(*) FROM docs")
    with pytest.raises(ValueError):
        parse_sql("SELECT a FROM docs trailing junk ,")
    with pytest.raises(ValueError):
        parse_sql("SELECT a docs")


# -------------------------------------------------------- translation

def test_where_pushdown_split(ctx):
    s = sql_to_stream(
        "SELECT doc_id FROM docs WHERE text = 'data query' AND n_chars > 15",
        ctx,
    )
    # indexed equality pushes into q; numeric comparison stays evaluator
    assert 'q="(text:data OR text:query)"' in s
    assert "having(" in s and "gt(n_chars, 15)" in s


def test_group_by_becomes_rollup(ctx):
    s = sql_to_stream(
        "SELECT lang, sum(n_chars) AS total FROM docs GROUP BY lang", ctx
    )
    assert "rollup(" in s and "sum(n_chars)" in s
    assert '"sum(n_chars) as total"' in s


# ---------------------------------------------------------- semantics

def test_select_filter_order_limit(ctx):
    got = rows(search_sql(
        "SELECT doc_id, lang FROM docs WHERE n_chars > 10 AND lang <> 'de' "
        "ORDER BY doc_id DESC LIMIT 2",
        ctx,
    ))
    assert got == [(4, "fr"), (1, "en")]


def test_group_by_having_order(ctx):
    got = rows(search_sql(
        "SELECT lang, count(*) AS n FROM docs WHERE text = 'data' "
        "GROUP BY lang HAVING count(*) >= 1 ORDER BY n DESC, lang ASC",
        ctx,
    ))
    assert got == [("en", 2), ("de", 1), ("fr", 1)]


def test_global_aggregates(ctx):
    got = rows(search_sql(
        "SELECT count(*) AS n, sum(n_chars) AS total FROM docs "
        "WHERE text = 'data'",
        ctx,
    ))
    assert got == [(4, 110.0)]


def test_distinct(ctx):
    got = rows(search_sql(
        "SELECT DISTINCT lang FROM docs ORDER BY lang", ctx
    ))
    assert got == [("de",), ("en",), ("fr",)]


def test_select_star(ctx):
    got = rows(search_sql(
        "SELECT * FROM docs WHERE lang = 'fr' ORDER BY doc_id", ctx
    ))
    assert got == [(4, "data data query", "fr", "book", 50)]


def test_or_and_not_where(ctx):
    got = rows(search_sql(
        "SELECT doc_id FROM docs WHERE (lang = 'fr' OR source = 'web') "
        "AND NOT n_chars = 30 ORDER BY doc_id",
        ctx,
    ))
    assert [r[0] for r in got] == [0, 3, 4]


def test_unsupported_shapes(ctx):
    with pytest.raises(ValueError):
        # evaluator residue has no hook before a global aggregate
        search_sql("SELECT count(*) FROM docs WHERE n_chars > 10", ctx)
    with pytest.raises(ValueError):
        # aggregates without GROUP BY cannot mix plain columns
        search_sql("SELECT lang, count(*) FROM docs", ctx)
    with pytest.raises(ValueError):
        search_sql("SELECT count(*) AS n FROM docs HAVING count(*) > 1", ctx)


def test_in_and_between(ctx):
    got = rows(search_sql(
        "SELECT doc_id FROM docs WHERE lang IN ('en', 'fr') "
        "AND n_chars BETWEEN 15 AND 50 ORDER BY doc_id",
        ctx,
    ))
    assert [r[0] for r in got] == [1, 4]
    got2 = rows(search_sql(
        "SELECT doc_id FROM docs WHERE lang NOT IN ('en') ORDER BY doc_id",
        ctx,
    ))
    assert [r[0] for r in got2] == [2, 3, 4]
    with pytest.raises(ValueError):
        search_sql("SELECT doc_id FROM docs WHERE lang NOT 'en'", ctx)
