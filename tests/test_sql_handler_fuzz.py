"""Differential fuzzing: the /sql handler vs DuckDB on generated
statements over a generated table.

Every statement in the grammar subset the handler documents must
produce EXACTLY DuckDB's answer (sorted-row comparison, float
tolerance): filters (AND/OR/NOT trees), GROUP BY + aggregates,
HAVING, DISTINCT, ORDER BY with tie-breaks, LIMIT. Statements are
generated from a seeded RNG so failures reproduce.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from golr_loader_spark.plans.sql_handler import search_sql
from golr_loader_spark.plans.stream_expr import StreamCollection, StreamContext

LANGS = ["en", "de", "fr"]
SOURCES = ["web", "book", "wiki"]


def _table(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                f"w{rng.randint(0, 5)} w{rng.randint(0, 5)}",
                rng.choice(LANGS),
                rng.choice(SOURCES),
                rng.randint(0, 99),
            )
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


@pytest.fixture(scope="module")
def env(spark):
    pdf = _table()
    sdf = spark.createDataFrame(pdf).cache()
    sdf.count()
    ctx = StreamContext({"t": StreamCollection(None, sdf)})
    con = duckdb.connect()
    con.register("t", pdf)
    return ctx, con


def _pred(rng, depth=0):
    """Random boolean predicate over the stored columns."""
    if depth < 2 and rng.random() < 0.4:
        op = rng.choice(["AND", "OR"])
        return f"({_pred(rng, depth + 1)} {op} {_pred(rng, depth + 1)})"
    if rng.random() < 0.15:
        return f"NOT {_pred(rng, depth + 1)}"
    kind = rng.choice(["num", "lang", "source", "in", "between"])
    if kind == "num":
        op = rng.choice(["=", "<>", "<", ">", "<=", ">="])
        return f"n_chars {op} {rng.randint(0, 99)}"
    if kind == "in":
        vals = ", ".join(f"'{v}'" for v in rng.sample(LANGS, rng.randint(1, 2)))
        neg = "NOT " if rng.random() < 0.3 else ""
        return f"lang {neg}IN ({vals})"
    if kind == "between":
        a = rng.randint(0, 60)
        return f"n_chars BETWEEN {a} AND {a + rng.randint(0, 40)}"
    col, vals = ("lang", LANGS) if kind == "lang" else ("source", SOURCES)
    op = rng.choice(["=", "<>"])
    return f"{col} {op} '{rng.choice(vals)}'"


def _statement(rng):
    if rng.random() < 0.5:
        # grouped aggregate
        gcols = rng.sample(["lang", "source"], rng.randint(1, 2))
        aggs = rng.sample(
            [
                "count(*) AS n",
                "sum(n_chars) AS s",
                "min(n_chars) AS lo",
                "max(n_chars) AS hi",
                "avg(n_chars) AS m",
            ],
            rng.randint(1, 3),
        )
        sql = f"SELECT {', '.join(gcols + aggs)} FROM t"
        if rng.random() < 0.7:
            sql += f" WHERE {_pred(rng)}"
        sql += f" GROUP BY {', '.join(gcols)}"
        if rng.random() < 0.4:
            sql += f" HAVING count(*) >= {rng.randint(1, 3)}"
        sql += f" ORDER BY {', '.join(gcols)}"
        return sql
    # plain select
    cols = rng.sample(["doc_id", "lang", "source", "n_chars"], rng.randint(1, 3))
    if "doc_id" not in cols:
        cols = ["doc_id"] + cols
    distinct = rng.random() < 0.2 and cols != ["doc_id"]
    sql = f"SELECT {'DISTINCT ' if distinct else ''}{', '.join(cols)} FROM t"
    if rng.random() < 0.8:
        sql += f" WHERE {_pred(rng)}"
    sql += f" ORDER BY {', '.join(cols)}"
    if rng.random() < 0.4:
        sql += f" LIMIT {rng.randint(1, 20)}"
    return sql


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(float).round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_sql_handler_matches_duckdb_on_fuzzed_statements(env):
    ctx, con = env
    rng = random.Random(42)
    n_checked = 0
    for _ in range(40):
        sql = _statement(rng)
        got = _canon(search_sql(sql, ctx).toPandas())
        want = _canon(con.sql(sql).df())
        assert list(got.columns) == list(want.columns), sql
        assert len(got) == len(want), f"{sql}\n{got}\n{want}"
        pd.testing.assert_frame_equal(got, want, check_dtype=False, obj=sql)
        n_checked += 1
    assert n_checked == 40
