"""q24 restructure (round-6 batch 3): the explode-free array-expression
form must stay row-identical to SQL_Q24 — same tf/df/dl integers, same
idf/contrib expression tree, same term-sorted fold order (absent terms
add exactly +0.0). Guards the internals change of the optimization."""

from __future__ import annotations

import duckdb
import pytest

from golr_loader_spark.operators.relational import SQL_Q24, q24_bm25_topk

SF = "/root/testdata/sf0.001"


def _oracle_rows():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    rows = con.execute(SQL_Q24).fetchall()
    con.close()
    return [tuple(r) for r in rows]


def test_q24_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in q24_bm25_topk(spark, SF).collect()]
    assert got == _oracle_rows()


def test_q24_plan_has_no_explode(spark):
    from golr_loader_spark.operators.relational import _q24_scored

    base, scored = _q24_scored(spark, SF)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    base.unpersist()
    # the whole point of the restructure: no Generate (explode) node
    # and no groupBy(doc_id, term) exchange of token rows
    assert "Generate" not in plan
