"""Driver-contract test: __spark_entry__ entry/queries/oracle_sql,
with a DuckDB-oracle comparison at sf0.001 (the driver runs the same
comparison at sf0.01 — scripts/check_oracles.py replicates it at any
scale)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from golr_loader_spark.sources.testdata import TABLES

SF = "/root/testdata/sf0.001"

# fast representatives of each operator family (full sweep is
# scripts/check_oracles.py)
SAMPLE = [
    "q01_pricing_summary",
    "q04_semi_join",
    "q10_rollup",
    "q12_sessionize",
    "q14_closure_bfs",
    "q16_dedup_exact",
    "q18_minhash",
    "q20_ann_cosine_topk",
    "q24_bm25_topk",
    "q32_ivf_ann",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "score"}


def test_queries_oracle_alignment():
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 26
    missing = set(oq) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF).toPandas()
    ddf = duck.sql(oq[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), name
    assert len(sdf) == len(ddf), name
    a, b = _canon(sdf), _canon(ddf)
    for c in a.columns:
        if np.issubdtype(a[c].dtype, np.floating):
            assert np.allclose(
                a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True
            ), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(
                a[c], b[c], check_dtype=False, check_names=False
            )
