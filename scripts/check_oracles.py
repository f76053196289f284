"""Local replica of the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin in DuckDB,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA MISMATCH spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        # the driver's value-hash is dtype-KIND-sensitive (int64 vs
        # DuckDB HUGEINT→float64 was r1's only failure mode; int32 vs
        # int64 row_number ranks hashed equal) — gate on kind here
        if ca[c].dtype.kind != cb[c].dtype.kind:
            return f"DTYPE MISMATCH col={c}: spark={ca[c].dtype} duck={cb[c].dtype}"
        x, y = ca[c].to_numpy(), cb[c].to_numpy()
        if np.issubdtype(ca[c].dtype, np.floating):
            bad = ~(np.isclose(x.astype(float), y.astype(float), rtol=0, atol=0, equal_nan=True))
            if bad.any():
                i = int(np.flatnonzero(bad)[0])
                return f"VALUE MISMATCH col={c} row={i}: spark={x[i]!r} duck={y[i]!r}"
        else:
            if not (pd.Series(x).fillna("<null>") == pd.Series(y).fillna("<null>")).all():
                bad = (pd.Series(x).fillna("<null>") != pd.Series(y).fillna("<null>")).to_numpy()
                i = int(np.flatnonzero(bad)[0])
                return f"VALUE MISMATCH col={c} row={i}: spark={x[i]!r} duck={y[i]!r}"
    return "OK"


def main() -> None:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from golr_loader_spark.session import get_spark
    from golr_loader_spark.sources.testdata import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:32s} SPARK ERROR: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oq:
            print(f"{name:32s} rows-only: {len(sdf)} rows")
            continue
        try:
            ddf = con.sql(oq[name]).df()
        except Exception as e:
            print(f"{name:32s} DUCKDB ERROR: {str(e)[:200]}")
            failures.append(name)
            continue
        verdict = compare(sdf, ddf)
        print(f"{name:32s} {verdict}   ({len(sdf)} rows)")
        if verdict != "OK":
            failures.append(name)
    print("\nFAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
