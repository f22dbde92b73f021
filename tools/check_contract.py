"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, schema (column names), and exact values (sorted columns+rows).

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == bool:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from tcmkg.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("contract-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {str(e)[:300]}")
            continue
        dt_s = {c: str(sdf[c].dtype) for c in sdf.columns}
        dt_o = {c: str(odf[c].dtype) for c in odf.columns}
        for c in set(dt_s) & set(dt_o):
            if dt_s[c] != dt_o[c]:
                print(f"[WARN-dtype] {name}.{c}: spark {dt_s[c]} vs duck {dt_o[c]}")
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"[FAIL-schema] {name}: {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"[FAIL-rows] {name}: {len(a)} vs {len(b)}")
            continue
        eq = a.equals(b)
        if not eq:
            diff_mask = ~(a == b).all(axis=1)
            print(f"[FAIL-values] {name}: {int(diff_mask.sum())}/{len(a)} rows differ")
            print("  spark:", a[diff_mask].head(3).to_dict("records"))
            print("  duck :", b[diff_mask].head(3).to_dict("records"))
            failures.append((name, "values"))
        else:
            print(f"[OK] {name}: {len(a)} rows")
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
