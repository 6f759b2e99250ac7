"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
compared as written — both sides are expected to round identically).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_result(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).fetchdf()


def normalize(df_pandas):
    """Columns sorted by name; rows sorted; values stringified."""
    import pandas as pd

    cols = sorted(df_pandas.columns)
    out = df_pandas[cols].copy()

    def cell(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted(tuple(cell(v) for v in row) for row in out.itertuples(index=False, name=None))
    return cols, rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from recommender_system_with_pyspark_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", shuffle_partitions=8)
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        if name not in oracles:
            status = "ok" if len(sdf) >= 0 else "??"
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s] {status}")
            continue
        try:
            ddf = duckdb_result(oracles[name], sf_dir)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        scols, srows = normalize(sdf)
        dcols, drows = normalize(ddf)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: columns {scols} != {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(drows)}")
            continue
        if srows != drows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            continue
        print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
