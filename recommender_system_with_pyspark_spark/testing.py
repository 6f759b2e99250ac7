"""Shared test/verification helpers — the local mirror of the driver's
DuckDB-oracle comparison (row count + column names + order-insensitive
value comparison with columns sorted by name)."""

from __future__ import annotations

TESTDATA_TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_result(sql: str, sf_dir: str):
    """Run oracle SQL on DuckDB with the driver's pre-registered views.

    Handles both table layouts: the driver's testdata ships each table as
    a single parquet FILE, while the generated scale tiers (.scale/sf*)
    are Spark-written DIRECTORIES of part files — DuckDB needs a glob for
    those (the streaming twin of this distinction caused the r8b
    empty-stream bug; here a bare-path view on a directory is a hard IO
    error, so sf100 oracle runs simply failed to open)."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue  # bounded scale tiers omit tables their runs don't read
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con.sql(sql).fetchdf()


def normalize(df_pandas) -> tuple[list[str], list[tuple]]:
    """Columns sorted by name; rows sorted; values stringified the way the
    driver's hash would see them (floats at fixed precision)."""
    cols = sorted(df_pandas.columns)
    out = df_pandas[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and v != v):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = sorted(
        tuple(cell(v) for v in row)
        for row in out.itertuples(index=False, name=None)
    )
    return cols, rows


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert a Spark result matches its DuckDB oracle. Raises AssertionError
    with a focused diff on mismatch."""
    sdf = spark_df.toPandas()
    ddf = duckdb_result(oracle_sql, sf_dir)
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols, f"columns differ: spark={scols} duckdb={dcols}"
    assert len(srows) == len(drows), f"row count differs: spark={len(srows)} duckdb={len(drows)}"
    if srows != drows:
        diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
        raise AssertionError(f"values differ, first diffs: {diff}")
