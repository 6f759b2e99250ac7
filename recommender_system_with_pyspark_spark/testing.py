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


# ---------------------------------------------------------------------------
# Distributed comparator (VERDICT r12 #2): scale-tier checks without
# collecting either result set. Both engines reduce their result to ONE
# (row_count, order-insensitive 60-bit hash) pair computed over an
# identical canonical row encoding, so a 100 GB result compares in O(1)
# driver memory. The sf0.01 gate keeps the collect comparator (it
# reports value-level diffs); sweep runs assert BOTH agree.
#
# Canonical row encoding (must be byte-identical across engines):
#   - columns sorted by name, joined with \x1f;
#   - NULL and NaN -> the literal token "NULL";
#   - float/double -> printf('%.6f', round(x, 6)) — round first (both
#     engines round half away from zero on doubles) so the printf never
#     sits on a representable half-way tie (Java formats HALF_UP, C
#     half-even; post-round the value is ≥ ~1e-10 away from any 6dp tie);
#   - decimal -> the float path (cast to double first): DuckDB's fetchdf
#     coerces DECIMAL (and HUGEINT) to float64, so the collect comparator
#     already compares decimals at double precision — the canonical
#     encoding mirrors that (caveat: decimal values beyond 2^53 would
#     lose exactness; the engine's oracles keep decimal sums within
#     double range). Found on cube_agg (Spark double vs DuckDB
#     round(DECIMAL) staying DECIMAL) in the r13 agreement sweep;
#   - timestamp/date -> string cast with a trailing " 00:00:00"
#     stripped: a DATE and a midnight TIMESTAMP canonicalize the same.
#     This mirrors the collect comparator's effective semantics (DuckDB's
#     fetchdf coerces DATE to datetime64, so date_trunc('day', ts) — DATE
#     in DuckDB, TIMESTAMP in Spark — already compares equal there; found
#     on event_volume_anomalies in the r13 agreement sweep);
#   - everything else -> the engine's plain string cast (decimals,
#     booleans and integers render identically in Spark and DuckDB);
#   - complex types (array/map/struct) are NOT supported — their string
#     renderings differ across engines; callers fall back to the
#     collect comparator (UnsupportedTypeError).
# Row hash: first 15 hex chars of md5(canonical) as a 60-bit int —
# xor-combined (order-insensitive) with the row count alongside, the
# same fingerprint shape the IVF freshness contract uses.
# ---------------------------------------------------------------------------


class UnsupportedTypeError(TypeError):
    """Result schema contains a type the distributed canonical encoding
    cannot render identically across engines (arrays/maps/structs)."""


_SEP = "\x1f"


def spark_result_hash(df) -> tuple[int, int]:
    """(row_count, xor-of-row-hashes) of a Spark result under the
    canonical encoding — one aggregate, nothing collected but two
    scalars."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cells = []
    for field in sorted(df.schema.fields, key=lambda f: f.name):
        col = df[f"`{field.name.replace('`', '``')}`"]
        t = field.dataType
        if isinstance(t, (T.ArrayType, T.MapType, T.StructType)):
            raise UnsupportedTypeError(
                f"column {field.name!r} is {t.simpleString()}; use the "
                "collect comparator"
            )
        if isinstance(t, (T.DoubleType, T.FloatType, T.DecimalType)):
            d = col.cast("double")
            s = F.when(
                d.isNull() | F.isnan(d), F.lit("NULL")
            ).otherwise(F.format_string("%.6f", F.round(d, 6)))
        elif isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            s = F.coalesce(
                F.regexp_replace(col.cast("string"), " 00:00:00$", ""),
                F.lit("NULL"),
            )
        else:
            s = F.coalesce(col.cast("string"), F.lit("NULL"))
        cells.append(s)
    canon = F.concat_ws(_SEP, *cells)
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(h).alias("fp")
    ).first()
    return int(row["n"]), int(row["fp"] or 0)


def duckdb_result_hash(oracle_sql: str, sf_dir: str) -> tuple[int, int]:
    """DuckDB twin of :func:`spark_result_hash`: the canonical encoding is
    built in SQL from the DESCRIBEd result schema (no execution), then
    the oracle runs ONCE inside a count+bit_xor aggregate — the result
    set never reaches Python."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    schema = con.sql(f"DESCRIBE SELECT * FROM ({oracle_sql}) _t").fetchall()
    cells = []
    for name, dtype, *_ in sorted(schema, key=lambda r: r[0]):
        up = dtype.upper()
        if any(k in up for k in ("STRUCT", "[]", "MAP", "LIST", "UNION")):
            raise UnsupportedTypeError(
                f"column {name!r} is {dtype}; use the collect comparator"
            )
        q = '"' + name.replace('"', '""') + '"'
        if up in ("DOUBLE", "FLOAT", "REAL") or up.startswith("DECIMAL"):
            cells.append(
                f"CASE WHEN {q} IS NULL OR isnan({q}::DOUBLE) THEN 'NULL' "
                f"ELSE printf('%.6f', round({q}::DOUBLE, 6)) END"
            )
        elif up.startswith(("TIMESTAMP", "DATE", "DATETIME")):
            cells.append(
                f"coalesce(regexp_replace(CAST({q} AS VARCHAR), "
                f"' 00:00:00$', ''), 'NULL')"
            )
        else:
            cells.append(f"coalesce(CAST({q} AS VARCHAR), 'NULL')")
    canon = f"concat_ws(chr(31), {', '.join(cells)})"
    h = f"CAST(concat('0x', substring(md5({canon}), 1, 15)) AS BIGINT)"
    n, fp = con.sql(
        f"SELECT count(*), bit_xor(h) FROM "
        f"(SELECT {h} AS h FROM ({oracle_sql}) _t) _s"
    ).fetchone()
    return int(n), int(fp or 0)


def compare_to_oracle_distributed(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert a Spark result matches its DuckDB oracle WITHOUT collecting
    either side — the scale-tier comparator (a >1 GiB result crossed the
    driver maxResultSize ceiling at sf100; this compares two scalars).
    Raises AssertionError on count or hash mismatch,
    UnsupportedTypeError when the schema cannot be canonically encoded
    (fall back to :func:`compare_to_oracle`)."""
    sn, sfp = spark_result_hash(spark_df)
    dn, dfp = duckdb_result_hash(oracle_sql, sf_dir)
    assert sn == dn, f"row count differs: spark={sn} duckdb={dn}"
    assert sfp == dfp, (
        f"content hash differs at {sn} rows: spark={sfp:#x} duckdb={dfp:#x}"
    )
