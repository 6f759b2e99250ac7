"""Sources and sinks (SURVEY §2.1, S1-S6).

Reference behavior re-expressed:

- S1/S2 CSV scan with ``inferSchema`` (`als.py:21-22`, `datacleaning.py:26`)
  → explicit-schema reads by default; ``infer_schema=True`` compat mode.
- S3/S5 pandas read/write round-trips → eliminated; one lazy DAG. Parquet is
  the default materialization format (columnar, predicate pushdown, column
  pruning — a CSV scan can push neither).
- S4 ``coalesce(1)`` single-file CSV sink (`datacleaning.py:30,98`) →
  parallel write by default; ``single_file=True`` compat flag (documented
  anti-pattern: serializes the write through one task).
- S6 model persistence → ``save_model``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import TESTDATA_TABLES

_SHIPPED_SESSIONS: set[str] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Worker-side import guard (round 8): Arrow ``mapInPandas`` closures
    reference package-level functions (codec parsers, hash helpers), which
    cloudpickle serializes BY MODULE REFERENCE — the forked Python workers
    must be able to ``import recommender_system_with_pyspark_spark``. When the
    driver runs from the repo root that works implicitly; under an external
    driver with a foreign cwd (the contract surface — a vanilla
    SparkSession anywhere) it raised worker-side ModuleNotFoundError. Ship
    the package once per SparkContext as a zip via ``addPyFile`` — the
    standard way PySpark distributes job code to executors, identical on a
    real 1000-executor cluster (files are fetched per executor, added to
    worker sys.path). Cost: one ~100 KB zip per session."""
    sc = spark.sparkContext
    # key on applicationId, NOT id(sc): CPython recycles object addresses,
    # so a fresh SparkContext can collide with a dead one's id and silently
    # skip the shipment — reintroducing the worker-side ModuleNotFoundError
    app_id = sc.applicationId
    if app_id in _SHIPPED_SESSIONS:
        return
    import os
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staged = tempfile.mkdtemp(prefix="spark-pkgship-")
    zpath = shutil.make_archive(
        os.path.join(staged, "recommender_system_with_pyspark_spark_pkg"),
        "zip",
        root_dir=os.path.dirname(pkg_dir),
        base_dir=os.path.basename(pkg_dir),
    )
    sc.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(app_id)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer_schema: bool = False,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan (S1/S2). Explicit schema by default — no inference pass."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the engine default (vectorized, pushdown, pruning)."""
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(spark: SparkSession, url: str, table: str, **options: str) -> DataFrame:
    """JDBC source. Driver jars are environment-provided; errors surface lazily."""
    return spark.read.format("jdbc").options(url=url, dbtable=table, **options).load()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one TESTDATA.md parquet table by name.

    Parquet carries its own schema; we validate the column set against the
    declared StructType so drift fails fast instead of mid-query.
    """
    # every query path starts here — make worker-side package imports safe
    # regardless of the driver's cwd (external-driver contract)
    ensure_package_on_workers(spark)
    # events.parquet stores TIMESTAMP(NANOS) — unsupported by Spark's reader
    # natively; read nanos as long and convert (integer division: a double
    # round-trip would lose sub-microsecond precision at 2^60 magnitudes).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    expected = TESTDATA_TABLES.get(name)
    if expected is not None:
        missing = {f.name for f in expected.fields} - set(df.columns)
        if missing:
            raise ValueError(f"table {name!r} at {sf_dir} missing columns {sorted(missing)}")
        actual = {f.name: f.dataType for f in df.schema.fields}
        for field in expected.fields:
            if field.dataType.typeName() != "timestamp" or actual.get(field.name) is None:
                continue
            if actual[field.name].typeName() == "long":
                df = df.withColumn(
                    field.name,
                    F.timestamp_micros(F.expr(f"{field.name} div 1000")),
                )
            elif actual[field.name].typeName() == "timestamp_ntz":
                # TESTDATA parquet stores naive microsecond timestamps; with
                # inferTimestampNTZ (Spark 3.4+ default) they surface as
                # TIMESTAMP_NTZ, which unix_micros()/datetime arithmetic
                # reject. Normalize to TIMESTAMP — the session timezone is
                # pinned to UTC, so the wall-clock is reinterpreted as the
                # same instant DuckDB's epoch() assumes.
                df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink (S4). ``single_file`` reproduces the reference's
    ``coalesce(1)`` (`datacleaning.py:30,98`) — correct but serial; never use
    it at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format at the pipeline edges
    (ingest handoffs, labeling exports). One file per task, no coalesce:
    JSONL is line-splittable, so downstream readers parallelize anyway."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source. Pass an explicit ``schema`` in production —
    inference is a full extra pass over the data and silently widens types
    on dirty rows; inference is the convenience default for exploration."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table sink: pre-hash-partitions (and sorts) the data on the
    join/agg key so later joins between two tables bucketed on the same key
    with the same bucket count run WITHOUT a shuffle — the co-location
    strategy for repeatedly-joined 100 TB fact tables.

    With ``path`` the table is external (data at the given location);
    otherwise it lands in the session warehouse."""
    writer = (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Layout-for-skipping sink: range-repartition + in-partition sort on
    ``sort_cols`` before writing, so each parquet row group covers a NARROW
    min/max range of the sort key. Parquet scans evaluate pushed predicates
    against row-group statistics first — over a sorted layout a selective
    filter skips almost every row group (the poor man's Z-order; for one
    dominant filter column this beats Z-order). The write costs one range
    shuffle; every later selective scan pays ~filter-selectivity instead of
    a full scan — the right trade for write-once-read-many 100 TB facts.

    Verified in tests/test_io.py: row-group stats of the sorted layout are
    near-disjoint vs heavily-overlapping for the unsorted write."""
    out = df.repartitionByRange(target_partitions, *sort_cols) if target_partitions \
        else df.repartitionByRange(*sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def save_model(model, path: str) -> None:
    """ML model sink (S6 — `bgrfunctions.py:228,262,298,328,360`)."""
    model.write().overwrite().save(path)


def zorder_key(x, y, x_min: float, x_max: float, y_min: float, y_max: float,
               bits: int = 12):
    """Morton (Z-order) key: both dimensions min/max-scaled to ``bits``-bit
    integers, then bit-interleaved — pure codegen shift/mask expressions.
    Linear scaling keeps it cheap (two scalar aggregates, no global sort);
    heavy skew in a dimension degrades its share of the curve — switch the
    scaling to quantile cut points if that matters."""
    from pyspark.sql import functions as F

    def scaled(c, lo, hi):
        span = (hi - lo) or 1.0
        v = F.floor((c.cast("double") - F.lit(float(lo))) / F.lit(float(span))
                    * ((1 << bits) - 1)).cast("long")
        return F.greatest(F.lit(0), F.least(v, F.lit((1 << bits) - 1)))

    xs, ys = scaled(x, x_min, x_max), scaled(y, y_min, y_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    mode: str = "overwrite",
    target_partitions: int | None = None,
    bits: int = 12,
) -> None:
    """Two-dimensional layout-for-skipping sink: rows clustered along a
    Morton curve over (col_x, col_y), so every parquet row group covers a
    small RECTANGLE of the 2-D key space and selective predicates on
    EITHER column skip most row groups. ``write_sorted_parquet`` is the
    better layout when one column dominates the workload's filters;
    Z-order is the trade when both matter (ranges are ~√(selectivity) per
    dim instead of full-width on the second column). One pass: two scalar
    min/max aggregates, a range shuffle on the z-key, in-partition sort."""
    from pyspark.sql import functions as F

    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(F.col(col_x).cast("double")), F.max(F.col(col_x).cast("double")),
        F.min(F.col(col_y).cast("double")), F.max(F.col(col_y).cast("double")),
    ).first()
    z = zorder_key(F.col(col_x), F.col(col_y), lo_x, hi_x, lo_y, hi_y, bits)
    out = df.withColumn("_z", z)
    out = (out.repartitionByRange(target_partitions, "_z") if target_partitions
           else out.repartitionByRange("_z"))
    out.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files of ~``target_file_bytes`` each,
    optionally restoring a sort layout while at it. Streaming sinks and
    over-parallel writers leave thousands of KB-sized files; at 100 TB
    that's millions of footer reads and NameNode/listing pressure before
    the first byte of data — periodic compaction is table maintenance,
    same as OPTIMIZE in lakehouse formats.

    Sizing reads the real on-disk bytes from the file index (no data
    scan); the rewrite is ONE pass — a round-robin repartition (or range
    repartition when ``sort_cols`` keeps skipping-friendly layout).
    Returns the target file count."""
    import math
    import os

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        # mode='overwrite' truncates dst before the lazy read of src runs —
        # in-place compaction would destroy the very data being compacted.
        # Write to a sibling temp dir and rename, or use a different dst.
        raise ValueError(
            f"compact_parquet: dst_path must differ from src_path ({src_path!r}); "
            "an overwrite sink truncates the source before the read executes"
        )

    df = spark.read.parquet(src_path)
    total = _dir_bytes(spark, src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    if sort_cols:
        out = df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst_path)
    return n_files


def _dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of data files under ``path`` via the Hadoop FileSystem
    API (works on HDFS/S3A/local alike; no data scan)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            total += f.getLen()
    return total
