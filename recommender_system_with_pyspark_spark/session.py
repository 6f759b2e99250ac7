"""SparkSession factory with scale-aware defaults.

The reference relies on a stock local Spark 3.2.1 session
(`PySpark Scripts/datacleaning.py:10`, `data_cleaning.py:21`) with no
tuning. Here every session is created with:

- AQE on (runtime shuffle-partition coalescing, dynamic join selection,
  skew-join splitting) — the ratings-style workloads are long-tail skewed
  by both user and item, so skew handling is on by default;
- Arrow for any pandas interchange (vectorized Pandas UDFs);
- UTC session timezone (deterministic timestamp semantics, matches the
  DuckDB oracle);
- shuffle partitions sized to the local core count instead of the 200
  default (on a real cluster, callers pass ``shuffle_partitions`` ~=
  2-3x total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "recommender_system_with_pyspark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    In local mode there is a single JVM; ``spark.driver.memory`` is the only
    memory knob. On a cluster the same conf applies unchanged — the defaults
    below are all scale-safe (AQE adapts partition counts at runtime).
    """
    # Pin BLAS pools to one thread per Python worker: Spark supplies the
    # parallelism (one worker per core), so OpenBLAS/OMP defaulting to
    # ncpu threads PER worker oversubscribes the box ~cores× (32 workers ×
    # 32 BLAS threads here) and makes every cogroup-BLAS operator's
    # wall-clock chaotic (SCALING.md round 8: semantic_dedup swung 3× run
    # to run). setdefault so a cluster deployment that deliberately sizes
    # BLAS pools (fat executors, few tasks) can still override. Must happen
    # before the JVM launches — local-mode Python workers inherit this
    # process's environment; on a cluster set the same via
    # spark.executorEnv.* in extra_conf.
    for _var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_var, "1")
    cpus = shuffle_partitions if shuffle_partitions is not None else _DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # TESTDATA events.parquet stores TIMESTAMP(NANOS); read as long,
        # io.load_table converts to microsecond timestamps.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode single JVM: spark-submit's 1g default heap OOMs a
        # long-lived session running many queries back-to-back (memory-sink
        # tables from streaming runs + broadcast cleanup lag). Only honored
        # at JVM launch — a no-op via getOrCreate on a live session.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{_DEFAULT_CPUS}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
