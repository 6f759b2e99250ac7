"""Source/sink tests (SURVEY §2.1): CSV compat paths, parquet round-trips,
bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark import io as eio
from recommender_system_with_pyspark_spark import schemas
from recommender_system_with_pyspark_spark.plans import explain as E


def test_csv_round_trip_with_schema(spark, sf_tiny, tmp_path):
    orig = eio.load_table(spark, sf_tiny, "customer")
    out = str(tmp_path / "cust_csv")
    eio.write_csv(orig, out)
    back = eio.read_csv(spark, out, schema=schemas.CUSTOMER)
    assert back.count() == orig.count()
    assert back.schema == schemas.CUSTOMER
    a = orig.agg(F.sum("c_acctbal")).first()[0]
    b = back.agg(F.sum("c_acctbal")).first()[0]
    assert abs(a - b) < 1e-6


def test_csv_single_file_compat(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "single")
    eio.write_csv(df, out, single_file=True)
    import glob

    parts = glob.glob(f"{out}/part-*")
    assert len(parts) == 1  # the reference's coalesce(1) semantics


def test_csv_infer_schema_compat(spark, sf_tiny, tmp_path):
    orig = eio.load_table(spark, sf_tiny, "region")
    out = str(tmp_path / "region_csv")
    eio.write_csv(orig, out)
    inferred = eio.read_csv(spark, out, infer_schema=True)
    assert dict(inferred.dtypes)["r_regionkey"] == "int"


def test_parquet_partitioned_write_prunes(spark, sf_tiny, tmp_path):
    orders = eio.load_table(spark, sf_tiny, "orders")
    out = str(tmp_path / "orders_part")
    eio.write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    # partition pruning: the scan must carry the partition filter
    plan = E.formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_no_shuffle(spark, sf_tiny, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    WITHOUT an exchange — the co-located 100 TB join strategy."""
    orders = eio.load_table(spark, sf_tiny, "orders")
    li = eio.load_table(spark, sf_tiny, "lineitem")
    eio.write_bucketed(orders, "b_orders", "o_orderkey", 4, path=str(tmp_path / "bo"))
    eio.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4,
        path=str(tmp_path / "bl"),
    )
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
        n_shuffles = E.shuffle_count(joined)
        assert n_shuffles <= 1, f"bucketed join shuffled {n_shuffles}×"  # only the final agg
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_jdbc_reader_surfaces_lazy_error(spark):
    import pytest

    with pytest.raises(Exception):
        eio.read_jdbc(spark, "jdbc:nosuch://x", "t").count()


def test_sorted_parquet_rowgroups_enable_skipping(spark, sf_small, tmp_path):
    """write_sorted_parquet produces row groups with near-disjoint min/max
    key ranges (the property parquet predicate pushdown skips on), where a
    plain write's row groups all span ~the full key range."""
    import glob

    import pyarrow.parquet as pq

    from recommender_system_with_pyspark_spark.io import load_table, write_sorted_parquet

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    plain, srt = str(tmp_path / "plain"), str(tmp_path / "sorted")
    ev.repartition(4).write.parquet(plain)
    write_sorted_parquet(ev, srt, ["user_id"], target_partitions=4)

    def ranges(path):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(cols["user_id"]).statistics
                out.append((st.min, st.max))
        return out

    total_span = max(b for _, b in ranges(plain)) - min(a for a, _ in ranges(plain))
    plain_cover = sum(b - a for a, b in ranges(plain)) / (total_span * len(ranges(plain)))
    sorted_cover = sum(b - a for a, b in ranges(srt)) / (total_span * len(ranges(srt)))
    # unsorted row groups each span ~full range; sorted ones are narrow slices
    assert plain_cover > 0.5
    assert sorted_cover < 0.4
    # and the pushed filter is visible in the scan
    from recommender_system_with_pyspark_spark.plans.explain import pushed_filters

    probe = spark.read.parquet(srt).filter(F.col("user_id") == 7)
    assert "user_id" in pushed_filters(probe)
    assert probe.count() == ev.filter("user_id = 7").count()


def test_zorder_rowgroups_skip_on_both_dims(spark, sf_small, tmp_path):
    """Z-order layout: row-group min/max rectangles are narrow on BOTH
    dimensions, where a single-column sort leaves the second column's
    ranges spanning ~the full domain."""
    import glob

    import pyarrow.parquet as pq

    from recommender_system_with_pyspark_spark.io import (
        load_table, write_sorted_parquet, write_zorder_parquet,
    )

    ev = load_table(spark, sf_small, "events").select("event_id", "user_id", "value")
    srt, zo = str(tmp_path / "sorted"), str(tmp_path / "zorder")
    write_sorted_parquet(ev, srt, ["user_id"], target_partitions=8)
    write_zorder_parquet(ev, zo, "user_id", "value", target_partitions=8)

    def mean_cover(path, col):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(cols[col]).statistics
                spans.append((float(st.min), float(st.max)))
        lo = min(a for a, _ in spans)
        hi = max(b for _, b in spans)
        return sum(b - a for a, b in spans) / ((hi - lo) * len(spans))

    # single-column sort: user_id narrow, value ~full-width per row group
    assert mean_cover(srt, "user_id") < 0.4
    assert mean_cover(srt, "value") > 0.6
    # z-order: BOTH dimensions substantially narrowed
    assert mean_cover(zo, "user_id") < 0.45
    assert mean_cover(zo, "value") < 0.45


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appending files with an evolved schema (new column) must stay
    readable: mergeSchema unions the footers and back-fills nulls — the
    lakehouse-style additive evolution path for long-lived 100 TB tables."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(p)
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1.5).alias("v2")
    ).write.mode("append").parquet(p)
    got = spark.read.option("mergeSchema", True).parquet(p)
    assert set(got.columns) == {"id", "v1", "v2"}
    assert got.count() == 8
    assert got.filter(F.col("v2").isNull()).count() == 5  # old files back-fill


def test_compact_parquet_hits_target_file_count(spark, tmp_path):
    """compact_parquet must rewrite a fragmented directory into
    ceil(bytes/target) files, preserving every row."""
    import glob

    from recommender_system_with_pyspark_spark.io import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(50_000).repartition(64).write.parquet(src)  # 64 tiny files
    n_src = len(glob.glob(f"{src}/*.parquet"))
    assert n_src == 64
    target = compact_parquet(spark, src, dst, target_file_bytes=200 * 1024)
    n_dst = len(glob.glob(f"{dst}/*.parquet"))
    assert n_dst == target < n_src
    assert spark.read.parquet(dst).count() == 50_000


def test_compact_parquet_sorted_layout(spark, tmp_path):
    """With sort_cols the compaction also restores range layout: each
    output file covers a disjoint id range (skipping-friendly)."""
    import glob

    from recommender_system_with_pyspark_spark.io import compact_parquet

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "compact2")
    spark.range(20_000).repartition(32).write.parquet(src)
    compact_parquet(spark, src, dst, target_file_bytes=150 * 1024, sort_cols=["id"])
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{dst}/*.parquet"):
        t = pq.read_table(f, columns=["id"])
        if t.num_rows:
            ids = t.column("id").to_pylist()
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint


def test_compact_parquet_rejects_in_place_overwrite(spark, tmp_path):
    """dst == src with an overwrite sink would truncate the source before
    the lazy read runs — must raise instead of destroying data (ADVICE r4)."""
    import pytest

    from recommender_system_with_pyspark_spark.io import compact_parquet

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="dst_path must differ"):
        compact_parquet(spark, src, src)
    # source intact
    assert spark.read.parquet(src).count() == 10
