"""As-of join + salted join + date parts unit tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators.relational import salted_join
from recommender_system_with_pyspark_spark.operators.temporal import as_of_join, date_parts


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_as_of_join_hand_case(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100.0),
            (1, _ts("2024-01-01T10:05:00"), 101.0),
            (2, _ts("2024-01-01T10:02:00"), 200.0),
        ],
        "key int, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:03:00"), "t1"),   # → 100.0
            (1, _ts("2024-01-01T10:05:00"), "t2"),   # equal time → inclusive → 101.0
            (2, _ts("2024-01-01T10:01:00"), "t3"),   # before any quote → null
            (3, _ts("2024-01-01T10:10:00"), "t4"),   # no quotes for key → null
        ],
        "key int, ts timestamp, trade string",
    )
    out = as_of_join(
        trades, quotes,
        left_key="key", right_key="key",
        left_time="ts", right_time="qts",
        payload_cols=["px"],
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    assert got == {"t1": 100.0, "t2": 101.0, "t3": None, "t4": None}
    assert out.count() == trades.count()  # left join: every trade preserved


def test_as_of_join_tolerance_nulls_stale_matches(spark):
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0)],
        "key int, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:04:00"), "fresh"),   # 240s old → kept
            (1, _ts("2024-01-01T10:05:00"), "edge"),    # exactly 300s → kept (> is strict)
            (1, _ts("2024-01-01T10:06:00"), "stale"),   # 360s old → nulled
        ],
        "key int, ts timestamp, trade string",
    )
    out = as_of_join(
        trades, quotes, "key", "key", "ts", "qts", ["px"], tolerance_seconds=300
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    assert got == {"fresh": 100.0, "edge": 100.0, "stale": None}
    assert out.count() == 3  # stale rows survive null-extended (LEFT)


def test_as_of_join_tie_dedupe(spark):
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 5.0), (1, _ts("2024-01-01T10:00:00"), 9.0)],
        "key int, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:01:00"), "t1")], "key int, ts timestamp, trade string"
    )
    out = as_of_join(trades, quotes, "key", "key", "ts", "qts", ["px"])
    assert out.first()["px"] == 9.0  # greatest-payload tie-break


def test_salted_join_equals_plain_join(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.io import load_table

    li = load_table(spark, sf_tiny, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    orders = load_table(spark, sf_tiny, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, "o_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(li, orders, "o_orderkey", salt=4).groupBy("o_orderpriority").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_salt_is_deterministic(spark):
    # retry-safety: the salt must be a deterministic function of row content,
    # never rand() — a recomputed partition (fetch failure / speculation /
    # AQE replan) would otherwise re-salt rows differently from the
    # already-shuffled small side and lose/duplicate rows.
    big = spark.createDataFrame([(i % 3, f"v{i}") for i in range(50)], "k int, v string")
    small = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k int, w string")
    plan = salted_join(big, small, "k", salt=4)._jdf.queryExecution().analyzed().toString()
    assert "rand(" not in plan
    assert "xxhash64" in plan


def test_salted_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(big, small, "k", salt=4, how="left")
    got = {r["v"]: r["w"] for r in out.collect()}
    assert got == {"a": "x", "b": None}


def test_date_parts_values(spark):
    df = spark.createDataFrame([(1, _ts("2024-03-15T13:45:00"))], "id int, ts timestamp")
    row = date_parts(df, "ts").first()
    assert (row["year"], row["quarter"], row["month"], row["day"], row["hour"]) == (2024, 1, 3, 15, 13)
    assert row["weekday"] == 4  # 2024-03-15 is a Friday, Monday=0

def test_as_of_join_preserves_exotic_payload_types(spark):
    """Payloads ride the fill struct in their NATIVE types — a microsecond
    timestamp and a decimal survive bit-exact (the former string round-trip
    was lossy for these)."""
    from decimal import Decimal

    left = spark.createDataFrame(
        [(1, 100), (1, 200)], "k int, t long"
    )
    right = spark.createDataFrame(
        [(1, 50, dt.datetime(2024, 1, 1, 0, 0, 0, 123456), Decimal("1.23456789"))],
        "k int, rt long, stamp timestamp, dec decimal(18,8)",
    )
    out = as_of_join(
        left, right, left_key="k", right_key="k",
        left_time="t", right_time="rt", payload_cols=["stamp", "dec"],
    ).collect()
    by_t = {r["t"]: r for r in out}
    assert by_t[100]["stamp"] == dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert by_t[100]["dec"] == Decimal("1.23456789")
    assert out[0]["stamp"].microsecond == 123456


def test_scd2_build_intervals(spark):
    from recommender_system_with_pyspark_spark.operators.temporal import scd2_build
    from recommender_system_with_pyspark_spark.plans.explain import shuffle_count

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: A A B A  -> versions A[0,2) B[2,3) A[3,null)
        (1, "A", t0, 10), (1, "A", t0 + dt.timedelta(hours=1), 11),
        (1, "B", t0 + dt.timedelta(hours=2), 12), (1, "A", t0 + dt.timedelta(hours=3), 13),
        # user 2: single version, stays current
        (2, "C", t0, 20),
    ]
    df = spark.createDataFrame(rows, "user_id long, attr string, ts timestamp, eid long")
    hist = scd2_build(df, "user_id", "attr", "ts", order_col="eid").orderBy("user_id", "valid_from")
    got = [(r.user_id, r.attr, r.valid_from.hour if r.valid_from else None,
            r.valid_to.hour if r.valid_to else None, r.is_current) for r in hist.collect()]
    assert got == [
        (1, "A", 0, 2, False), (1, "B", 2, 3, False), (1, "A", 3, None, True),
        (2, "C", 0, None, True),
    ]
    # one is_current per key; both window passes share ONE exchange
    assert hist.filter("is_current").count() == 2
    assert shuffle_count(scd2_build(df, "user_id", "attr", "ts", order_col="eid")) == 1


def test_resample_nonhour_step_keeps_every_event(spark):
    """step='1 day' must bucket onto the same daily grid the sequence()
    steps over — a hard-coded hour truncation once made most events miss
    the grid join and silently vanish (ADVICE r4). Every event lands in
    exactly one bucket and the totals reconcile."""
    from recommender_system_with_pyspark_spark.operators.temporal import resample_timeseries

    t0 = dt.datetime(2024, 1, 1, 6, 30, 0)  # off-midnight on purpose
    rows = [("k", t0 + dt.timedelta(hours=7 * i), 1.0) for i in range(12)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")

    out = resample_timeseries(df, "key", "ts", "value", step="1 day").collect()
    assert sum(r["n_events"] for r in out) == 12
    assert sum(r["total"] or 0.0 for r in out) == 12.0
    # daily grid: consecutive buckets 24h apart, all at midnight-aligned
    # epoch multiples of the step
    buckets = sorted(r["bucket"] for r in out)
    assert all((b2 - b1) == dt.timedelta(days=1) for b1, b2 in zip(buckets, buckets[1:]))
    assert all(b.hour == 0 and b.minute == 0 for b in buckets)


def test_resample_quarter_hour_step(spark):
    from recommender_system_with_pyspark_spark.operators.temporal import resample_timeseries

    t0 = dt.datetime(2024, 1, 1, 0, 7, 0)
    rows = [("k", t0 + dt.timedelta(minutes=10 * i), 2.0) for i in range(9)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    out = resample_timeseries(df, "key", "ts", "value", step="15 minutes").collect()
    assert sum(r["n_events"] for r in out) == 9
    assert all(b["bucket"].minute % 15 == 0 for b in out)


def test_cdc_apply_latest_wins_and_deletes(spark):
    from recommender_system_with_pyspark_spark.operators.temporal import cdc_apply

    cdc = spark.createDataFrame(
        [
            (1, 1, "I", 10.0), (1, 2, "U", 11.0),          # update wins
            (2, 1, "I", 20.0), (2, 3, "D", None), (2, 2, "U", 21.0),  # delete is latest
            (3, 5, "I", 30.0),                               # plain insert
        ],
        "k long, seq int, op string, v double",
    )
    out = {r["k"]: r for r in cdc_apply(cdc, ["k"], ["seq"]).collect()}
    assert set(out) == {1, 3}
    assert out[1]["op"] == "U" and out[1]["v"] == 11.0
    assert out[3]["v"] == 30.0


def test_last_touch_attribution_organic_and_ties(spark):
    import datetime

    from recommender_system_with_pyspark_spark.operators.temporal import (
        last_touch_attribution,
    )

    t = datetime.datetime(2024, 1, 1)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t, 10, "view"), (1, t + s, 11, "click"), (1, t + 2 * s, 12, "purchase"),
        (2, t, 20, "purchase"),                       # organic: no prior touch
        (3, t, 30, "view"), (3, t, 31, "purchase"),   # same ts: id order decides
        (3, t, 32, "click"),                          # later id -> NOT attributed
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {r["conversion_id"]: r for r in last_touch_attribution(ev).collect()}
    assert out[12]["touch_id"] == 11 and out[12]["touch_type"] == "click"
    assert out[20]["touch_id"] is None
    assert out[31]["touch_id"] == 30  # only the id-earlier same-ts view counts


def test_km_survival_textbook_example(spark):
    from recommender_system_with_pyspark_spark.operators.temporal import km_survival

    # classic toy: deaths at t=1 (1 of 5), t=3 (2 of 3); censored at t=2, t=4
    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "duration int, event int")
    out = {r["duration"]: r for r in km_survival(df, "duration", "event").collect()}
    assert out[1]["n_at_risk"] == 5 and out[1]["deaths"] == 1
    assert out[1]["survival"] == 0.8                      # 4/5
    assert out[2]["survival"] == 0.8                      # censoring: no drop
    assert out[3]["n_at_risk"] == 3 and out[3]["deaths"] == 2
    assert out[3]["survival"] == round(0.8 * (1 / 3), 6)  # 4/5 * 1/3
    assert out[4]["survival"] == out[3]["survival"]


def test_km_survival_all_die_hits_zero(spark):
    from recommender_system_with_pyspark_spark.operators.temporal import km_survival

    df = spark.createDataFrame([(1, 1), (2, 1)], "duration int, event int")
    out = {r["duration"]: r["survival"] for r in km_survival(df).collect()}
    assert out[2] == 0.0  # d == n at the last timepoint -> exactly 0, not NaN
