"""Custom stateful streaming operators via applyInPandasWithState
(engine extension — the escape hatch when windowed aggregates can't express
the semantics; state lives in the state store, partitioned by key).

DEMO SURFACE, not the default path. Both operators here have associative
state updates, so each has a NATIVE streaming-aggregation form that is
strictly cheaper (JVM state, map-side partial agg, no Arrow round-trip):
``running_user_totals`` ≡ ``groupBy(user).agg(count, sum)`` in update mode
(what the ``stream_stateful_totals`` oracle effectively checks), and
``decayed_user_features`` ≡ ``windows.decayed_user_features_native`` —
the registered ``stream_decayed_features`` entry runs the native form;
tests pin the two equal. Keep THIS module as the template for state that
is genuinely non-associative (per-key model state, pattern detection over
ordered events, idle-timeout session eviction — ``running_user_totals``
demonstrates the timeout API natively-unreachable by aggregates)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return _update


def running_user_totals(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Per-user running (count, sum) state across micro-batches; emits the
    updated totals each batch a user appears in. One shuffle on user_id;
    state-store footprint = one (long, double) pair per active user.

    ``idle_timeout_ms`` enables ProcessingTimeTimeout state eviction for
    unbounded streams. Leave None for bounded/availableNow runs — with a
    timeout configured, availableNow keeps scheduling timeout-processing
    micro-batches and a 'finite' run degenerates into dozens of batches."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            timeout,
        )
    )


DECAY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("decayed_count", T.DoubleType()),
        T.StructField("decayed_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

DECAY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("dc", T.DoubleType()),
        T.StructField("dv", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def decayed_user_features(
    events: DataFrame,
    ref_ts_us: int,
    half_life_days: float = 7.0,
) -> DataFrame:
    """STREAMING half-life-decayed per-user features, custom-state DEMO
    form (the production path is ``windows.decayed_user_features_native``
    — a native update-mode aggregation with identical output; this
    version exists to exercise/document the applyInPandasWithState
    surface and the serving-time re-anchor pattern). Per-key state
    carries the decayed aggregates across micro-batches.
    The state accumulates each event's weight AT A FIXED
    reference instant (``2^(−(ref − t)/hl)``), which makes the update
    associative and commutative — contributions simply add, whatever the
    micro-batch split — and equal to the batch ``temporal.decayed_agg``
    at the same reference. (A serving deployment re-anchors the reference
    periodically with the rescale identity
    ``decayed(ref') = decayed(ref) · 2^(−(ref'−ref)/hl)`` — one multiply
    per key, state shape unchanged.) Events at/after the reference are
    excluded, same point-in-time rule as the batch twin.

    State per user: (double, double, long). One shuffle on the key."""
    import math

    import numpy as np

    lam = math.log(2.0) / (half_life_days * 86400e6)

    def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        dc, dv, n = state.get if state.exists else (0.0, 0.0, 0)
        for pdf in pdfs:
            t_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            mask = t_us < ref_ts_us
            if not mask.any():
                continue
            w = np.exp(-lam * (ref_ts_us - t_us[mask]).astype("float64"))
            dc += float(w.sum())
            dv += float((w * pdf["value"].values[mask]).sum())
            n += int(mask.sum())
        state.update((dc, dv, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "decayed_count": [dc],
                "decayed_value": [dv],
                "n_events": [n],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            DECAY_OUTPUT_SCHEMA,
            DECAY_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
