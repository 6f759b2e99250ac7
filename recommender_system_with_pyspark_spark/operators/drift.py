"""Distribution-drift monitoring (north-star extension: a training-data
pipeline needs to detect when an incoming batch stopped looking like the
corpus the model was trained on).

Population Stability Index over fixed equal-width buckets:

    PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

summed over buckets observed in either cohort, with Laplace-smoothed bucket
shares — share_b = (count_b + 1) / (n_cohort + n_buckets) — so a bucket
empty on one side contributes a finite penalty instead of ±inf. Rule of
thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 action needed.

Scale shape: ONE pass for the global value range (2-number aggregate,
broadcast back), ONE partial-aggregating groupBy over (group, bucket) with
conditional counts — the shuffle carries at most |groups|·|buckets| rows,
never the fact table. No UDFs, no driver collects, no windows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(value: Column, vmin: Column, vmax: Column, n_buckets: int) -> Column:
    """Equal-width bucket index in [0, n_buckets): floor(n·(v−min)/width),
    with v == max clamped into the last bucket. Pure expression — identical
    arithmetic is reproducible in any engine (the DuckDB oracles reuse it
    verbatim). A constant column (vmax == vmin → width 0) puts every row
    in bucket 0 explicitly rather than leaving engine-dependent null/±inf
    clamping to decide."""
    width = (vmax - vmin) / F.lit(float(n_buckets))
    raw = F.floor((value - vmin) / width).cast("int")
    return F.when(vmax == vmin, F.lit(0)).otherwise(
        F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), raw))
    )


def population_stability(
    df: DataFrame,
    value_col: str,
    cohort_col: str,
    baseline: str,
    current: str,
    group_col: str,
    n_buckets: int = 10,
    round_to: int = 6,
    range_cols_present: bool = False,
) -> DataFrame:
    """Per-``group_col`` PSI of ``value_col`` between the rows where
    ``cohort_col == baseline`` (p) and ``cohort_col == current`` (q); rows
    in neither cohort are ignored. Returns
    (``group_col``, psi, n_baseline, n_current).

    ``range_cols_present``: the input already carries ``_vmin``/``_vmax``
    columns (double) from a range the caller aggregated anyway — skip the
    internal min/max pass (every extra pass over a 100 TB fact is a real
    scan)."""
    if range_cols_present:
        with_range = df
    else:
        # Range over the two cohorts ONLY — rows in neither cohort must not
        # stretch the buckets (they are ignored everywhere else too).
        coh = df.filter(F.col(cohort_col).isin(baseline, current))
        rng = coh.agg(
            F.min(value_col).cast("double").alias("_vmin"),
            F.max(value_col).cast("double").alias("_vmax"),
        )
        with_range = coh.crossJoin(F.broadcast(rng))
    bucketed = (
        with_range.filter(F.col(cohort_col).isin(baseline, current))
        .select(
            F.col(group_col),
            F.col(cohort_col).alias("_cohort"),
            bucketize(
                F.col(value_col).cast("double"), F.col("_vmin"), F.col("_vmax"), n_buckets
            ).alias("_bucket"),
        )
    )
    is_p = (F.col("_cohort") == baseline).cast("long")
    counts = bucketed.groupBy(group_col, "_bucket").agg(
        F.sum(is_p).alias("c_p"),
        F.sum(1 - is_p).alias("c_q"),
    )
    # Cohort totals via a per-group window, NOT a groupBy + join back: a
    # second aggregate over `counts` would re-execute the whole scan+agg
    # subtree (no plan reuse across the self-reference), doubling the work
    # and the shuffles. The window costs one reshuffle of the tiny counts
    # table and leaves it partitioned by group for the final aggregate.
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col)
    with_tot = counts.withColumn("tot_p", F.sum("c_p").over(w)).withColumn(
        "tot_q", F.sum("c_q").over(w)
    )
    sm = F.lit(float(n_buckets))
    p = (F.col("c_p") + 1) / (F.col("tot_p") + sm)
    q = (F.col("c_q") + 1) / (F.col("tot_q") + sm)
    return (
        with_tot.withColumn("_term", (p - q) * F.log(p / q))
        .groupBy(group_col)
        .agg(
            F.round(F.sum("_term"), round_to).alias("psi"),
            F.min("tot_p").cast("long").alias("n_baseline"),
            F.min("tot_q").cast("long").alias("n_current"),
        )
    )


def ks_statistic(
    df: DataFrame,
    value_col: str,
    cohort_col: str,
    baseline: str,
    current: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two cohorts:

        KS = max over v of | ECDF_baseline(v) − ECDF_current(v) |

    the standard non-parametric drift test PSI can't replace when bucket
    boundaries would hide the shift (KS is binning-free and sensitive to
    the worst point of the CDF gap, not an average).

    Distributed shape: one partial-aggregating ``groupBy(value)`` collapses
    the cohorts to per-distinct-value counts, then the GLOBAL running
    counts come from :func:`~..operators.relational.two_stage_cumsum` —
    value-range subgroups cumsum in parallel with broadcast prefix offsets,
    so no single-partition window ever sees the fact table. The final max
    is an ordinary aggregate. Everything is integer counts until one
    double division at the end, so the result is bit-stable across engines
    (the DuckDB oracle reproduces it exactly).

    Returns one row: (ks_stat, n_baseline, n_current)."""
    from .relational import two_stage_cumsum

    pts = (
        df.filter(F.col(cohort_col).isin([baseline, current]))
        # a NULL has no place in an ECDF (ADVICE r6): Spark's cumsum groups
        # nulls first while a SQL oracle's `ORDER BY v` puts them last —
        # dropping them on BOTH sides pins the twin contract
        .filter(F.col(value_col).isNotNull())
        .select(
            F.col(value_col).alias("_v"),
            (F.col(cohort_col) == baseline).cast("long").alias("_a"),
            (F.col(cohort_col) == current).cast("long").alias("_b"),
        )
        .groupBy("_v")
        .agg(F.sum("_a").alias("_a"), F.sum("_b").alias("_b"))
    )
    # LAZY checkpoint with the fused stats job as materializer (round 14):
    # one aggregate computes the cumsum's quantile cut points while
    # persisting pts, replacing the eager-checkpoint job + the separate
    # approxQuantile action two_stage_cumsum would run (3 actions → 2 per
    # call). Cumulative sums are exact for ANY cut set, so the sketch swap
    # (percentile_approx vs stat.approxQuantile) only moves load-balance
    # boundaries.
    pts = pts.localCheckpoint(eager=False)  # feeds totals AND the cumsum
    n_groups = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    sketch = pts.agg(
        F.percentile_approx(
            F.col("_v").cast("double"),
            [i / n_groups for i in range(1, n_groups)],
            4 * max(n_groups, 1),
        ).alias("_cuts")
    ).first()
    cuts = sorted({float(c) for c in (sketch["_cuts"] or [])})
    totals = pts.agg(F.sum("_a").alias("na"), F.sum("_b").alias("nb"))
    cum = two_stage_cumsum(pts, "_v", ["_a", "_b"], n_groups=n_groups,
                           cut_points=cuts)
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.abs(F.col("cum__a") / F.col("na")
                  - F.col("cum__b") / F.col("nb")).alias("d"),
            "na", "nb",
        )
        .agg(
            F.round(F.max("d"), round_to).alias("ks_stat"),
            F.max("na").cast("long").alias("n_baseline"),
            F.max("nb").cast("long").alias("n_current"),
        )
    )
