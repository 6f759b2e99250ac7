"""Declarative data-quality audits (north-star extension: a 100 TB
training-data pipeline gates every ingest batch on constraint checks —
completeness, uniqueness, referential integrity, domain/range membership —
the way Deequ/dbt-tests do, and the reference does by hand with
`isNull().sum()`-style pandas audits (`datacleaning.py:34-44`,
`functions.py:61-74` find_missing_values).

Scale shape: every per-table check compiles to ONE conditional aggregate
over a single scan — N checks on a table cost one pass total, not N.
`count(distinct)` for uniqueness rides the same pass (Spark plans it as an
expand + two-stage aggregate; the expand multiplies rows only by the number
of DISTINCT groups, here 1). Referential checks are a broadcast-anti-join
aggregate: the parent's key set is deduplicated map-side and broadcast, so
the child (the 100 TB side) is never shuffled. Results are tiny
(one row per check) — the unpivot to rows happens on a 1-row frame.

No UDFs, no collects; every expression is ANSI-portable so the DuckDB
oracles state the same checks as scalar subqueries.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESULT_COLS = ("check", "violations", "total")


@dataclass(frozen=True)
class Check:
    """One named constraint: ``violated`` is a boolean expression that is
    true on rows breaking the constraint."""

    name: str
    violated: Column


def not_null(col: str) -> Check:
    return Check(f"not_null:{col}", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    """Violated when outside [lo, hi] (nulls count as violations — an
    unknown value cannot be shown to satisfy the constraint)."""
    c = F.col(col)
    return Check(f"in_range:{col}", ~c.between(F.lit(lo), F.lit(hi)) | c.isNull())


def accepted_values(col: str, values: Sequence[str]) -> Check:
    c = F.col(col)
    return Check(f"accepted_values:{col}", ~c.isin(list(values)) | c.isNull())


def matches(col: str, pattern: str) -> Check:
    """Violated when the column does not rlike the anchored pattern."""
    c = F.col(col)
    return Check(f"matches:{col}", ~c.rlike(pattern) | c.isNull())


def table_audit(df: DataFrame, table: str, checks: Sequence[Check],
                unique: Sequence[str] = ()) -> DataFrame:
    """All row-level checks plus optional key-uniqueness in ONE aggregate
    pass; returns (check, violations, total) rows.

    Uniqueness counts rows minus distinct keys (0 ⇔ the key is unique);
    it shares the same scan as the conditional counters.
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for ck in checks:
        aggs.append(
            F.sum(F.when(ck.violated, 1).otherwise(0)).alias(f"_v_{ck.name}")
        )
    if unique:
        aggs.append(F.count_distinct(*[F.col(c) for c in unique]).alias("_ndistinct"))
    row = df.agg(*aggs)

    # unpivot via stack (a generator over the ONE aggregate row) — a union
    # of per-check selects would repeat the aggregate subtree per branch
    # (Catalyst does not CSE across union branches), turning "one pass"
    # into one scan per check
    pairs: list[Column] = []
    for ck in checks:
        pairs += [F.lit(f"{table}.{ck.name}"), F.col(f"_v_{ck.name}").cast("long")]
    if unique:
        pairs += [
            F.lit(f"{table}.unique:{','.join(unique)}"),
            (F.col("_total") - F.col("_ndistinct")).cast("long"),
        ]
    n = len(checks) + (1 if unique else 0)
    return row.select(
        F.stack(F.lit(n), *pairs).alias("check", "violations"),
        F.col("_total").cast("long").alias("total"),
    )


def referential_audit(child: DataFrame, child_key: str,
                      parent: DataFrame, parent_key: str,
                      name: str) -> DataFrame:
    """Orphan-count check: child rows whose NON-NULL key has no parent row.

    NULL child keys are excluded before the anti join (ADVICE r6): SQL FK
    semantics treat a NULL foreign key as "no reference", not a violation —
    and a left_anti join would otherwise count every null-key row as an
    orphan (NULL never equi-matches), inflating violation counts on
    null-heavy child tables. Use ``dq_audit``'s not-null check to police
    null keys separately.

    The parent key set is distinct-ed and broadcast, so the child side is a
    scan + map-side anti join + aggregate — zero shuffles of the fact.
    """
    parents = F.broadcast(parent.select(F.col(parent_key).alias(child_key)).distinct())
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parents, on=child_key, how="left_anti"
    )
    return (
        child.agg(F.count(F.lit(1)).cast("long").alias("total"))
        .crossJoin(orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")))
        .select(F.lit(name).alias("check"), "violations", "total")
    )


def audit_suite(parts: Sequence[DataFrame]) -> DataFrame:
    """Union per-table audits into one small report, flagged pass/fail."""
    report = reduce(DataFrame.unionByName, parts)
    return report.withColumn("passed", F.col("violations") == 0)


def key_skew_report(df: DataFrame, key_col: str, round_to: int = 6) -> DataFrame:
    """Shuffle-key skew diagnostics — the report to run BEFORE keying a
    100 TB join or aggregation on a column: per-key fan-out quantiles, the
    max/mean skew ratio, and the heaviest key. A skew ratio in the
    hundreds means the biggest reducer does hundreds of partitions' worth
    of work — reach for salting (`temporal.salted_join`) or AQE skew
    splitting before running the real job.

    Scale shape: one map-side-combining count per key (output is key
    cardinality, not rows), exact percentiles over that post-agg frame,
    and a TakeOrdered(1) for the heaviest key — no global sort, nothing
    driver-side beyond two 1-row frames."""
    counts = df.groupBy(F.col(key_col).alias("_key")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_n").cast("long").alias("total_rows"),
        F.max("_n").cast("long").alias("max_count"),
        F.percentile(F.col("_n").cast("double"), F.lit(0.5)).alias("_p50"),
        F.percentile(F.col("_n").cast("double"), F.lit(0.99)).alias("_p99"),
    )
    heaviest = (
        counts.orderBy(F.col("_n").desc(), F.col("_key").asc())
        .limit(1)
        .select(F.col("_key").cast("string").alias("heaviest_key"))
    )
    return stats.crossJoin(F.broadcast(heaviest)).select(
        "n_keys", "total_rows", "max_count",
        F.round("_p50", round_to).alias("p50_count"),
        F.round("_p99", round_to).alias("p99_count"),
        F.round(F.col("max_count") / (F.col("total_rows") / F.col("n_keys")), round_to)
        .alias("skew_ratio"),
        "heaviest_key",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of two table snapshots — the pre-publish gate for any
    periodically rebuilt dataset ("how much did today's build move?"):
    emits one row per ADDED / REMOVED / CHANGED key with the count of
    changed columns (unchanged keys — the bulk — are never emitted).

    Scale shape: one full outer join on the key (both sides shuffle once,
    co-partitioned), per-column null-safe comparisons inside codegen, and
    the output is bounded by the churn, not the table. At 100 TB, snapshot
    both sides bucketed on the key and even that one shuffle disappears."""
    keys = list(key_cols)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    # presence flags are non-nullable markers — a data column can be null
    # on a present row, so it can't signal side-existence after the join
    o = old.select(*keys, *[F.col(c).alias(f"_old_{c}") for c in cols],
                   F.lit(1).alias("_old_present"))
    n = new.select(*keys, *[F.col(c).alias(f"_new_{c}") for c in cols],
                   F.lit(1).alias("_new_present"))
    j = o.join(n, keys, "full_outer")
    changed = None
    for c in cols:
        d = (~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))).cast("int")
        changed = d if changed is None else changed + d
    changed = changed if changed is not None else F.lit(0)
    status = (
        F.when(F.col("_old_present").isNull(), F.lit("added"))
        .when(F.col("_new_present").isNull(), F.lit("removed"))
        .when(changed > 0, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .withColumn(
            "n_cols_changed",
            F.when(F.col("status") == "changed", changed).otherwise(F.lit(0)).cast("int"),
        )
        .select(*keys, "status", "n_cols_changed")
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: "Sequence[str]",
    k: int = 5,
    histogram: bool = False,
) -> DataFrame:
    """k-anonymity audit: return every quasi-identifier combination shared
    by FEWER than ``k`` rows — the re-identification risk set a privacy
    release must suppress or generalize (Sweeney's k-anonymity: an
    individual is protected only if at least k−1 others share their
    quasi-identifier tuple).

    Scale shape: one partial-aggregating groupBy over the quasi columns +
    a HAVING filter. Output size: one row per RISKY group — small when
    the quasi columns are genuinely categorical, but O(n_rows) in the
    worst case (a near-key quasi set makes every row its own singleton
    group), so do NOT blindly collect it. For near-key quasi sets, or as
    the always-safe first look, pass ``histogram=True`` to get the
    (group_size, n_groups) distribution instead — at most ``k − 1`` rows
    out, whatever the table.

    Returns the quasi columns + ``group_size`` (default), or
    (group_size, n_groups) with ``histogram=True``."""
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    risky = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("group_size"))
        .filter(F.col("group_size") < k)
    )
    if histogram:
        return risky.groupBy("group_size").agg(
            F.count(F.lit(1)).cast("long").alias("n_groups")
        )
    return risky


def schema_drift(
    before: DataFrame,
    after: DataFrame,
    round_to: int = 6,
) -> DataFrame:
    """Schema + column-statistics drift between two snapshots of "the same"
    table — the upstream-broke-the-contract detector that runs before any
    value-level check can even apply: columns appearing/disappearing or a
    null-rate jumping from 0.1% to 40% are how producer changes actually
    reach a pipeline. For every column in either snapshot, emit its
    status (added / removed / common) and, for common columns, the
    null-rate on both sides plus the delta.

    Scale shape: ONE aggregate pass per snapshot computing every column's
    null count in a single job (no per-column scans), then a tiny
    driver-side column-name alignment — column COUNTS are driver data by
    definition. The shuffle carries one row per snapshot. Complements
    ``snapshot_diff`` (row-level churn) and ``population_stability``
    (value drift): schema first, rows second, values third.

    Returns (column, status, null_rate_before, null_rate_after,
    null_rate_delta) — rates null for non-common columns."""
    def _null_rates(df: DataFrame) -> dict[str, float]:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns
        ]
        row = df.agg(*aggs).first()
        n = max(row["__n"], 1)
        return {c: row[c] / n for c in df.columns}

    rb, ra = _null_rates(before), _null_rates(after)
    rows = []
    for c in sorted(set(rb) | set(ra)):
        if c in rb and c in ra:
            rows.append(
                (c, "common", round(rb[c], round_to), round(ra[c], round_to),
                 round(ra[c] - rb[c], round_to))
            )
        elif c in ra:
            rows.append((c, "added", None, round(ra[c], round_to), None))
        else:
            rows.append((c, "removed", round(rb[c], round_to), None, None))
    return before.sparkSession.createDataFrame(
        rows,
        "column string, status string, null_rate_before double, "
        "null_rate_after double, null_rate_delta double",
    )
