"""EXPLAIN helpers + machine-checkable plan assertions.

The reference has no optimizer of its own (SURVEY §4) — Catalyst does the
work; what the engine owes users is *visibility* (an EXPLAIN surface) and
*guarantees* (tests that the plans we promise — pushdown, broadcast,
codegen — actually materialize). These helpers parse
``df.explain('formatted')`` output so tests can assert plan shape instead
of eyeballing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The engine's EXPLAIN: Catalyst's formatted physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def uses_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is a BroadcastHashJoin (the J1/J2 scale
    contract: small side broadcast, fact side never shuffled)."""
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded — they move only the small side)."""
    import re

    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters:" in line:
            out.append(line.split("PushedFilters:", 1)[1].strip())
    return "; ".join(out)


def read_schema(df: DataFrame) -> str:
    """ReadSchema of the scan node(s) — verifies column pruning."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return "; ".join(out)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more fused JVM code)."""
    return executed_plan(df).count("*(")


def unpartitioned_window_specs(df: DataFrame) -> list[str]:
    """Window specs in the physical plan with an EMPTY partition clause —
    the exact condition that makes the JVM log ``WindowExec: No Partition
    Defined for Window operation! Moving all data to a single partition``
    at runtime. Plan-side detection (instead of log scraping) is
    deterministic, needs no log4j plumbing, and fires BEFORE execution.

    A windowspecdefinition's argument list is ``partition cols..., order
    exprs (each tagged ASC/DESC NULLS ...), specifiedwindowframe(...)`` —
    so a spec whose every pre-frame argument carries an ASC/DESC tag has no
    partitioning. Commas inside nested calls (casts etc.) are skipped by a
    paren-depth scanner."""
    import re

    plan = formatted_plan(df)
    bad: list[str] = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth, i = 1, start
        while i < len(plan) and depth:
            depth += {"(": 1, ")": -1}.get(plan[i], 0)
            i += 1
        body = plan[start : i - 1]
        head = body.split("specifiedwindowframe", 1)[0]
        args, buf, d = [], [], 0
        for ch in head:
            if ch == "," and d == 0:
                args.append("".join(buf).strip())
                buf = []
            else:
                d += {"(": 1, ")": -1}.get(ch, 0)
                buf.append(ch)
        if tail := "".join(buf).strip():
            args.append(tail)
        args = [a for a in args if a]
        if all(re.search(r"\b(ASC|DESC)\b", a) for a in args):
            bad.append(body)
    return bad


def assert_plan(
    df: DataFrame,
    broadcast_join: bool | None = None,
    max_shuffles: int | None = None,
    filter_pushed: str | None = None,
    pruned_to: list[str] | None = None,
) -> None:
    """Declarative plan contract for tests; raises AssertionError with the
    full formatted plan on violation."""
    plan = formatted_plan(df)
    problems = []
    if broadcast_join is not None and uses_broadcast_join(df) != broadcast_join:
        problems.append(f"broadcast_join != {broadcast_join}")
    if max_shuffles is not None and shuffle_count(df) > max_shuffles:
        problems.append(f"shuffles {shuffle_count(df)} > {max_shuffles}")
    if filter_pushed is not None and filter_pushed not in pushed_filters(df):
        problems.append(f"filter {filter_pushed!r} not pushed (got: {pushed_filters(df)!r})")
    if pruned_to is not None:
        schema = read_schema(df)
        extra = [c for c in _schema_cols(schema) if c not in pruned_to]
        if extra:
            problems.append(f"scan reads unpruned columns {extra}")
    if problems:
        raise AssertionError("; ".join(problems) + "\n\n" + plan)


def _schema_cols(read_schema_str: str) -> list[str]:
    import re

    return re.findall(r"(\w+):", read_schema_str)
