"""Mergeable counting sketches (Count–Min) — approximate frequency at
100 TB scale.

The exact heavy-hitter operators (``relational.heavy_hitters``,
``quality.key_skew_report``) shuffle one row per DISTINCT key — fine for
categorical columns, unbounded for ids. A Count–Min sketch (Cormode &
Muthukrishnan 2005) caps the state at depth×width cells no matter the key
cardinality, is MERGEABLE (cell-wise sum — so partial sketches combine
associatively across partitions, days, or streams), and guarantees
``estimate ≥ true`` with ``estimate ≤ true + εN`` w.h.p. (ε = e/width).

Spark-first design: the sketch IS a groupBy — each input row contributes
``depth`` (row, bucket) cells via a posexplode projection, and one
partial-aggregating groupBy over at most depth×width groups builds the
table. No UDAF, no driver state, and the partial-agg step is exactly the
sketch merge. Bucket hashing is the repo's portable md5 convention
(``sampling.hash_bucket``), so an oracle engine reproduces every cell and
every estimate bit-for-bit — the sketch is DETERMINISTIC, only its error
is probabilistic.

Reference parity note: the reference has no sketches at all (SURVEY §2.4
covers exact aggregates only); this extends the approx-aggregate family
(HLL++/approx-percentile in `sketch_accuracy`) with a mergeable
frequency sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def _bucket(key: F.Column, row: int, width: int, seed: int | str) -> F.Column:
    """Row-``row`` bucket of ``key``: md5(key || ':cms<seed>' || ':<row>')
    mod width — the module's portable convention, reproduced verbatim by
    the DuckDB oracle."""
    return F.pmod(
        hash_bucket(F.concat(key.cast("string"), F.lit(f":cms{seed}")), seed=row),
        F.lit(width),
    )


def count_min_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int | str = 0,
) -> DataFrame:
    """Build the Count–Min table for a key column: one row per non-empty
    (sketch_row, bucket) cell with its count. At most depth×width rows out
    regardless of input size; the groupBy partial-aggregates map-side, so
    the shuffle carries ≤ depth×width rows per input partition — this IS
    the sketch merge, expressed as Spark's own combiner.

    Sketches built per partition/day/source can be unioned and re-grouped
    (cell-wise sum) to sketch the whole — the mergeability contract tests
    pin."""
    return cms_cells(df, key_col, depth, width, seed).groupBy(
        "sketch_row", "bucket"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def cms_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int | str = 0,
) -> DataFrame:
    """The pre-aggregation cell projection of the Count–Min sketch: each
    input row becomes its ``depth`` (sketch_row, bucket) cells. Exposed
    separately because it is a pure per-row projection — it composes with
    a STREAMING groupBy unchanged (the streaming state store then IS the
    sketch, capped at depth×width entries forever), which is the whole
    point of a mergeable sketch."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    k = F.col(key_col)
    return df.select(
        F.posexplode(
            F.array(*[_bucket(k, r, width, seed) for r in range(depth)])
        ).alias("sketch_row", "bucket")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int | str = 0,
) -> DataFrame:
    """Point-frequency estimates for probe keys against a Count–Min table:
    ``min`` over the key's ``depth`` cells. Join shape: probes explode to
    depth rows, equi-join the ≤ depth×width-row sketch (broadcast — the
    sketch is tiny BY CONSTRUCTION), one groupBy per probe key for the
    min. Missing cells count as 0 (a key hashing into an untouched bucket
    has estimate 0 — correct: it was never seen).

    Returns (key_col, est_cnt). Structural guarantee est_cnt ≥ true count;
    est_cnt ≤ true + e/width·N w.h.p."""
    k = F.col(key_col)
    probe_cells = probes.select(
        key_col,
        F.posexplode(
            F.array(*[_bucket(k, r, width, seed) for r in range(depth)])
        ).alias("sketch_row", "bucket"),
    )
    joined = probe_cells.join(
        F.broadcast(sketch), ["sketch_row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est_cnt"))
