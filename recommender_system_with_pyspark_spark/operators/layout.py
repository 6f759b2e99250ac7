"""Physical data layout for multi-dimensional scan pruning (north-star
extension: at 100 TB the cheapest byte is the one never read, and parquet
min/max pruning only works if writers cluster the data).

Z-order (Morton) clustering: normalize each clustering column to a
``bits``-wide integer rank, interleave the bits, range-partition + sort by
the interleaved key, write parquet. Files then cover small axis-aligned
rectangles of the (col1, col2, …) space instead of full-width stripes, so
a conjunctive range predicate on ANY subset of the clustered columns
prunes most files/row-groups via footer statistics alone — the same trick
Delta OPTIMIZE ZORDER BY and Iceberg's sort orders apply.

Everything is pure column expressions (bit arithmetic stays in
whole-stage codegen); the only extra cost at write time is one min/max
aggregate over the clustering columns plus the range exchange the write
needed anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
    out_col: str = "_zorder",
) -> DataFrame:
    """Append the Morton key of ``cols``: each column is min/max-normalized
    to an integer in [0, 2^bits) (one broadcast aggregate supplies the
    bounds), then bit j of column i lands at interleaved position
    ``j*len(cols) + i``. Total key width = bits·len(cols) ≤ 63.

    Constant columns (max == min) contribute rank 0 everywhere — harmless.
    Nulls rank 0 (cluster with the minimum; parquet null-count stats still
    prune them) — judged on the DOUBLE-CAST value, so a non-numeric string
    that casts to NULL gets the documented rank-0 treatment instead of
    nulling the whole key (ADVICE r6)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"zorder key would need {n * bits} bits (> 63); "
                         f"lower bits= or cluster fewer columns")
    bounds = df.agg(
        *[F.min(F.col(c).try_cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).try_cast("double")).alias(f"_max_{c}") for c in cols],
    )
    withb = df.crossJoin(F.broadcast(bounds))
    scale = float(2**bits)
    ranks = []
    for c in cols:
        # try_cast: under ANSI mode a plain cast THROWS on malformed
        # strings; the documented contract is rank 0 for anything
        # non-numeric. Single cast: null guard and rank see the same value.
        v = F.col(c).try_cast("double")
        width = F.col(f"_max_{c}") - F.col(f"_min_{c}")  # rank see the same value
        raw = F.floor((v - F.col(f"_min_{c}")) / width * F.lit(scale)).cast("long")
        rank = F.when(
            v.isNull() | (width <= 0), F.lit(0)
        ).otherwise(F.least(F.lit(2**bits - 1), F.greatest(F.lit(0), raw)))
        ranks.append(rank)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, j).bitwiseAND(F.lit(1)), j * n + i)
            )
    return withb.withColumn(out_col, z).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``:
    range-partition into ``n_files`` key ranges (contiguous Z-curve
    segments ⇒ small rectangles per file), sort within each so row-group
    stats are tight too, drop the key, write."""
    keyed = add_zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_overlapping_box(
    path: str, box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files whose column min/max stats intersect the box, total files) —
    the pruning a stats-aware reader achieves on the conjunction of range
    predicates in ``box``. Driver-side metadata walk (parquet footers
    only), used to MEASURE layout quality, not in any query path.

    A row group with missing/disabled statistics (or truncated
    binary min-max) cannot be pruned, so it counts as overlapping —
    the same conservative contract every stats-based reader honors
    (ADVICE r6)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        overlaps = True
        for col, (lo, hi) in box.items():
            if col not in names:
                raise ValueError(
                    f"box column {col!r} not in parquet schema of {f} "
                    f"(columns: {names})"
                )
            idx = names.index(col)
            mins, maxs = [], []
            stats_complete = True
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    stats_complete = False
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if not stats_complete:
                continue  # can't prune on this column; stays 'overlaps'
            if max(maxs) < lo or min(mins) > hi:
                overlaps = False
                break
        hit += int(overlaps)
    return hit, len(files)
