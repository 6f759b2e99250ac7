"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — a
first-class connector, not a driver-side DataFrame builder.

``SyntheticRatingsDataSource`` serves the calibrated golden-corpus ratings
(domain/golden.py math) through the planner like any other source:

    spark.dataSource.register(SyntheticRatingsDataSource)
    df = spark.read.format("synthetic_ratings")
         .option("n_ratings", 1_000_000).option("n_users", 21_000)
         .option("n_items", 1_150).load()

Why it exists (beyond exercising the connector API the reference never
had): partition planning happens in ``partitions()`` — the row-id range is
split into ``num_partitions`` slices, each read task generates only its
slice, so the source scales out exactly like a parquet scan (no driver
materialization, no single-task bottleneck). The same numbers as
domain/golden.py fall out because the per-row math is the same pure
function of (row id, seed) — deterministic across partitionings by
construction.

This is the template for real custom connectors (REST cursors, message
queues, proprietary formats): implement ``schema``/``partitions``/``read``
and the engine's planner handles distribution, projection, and downstream
shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRatingsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_ratings = int(options.get("n_ratings", 100_000))
        self.n_users = int(options.get("n_users", 2_100))
        self.n_items = int(options.get("n_items", 115))
        self.seed = int(options.get("seed", 1))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        n_parts = max(1, min(self.num_partitions, self.n_ratings))
        bounds = [round(i * self.n_ratings / n_parts) for i in range(n_parts + 1)]
        return [_Slice(a, b) for a, b in zip(bounds, bounds[1:]) if b > a]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        # numpy-vectorized slice generation: same (id, seed) -> rating math
        # as domain/golden.py, so this source and spark.range-based
        # generation agree row for row
        import numpy as np

        from ..domain import golden as G

        ids = np.arange(partition.start, partition.end, dtype=np.int64)

        import hashlib

        def u(tag: str, base: np.ndarray) -> np.ndarray:
            # xxhash64 isn't available Python-side; use the same fold shape
            # over a different 64-bit mix — determinism and uniformity are
            # what matter for a SOURCE (cross-engine equality is pinned by
            # the parquet-backed oracles, not this connector). The tag salt
            # comes from md5, NOT Python's hash() — hash() is randomized
            # per process (PYTHONHASHSEED) and would silently break
            # cross-run determinism
            salt = int.from_bytes(hashlib.md5(tag.encode()).digest()[:4], "little")
            h = (base * np.int64(-7046029254386353131) + np.int64(salt)
                 + np.int64(self.seed)) & np.int64(0x7FFFFFFFFFFFFFFF)
            h ^= h >> 33
            h = (h * np.int64(-4417276706812531889)) & np.int64(0x7FFFFFFFFFFFFFFF)
            h ^= h >> 29
            return ((h % np.int64(1 << 31)).astype(np.float64) + 0.5) / float(1 << 31)

        def gauss(tag: str, base: np.ndarray) -> np.ndarray:
            u1, u2 = u(tag + ":1", base), u(tag + ":2", base)
            return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)

        users = (ids * np.int64(2654435761) + self.seed) % self.n_users
        items = np.minimum(
            (u("item", ids) ** 1.4 * self.n_items).astype(np.int64), self.n_items - 1
        )
        dot = np.zeros(len(ids))
        for k in range(G.CALIB_TRUE_RANK):
            dot += gauss(f"p{k}", users) * gauss(f"q{k}", items)
        rating = (
            G.CALIB_MU
            + G.CALIB_BIAS_U_STD * gauss("bu", users)
            + G.CALIB_BIAS_I_STD * gauss("bi", items)
            + (G.CALIB_SIGNAL_STD / G.CALIB_TRUE_RANK ** 0.5) * dot
            + G.CALIB_NOISE_STD * gauss("n", ids)
        )
        rating = np.round(rating, 1)
        for uid, iid, r in zip(users.tolist(), items.tolist(), rating.tolist()):
            yield (uid, iid, r)


class SyntheticRatingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_ratings"

    def schema(self) -> str:
        return "user_id long, item_id long, rating double"

    def reader(self, schema) -> SyntheticRatingsReader:
        return SyntheticRatingsReader(self.options)
