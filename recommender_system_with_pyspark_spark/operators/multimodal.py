"""Multimodal column operators (north-star extension).

Media (image/audio/video) is modeled as opaque ``binary`` columns plus a
typed metadata struct — the Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested; the actual codec calls are
stubbed behind ``NotImplementedError`` / a deterministic fake because the
image/audio libraries are not in this container.

Scale notes: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
small enough that a batch of decoded frames fits executor memory, and always
``mapInPandas`` (Arrow batch streaming, constant memory) rather than
collect-and-loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, byte_entropy double, histogram array<long>"


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document bodies as binary media rows (the container
    has no real image/audio fixtures; the binary plumbing is identical)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(data: bytes) -> "object":
    """STUB — real deployments plug in PIL/libvips here. The container has
    no image codecs; the Spark-side batch plumbing is what's under test."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this "
        "container; use extract_byte_features for the plumbing-level path"
    )


def extract_byte_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas:
    byte length, byte-level entropy, and an n-bin byte histogram.

    Deterministic stand-in for a real decode→embed stage — exercises the
    exact batch shape (iterator of pandas DataFrames in/out), schema, and
    partition behavior a neural feature extractor would use.

    Per-blob work is fully numpy-vectorized (``np.frombuffer`` +
    ``np.bincount``) — no per-byte Python loop, so throughput scales with
    blob size at memory bandwidth, not interpreter speed."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                n = int(arr.size)
                counts = np.bincount((arr.astype(np.int32) * n_bins) >> 8, minlength=n_bins)
                if n:
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                out.append((mid, n, round(entropy, 6), counts.tolist()))
            yield pd.DataFrame(out, columns=["media_id", "n_bytes", "byte_entropy", "histogram"])

    return df.select("media_id", "media").mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB shape for video frame sampling: emits (media_id, frame_ts_ms)
    plan rows from metadata without decoding — the decode step itself would
    slot into the same mapInPandas pattern as extract_byte_features."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
