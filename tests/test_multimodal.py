"""Multimodal binary-column plumbing tests (codec stubbed per container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from recommender_system_with_pyspark_spark.operators import multimodal as M


def test_documents_as_media_schema(spark, sf_tiny):
    from recommender_system_with_pyspark_spark.io import load_table

    docs = load_table(spark, sf_tiny, "documents")
    media = M.documents_as_media(docs)
    assert dict(media.dtypes)["media"] == "binary"
    assert "meta" in media.columns
    assert media.count() == docs.count()


def test_extract_byte_features_consistency(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "")], "doc_id long, text string")
    media = M.documents_as_media(df)
    feats = M.extract_byte_features(media, n_bins=4)
    got = {r["media_id"]: r for r in feats.collect()}
    assert got[1]["n_bytes"] == 4
    assert got[2]["n_bytes"] == 0
    assert len(got[1]["histogram"]) == 4
    assert sum(got[1]["histogram"]) == 4
    assert got[1]["byte_entropy"] >= 0.0


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), ("video/mp4", None, None, 3500))],
        M.MEDIA_SCHEMA,
    )
    out = M.frame_sample(df, every_ms=1000)
    ts = [r["frame_ts_ms"] for r in out.collect()]
    assert ts == [0, 1000, 2000, 3000]
