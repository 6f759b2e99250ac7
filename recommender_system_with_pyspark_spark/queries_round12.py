"""Round-12 query surface.

- ``multimodal_mp3_layer_census`` (VERDICT r11 #8) — the Layer I/II/III
  MPEG-audio census: crawled audio contains Layer II (and the odd Layer
  I broadcast rip), and the round-11 walker stopped at the first
  non-Layer-III header. The round-12 walker carries per-(version, layer)
  bitrate tables and the Layer-I slots-of-4 frame-length rule; this
  entry drives all NINE version × layer combinations through the walker
  and aggregates the census per (version, layer) with every statistic a
  closed form of the document text that DuckDB recomputes. A wrong
  Layer-II bitrate row, a Layer-I slot-arithmetic slip (the walk would
  desync and the frame count collapses), a samples/frame mix-up (384 vs
  1152 vs 576 — duration breaks), or a Xing frame wrongly attached to a
  Layer I/II stream all break the hash.
The recall-targeting helper (VERDICT r11 #2) surfaces through the
round-11 ``hard_negative_mining_indexed`` entry (its ``ivf_selected``
row) — its prediction theory (recall@p = probed-cell hit rate of the
true top-k) is pinned by pytest invariants in ``tests/test_round12.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .queries_round11 import _V2_KBPS, _VBR_CHAR_LIST
from .registry import query

# Layer I/II bitrate tables as DuckDB list literals (kbps, index 1..14).
_V1_L1_KBPS = "[32,64,96,128,160,192,224,256,288,320,352,384,416,448]"
_V1_L2_KBPS = "[32,48,56,64,80,96,112,128,160,192,224,256,320,384]"
_V2_L1_KBPS = "[32,48,56,64,80,96,112,128,144,160,176,192,224,256]"
_V1_L3_KBPS = "[32,40,48,56,64,80,96,112,128,160,192,224,256,320]"

_CENSUS_FRAMES = 24


@query(
    "multimodal_mp3_layer_census",
    oracle=f"""
    WITH v AS (
        SELECT doc_id AS media_id, {_VBR_CHAR_LIST} AS cs
        FROM documents
        WHERE length(text) > 0
          AND NOT regexp_matches(text, '[^\\x01-\\x7f]')
    ), b AS (
        SELECT media_id, cs[1] % 3 AS sel, cs[2] % 3 AS lsel, cs[1] AS c0,
               CASE
                   WHEN cs[1] % 3 = 0 AND cs[2] % 3 = 0
                       THEN [{_V1_L3_KBPS}[1 + (c % 14)] for c in cs]
                   WHEN cs[1] % 3 = 0 AND cs[2] % 3 = 1
                       THEN [{_V1_L2_KBPS}[1 + (c % 14)] for c in cs]
                   WHEN cs[1] % 3 = 0
                       THEN [{_V1_L1_KBPS}[1 + (c % 14)] for c in cs]
                   WHEN cs[2] % 3 = 2
                       THEN [{_V2_L1_KBPS}[1 + (c % 14)] for c in cs]
                   ELSE [{_V2_KBPS}[1 + (c % 14)] for c in cs]
               END AS kbps
        FROM v
    ), f AS (
        SELECT media_id,
               CASE sel WHEN 0 THEN '1' WHEN 1 THEN '2' ELSE '2.5' END AS mpeg_version,
               CASE lsel WHEN 0 THEN 'III' WHEN 1 THEN 'II' ELSE 'I' END AS mpeg_layer,
               round({_CENSUS_FRAMES} *
                     (CASE WHEN lsel = 2 THEN 384
                           WHEN lsel = 1 THEN 1152
                           WHEN sel = 0 THEN 1152 ELSE 576 END) * 1000.0
                     / (CASE sel WHEN 0 THEN 44100 WHEN 1 THEN 22050 ELSE 11025 END),
                     3) AS duration_ms,
               list_sum(kbps) AS kbps_sum,
               len(list_distinct(kbps)) = 1 AS is_cbr,
               (c0 % 2 = 1) AS has_id3,
               (lsel = 0) AS xing_ok
        FROM b
    )
    SELECT mpeg_version, mpeg_layer,
           COUNT(*) AS n_files,
           CAST(COUNT(*) * {_CENSUS_FRAMES} AS BIGINT) AS frames_total,
           MIN(duration_ms) AS file_duration_ms,
           CAST(SUM(kbps_sum) AS BIGINT) AS kbps_total,
           CAST(SUM(CASE WHEN is_cbr THEN 1 ELSE 0 END) AS BIGINT) AS n_cbr,
           CAST(SUM(CASE WHEN has_id3 THEN 1 ELSE 0 END) AS BIGINT) AS n_id3,
           CAST(SUM(CASE WHEN xing_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_xing_match
    FROM f
    GROUP BY mpeg_version, mpeg_layer
    ORDER BY mpeg_version, mpeg_layer
    """,
)
def multimodal_mp3_layer_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(MPEG version, layer) corpus census through the layer-aware
    walker: file/frame counts, the (constant-within-group) file duration,
    the total encoded kbps mass, and CBR/ID3/Xing tallies. Documents
    become mixed Layer I/II/III streams (``mix_layers=True`` — second
    cycled byte selects the layer, so all nine combinations appear);
    Layer I/II files carry no Xing frame (a Layer III structure), which
    the n_xing_match column pins. Per-file kbps sums are recovered
    exactly from the audited mean (``round(mean · n_frames)`` — the 6dp
    mean rounding error times 24 frames stays below 0.5), so the
    aggregate is integer-stable across engines and row orders. ASCII-only
    invariant enforced on both sides (the fixture cycles UTF-8 bytes, the
    oracle cycles codepoints)."""
    from .operators import multimodal as M

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & ~F.col("text").rlike("[^\\x01-\\x7f]")
    )
    media = M.text_to_mp3_vbr_media(docs, n_frames=_CENSUS_FRAMES, mix_layers=True)
    audit = M.mp3_vbr_audit(media)
    return (
        audit.groupBy("mpeg_version", "mpeg_layer")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_frames").cast("long").alias("frames_total"),
            F.min("duration_ms").alias("file_duration_ms"),
            F.sum(F.round(F.col("mean_bitrate_kbps") * F.col("n_frames")).cast("long"))
            .alias("kbps_total"),
            F.sum(F.col("is_cbr").cast("int")).cast("long").alias("n_cbr"),
            F.sum(F.col("has_id3").cast("int")).cast("long").alias("n_id3"),
            F.sum(F.when(F.col("xing_match"), 1).otherwise(0)).cast("long")
            .alias("n_xing_match"),
        )
        .orderBy("mpeg_version", "mpeg_layer")
    )
