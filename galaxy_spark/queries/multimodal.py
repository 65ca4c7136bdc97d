"""Multimodal-column queries (driver mandate, SURVEY.md §2.2):
image/audio/video as opaque binary + typed metadata, processed by
Arrow-batched ``mapInPandas`` stages (galaxy_spark.operators.
multimodal).

Oracle strategy: the test-harness media table is synthesized
deterministically from ``documents`` (payload = utf-8 bytes of the
text, which the fixture generator keeps pure-ASCII), so DuckDB can
reproduce the fake decode byte-for-byte with ``ord(substr(...))``
— giving the Python-side mapInPandas plumbing a full value-level
oracle, not just a rows-only check. Sums are over exact integers
(byte values < 128), so double-precision folds agree bit-for-bit
across engines before rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from galaxy_spark.operators import multimodal as mm
from galaxy_spark.registry import register
from galaxy_spark.tables import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return mm.synthesize_media(docs)


# DuckDB mirror of synthesize_media's modality/dimension assignment
_MEDIA_CTE = """
    media AS (
        SELECT doc_id AS media_id, text,
               CAST(length(text) AS INTEGER) AS plen,
               ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1]
                 AS modality
        FROM documents
    )
"""


@register(
    "multimodal_inventory",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT modality, COUNT(*) AS n_items,
           CAST(SUM(plen) AS BIGINT) AS total_bytes,
           CAST(MAX(plen) AS INTEGER) AS max_bytes
    FROM media GROUP BY modality
    """,
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality inventory over the typed-metadata column — the
    pure column-algebra tier (no Python exchange; payload bytes are
    never decoded, and column pruning keeps them out of the scan)."""
    media = _media(spark, sf_dir)
    return (
        media.groupBy(F.col("meta.modality").alias("modality"))
        .agg(F.count("*").alias("n_items"),
             F.sum(F.length("payload")).alias("total_bytes"),
             F.max(F.length("payload")).cast("int").alias("max_bytes"))
    )


@register(
    "multimodal_image_features",
    oracle=f"""
    WITH {_MEDIA_CTE},
    dims AS (
        SELECT media_id, text,
               CAST(least(plen, 16) AS INTEGER) AS w,
               CAST(floor(plen / 16) AS INTEGER) AS h
        FROM media WHERE modality = 'image' AND floor(plen / 16) > 0
    ), px AS (
        SELECT media_id, h, w,
               list_transform(range(1, h * w + 1),
                   i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1))
                             AS DOUBLE)) AS p
        FROM dims
    )
    SELECT media_id,
           ROUND(list_sum(p) / (h * w), 4) AS mean_px,
           ROUND(sqrt(list_sum(list_transform(p, x -> x * x)) / (h * w)
                      - (list_sum(p) / (h * w)) * (list_sum(p) / (h * w))),
                 4) AS std_px,
           CAST(list_min(p) AS INTEGER) AS min_px,
           CAST(list_max(p) AS INTEGER) AS max_px
    FROM px
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode image payloads (Arrow-batched mapInPandas) and extract
    per-image intensity features. Value-level oracle: the fake
    decoder is byte-deterministic and the feature sums are exact
    integer folds (see module docstring)."""
    decoded = mm.decode_images(_media(spark, sf_dir))
    feats = mm.image_features(decoded)
    return feats.select(
        "media_id",
        F.round("mean_px", 4).alias("mean_px"),
        F.round("std_px", 4).alias("std_px"),
        "min_px", "max_px")


@register(
    "multimodal_audio_features",
    oracle=f"""
    WITH {_MEDIA_CTE},
    wav AS (
        SELECT media_id, plen,
               list_transform(range(1, plen + 1),
                   i -> CAST(ord(substr(text, CAST(i AS INTEGER), 1))
                             AS DOUBLE)) AS w
        FROM media WHERE modality = 'audio'
    )
    SELECT media_id, plen AS n_samples,
           ROUND(sqrt(list_sum(list_transform(w, x -> x * x)) / plen), 4)
             AS rms,
           0 AS zero_crossings
    FROM wav
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RMS + zero-crossing features over the int8-waveform view
    of the payload. ASCII payload bytes are all positive, so the
    oracle's zero-crossing count is the constant 0 — the Spark side
    must agree, which exercises the signbit logic end-to-end."""
    feats = mm.audio_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "n_samples",
        F.round("rms", 4).alias("rms"), "zero_crossings")


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH {_MEDIA_CTE},
    vids AS (
        SELECT media_id, text,
               CAST(floor(plen / 64) AS INTEGER) AS n_frames
        FROM media WHERE modality = 'video'
    ), frames AS (
        SELECT media_id,
               CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx,
               text
        FROM vids WHERE n_frames > 0
    )
    SELECT media_id, frame_idx,
           md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 4th fixed-size frame from video payloads via the
    fan-out mapInPandas stage; frames are compared by md5 so the
    oracle checks exact byte content without shipping blobs."""
    frames = mm.sample_frames(_media(spark, sf_dir), every_k=4,
                              frame_bytes=64)
    return frames.select(
        "media_id", "frame_idx", F.md5("frame").alias("frame_md5"))


@register(
    "multimodal_video_metadata",
    oracle=f"""
    WITH {_MEDIA_CTE}
    SELECT media_id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
           CAST(plen AS BIGINT) AS duration_ms, 1 AS n_tracks,
           'avc1' AS codec, 8 AS width, 8 AS height,
           100 AS codec_profile, 41 AS codec_level,
           4 AS nal_length_size,
           CAST(plen AS BIGINT) AS mdat_bytes
    FROM media WHERE modality = 'video'
    """,
)
def multimodal_video_metadata(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF container parsing through genuine Spark binary
    columns: each video payload is wrapped into a spec-layout mp4
    (``build_mp4``: ftyp + moov/mvhd/trak/tkhd/mdhd/hdlr/stbl/stsd
    + mdat) in one Arrow stage, then PARSED back by the real box
    walker (``parse_mp4``) in another — brand, movie timescale and
    duration, track count, sample-entry codec, tkhd dimensions,
    avcC codec config (profile/level/NAL length size — r9, still
    container metadata, not bitstream), and mdat byte accounting.
    Algorithm-mirroring oracle: the synthesis parameters are
    deterministic functions of the row (duration = payload length
    ms, 8x8 avc1 High@4.1), so DuckDB states the expected metadata
    without parsing — any misread field in the parser breaks the
    hash. Codec-bitstream decode is the one remaining
    honest refusal (``real_decode``).

    Shape at scale: two shuffle-free scan-parallel mapInPandas
    stages; container parsing touches headers, never sample data,
    so bytes-per-row work is O(box tree), not O(payload)."""
    vids = _media(spark, sf_dir).filter(
        F.col("meta.modality") == "video")
    return mm.video_container_metadata(mm.wrap_mp4(vids))


@register(
    "multimodal_resize_pipeline",
    oracle=f"""
    WITH {_MEDIA_CTE},
    dims AS (
        SELECT media_id, text,
               CAST(least(plen, 16) AS INTEGER) AS w,
               CAST(floor(plen / 16) AS INTEGER) AS h
        FROM media WHERE modality = 'image' AND floor(plen / 16) > 0
    ), px AS (
        -- nearest-neighbor 8x8 resample: src index (r*h//8, c*w//8)
        SELECT media_id,
               flatten(list_transform(range(0, 8), r ->
                   list_transform(range(0, 8), c ->
                       CAST(ord(substr(text,
                           CAST((r * h // 8) * w + (c * w // 8) + 1
                                AS INTEGER), 1)) AS DOUBLE)))) AS p
        FROM dims
    )
    SELECT media_id,
           ROUND(list_sum(p) / 64, 4) AS mean_px,
           ROUND(sqrt(list_sum(list_transform(p, x -> x * x)) / 64
                      - (list_sum(p) / 64) * (list_sum(p) / 64)), 4)
             AS std_px,
           CAST(list_min(p) AS INTEGER) AS min_px,
           CAST(list_max(p) AS INTEGER) AS max_px
    FROM px
    """,
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize(8x8) → feature pipeline chained across three
    mapInPandas stages (the shape a real embedding pipeline takes).
    Value-level oracle: nearest-neighbor resampling is pure index
    arithmetic over the deterministic fake-decoded bytes, so DuckDB
    reproduces the resized tensor exactly."""
    media = _media(spark, sf_dir)
    resized = mm.resize_images(mm.decode_images(media), 8, 8)
    feats = mm.image_features(resized)
    return feats.select(
        "media_id",
        F.round("mean_px", 4).alias("mean_px"),
        F.round("std_px", 4).alias("std_px"),
        "min_px", "max_px")
