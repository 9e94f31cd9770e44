"""Multimodal-column queries — binary payloads with typed metadata, decoded
(deterministic fake codec) and feature-extracted through Arrow-batched
``mapInPandas``.

Payloads are the UTF-8 bytes of ``documents.text`` (ASCII corpus), so the
DuckDB oracle can verify the byte-level features with codepoint arithmetic —
the full binary plumbing is hash-checked even though the codec is a stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bakery_big_data_spark.operators.multimodal import (
    attach_media_columns,
    audio_window_rms,
    frame_sample,
    image_features,
)
from bakery_big_data_spark.plans.base import register, t


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return attach_media_columns(
        t(spark, sf_dir, "documents"), text_col="text", id_col="doc_id"
    )


@register(
    "multimodal_image_features",
    """
    SELECT doc_id AS media_id,
           len(cs) AS n_bytes,
           CAST(list_sum(list_transform(cs, c -> unicode(c))) AS BIGINT)
             AS byte_checksum,
           CAST(list_sum(list_transform(cs, c -> unicode(c))) AS DOUBLE)
             / len(cs) AS mean_byte,
           16 AS fake_width,
           CAST(CEIL(len(cs) / 16.0) AS INT) AS fake_height
    FROM (
      SELECT doc_id, list_filter(string_split(text, ''), c -> c <> '') AS cs
      FROM documents
    )
    """,
    doc="Binary-column feature extraction via Arrow mapInPandas (size, "
        "checksum, mean sample, fake-decode grid dims); codec stubbed with a "
        "deterministic byte decoder, plumbing hash-verified through the "
        "ASCII-payload oracle",
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_features(_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(f AS INT) AS frame_idx,
           CAST(len(chunk) AS INT) AS frame_len,
           CAST(list_sum(list_transform(
             list_filter(string_split(chunk, ''), c -> c <> ''),
             c -> unicode(c))) AS BIGINT) AS frame_checksum
    FROM (
      SELECT doc_id, f, substring(text, CAST(f * 256 + 1 AS INT), 256) AS chunk
      FROM documents,
           UNNEST(generate_series(0, CAST(CEIL(len(text) / 256.0) AS INT) - 1, 4)) AS u(f)
    )
    WHERE len(chunk) > 0
    """,
    doc="Video frame sampling shape: every 4th fixed-size 256-byte frame per "
        "payload — one-to-many mapInPandas expansion, map-only at any scale",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(_media(spark, sf_dir), frame_bytes=256, every=4)


@register(
    "multimodal_audio_window_rms",
    """
    SELECT doc_id AS media_id,
           CAST(w AS INT) AS window_idx,
           sqrt(CAST(list_sum(list_transform(cs_w, c -> unicode(c) * unicode(c)))
                AS DOUBLE) / len(cs_w)) AS rms
    FROM (
      SELECT doc_id, w,
             list_slice(cs, CAST(w * 100 + 1 AS INT), CAST(w * 100 + 100 AS INT)) AS cs_w
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ''), c -> c <> '') AS cs
            FROM documents),
           UNNEST(generate_series(0, CAST(CEIL(len(cs) / 100.0) AS INT) - 1)) AS u(w)
    )
    WHERE len(cs_w) > 0
    """,
    doc="Audio windowed RMS over fake-PCM byte samples (100-sample windows): "
        "integer-exact sums of squares, one sqrt per window, Arrow-batched",
)
def multimodal_audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_window_rms(_media(spark, sf_dir), window=100)
