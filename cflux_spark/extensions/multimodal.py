"""Multimodal column plumbing (SURVEY.md §2.13 X5).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side contract — schema, batch iteration via
``mapInPandas`` (Arrow), partition sizing — is real and tested; the
actual media decode is stubbed behind ``DECODERS`` because the
image/audio libraries are not in this container (clearly marked; a
deployment swaps in PIL/librosa/av implementations).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def _fake_feature(content: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode→embed step.

    STUB: real deployments replace this with actual decode (PIL /
    librosa / av). Derives a stable pseudo-feature from the bytes so
    the pipeline shape (binary in → float vector out) is exercised
    honestly."""
    if content is None:
        return [0.0] * dim
    h = 1469598103934665603  # FNV-1a 64
    out = []
    for i in range(dim):
        for b in content[i :: dim] or b"\x00":
            h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
        out.append(((h % 2_000_001) - 1_000_000) / 1_000_000.0)
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary columns.

    The mapInPandas iterator shape means one Python worker sees a
    whole Arrow batch — at scale, batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch, and media blobs
    should be size-capped per row (store pointers for large assets)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)).astype("int32"),
                    "feature": pdf["content"].map(lambda c: _fake_feature(c, dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB — image decode requires PIL/libvips, not in this container."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; extract_features() demonstrates the Spark plumbing"
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB — video frame sampling requires av/ffmpeg bindings."""
    raise NotImplementedError(
        "video frame sampling requires av/ffmpeg, not present in this "
        "environment; extract_features() demonstrates the Spark plumbing"
    )


def attach_media_stub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: text bytes as
    the binary payload (deterministic), typed metadata attached."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
