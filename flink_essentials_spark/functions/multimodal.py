"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are ``binary`` columns with a ``modality`` tag and a
metadata struct (schemas.MEDIA_SCHEMA). The Spark-side plumbing —
schema, partitioning, Arrow batch shape, UDF signatures — is real and
tested; the actual codec work (JPEG decode, resampling, frame
extraction) is STUBBED because no media libraries exist in this
image: ``decode_media`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic hash-derived feature
vector so downstream pipeline stages are exercisable end-to-end.

Scale notes: payloads ride in parquet binary columns; feature
extraction is ``mapInPandas`` (Arrow-batched, per-partition codec
init via the iterator form); never collect payloads to the driver.
Batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch
— lower it for large payloads to bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_essentials_spark.schemas import MEDIA_SCHEMA

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, payload_md5 string, "
    f"features array<double>"
)


def synthetic_media(spark: SparkSession, source_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text corpus: payload =
    utf-8 bytes of the text (a stand-in blob), metadata from lengths."""
    return source_df.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.struct(
            (F.length(text_col) % 640).cast("int").alias("width"),
            (F.length(text_col) % 480).cast("int").alias("height"),
            (F.length(text_col).cast("long") * 100).alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-feature vector."""
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_media(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads → feature vectors via Arrow-batched mapInPandas.

    Real codecs are not available in this environment; ``fake=True``
    runs the deterministic stand-in (same schema, same batch shape) so
    the pipeline is testable. The real implementation plugs a codec
    call into exactly this iterator body.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init hook (codec contexts would be opened here)
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs (image/audio/video) are not available in "
                    "this image; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": payloads.map(lambda b: _fake_features(bytes(b))),
                }
            )

    return df.mapInPandas(op, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, modality string, width int, height int, payload binary"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, frame_md5 string"


def resize_images(
    df: DataFrame, width: int, height: int, *, fake: bool = False
) -> DataFrame:
    """Image resize over Arrow batches (STUB — no codec libs in this
    image). ``fake=True`` substitutes a deterministic payload derived
    from (md5, target dims) with correct metadata, so partitioning,
    batch shape and schema are exercised end-to-end; a real
    implementation replaces only the marked line with a PIL/opencv
    call."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable; pass fake=True for the stub"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    # real impl: decode → resize → re-encode HERE
                    "payload": pdf["payload"].map(
                        lambda b: hashlib.md5(
                            bytes(b) + f"{width}x{height}".encode()
                        ).digest()
                    ),
                }
            )
            yield out

    return df.filter(F.col("modality") == "image").mapInPandas(
        op, schema=RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_ms: int = 1000, *, fake: bool = False
) -> DataFrame:
    """Video frame sampling (STUB): one output row per sampled frame,
    frame count derived from real metadata (duration_ms / every_ms).
    1→N expansion inside the Arrow batch — the shape a real ffmpeg
    call produces."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable; pass fake=True for the stub"
                )
            rows = []
            for r in pdf.itertuples():
                n = max(1, int(r.meta["duration_ms"] // every_ms))
                for i in range(min(n, 100)):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            # real impl: decode frame i*every_ms HERE
                            "frame_md5": hashlib.md5(
                                bytes(r.payload) + i.to_bytes(4, "big")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return df.filter(F.col("modality") == "video").mapInPandas(
        op, schema=FRAMES_SCHEMA
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Payload stats with pure Column expressions (no Python): size and
    content hash per item — the JVM-side fast path for audits."""
    return df.select(
        "media_id",
        "modality",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
