"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched `mapInPandas` stages. The decode libraries are not in this
container, so the decode step is STUBBED (deterministic fake features with a
clearly marked NotImplementedError escape hatch) — the Spark-side plumbing
(schema, batch shape, partition behavior) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),   # opaque encoded bytes
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents fixture: the text
    bytes stand in for an encoded payload."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.col("n_chars") % 1920).alias("width"),
        (F.col("n_chars") % 1080).alias("height"),
        (F.col("n_chars") * 10).alias("duration_ms"),
    )


def _decode(payload: bytes, kind: str) -> bytes:
    """Decode stub. Real deployments plug PIL/ffmpeg here."""
    if payload is None:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; payloads must be non-null fake media"
        )
    return payload  # fake media: payload IS the decoded content


def _feature_vector(decoded: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor: md5-derived unit-scale floats."""
    h = hashlib.md5(decoded).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8,
                     batch_cols: tuple[str, ...] = ("media_id", "kind",
                                                    "payload")) -> DataFrame:
    """mapInPandas feature extraction — the canonical multimodal UDF shape.

    Arrow delivers whole record batches; the python loop touches each
    payload once (decode+feature), which is the true cost model of media
    pipelines (CPU-bound per item, not per row-field)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                decoded = _decode(bytes(payload), kind)
                feats.append(_feature_vector(decoded, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "feature": feats,
            })

    return media.select(*batch_cols).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp
    (decode stubbed; timestamps are the real scheduling logic)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(frames).alias("frame_ms")
    )
