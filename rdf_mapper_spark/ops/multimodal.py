"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
metadata struct; decode / feature-extraction / frame-sampling run as
Arrow-batched `mapInPandas` / pandas-UDF stages.

The decode step is REAL for two kinds — pure-Python codecs with no
external library:

* image: binary PPM (P6) — header parsed, dimensions validated against
  the metadata, raw RGB bytes decoded (``_decode_ppm``);
* audio: RIFF/WAV 16-bit PCM via the stdlib ``wave`` module
  (``_decode_wav``).

Video remains a declared stub (no container/codec format is decodable in
pure Python); its payload passes through and features are byte statistics
of the encoded stream — the honest fallback a real pipeline uses for
fingerprinting undecodable media.

Feature vectors are integer-valued by design (dims, byte/sample sums,
extrema, crossings): exactly representable in float32, so the driver
oracle (__spark_entry__._oracle_multimodal_features) recomputes them
bit-exactly in DuckDB from the same deterministic payload construction.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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

_WAV_RATE = 8000


# ---------------------------------------------------------------------------
# Codecs (encode used by the synthetic fixture; decode by the extractor)
# ---------------------------------------------------------------------------
def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """-> (width, height, raw RGB bytes).  Real parse: magic, whitespace-
    separated dims/maxval (comments allowed), then the binary plane."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = 4 whitespace-separated tokens, '#' comments to end-of-line
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    rgb = payload[pos:pos + w * h * 3]
    if len(rgb) != w * h * 3:
        raise ValueError("truncated pixel plane")
    return w, h, rgb


def encode_wav(samples: list[int], rate: int = _WAV_RATE) -> bytes:
    """16-bit mono PCM RIFF/WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _decode_wav(payload: bytes) -> list[int]:
    """-> int16 samples.  Real parse via the stdlib wave reader."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only 16-bit mono PCM supported")
        raw = wf.readframes(wf.getnframes())
    return list(struct.unpack(f"<{len(raw) // 2}h", raw))


def _digest_tile(key: bytes, length: int) -> bytes:
    """md5(key) tiled to `length` bytes — the deterministic content
    generator shared with the DuckDB oracle."""
    d = hashlib.md5(key).digest()
    return (d * (length // 16 + 1))[:length]


# deterministic fixture dimensions (mirrored in the driver oracle SQL)
def _img_w(media_id: int) -> int:
    return media_id % 32 + 16


_IMG_H = 8


def _n_samples(n_chars: int) -> int:
    return (n_chars % 50 + 10) * 8


def _video_len(n_chars: int) -> int:
    return n_chars % 200 + 16


def synth_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic media table from the documents fixture with REAL
    encoded payloads: P6 PPM images and 16-bit PCM WAV audio whose
    content bytes/samples are md5(text) tiled; video payloads are the
    raw tiled bytes (undecodable by design).  Built in an Arrow-batched
    pandas UDF — the encode cost model of a real ingest."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    mime = F.element_at(
        F.array(F.lit("image/x-portable-pixmap"), F.lit("audio/x-wav"),
                F.lit("application/octet-stream")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )

    @F.pandas_udf(BinaryType())
    def make_payload(kinds: pd.Series, texts: pd.Series,
                     ids: pd.Series, n_chars: pd.Series) -> pd.Series:
        out = []
        for k, t, i, n in zip(kinds, texts, ids, n_chars):
            key = t.encode("utf-8")
            if k == "image":
                w = _img_w(int(i))
                out.append(encode_ppm(
                    w, _IMG_H, _digest_tile(key, w * _IMG_H * 3)))
            elif k == "audio":
                ns = _n_samples(int(n))
                raw = _digest_tile(key, ns * 2)
                out.append(encode_wav(list(struct.unpack(
                    f"<{ns}h", raw))))
            else:
                out.append(_digest_tile(key, _video_len(int(n))))
        return pd.Series(out)

    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        make_payload(kind, F.col(text_col), F.col("doc_id"),
                     F.col("n_chars")).alias("payload"),
        (F.col("doc_id") % 32 + 16).alias("width"),
        F.lit(_IMG_H).cast("long").alias("height"),
        # audio: true duration from the sample count at the fixture rate;
        # video: synthetic 10 ms/char so frame sampling has real spans
        F.when(kind == "audio",
               (((F.col("n_chars") % 50 + 10) * 8) * 1000
                / F.lit(_WAV_RATE)).cast("long"))
        .otherwise(F.col("n_chars") * 10).alias("duration_ms"),
    )


def _feature_vector(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """REAL decode + integer-valued features (exact in float32):

    image  -> [w, h, w*h, sum(bytes), min, max, first, last]
    audio  -> [n, sum(|s|), min, max, sign-crossings, n>0, first, last]
    video  -> [len, sum(bytes), min, max, first, last, 0, 0]  (stub:
              byte stats of the ENCODED stream — no pure-Python video
              codec exists; a real deployment plugs ffmpeg here)
    """
    if kind == "image":
        w, h, rgb = _decode_ppm(payload)
        feats = [w, h, w * h, sum(rgb), min(rgb), max(rgb),
                 rgb[0], rgb[-1]]
    elif kind == "audio":
        s = _decode_wav(payload)
        crossings = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
        feats = [len(s), sum(abs(x) for x in s), min(s), max(s),
                 crossings, sum(1 for x in s if x > 0), s[0], s[-1]]
    else:
        b = payload
        feats = [len(b), sum(b), min(b), max(b), b[0], b[-1], 0, 0]
    return [float(x) for x in feats[:dim]]


def extract_features(media: DataFrame, dim: int = 8,
                     batch_cols: tuple[str, ...] = ("media_id", "kind",
                                                    "payload")) -> DataFrame:
    """mapInPandas decode + feature extraction — the canonical multimodal
    UDF shape.  Arrow delivers whole record batches; the Python loop
    touches each payload once (decode+feature), which is the true cost
    model of media pipelines (CPU-bound per item, not per row-field)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                feats.append(_feature_vector(bytes(payload), kind, dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "feature": feats,
            })

    return media.select(*batch_cols).mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame timestamp
    (video decode stubbed; timestamps are the real scheduling logic)."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id", F.explode(frames).alias("frame_ms")
    )
