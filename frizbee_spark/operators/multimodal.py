"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partition sizing,
mapInPandas signatures) is real and tested. Image decode is REAL for the
formats `functions/imagecodec.py` covers (8-bit PNG via stdlib zlib, all
five scanline filters; binary PPM/PGM) and audio decode is REAL for
canonical RIFF/WAVE PCM + IEEE-float (`functions/audiocodec.py`) — no
external codec needed for either. Formats beyond those (JPEG,
16-bit/palette PNG, MP3/OGG, video) fall back to a deterministic fake or
raise `DecoderNotAvailable`, because their codec libraries are not in
this container; a real deployment swaps `_decode_image` / the WAV decode
for PIL/libvips/soundfile inside the same mapInPandas contract.

Scale notes: binary payloads ride in their own column so Parquet column
pruning skips them unless the stage needs bytes; `maxRecordsPerBatch`
should be lowered (e.g. 256) on tables with MB-scale blobs so Arrow
batches stay within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "DecoderNotAvailable",
    "attach_media_metadata",
    "decode_and_featurize",
    "featurize_audio",
    "sample_video_frames",
]


class DecoderNotAvailable(NotImplementedError):
    """Raised by codec stubs; swap in a real decoder in production."""


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_entropy", FloatType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side cheap metadata: payload size and a magic-byte MIME sniff —
    no decode, no Python."""
    payload = F.col(payload_col)
    hex_prefix = F.hex(F.substring(payload, 1, 4))
    return df.withColumn("n_bytes", F.octet_length(payload)).withColumn(
        "mime_sniffed",
        F.when(hex_prefix.startswith("FFD8"), F.lit("image/jpeg"))
        .when(hex_prefix == "89504E47", F.lit("image/png"))
        .when(hex_prefix.startswith("5036"), F.lit("image/x-portable-pixmap"))
        .when(hex_prefix.startswith("5035"), F.lit("image/x-portable-graymap"))
        .when(hex_prefix.startswith("52494646"), F.lit("audio/wav"))
        .otherwise(F.lit("application/octet-stream")),
    )


def _decode_image(payload: bytes, deterministic_fake: bool) -> np.ndarray:
    """Decode -> (H, W) float32 grayscale. REAL decode for PNG/PPM/PGM
    (pure-Python codec, `functions/imagecodec.py`); other formats fall
    back to a payload-seeded fake 8x8 'image' when `deterministic_fake`
    (so shape/partition logic still runs end-to-end on e.g. JPEG columns
    in this codec-less container) or raise `DecoderNotAvailable`."""
    from ..functions.imagecodec import UnsupportedImage, decode_image

    try:
        img = decode_image(payload)
    except UnsupportedImage:
        if not deterministic_fake:
            raise DecoderNotAvailable(
                "payload is not PNG/PPM and JPEG/audio/video codecs are "
                "not available in this container"
            ) from None
        arr = np.frombuffer(payload[:4096], dtype=np.uint8)
        if len(arr) == 0:
            arr = np.zeros(1, dtype=np.uint8)
        reps = -(-64 // len(arr))
        return np.tile(arr, reps)[:64].reshape(8, 8).astype(np.float32)
    # luminance: ITU-R BT.601 weights for RGB(A); alpha ignored
    img = img.astype(np.float32)
    if img.shape[2] >= 3:
        return img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    return img[:, :, 0]


def decode_and_featurize(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas decode -> feature-extract: (media_id, n_bytes,
    byte_entropy, feature: array<float>).

    Batched over Arrow; the per-item numpy work is the shape a real
    decode+embed stage has (decode bytes -> pixel array -> pooled feature)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, n_bytes, entropies, feats = [], [], [], []
            for media_id, payload in zip(batch[id_col], batch[payload_col]):
                payload = payload or b""
                data = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(data, minlength=256) if len(data) else np.zeros(256)
                p = counts / max(1, counts.sum())
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if len(nz) else 0.0
                img = _decode_image(payload, deterministic_fake)
                pooled = np.resize(img.mean(axis=0), feature_dim).astype(np.float32)
                ids.append(media_id)
                n_bytes.append(len(payload))
                entropies.append(entropy)
                feats.append(pooled.tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": n_bytes,
                    "byte_entropy": np.asarray(entropies, dtype=np.float32),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("duration_ms", LongType(), False),
        StructField("rms", FloatType(), False),
        StructField("zero_crossing_rate", FloatType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def featurize_audio(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    feature_dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas REAL audio decode -> features: duration, RMS level,
    zero-crossing rate, and a `feature_dim`-band temporal RMS envelope.

    Decode is real for canonical RIFF/WAVE PCM + IEEE-float payloads
    (`functions/audiocodec.py`, numpy only — no external audio libs).
    Non-WAV payloads (MP3/OGG/FLAC, whose codecs this container lacks)
    fall back to a payload-seeded fake signal when `deterministic_fake`
    (so partition/batch plumbing still runs end-to-end), else raise
    `DecoderNotAvailable`. A real deployment swaps the decode call for
    soundfile/librosa inside the same mapInPandas contract.

    Scale notes: same blob rules as images — payload rides its own
    pruned column, and `spark.sql.execution.arrow.maxRecordsPerBatch`
    should be lowered on tables with MB-scale audio so Arrow batches
    stay within executor memory."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import UnsupportedAudio, decode_wav

        for batch in batches:
            rows: dict[str, list] = {
                "media_id": [],
                "sample_rate": [],
                "n_frames": [],
                "n_channels": [],
                "duration_ms": [],
                "rms": [],
                "zero_crossing_rate": [],
                "feature": [],
            }
            for media_id, payload in zip(batch[id_col], batch[payload_col]):
                payload = payload or b""
                try:
                    samples, sr = decode_wav(payload)
                except UnsupportedAudio:
                    if not deterministic_fake:
                        raise DecoderNotAvailable(
                            "payload is not canonical WAV and no other "
                            "audio codec is available in this container"
                        ) from None
                    raw = np.frombuffer(payload[:4096], dtype=np.uint8)
                    if len(raw) == 0:
                        raw = np.zeros(64, dtype=np.uint8)
                    samples = ((raw.astype(np.float32) - 128.0) / 128.0)[:, None]
                    sr = 8000
                mono = samples.mean(axis=1) if samples.shape[1] else np.zeros(0)
                rms = float(np.sqrt(np.mean(np.square(mono)))) if len(mono) else 0.0
                zcr = (
                    float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    / max(1, len(mono) - 1)
                    if len(mono) > 1
                    else 0.0
                )
                # temporal RMS envelope: feature_dim equal windows
                edges = np.linspace(0, len(mono), feature_dim + 1, dtype=np.int64)
                sq = np.concatenate(([0.0], np.cumsum(np.square(mono, dtype=np.float64))))
                win = np.maximum(1, np.diff(edges))
                envelope = np.sqrt(np.diff(sq[edges]) / win).astype(np.float32)
                rows["media_id"].append(media_id)
                rows["sample_rate"].append(sr)
                rows["n_frames"].append(len(samples))
                rows["n_channels"].append(samples.shape[1])
                rows["duration_ms"].append(int(round(1000.0 * len(mono) / sr)))
                rows["rms"].append(rms)
                rows["zero_crossing_rate"].append(zcr)
                rows["feature"].append(envelope.tolist())
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(process, AUDIO_FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing: emits up to `max_frames` byte-slices per
    video payload (a real implementation yields decoded keyframes from the
    same mapInPandas contract — one input row fanning out to many rows)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(batch[id_col], batch[payload_col]):
                payload = payload or b""
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)
