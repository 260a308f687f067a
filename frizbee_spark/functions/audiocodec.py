"""Pure-Python WAV (RIFF/WAVE) codec — stdlib struct + numpy only.

Exists so the multimodal audio operators can decode REAL bytes end-to-end
in environments without soundfile/librosa (this container): `decode_wav`
understands canonical RIFF/WAVE files carrying PCM integer samples
(8/16/24/32-bit) or IEEE float32/float64, any channel count, and returns
`(samples, sample_rate)` with samples as float32 in [-1, 1] shaped
(n_frames, n_channels). `encode_wav` produces spec-conformant 16-bit PCM
files for round-trip tests and synthetic fixtures.

Format per the public RIFF/WAVE spec (Microsoft/IBM 1991; identical
framing to RFC 2361's registry): little-endian chunk stream, `fmt `
chunk (format tag 1 = PCM, 3 = IEEE float, 0xFFFE = extensible with the
real tag in the GUID), `data` chunk of interleaved frames.

Deliberately unsupported (raise `UnsupportedAudio`, callers fall back or
skip): compressed format tags (ADPCM, mu-law, MP3-in-WAV), malformed
chunk streams — the goal is a correct, honest decoder for the canonical
PCM case, not a general audio library.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["UnsupportedAudio", "decode_wav", "encode_wav"]


class UnsupportedAudio(ValueError):
    """Payload is not a WAV variant this pure-Python codec handles."""


_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _chunks(data: bytes):
    """Yield (chunk_id, body) over a RIFF chunk stream (after the 12-byte
    RIFF/WAVE header). Chunk bodies are word-aligned: odd sizes carry one
    pad byte that is not part of the body."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise UnsupportedAudio("truncated WAV chunk")
        yield cid, body
        pos += 8 + size + (size & 1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload -> (float32 samples (frames, channels)
    in [-1, 1], sample_rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedAudio("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for cid, body in _chunks(payload):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise UnsupportedAudio("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == _WAVE_FORMAT_EXTENSIBLE:
                # real format tag is the first word of the SubFormat GUID
                if len(body) < 40:
                    raise UnsupportedAudio("short WAVE_FORMAT_EXTENSIBLE fmt")
                (sub_tag,) = struct.unpack("<H", body[24:26])
                fmt = (sub_tag,) + fmt[1:]
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise UnsupportedAudio("WAV missing fmt or data chunk")
    tag, n_channels, sample_rate, _byte_rate, block_align, bits = fmt
    if n_channels < 1 or sample_rate < 1:
        raise UnsupportedAudio("invalid channel count or sample rate")

    if tag == _WAVE_FORMAT_PCM and bits == 8:
        # 8-bit PCM is unsigned per spec
        samples = data_arr = np.frombuffer(data, dtype=np.uint8)
        samples = (data_arr.astype(np.float32) - 128.0) / 128.0
    elif tag == _WAVE_FORMAT_PCM and bits == 16:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.float32) / 32768.0
    elif tag == _WAVE_FORMAT_PCM and bits == 24:
        raw = np.frombuffer(
            data[: len(data) - (len(data) % 3)], dtype=np.uint8
        ).reshape(-1, 3)
        # little-endian 24-bit two's complement -> int32 (sign-extended)
        as32 = (
            raw[:, 0].astype(np.uint32)
            | (raw[:, 1].astype(np.uint32) << 8)
            | (raw[:, 2].astype(np.uint32) << 16)
        )
        as32 = np.where(as32 & 0x800000, as32 | 0xFF000000, as32)
        samples = as32.astype(np.uint32).view(np.int32).astype(np.float32)
        samples /= 8388608.0
    elif tag == _WAVE_FORMAT_PCM and bits == 32:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 4)], dtype="<i4"
        ).astype(np.float32) / 2147483648.0
    elif tag == _WAVE_FORMAT_IEEE_FLOAT and bits == 32:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 4)], dtype="<f4"
        ).astype(np.float32)
    elif tag == _WAVE_FORMAT_IEEE_FLOAT and bits == 64:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 8)], dtype="<f8"
        ).astype(np.float32)
    else:
        raise UnsupportedAudio(
            f"unsupported WAV format tag={tag} bits={bits} "
            "(only canonical PCM / IEEE float)"
        )

    n_frames = len(samples) // n_channels
    return samples[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate


def encode_wav(
    samples: np.ndarray, sample_rate: int
) -> bytes:
    """Encode float samples in [-1, 1] (frames,) or (frames, channels) as
    canonical 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (frames,) or (frames, channels)")
    n_frames, n_channels = arr.shape
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        _WAVE_FORMAT_PCM,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
