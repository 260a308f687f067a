"""Pure-Python image codecs (PNG + binary PPM) — stdlib zlib + numpy only.

Exists so the multimodal operators can decode REAL bytes end-to-end in
environments without PIL/libvips (this container): `decode_image`
understands 8-bit PNG (grayscale / gray+alpha / RGB / RGBA, all five
scanline filters, non-interlaced) and binary PPM (P6) / PGM (P5).
`encode_png` / `encode_ppm` produce spec-conformant files for round-trip
tests and synthetic fixtures.

PNG per RFC 2083 (public spec): chunk framing, zlib-compressed IDAT,
per-scanline filters None/Sub/Up/Average/Paeth. The filter undo loops
over scanlines (inherently sequential in the Up/Average/Paeth
dependencies) but vectorizes across each row's bytes with numpy where
the recurrence allows (None/Up fully; Sub/Average/Paeth run per-pixel
across the row's channel lanes).

Deliberately unsupported (raise `UnsupportedImage`, callers fall back or
skip): 16-bit channels, palette images, interlacing — the goal is a
correct, honest decoder for the formats our pipelines synthesize and the
overwhelmingly common 8-bit truecolor web case, not a general-purpose
imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "UnsupportedImage",
    "decode_image",
    "decode_png",
    "decode_ppm",
    "encode_png",
    "encode_ppm",
]

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class UnsupportedImage(ValueError):
    """Payload is not a format (or variant) this pure-Python codec handles."""


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise UnsupportedImage("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise UnsupportedImage("PNG missing IEND")


#: channels per PNG color type (8-bit only; palette/16-bit unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. 8-bit, non-interlaced only."""
    if not data.startswith(_PNG_MAGIC):
        raise UnsupportedImage("not a PNG")
    width = height = None
    channels = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise UnsupportedImage(f"bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise UnsupportedImage(f"color type {color} (palette unsupported)")
            if interlace != 0:
                raise UnsupportedImage("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
    if width is None or not idat:
        raise UnsupportedImage("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise UnsupportedImage("PNG pixel payload size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int32)  # int32: filter math is mod-256 sums
    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row = rows[y]
        f = int(filters[y])
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub — prefix recurrence per channel lane
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                ul = prev[x - bpp] if x >= bpp else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise UnsupportedImage(f"PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array -> PNG bytes (filter 0 scanlines)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color is None:
        raise UnsupportedImage(f"cannot encode {c}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 prepended per scanline
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(scan.tobytes(), compress_level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, 3-channel) / PGM (P5, 1-channel) -> (H, W, C) uint8."""
    if data[:2] not in (b"P6", b"P5"):
        raise UnsupportedImage("not a binary PPM/PGM")
    channels = 3 if data[:2] == b"P6" else 1
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments; pixel data starts after the single whitespace
    # byte following maxval
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        if pos >= len(data):
            raise UnsupportedImage("truncated PPM header")
        ch = data[pos : pos + 1]
        if ch == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise UnsupportedImage(f"PPM maxval {maxval} (only 255 supported)")
    need = w * h * channels
    pixels = data[pos : pos + need]
    if len(pixels) != need:
        raise UnsupportedImage("PPM pixel payload size mismatch")
    return np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W[, 1|3]) uint8 -> binary PPM (P6) or PGM (P5) bytes."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise UnsupportedImage(f"cannot encode {c}-channel PPM")
    magic = b"P6" if c == 3 else b"P5"
    return magic + f" {w} {h} 255\n".encode() + a.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch to the PNG or PPM decoder -> (H, W, C) uint8."""
    if data.startswith(_PNG_MAGIC):
        return decode_png(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    raise UnsupportedImage("unrecognized image format")
