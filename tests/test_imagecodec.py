"""Pure-Python image codec: PNG/PPM round-trips, filter handling, and the
real-decode path through decode_and_featurize."""

import struct
import zlib

import numpy as np
import pytest

from frizbee_spark.functions.imagecodec import (
    UnsupportedImage,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    arr = _rng(channels).integers(0, 256, size=(13, 7, channels), dtype=np.uint8)
    decoded = decode_png(encode_png(arr))
    assert decoded.shape == arr.shape
    assert np.array_equal(decoded, arr)


def test_png_roundtrip_2d_input():
    arr = _rng(9).integers(0, 256, size=(5, 11), dtype=np.uint8)
    decoded = decode_png(encode_png(arr))
    assert decoded.shape == (5, 11, 1)
    assert np.array_equal(decoded[:, :, 0], arr)


def _paeth(left, up, ul):
    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    if pa <= pb and pa <= pc:
        return left
    if pb <= pc:
        return up
    return ul


def _encode_with_filters(arr: np.ndarray, filter_types: list[int]) -> bytes:
    """Independent serial PNG encoder applying a GIVEN filter type per
    scanline — exercises the decoder's Sub/Up/Average/Paeth undo paths,
    which `encode_png` (filter 0 only) never produces."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = filter_types[y % len(filter_types)]
        cur = flat[y]
        row = bytearray([f])
        for x in range(stride):
            left = int(cur[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            row.append((int(cur[x]) - pred) & 0xFF)
        out += row
        prev = cur
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_all_filter_types(filters, channels):
    arr = _rng(sum(filters) * 10 + channels).integers(
        0, 256, size=(9, 6, channels), dtype=np.uint8
    )
    decoded = decode_png(_encode_with_filters(arr, filters))
    assert np.array_equal(decoded, arr)


def test_png_multi_idat_chunks():
    """IDAT payload may be split across chunks arbitrarily."""
    arr = _rng(3).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    whole = encode_png(arr)
    # re-split the single IDAT into 3-byte chunks
    pos, parts, idat = 8, [], b""
    while pos < len(whole):
        (length,) = struct.unpack(">I", whole[pos : pos + 4])
        ctype = whole[pos + 4 : pos + 8]
        body = whole[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            idat += body
        else:
            parts.append((ctype, body))
        pos += 12 + length

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    rebuilt = b"\x89PNG\r\n\x1a\n" + chunk(*parts[0])
    for i in range(0, len(idat), 3):
        rebuilt += chunk(b"IDAT", idat[i : i + 3])
    rebuilt += chunk(b"IEND", b"")
    assert np.array_equal(decode_png(rebuilt), arr)


@pytest.mark.parametrize("channels", [1, 3])
def test_ppm_roundtrip(channels):
    arr = _rng(channels + 20).integers(0, 256, size=(6, 10, channels), dtype=np.uint8)
    decoded = decode_ppm(encode_ppm(arr))
    assert np.array_equal(decoded, arr)


def test_ppm_header_comments_and_whitespace():
    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6 # a comment\n#another\n 2\t2\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(raw), arr)


def test_unsupported_variants_raise():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(arr)
    with pytest.raises(UnsupportedImage):
        decode_image(b"GIF89a not supported")
    with pytest.raises(UnsupportedImage):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)  # truncated
    # 16-bit depth: patch IHDR byte 8 (depth) and fix the CRC
    ihdr_body = bytearray(good[16:29])
    ihdr_body[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF
    bad = (
        good[:16] + bytes(ihdr_body) + struct.pack(">I", crc) + good[33:]
    )
    with pytest.raises(UnsupportedImage):
        decode_png(bad)
    with pytest.raises(UnsupportedImage):
        decode_ppm(b"P3 2 2 255\n0 0 0")  # ASCII PPM unsupported


def test_decode_image_dispatch():
    arr = _rng(5).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(arr)), arr)
    assert np.array_equal(decode_image(encode_ppm(arr)), arr)


def test_decode_and_featurize_real_png(spark):
    """decode_and_featurize consumes REAL PNG/PPM bytes end-to-end: the
    feature vector is derived from actual decoded pixels (column means of
    the luminance), not payload-byte fakery."""
    from frizbee_spark.operators.multimodal import decode_and_featurize

    # constant-valued image -> every pooled feature equals that gray level
    flat = np.full((8, 16, 3), 77, dtype=np.uint8)
    grad = np.tile(
        np.arange(16, dtype=np.uint8)[None, :, None] * 10, (8, 1, 3)
    )
    rows = [
        (0, "image", bytearray(encode_png(flat))),
        (1, "image", bytearray(encode_ppm(grad))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
    feats = {r.media_id: r for r in decode_and_featurize(df, feature_dim=16).collect()}
    assert feats[0].n_bytes == len(rows[0][2])
    assert all(abs(v - 77.0) < 1e-3 for v in feats[0].feature)
    # gradient: luminance of column j is 10*j for the BT.601 weights
    # (0.299+0.587+0.114 == 1), so pooled feature j == 10*j
    got = feats[1].feature
    want = [10.0 * j for j in range(16)]
    assert all(abs(g - w) < 1e-2 for g, w in zip(got, want))


def test_decode_and_featurize_unknown_format_paths(spark):
    """Non-PNG/PPM payloads keep the old contract: deterministic fake by
    default, DecoderNotAvailable when fakes are disallowed."""
    from frizbee_spark.operators.multimodal import decode_and_featurize

    df = spark.createDataFrame(
        [(0, "image", b"\xff\xd8jpeg-ish payload")], ["media_id", "kind", "payload"]
    )
    out = decode_and_featurize(df).collect()
    assert len(out) == 1 and len(out[0].feature) == 16
    with pytest.raises(Exception, match="(?i)decod|notimplemented"):
        decode_and_featurize(df, deterministic_fake=False).collect()
