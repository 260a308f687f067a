"""Pure-Python WAV codec: PCM/float round-trips and bit-depth handling
(the Spark featurize path is covered in test_multimodal_audio.py)."""

import struct

import numpy as np
import pytest

from frizbee_spark.functions.audiocodec import (
    UnsupportedAudio,
    decode_wav,
    encode_wav,
)


def _build_wav(tag, bits, data, ch=1, sr=8000, fmt_extra=b""):
    """Hand-build a minimal RIFF/WAVE file for decoder edge cases."""
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * block_align, block_align, bits)
    fmt += fmt_extra
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


@pytest.mark.parametrize("channels", [1, 2, 4])
def test_wav_roundtrip_16bit(channels):
    rng = np.random.default_rng(7)
    sig = rng.uniform(-0.9, 0.9, size=(500, channels))
    dec, sr = decode_wav(encode_wav(sig, 16000))
    assert sr == 16000 and dec.shape == (500, channels)
    assert np.abs(dec - sig).max() < 2 / 32768


def test_wav_roundtrip_1d_input():
    sig = np.sin(np.linspace(0, 6.28, 100))
    dec, sr = decode_wav(encode_wav(sig, 8000))
    assert dec.shape == (100, 1)
    assert np.abs(dec[:, 0] - sig).max() < 2 / 32768


def test_wav_8bit_unsigned():
    s, _ = decode_wav(_build_wav(1, 8, bytes([0, 128, 255])))
    assert s.shape == (3, 1)
    assert abs(s[1, 0]) < 1e-6 and s[0, 0] < -0.99 and s[2, 0] > 0.99


def test_wav_24bit_sign_extension():
    v = int(-8388608 * 0.5) & 0xFFFFFF
    pos = int(8388607 * 0.25) & 0xFFFFFF
    data = struct.pack("<I", v)[:3] + struct.pack("<I", pos)[:3]
    s, _ = decode_wav(_build_wav(1, 24, data))
    assert abs(s[0, 0] + 0.5) < 1e-5
    assert abs(s[1, 0] - 0.25) < 1e-5


def test_wav_32bit_int_and_floats():
    s, _ = decode_wav(_build_wav(1, 32, np.array([2**30, -(2**31)], "<i4").tobytes()))
    assert np.allclose(s.ravel(), [0.5, -1.0])
    s, _ = decode_wav(_build_wav(3, 32, np.array([0.25, -0.75], "<f4").tobytes()))
    assert np.allclose(s.ravel(), [0.25, -0.75])
    s, _ = decode_wav(_build_wav(3, 64, np.array([0.125], "<f8").tobytes()))
    assert np.allclose(s.ravel(), [0.125])


def test_wav_extensible_format():
    """WAVE_FORMAT_EXTENSIBLE: real tag lives in the SubFormat GUID."""
    extra = (
        struct.pack("<H", 22)  # cbSize
        + struct.pack("<H", 16)  # valid bits
        + struct.pack("<I", 4)  # channel mask
        + struct.pack("<H", 1)  # sub-format tag: PCM
        + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    wav = _build_wav(0xFFFE, 16, struct.pack("<hh", 16384, -16384), fmt_extra=extra)
    s, sr = decode_wav(wav)
    assert sr == 8000 and np.allclose(s.ravel(), [0.5, -0.5])


def test_wav_odd_chunk_padding():
    """Odd-sized chunks carry a pad byte that must not shift the stream."""
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + junk
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 2)
        + struct.pack("<h", 16384)
    )
    s, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert np.allclose(s.ravel(), [0.5])


def test_unsupported_variants_raise():
    with pytest.raises(UnsupportedAudio):
        decode_wav(b"not audio at all")
    with pytest.raises(UnsupportedAudio):
        decode_wav(_build_wav(2, 4, b"\x00" * 8))  # ADPCM tag
    decode_wav(_build_wav(1, 16, b""))  # empty data chunk is fine
    with pytest.raises(UnsupportedAudio):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks
    truncated = _build_wav(1, 16, struct.pack("<h", 0))[:-1]
    with pytest.raises(UnsupportedAudio):
        decode_wav(truncated)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        n_frames=st.integers(min_value=0, max_value=400),
        n_channels=st.integers(min_value=1, max_value=3),
        sample_rate=st.sampled_from([1000, 8000, 44100]),
        data=st.data(),
    )
    def test_wav_roundtrip_property(n_frames, n_channels, sample_rate, data):
        """encode->decode is identity up to 16-bit quantization for any
        frame count / channel count / sample rate."""
        rng = np.random.default_rng(
            data.draw(st.integers(min_value=0, max_value=2**31))
        )
        sig = rng.uniform(-1.0, 1.0, size=(n_frames, n_channels))
        dec, sr = decode_wav(encode_wav(sig, sample_rate))
        assert sr == sample_rate
        assert dec.shape == (n_frames, n_channels)
        if n_frames:
            # encode scales by 32767, decode divides by 32768: up to
            # 1/32768 scale skew + 0.5/32768 rounding
            assert np.abs(dec - sig).max() <= 1.6 / 32768
except ImportError:  # pragma: no cover - hypothesis is in the container
    pass
