"""featurize_audio over Spark: REAL WAV decode end-to-end plus the
fake/raise contract for non-WAV payloads."""

import numpy as np
import pytest

from frizbee_spark.functions.audiocodec import encode_wav


def test_featurize_audio_real_wav(spark):
    """featurize_audio consumes REAL WAV bytes end-to-end: duration, RMS,
    ZCR, and the temporal envelope derive from decoded samples, not
    payload-byte fakery."""
    from frizbee_spark.operators.multimodal import featurize_audio

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr  # exactly 1 second
    # 440 Hz sine at amplitude 0.5: RMS = 0.5/sqrt(2), ZCR ~= 2*440/sr
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    # first-half loud / second-half silent: envelope halves differ
    halfsig = np.concatenate([0.8 * np.sin(2 * np.pi * 100 * t[: sr // 2]), np.zeros(sr // 2)])
    rows = [
        (0, "audio", bytearray(encode_wav(sine, sr))),
        (1, "audio", bytearray(encode_wav(np.stack([sine, sine], 1), sr))),
        (2, "audio", bytearray(encode_wav(halfsig, sr))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "kind", "payload"])
    feats = {r.media_id: r for r in featurize_audio(df, feature_dim=8).collect()}

    mono = feats[0]
    assert mono.sample_rate == sr and mono.n_frames == sr and mono.n_channels == 1
    assert mono.duration_ms == 1000
    assert abs(mono.rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(mono.zero_crossing_rate - 2 * 440 / sr) < 0.01

    stereo = feats[1]
    assert stereo.n_channels == 2
    assert abs(stereo.rms - mono.rms) < 1e-3  # identical channels -> same mono mix

    env = feats[2].feature
    assert len(env) == 8
    assert all(v > 0.4 for v in env[:4])  # loud half
    assert all(v < 1e-3 for v in env[4:])  # silent half


def test_featurize_audio_unknown_format_paths(spark):
    """Non-WAV payloads keep the image-path contract: deterministic fake
    by default, DecoderNotAvailable when fakes are disallowed."""
    from frizbee_spark.operators.multimodal import featurize_audio

    df = spark.createDataFrame(
        [(0, "audio", b"\xff\xfbmp3-ish payload")], ["media_id", "kind", "payload"]
    )
    out = featurize_audio(df).collect()
    assert len(out) == 1 and len(out[0].feature) == 16
    with pytest.raises(Exception, match="(?i)decod|notimplemented"):
        featurize_audio(df, deterministic_fake=False).collect()
