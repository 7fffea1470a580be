"""WAV sink/source tests (reference tools.py:227-254 parity)."""

import numpy as np
import pytest

from pandas_sigproc_spark.sources.wav import (
    read_wav,
    signals_to_wav,
    wav_to_signals,
    write_wav,
)


def test_roundtrip_float64_stereo(tmp_path):
    t = np.arange(0, 0.1, 1 / 8000)
    left = np.sin(2 * np.pi * 440 * t)
    right = np.sin(2 * np.pi * 880 * t)
    p = str(tmp_path / "st.wav")
    write_wav(p, 8000, left, right)
    rate, arr = read_wav(p)
    assert rate == 8000 and arr.shape == (len(t), 2)
    assert np.array_equal(arr[:, 0], left)  # IEEE float: verbatim
    assert np.array_equal(arr[:, 1], right)


def test_mono_duplicates_left(tmp_path):
    left = np.linspace(-1, 1, 100)
    p = str(tmp_path / "mono.wav")
    write_wav(p, 44100, left)  # tools.py:246-247
    _, arr = read_wav(p)
    assert np.array_equal(arr[:, 0], arr[:, 1])


def test_int16_pcm_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 20, 500)) * 32000).astype(np.int16)
    p = str(tmp_path / "pcm.wav")
    write_wav(p, 16000, x)
    rate, arr = read_wav(p)
    assert rate == 16000 and arr.dtype == np.int16
    assert np.array_equal(arr[:, 0], x)


def test_spark_roundtrip(spark, tmp_path):
    t = np.arange(0, 0.05, 1 / 8000)
    left = np.cos(2 * np.pi * 100 * t)
    p = str(tmp_path / "rt.wav")
    write_wav(p, 8000, left)
    sig = wav_to_signals(spark, p, channel_prefix="tone")
    assert set(r["channel_id"] for r in sig.select("channel_id").distinct().collect()) == {
        "tone_L",
        "tone_R",
    }
    out = str(tmp_path / "rt2.wav")
    signals_to_wav(sig, out, 8000, "tone_L", "tone_R")
    rate, arr = read_wav(out)
    assert rate == 8000
    assert np.allclose(arr[:, 0], left)


def test_missing_channel_raises(spark, tmp_path):
    t = np.arange(0, 0.01, 1 / 8000)
    p = str(tmp_path / "m.wav")
    write_wav(p, 8000, np.sin(t))
    sig = wav_to_signals(spark, p)
    with pytest.raises(ValueError, match="not found"):
        signals_to_wav(sig, str(tmp_path / "x.wav"), 8000, "nope")


def test_ide_source_is_import_gated():
    import pytest as _pytest

    from pandas_sigproc_spark.sources.endaq import read_ide_channels

    with _pytest.raises(ImportError, match="endaq"):
        read_ide_channels("/nonexistent.ide")
