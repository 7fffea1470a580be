"""WAV sink/source (reference ``tools.py:227-254`` ``write_wav``).

The reference delegates to ``scipy.io.wavfile.write`` (unavailable here),
so this is a minimal self-contained RIFF/WAVE codec with the same dtype
semantics for the formats the reference can produce:

- float32 / float64 arrays -> WAVE_FORMAT_IEEE_FLOAT (scipy behavior for
  float input — no rescaling, values stored verbatim),
- int16 -> WAVE_FORMAT_PCM.

Mono input duplicates the left channel into the right, exactly like the
reference (``tools.py:246-247``).

Engine integration: WAV is not a distributed format — a file is one
coherent PCM stream.  ``signals_to_wav`` is the documented driver-side
sink (collect <=2 channels, write locally); ``wav_to_signals`` fans a
file out into the canonical ``signals`` layout for distributed
processing.  SURVEY.md §2.1.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_FMT_PCM = 1
_FMT_IEEE = 3

_DTYPES = {
    np.dtype("int16"): (_FMT_PCM, 16),
    np.dtype("float32"): (_FMT_IEEE, 32),
    np.dtype("float64"): (_FMT_IEEE, 64),
}


def encode_wav_bytes(sample_rate, sound_left, sound_right=None) -> bytes:
    """Stereo/mono WAV payload with reference semantics
    (``tools.py:227-254``) built fully in memory — the single layout
    path shared by the file sink and the media pipeline (one encode per
    channel inside applyInPandas), so the bytes cannot drift between
    them and validation happens before any file is touched."""
    left = np.asarray(sound_left)
    right = left if sound_right is None else np.asarray(sound_right)
    if left.ndim != 1 or right.ndim != 1:
        # a (n, 1) column vector would vstack to (2n, 1), transpose to
        # (1, 2n), and interleave samples ACROSS channels silently
        # (a review finding)
        raise ValueError(
            f"channels must be 1-D, got shapes {left.shape}/{right.shape}"
        )
    if left.shape != right.shape:
        raise ValueError("left/right length mismatch")
    off_l = left.dtype not in _DTYPES
    off_r = right.dtype not in _DTYPES
    if off_l or off_r:
        # off-table dtypes (int64, int32, ...) promote to the float64
        # encoding — when BOTH channels are off-table, or when the one
        # in-table channel already IS float64 (promotion lands exactly
        # on its declared type, so nothing is discarded — an r15
        # review finding: the first symmetric guard also refused
        # int64 + float64 pairs that previously encoded losslessly).
        # Any other mixed in-table/off-table pair refuses symmetrically,
        # so a narrower in-table channel's declared sample type is never
        # silently widened based on which side the off-table dtype
        # landed (an ADVICE finding: int64 left + int16 right used to
        # force both to float64 while int16 left + int64 right raised).
        # Documented seam: integer samples beyond 2**53 lose low bits
        # in float64, like any float64 pipeline — audio amplitudes
        # never approach that.
        in_dtype = left.dtype if off_r else right.dtype
        if (off_l and off_r) or in_dtype == np.dtype("float64"):
            left = left.astype(np.float64)
            right = right.astype(np.float64)
        else:
            raise ValueError(
                f"left/right dtype mismatch: {left.dtype} vs"
                f" {right.dtype} — one channel has a narrower"
                " WAV-encodable sample type (int16/float32) and the"
                " other does not; cast both channels to one sample"
                " type first"
            )
    if right.dtype != left.dtype:
        # the fmt/bits choice comes from the LEFT dtype; a differing
        # right channel would be promoted by vstack then truncated by
        # the raw astype — decoded garbage with no error (a review
        # finding)
        raise ValueError(
            f"left/right dtype mismatch: {left.dtype} vs {right.dtype}"
            " — cast both channels to one sample type first"
        )
    fmt, bits = _DTYPES[left.dtype]
    stereo = np.vstack((left, right)).transpose().copy()  # tools.py:250-251
    data = stereo.astype("<" + left.dtype.str[1:]).tobytes()
    n_ch, rate, block = 2, int(sample_rate), 2 * bits // 8
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        fmt,
        n_ch,
        rate,
        rate * block,
        block,
        bits,
        b"data",
        len(data),
    )
    return hdr + data


def write_wav(filename, sample_rate, sound_left, sound_right=None) -> None:
    """Stereo/mono WAV sink with reference semantics (``tools.py:227-254``).

    The payload is fully built (and validated) BEFORE the file is
    opened, so a failing call never truncates an existing file.
    """
    payload = encode_wav_bytes(sample_rate, sound_left, sound_right)
    with open(filename, "wb") as f:
        f.write(payload)


def _read_wav_stream(f):
    head12 = f.read(12)
    if len(head12) < 12:
        raise ValueError("not a RIFF/WAVE file (shorter than 12 bytes)")
    riff, _size, wave = struct.unpack("<4sI4s", head12)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = rate = bits = n_ch = None
    data = None
    while True:
        head = f.read(8)
        if len(head) < 8:
            break
        cid, clen = struct.unpack("<4sI", head)
        body = f.read(clen + (clen % 2))[:clen]
        if len(body) < clen:
            # a truncated chunk used to decode SILENTLY to fewer
            # samples (or die in a cryptic reshape) — refuse by name
            # (a review finding)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: header says {clen} bytes,"
                f" stream holds {len(body)}"
            )
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError(
                    f"WAV fmt chunk of {clen} bytes is shorter than the"
                    " 16-byte PCM header"
                )
            fmt, n_ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if fmt == _FMT_PCM and bits == 16:
        arr = np.frombuffer(data, dtype="<i2")
    elif fmt == _FMT_IEEE and bits == 32:
        arr = np.frombuffer(data, dtype="<f4")
    elif fmt == _FMT_IEEE and bits == 64:
        arr = np.frombuffer(data, dtype="<f8")
    else:
        raise ValueError(f"unsupported WAV format ({fmt=}, {bits=})")
    return rate, arr.reshape(-1, n_ch)


def read_wav(filename):
    """Read a PCM16 / IEEE-float WAV -> (sample_rate, ndarray[n, channels])."""
    with open(filename, "rb") as f:
        return _read_wav_stream(f)


def decode_wav_bytes(payload: bytes):
    """Decode an in-memory WAV payload -> (sample_rate, ndarray[n, channels]).

    The executor-side entry point: binary media columns carry whole WAV
    files as bytes, and this parses them without touching the filesystem
    (the multimodal tier's ``codec='real'`` audio seam).
    """
    import io

    return _read_wav_stream(io.BytesIO(payload))


def wav_to_signals(spark, filename, channel_prefix: str = "wav"):
    """WAV file -> canonical ``signals(channel_id, t, value)`` DataFrame."""
    rate, arr = read_wav(filename)
    t = np.arange(arr.shape[0], dtype=np.float64) / rate
    names = (
        [f"{channel_prefix}_L", f"{channel_prefix}_R"]
        if arr.shape[1] == 2
        else [f"{channel_prefix}_{i}" for i in range(arr.shape[1])]
    )
    frames = [
        pd.DataFrame(
            {"channel_id": name, "t": t, "value": arr[:, i].astype(np.float64)}
        )
        for i, name in enumerate(names)
    ]
    return spark.createDataFrame(
        pd.concat(frames, ignore_index=True),
        "channel_id string, t double, value double",
    )


def signals_to_wav(df, filename, sample_rate, left_channel, right_channel=None):
    """Driver-side WAV sink: collect <=2 channels, write locally.

    Matches the reference's model where audio output is an endpoint, not a
    distributed table (SURVEY.md §2.1 write_wav row).  Rows are ordered by
    ``t`` per channel before concatenation.
    """
    chans = [left_channel] + ([right_channel] if right_channel else [])
    pdf = (
        df.filter(df.channel_id.isin(chans))
        .select("channel_id", "t", "value")
        .toPandas()
        .sort_values(["channel_id", "t"])
    )
    series = {
        cid: grp["value"].to_numpy(np.float64)
        for cid, grp in pdf.groupby("channel_id")
    }
    missing = [c for c in chans if c not in series]
    if missing:
        raise ValueError(f"channels not found: {missing}")
    left = series[left_channel]
    right = series[right_channel] if right_channel else None
    write_wav(filename, sample_rate, left, right)


try:  # pragma: no cover - sounddevice absent in this environment
    import sounddevice as _sd
except Exception:  # ImportError or PortAudio load failures
    _sd = None


def playsound(signals, channel_id, wait=False):
    """Play ONE channel through the sound card (reference ``playsound``,
    ``extension.py:436-450``): ``sd.play(y, fs)`` + optional blocking
    ``sd.wait()``.

    Driver-side exit point like :func:`signals_to_wav` — audio output
    is an endpoint, not a distributed op — and import-gated on the
    ``sounddevice`` package (not installed in this environment; the
    reference carries the same hard dependency).  Where the reference
    TRUSTS "a constant logging rate" (its docstring), this version
    VERIFIES it through the engine's samplerate operator
    (``operators/relational.py`` — the oracle-gated inference that
    yields NULL for non-uniform channels) and raises instead of
    playing garbage at a wrong clock.

    Returns the sample rate used (handy for tests and logging).
    """
    if _sd is None:
        raise ImportError(
            "the 'sounddevice' package is required for playsound"
            " (pip install sounddevice); use signals_to_wav to write"
            " a .wav file without it"
        )
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.relational import samplerate

    ch = signals.filter(F.col("channel_id") == channel_id)
    rows = samplerate(ch).collect()  # bounded: one row per channel
    fs = rows[0]["samplerate"] if rows else None
    if fs is None:
        # samplerate emits no row for a <2-sample channel, so an empty
        # result does NOT mean the channel is absent — check before
        # diagnosing (a review finding: a 1-sample channel was
        # reported as "not found")
        if not rows and ch.limit(1).count() == 0:
            raise ValueError(
                f"playsound: channel {channel_id!r} not found"
            )
        raise ValueError(
            f"playsound: channel {channel_id!r} has no uniform sample"
            " rate — resample() it to a constant rate first"
        )
    y = (
        ch.select("t", "value")
        .orderBy("t")
        .toPandas()["value"]
        .to_numpy(np.float64)
    )
    _sd.play(y, fs)
    if wait:
        _sd.wait()
    return fs
