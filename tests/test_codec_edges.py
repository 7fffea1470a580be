"""r13 image/audio-codec review pass: silent-corruption and error-
taxonomy edges (every malformed input must raise ValueError, never
struct.error/zlib.error/IndexError — the on_error='skip' contract
catches ValueError only)."""

import struct

import numpy as np
import pytest

from pandas_sigproc_spark.sources.bmp import (
    decode_bmp_bytes,
    decode_bmpv,
    encode_bmp,
)
from pandas_sigproc_spark.sources.gif import decode_gif, encode_gif
from pandas_sigproc_spark.sources.png import decode_png_bytes, encode_png
from pandas_sigproc_spark.sources.wav import decode_wav_bytes, encode_wav_bytes


def test_wav_mixed_dtype_channels_refused():
    with pytest.raises(ValueError, match="dtype mismatch"):
        encode_wav_bytes(
            44100,
            np.array([1000, -2000], np.int16),
            np.array([0.5, -0.25], np.float32),
        )


def test_wav_2d_channels_refused():
    with pytest.raises(ValueError, match="1-D"):
        encode_wav_bytes(8000, np.arange(4, dtype=np.int16).reshape(4, 1))


def test_wav_truncated_data_chunk_is_loud():
    blob = encode_wav_bytes(8000, np.arange(4, dtype=np.int16))
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav_bytes(blob[:-4])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_bytes(b"RIFF")


def test_bmp_negative_width_refused():
    img = np.zeros((3, 3, 3), np.uint8)
    blob = bytearray(encode_bmp(img))
    blob[18:22] = struct.pack("<i", -3)  # width field
    with pytest.raises(ValueError, match="dimensions"):
        decode_bmp_bytes(bytes(blob))


def test_bmpv_corrupt_count_is_valueerror():
    with pytest.raises(ValueError, match="BMPV"):
        decode_bmpv(b"BMPV" + struct.pack("<I", 0xFFFFFF))
    with pytest.raises(ValueError, match="BMPV"):
        decode_bmpv(b"BMPV\x01")


def test_gif_truncated_extension_is_valueerror():
    img = np.zeros((4, 4, 3), np.uint8)
    blob = encode_gif([img])
    # header(13) + the 2-entry GCT(6), then a bare extension introducer
    cut = blob[:19] + bytes([0x21])
    with pytest.raises(ValueError, match="truncated GIF extension"):
        decode_gif(cut)


def test_gif_delays_validation_is_upfront():
    img = np.zeros((4, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="entries for"):
        encode_gif([img, img, img], delays_cs=[10])
    with pytest.raises(ValueError, match="centiseconds"):
        encode_gif([img], delays_cs=[-1])


def test_gif_interlace_roundtrip_after_helper():
    rng = np.random.default_rng(4)
    img = (rng.integers(0, 4, (16, 8)) * 80).astype(np.uint8)
    img = np.repeat(img[:, :, None], 3, axis=2)
    frames = decode_gif(encode_gif([img], interlace=True))
    assert np.array_equal(frames[0], img)


def test_png_truncated_crc_and_corrupt_idat_are_valueerror():
    img = np.zeros((4, 4, 3), np.uint8)
    blob = encode_png(img)
    with pytest.raises(ValueError, match="PNG"):
        decode_png_bytes(blob[: 8 + 8 + 13 + 2])  # cut inside IHDR CRC
    # flip a bit inside IDAT and recompute that chunk's CRC
    b = bytearray(blob)
    pos = 8
    while True:
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = bytes(b[pos + 4 : pos + 8])
        if tag == b"IDAT":
            b[pos + 8] ^= 0xFF
            import zlib

            crc = zlib.crc32(bytes(b[pos + 4 : pos + 8 + length])) & 0xFFFFFFFF
            b[pos + 8 + length : pos + 12 + length] = struct.pack(">I", crc)
            break
        pos += 12 + length
    with pytest.raises(ValueError, match="PNG"):
        decode_png_bytes(bytes(b))


def test_wav_mixed_offtable_int_channels_promote():
    # r14 advice: two differing dtypes that are BOTH outside the codec's
    # sample-type table (int64 left + int32 right) promote losslessly to
    # the float64 encoding; r15 advice tightened the rule to be
    # side-symmetric — ANY mixed in-table/off-table pair refuses, so an
    # in-table channel's declared sample type is never discarded based
    # on which side the off-table dtype landed.
    blob = encode_wav_bytes(
        8000,
        np.array([1, -2, 3], np.int64),
        np.array([4, -5, 6], np.int32),
    )
    rate, sound = decode_wav_bytes(blob)
    assert rate == 8000
    assert sound.dtype == np.float64
    np.testing.assert_array_equal(sound[:, 0], [1.0, -2.0, 3.0])
    np.testing.assert_array_equal(sound[:, 1], [4.0, -5.0, 6.0])
    # in-table left + differing right still refuses (truncation is real)
    with pytest.raises(ValueError, match="dtype mismatch"):
        encode_wav_bytes(
            8000,
            np.array([1, -2], np.int16),
            np.array([3, -4], np.int64),
        )
    # r15 advice regression: the MIRROR direction (off-table left +
    # in-table right) must refuse identically, not silently force the
    # in-table right channel to float64
    with pytest.raises(ValueError, match="dtype mismatch"):
        encode_wav_bytes(
            8000,
            np.array([1, -2], np.int64),
            np.array([3, -4], np.int16),
        )
    # r15 code-review regression: when the in-table side IS float64,
    # promotion lands exactly on its declared type — int64 + float64
    # pairs encode losslessly in both directions (the first symmetric
    # guard over-refused them)
    for l, r in (
        (np.array([1, -2], np.int64), np.array([0.5, -0.25], np.float64)),
        (np.array([0.5, -0.25], np.float64), np.array([1, -2], np.int64)),
    ):
        rate, snd = decode_wav_bytes(encode_wav_bytes(8000, l, r))
        assert snd.dtype == np.float64
        np.testing.assert_array_equal(snd[:, 0], l.astype(np.float64))
        np.testing.assert_array_equal(snd[:, 1], r.astype(np.float64))
    # but a NARROWER in-table type (float32) still refuses — promotion
    # would widen its declared sample type
    with pytest.raises(ValueError, match="dtype mismatch"):
        encode_wav_bytes(
            8000,
            np.array([0.5], np.float32),
            np.array([1], np.int64),
        )
