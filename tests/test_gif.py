"""From-scratch GIF codec (sources/gif.py).

No in-container reference decoder exists in this environment, so the
contract is: exact roundtrips (GIF is lossless given a palette), an
INDEPENDENTLY hand-packed LZW bit-stream vector (a second, tiny LSB
packer written here cross-checks the bit order), interlace
reordering, dictionary-growth stress, animation compositing, and the
refusal matrix.
"""

import struct

import numpy as np
import pytest

from pandas_sigproc_spark.sources.gif import (
    decode_gif,
    encode_gif,
    is_gif_bytes,
)


def _rand_frame(rng, h, w, ncolors):
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(h, w))
    return pal[idx]


def test_roundtrip_exact_single_frame():
    rng = np.random.default_rng(1)
    for h, w, nc in ((1, 1, 1), (7, 13, 4), (33, 21, 200), (64, 64, 256)):
        px = _rand_frame(rng, h, w, nc)
        got = decode_gif(encode_gif(px))
        assert len(got) == 1
        np.testing.assert_array_equal(got[0], px)


def test_roundtrip_exact_interlaced():
    rng = np.random.default_rng(2)
    for h in (1, 2, 5, 8, 17, 40):
        px = _rand_frame(rng, h, 11, 16)
        blob = encode_gif(px, interlace=True)
        np.testing.assert_array_equal(decode_gif(blob)[0], px)
        # the interlace flag is actually set
        assert blob[6:13][0:1]  # header parses
        i = blob.index(b"\x2c")
        assert blob[i + 9] & 0x40


def test_roundtrip_animation():
    rng = np.random.default_rng(3)
    frames = [_rand_frame(rng, 12, 9, 8) for _ in range(5)]
    got = decode_gif(encode_gif(frames, delays_cs=[10] * 5))
    assert len(got) == 5
    for a, b in zip(got, frames):
        np.testing.assert_array_equal(a, b)


def test_lzw_dictionary_growth_stress():
    # 256-color noise forces the code width to grow to 12 bits and
    # triggers in-band clear resets
    rng = np.random.default_rng(4)
    px = _rand_frame(rng, 120, 130, 256)
    np.testing.assert_array_equal(decode_gif(encode_gif(px))[0], px)


def test_handpacked_lzw_vector_decodes():
    """A 2x2 two-color GIF whose LZW stream is packed by an
    INDEPENDENT bit packer written here — pins the LSB-first code
    packing and the clear/end framing against the decoder."""
    # palette: color 0 = red, color 1 = blue; pixels: 0 1 / 1 0.
    # width grows to 4 bits before the LAST pixel code: the table
    # (4 singles + clear + end + two built phrases) reaches 8 entries
    # after the third pixel code, mirroring the encoder's growth rule.
    mcs = 2
    clear, end = 4, 5
    codes = [(clear, 3), (0, 3), (1, 3), (1, 3), (0, 4), (end, 4)]
    acc = nbits = 0
    stream = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    blob = bytearray()
    blob += b"GIF89a"
    blob += struct.pack("<HHBBB", 2, 2, 0x80 | 0, 0, 0)  # 2-entry GCT
    blob += bytes((255, 0, 0, 0, 0, 255))
    blob += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    blob.append(mcs)
    blob += bytes((len(stream),)) + stream + b"\x00"
    blob.append(0x3B)
    got = decode_gif(bytes(blob))[0]
    want = np.array(
        [[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(got, want)


def test_transparency_composites_over_previous_frame():
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:, :] = (10, 20, 30)
    blob = bytearray(encode_gif(base))
    # append a second frame: 2x2 at (1,1), palette idx 1 opaque white,
    # idx 0 declared transparent
    body = bytes((0x21, 0xF9, 4, 0x01, 0, 0, 0, 0))  # GCE: transparent=0
    frame = struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0x80 | 0)
    frame += bytes((0, 0, 0, 255, 255, 255))  # local table: black, white
    from pandas_sigproc_spark.sources.gif import _lzw_encode

    lzw = _lzw_encode(bytes((1, 0, 0, 1)), 2)
    frame += bytes((2,)) + bytes((len(lzw),)) + lzw + b"\x00"
    assert blob[-1] == 0x3B
    blob = blob[:-1] + body + frame + bytes((0x3B,))
    frames = decode_gif(bytes(blob))
    assert len(frames) == 2
    f2 = frames[1]
    # opaque corners white, transparent corners keep the base color
    np.testing.assert_array_equal(f2[1, 1], (255, 255, 255))
    np.testing.assert_array_equal(f2[2, 2], (255, 255, 255))
    np.testing.assert_array_equal(f2[1, 2], (10, 20, 30))
    np.testing.assert_array_equal(f2[2, 1], (10, 20, 30))


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_gif(px)
    with pytest.raises(ValueError):
        decode_gif(blob[:-1])  # trailer cut
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2])
    # > 256 distinct colors refuse loudly
    y, x = np.mgrid[0:32, 0:32]
    rainbow = np.stack(
        [y * 8 % 256, x * 8 % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_gif(rainbow)


def test_is_gif_bytes():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert is_gif_bytes(encode_gif(px))
    assert not is_gif_bytes(b"\x89PNG\r\n\x1a\n")


def test_deterministic_bytes():
    rng = np.random.default_rng(6)
    px = _rand_frame(rng, 10, 10, 12)
    assert encode_gif(px) == encode_gif(px)


# ---------------------------------------------------------------------------
# hypothesis roundtrip
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.integers(1, 32),
    st.integers(0, 2**32 - 1),
    st.booleans(),
)
def test_roundtrip_property(h, w, ncolors, seed, interlace):
    rng = np.random.default_rng(seed)
    px = _rand_frame(rng, h, w, ncolors)
    got = decode_gif(encode_gif(px, interlace=interlace))
    assert len(got) == 1
    np.testing.assert_array_equal(got[0], px)


# ---------------------------------------------------------------------------
# engine integration: magic dispatch + frame hashing
# ---------------------------------------------------------------------------


def test_multimodal_dispatches_gif_image_and_video(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.multimodal import (
        extract_media_features,
    )

    rng = np.random.default_rng(7)
    still = _rand_frame(rng, 10, 14, 5)
    anim = [_rand_frame(rng, 6, 8, 4) for _ in range(3)]
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1],
                "kind": ["image", "video"],
                "payload": [encode_gif(still), encode_gif(anim)],
            }
        ),
        "media_id long, kind string, payload binary",
    )
    rows = {
        r.media_id: r
        for r in extract_media_features(df, codec="real").collect()
    }
    assert (rows[0].width, rows[0].height, rows[0].n_frames) == (14, 10, 1)
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (8, 6, 3)


def test_phash_frames_hashes_gif_animation(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.imagedup import (
        phash_frames,
        phash_pixels,
    )

    rng = np.random.default_rng(8)
    frames = [_rand_frame(rng, 32, 32, 16) for _ in range(4)]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0], "payload": [encode_gif(frames)]}),
        "media_id long, payload binary",
    )
    got = {
        r.frame_idx: r.phash
        for r in phash_frames(df, every_n=2).collect()
    }
    assert sorted(got) == [0, 2]
    # the distributed hash equals the local pixel-level hash
    assert got[0] == phash_pixels(frames[0])
    assert got[2] == phash_pixels(frames[2])


def test_format_preserving_resize_keeps_gif(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(9)
    px = _rand_frame(rng, 16, 16, 8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0], "kind": ["image"], "payload": [encode_gif(px)]}
        ),
        "media_id long, kind string, payload binary",
    )
    out = resize_images(df, 8, 8, codec="real").collect()[0]
    resized = bytes(out.payload)
    assert is_gif_bytes(resized)
    assert decode_gif(resized)[0].shape == (8, 8, 3)


def test_lzw_tail_width_boundary_regression():
    # review finding: the decoder appends a dictionary entry for the
    # FINAL data code; when that append lands exactly on 1<<width the
    # end code must be written at the bumped width or the decode
    # desyncs (original falsifying example: 16x18, 17 colors, seed 1)
    rng = np.random.default_rng(1)
    pal = rng.integers(0, 256, size=(17, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 17, size=(16, 18))]
    np.testing.assert_array_equal(decode_gif(encode_gif(px))[0], px)


def test_truncation_raises_valueerror_not_struct_error():
    # the corrupt-container convention (on_error="skip") catches
    # ValueError, so every truncation must surface as one
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_gif(px)
    for cut in range(7, len(blob)):
        try:
            decode_gif(blob[:cut])
        except ValueError:
            pass  # the loud, catchable refusal
        # any other exception type fails the test by propagating
