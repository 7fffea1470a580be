"""Progressive JPEG (SOF2, T.81 Annex G) — sources/jpeg.py.

The coefficient pipeline is shared with the baseline path, so the
decisive contract is IDENTITY: at the same quality/subsampling, the
progressive stream must decode to EXACTLY the pixels of the baseline
stream (same quantized coefficients, different entropy layout).  That
pins all four scan kinds — DC first, DC refine (raw bits), AC first
(spectral selection + EOB runs), AC refine (correction bits inside
EOB runs) — against the proven baseline decoder.
"""

import numpy as np
import pytest

from pandas_sigproc_spark.sources.jpeg import (
    decode_jpeg_bytes,
    encode_jpeg,
)


def _identity_case(px, quality, subsampling):
    base = decode_jpeg_bytes(
        encode_jpeg(px, quality, subsampling=subsampling)
    )
    prog = decode_jpeg_bytes(
        encode_jpeg(px, quality, subsampling=subsampling, progressive=True)
    )
    np.testing.assert_array_equal(base, prog)
    return prog


def test_progressive_equals_baseline_random():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
    for q in (35, 75, 95):
        for sub in ("444", "420"):
            _identity_case(px, q, sub)


def test_progressive_equals_baseline_gradient():
    y, x = np.mgrid[0:40, 0:56]
    px = np.stack(
        [(y * 4) % 256, (x * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for sub in ("444", "420"):
        _identity_case(px, 80, sub)


def test_progressive_equals_baseline_flat_exercises_eob_runs():
    # a flat image makes every AC block insignificant -> the whole AC
    # first scan is one long EOB run (EOBn symbols, n >> 1), and the
    # refine scan is EOB runs carrying zero correction bits
    px = np.full((48, 64, 3), 130, dtype=np.uint8)
    got = _identity_case(px, 90, "444")
    assert np.unique(got).size <= 3  # still (near-)flat after roundtrip


def test_progressive_sparse_blocks_mix_eob_and_symbols():
    # mostly-flat with a few sharp impulses: some blocks carry AC
    # symbols, the rest fold into EOB runs on BOTH sides of them —
    # exercising the flush-before-symbol ordering
    px = np.full((48, 48, 3), 100, dtype=np.uint8)
    px[5, 5] = (255, 0, 0)
    px[30, 41] = (0, 255, 0)
    px[44, 2] = (0, 0, 255)
    _identity_case(px, 85, "444")
    _identity_case(px, 85, "420")


def test_progressive_nonmultiple_dims_and_comp_grid_mismatch():
    # 420 with h=20: the Y component's true block grid (3 rows) is
    # smaller than the MCU-padded grid (4 rows) — the non-interleaved
    # AC scans must cover exactly the component grid
    rng = np.random.default_rng(3)
    for shape in ((20, 24), (17, 23), (9, 41)):
        px = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        _identity_case(px, 70, "420")
        _identity_case(px, 70, "444")


def test_progressive_grayscale():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(21, 19), dtype=np.uint8)
    base = decode_jpeg_bytes(encode_jpeg(px, 80))
    prog = decode_jpeg_bytes(encode_jpeg(px, 80, progressive=True))
    np.testing.assert_array_equal(base, prog)


def test_progressive_marker_is_sof2():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = encode_jpeg(px, 90, progressive=True)
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    base = encode_jpeg(px, 90)
    assert b"\xff\xc0" in base and b"\xff\xc2" not in base


def test_progressive_has_multiple_scans():
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    blob = encode_jpeg(px, 90, progressive=True)
    # 2 DC scans + 3 AC first + 3 AC refine = 8 SOS markers
    assert blob.count(b"\xff\xda") == 8


def test_progressive_flat_color_q100_exact():
    # the baseline q100 flat-color exactness anchor must carry over
    px = np.full((16, 24, 3), 77, dtype=np.uint8)
    got = decode_jpeg_bytes(encode_jpeg(px, 100, progressive=True))
    np.testing.assert_array_equal(got, px)


def test_progressive_refuses_restart_combination():
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="restart"):
        encode_jpeg(px, 90, progressive=True, restart_interval=2)


def test_multimodal_decode_dispatches_progressive(spark):
    # the magic-dispatched media decoder handles SOF2 payloads with no
    # caller-side change
    import pandas as pd

    from pandas_sigproc_spark.operators.multimodal import (
        extract_media_features,
    )

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    blob = encode_jpeg(px, 90, progressive=True)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0], "kind": ["image"], "payload": [blob]}
        ),
        "media_id long, kind string, payload binary",
    )
    row = extract_media_features(df, codec="real").collect()[0]
    assert (row.height, row.width) == (16, 24)


def test_progressive_refuses_four_components():
    # same profile guard as the baseline path: a 4-component (CMYK)
    # SOF2 frame must refuse, not render garbage from 3 of 4 planes
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px, 90, progressive=True))
    i = bytes(blob).index(b"\xff\xc2")
    # SOF2 payload: len(2) prec(1) h(2) w(2) nc(1) + 3 comps; forge nc=4
    # by appending a 4th component spec and fixing lengths
    comp4 = bytes((4, 0x11, 1))
    insert_at = i + 2 + 8 + 9
    blob[i + 2 : i + 4] = (8 + 3 * 4).to_bytes(2, "big")
    blob[i + 9] = 4
    blob[insert_at:insert_at] = comp4
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg_bytes(bytes(blob))


def test_progressive_refuses_noninteger_ratio():
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    blob = bytearray(encode_jpeg(px, 90, subsampling="420", progressive=True))
    i = bytes(blob).index(b"\xff\xc2")
    # Y is 2x2; forge Cb to 3x3 -> vmax=3 with Y's 2 -> non-integer
    blob[i + 2 + 8 + 3 + 1] = 0x33
    with pytest.raises(NotImplementedError, match="non-integer"):
        decode_jpeg_bytes(bytes(blob))
