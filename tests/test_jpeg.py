"""From-scratch baseline JPEG codec (sources/jpeg.py): quality anchors,
profile guards, and the multimodal seam integration.

Reference parity note: the reference delegates all media decoding to
external libraries; this engine carries its own codecs (WAV/BMP/PNG and
now JPEG) so the multimodal operators run on real bytes in this
dependency-free environment."""

import numpy as np
import pytest

from pandas_sigproc_spark.sources.jpeg import (
    QUANT_LUMA,
    decode_jpeg_bytes,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h=64, w=64):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    g = (np.add.outer(y, x) / 2).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def test_flat_color_roundtrips_exactly_at_q100():
    # DC-only blocks + unit quantizers: the one provable-exact corner
    for v in (0, 77, 130, 255):
        img = np.full((24, 40, 3), v, np.uint8)
        out = decode_jpeg_bytes(encode_jpeg(img, 100))
        assert np.array_equal(out, img), f"flat {v} not exact"


def test_psnr_floors_and_monotone_quality():
    img = _gradient()
    p = {q: _psnr(img, decode_jpeg_bytes(encode_jpeg(img, q))) for q in (50, 90, 100)}
    assert p[100] > 60 and p[90] > 50 and p[50] > 40
    assert p[100] > p[90] > p[50]


def test_nonmultiple_of_8_dims_and_grayscale():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 50, 3), dtype=np.uint8).astype(np.uint8)
    out = decode_jpeg_bytes(encode_jpeg(img, 95))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30
    g = rng.integers(0, 256, (17, 23), dtype=np.uint8).astype(np.uint8)
    out = decode_jpeg_bytes(encode_jpeg(g, 95))
    assert out.shape == (17, 23, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all()  # gray replicates


def test_restart_markers_decode_identically():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (48, 56, 3), dtype=np.uint8).astype(np.uint8)
    plain = decode_jpeg_bytes(encode_jpeg(img, 90))
    dri = encode_jpeg(img, 90, restart_interval=3)
    assert len(dri) > len(encode_jpeg(img, 90))  # DRI + RSTn present
    assert np.array_equal(decode_jpeg_bytes(dri), plain)


def test_compression_actually_compresses():
    img = _gradient(128, 128)
    enc = encode_jpeg(img, 90)
    assert len(enc) < img.size // 4  # raw 49KB -> well under 12KB


def test_quality_scales_quant_tables():
    from pandas_sigproc_spark.sources.jpeg import _quality_tables

    l50, _ = _quality_tables(50)
    assert np.array_equal(l50, QUANT_LUMA)  # scale 100 == base tables
    l100, c100 = _quality_tables(100)
    assert (l100 == 1).all() and (c100 == 1).all()
    l10, _ = _quality_tables(10)
    assert (l10 >= l50).all() and (l10 > l50).any()


def test_stream_structure_and_guards():
    img = np.full((8, 8, 3), 100, np.uint8)
    data = encode_jpeg(img, 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"BM" + data)
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 8, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((8, 8, 4), np.uint8))


def test_unsupported_sof_refused_with_seam_message():
    # progressive (SOF2) is now a supported profile; the remaining
    # lossless/extended/arithmetic SOFs still refuse loudly
    img = np.full((8, 8, 3), 100, np.uint8)
    data = bytearray(encode_jpeg(img, 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC3  # flip SOF0 -> SOF3 (lossless sequential)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_bytes(bytes(data))


def test_baseline_scan_mislabeled_progressive_refused():
    # a baseline single-scan stream whose SOF was flipped to SOF2 is
    # MALFORMED progressive data (a DC scan may not carry Se=63) and
    # must refuse, not mis-decode
    img = np.full((8, 8, 3), 100, np.uint8)
    data = bytearray(encode_jpeg(img, 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se != 0"):
        decode_jpeg_bytes(bytes(data))


def test_multimodal_seam_dispatches_jpeg():
    from pandas_sigproc_spark.operators.multimodal import (
        _decode_image,
        _encode_image_like,
        decode_payload,
    )

    img = _gradient(24, 16)
    payload = encode_jpeg(img, 100)
    px = _decode_image(payload)
    assert px.shape == img.shape
    assert decode_payload(payload, "image", codec="real") == (16, 24, 1)
    re = _encode_image_like(px, payload)
    assert re[:2] == b"\xff\xd8"  # format-preserving re-encode


def test_spark_media_pipeline_decodes_jpeg(spark):
    """The full distributed path: encode per-channel images as JPEG in
    applyInPandas, decode via the zero-shuffle mapInPandas feature
    extractor — dimensions come out of a genuine stream parse."""
    import __spark_entry__ as entry_mod

    out = entry_mod.q_media_image_jpeg(spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert (pdf["width"] == 16).all()
    assert (pdf["n_frames"] == 1).all()
    assert (pdf["height"] > 0).all()


def _colorful(seed: int = 7) -> np.ndarray:
    r = np.random.default_rng(seed)
    col = np.stack(
        [np.kron(r.standard_normal((8, 8)), np.ones((8, 8))) for _ in range(3)],
        -1,
    )
    return ((col - col.min()) / (col.max() - col.min()) * 255).astype(np.uint8)


def test_420_roundtrip_and_compression():
    img = _colorful()
    d = decode_jpeg_bytes(encode_jpeg(img, 90, subsampling="420"))
    assert d.shape == img.shape
    assert _psnr(img, d) > 30
    # chroma-area quartering shows up as real byte savings on natural
    # content (noise: ~2x; smooth color: ~1.4x) — blocky synthetics can
    # invert it because the 2x2 box mean creates off-grid edges
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8).astype(np.uint8)
    assert len(encode_jpeg(noise, 90, subsampling="420")) < 0.6 * len(
        encode_jpeg(noise, 90)
    )
    x = np.linspace(0, 255, 64)
    smooth_col = np.stack(
        [np.add.outer(x, x) / 2, np.add.outer(x[::-1], x) / 2, np.tile(x, (64, 1))],
        -1,
    ).astype(np.uint8)
    assert len(encode_jpeg(smooth_col, 90, subsampling="420")) < 0.8 * len(
        encode_jpeg(smooth_col, 90)
    )
    # luma survives subsampling almost untouched: gray content at 4:2:0
    # stays near the 4:4:4 fidelity
    gray_img = _gradient()
    assert _psnr(
        gray_img, decode_jpeg_bytes(encode_jpeg(gray_img, 90, subsampling="420"))
    ) > 45


def test_420_odd_dims_and_restarts():
    img = _colorful(9)[:37, :45]
    d = decode_jpeg_bytes(encode_jpeg(img, 90, subsampling="420"))
    assert d.shape == (37, 45, 3)
    assert _psnr(img, d) > 30
    plain = decode_jpeg_bytes(encode_jpeg(img, 90, subsampling="420"))
    rst = decode_jpeg_bytes(
        encode_jpeg(img, 90, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(plain, rst)


def test_420_sampling_factors_in_header():
    data = encode_jpeg(_colorful(), 90, subsampling="420")
    i = data.index(b"\xff\xc0")
    # marker(2) + len(2) prec(1) h(2) w(2) nc(1) = 10, then
    # (id, samp, qid) triples — samp is the second byte of each triple
    samp_y = data[i + 11]
    samp_cb = data[i + 14]
    assert samp_y == 0x22 and samp_cb == 0x11
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(_colorful(), 90, subsampling="422")


def test_resize_images_preserves_jpeg_container(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.multimodal import resize_images
    from pandas_sigproc_spark.sources.jpeg import decode_jpeg_bytes as dec

    payload = encode_jpeg(_colorful(), 90, subsampling="420")
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [payload]}),
        "media_id long, payload binary",
    )
    out = resize_images(media, 24, 20, codec="real").collect()[0]
    assert (out.width, out.height) == (24, 20)
    px = dec(bytes(out.payload))  # re-encoded as a JPEG
    assert px.shape == (20, 24, 3)


def test_truncated_stream_raises_valueerror_not_indexerror():
    # r13 codec-sweep finding: callers skip corrupt payloads by catching
    # ValueError (the module's one malformed-input exception); truncation
    # used to leak bare IndexError from the bit reader / marker scan.
    img = _gradient(32, 32)
    blob = encode_jpeg(img, 90)
    # (cutting ONLY the final EOI byte still decodes — the scan data is
    # complete — so the smallest cut here is 5 bytes into the entropy
    # segment)
    for cut in (40, 20, 5):
        with pytest.raises(ValueError):
            decode_jpeg_bytes(blob[:-cut])


def test_truncated_progressive_raises_valueerror():
    img = _gradient(32, 32)
    blob = encode_jpeg(img, 90, progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg_bytes(blob[:-30])


def test_12bit_precision_refuses_by_name():
    # Flip the SOF sample-precision byte to 12: the 8-bit level shift
    # would silently return garbage (r13 codec-sweep finding).
    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, 90))
    i = blob.find(b"\xff\xc0")
    assert i >= 0
    assert blob[i + 4] == 8  # precision byte of the SOF segment
    blob[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg_bytes(bytes(blob))


def test_noninterleaved_baseline_scan_refuses_by_name():
    # A baseline SOS covering fewer components than the frame declares
    # (spec-legal non-interleaved layout) must refuse loudly, not decode
    # the partial scan as interleaved garbage (r13 codec-sweep finding).
    img = _gradient(16, 16)
    blob = bytearray(encode_jpeg(img, 90))
    i = blob.find(b"\xff\xda")
    assert i >= 0
    ns = blob[i + 4]
    assert ns == 3
    # rewrite the SOS header in place to claim ONE component: the
    # spectral bytes move up, so splice a shortened segment
    seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
    comp0 = bytes(blob[i + 5 : i + 7])  # first (cid, tables) pair
    tail = bytes(blob[i + 5 + 2 * ns : i + 2 + seg_len])  # ss/se/ahal
    new_seg = (8).to_bytes(2, "big") + bytes([1]) + comp0 + tail
    blob[i + 2 : i + 2 + seg_len] = new_seg
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg_bytes(bytes(blob))


def test_decode_wall_is_not_quadratic_in_scan_size():
    # r13 codec-sweep finding: the bit reader never masked consumed bits
    # out of its accumulator, making decode O(bits^2) — a 256x256 noise
    # image took 57s (0.67s masked).  Generous ceiling so host jitter
    # can't flake this; a quadratic regression blows past it by 10x.
    import time

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    blob = encode_jpeg(img, 95)
    t0 = time.time()
    out = decode_jpeg_bytes(blob)
    wall = time.time() - t0
    assert out.shape == (128, 128, 3)
    assert wall < 3.0, f"decode took {wall:.1f}s — bit reader quadratic again?"


def test_truncated_restart_stream_raises_valueerror():
    # r13 review finding: sync_restart's marker scan leaked IndexError
    # when a DRI stream is cut before the next RSTn marker.
    img = _gradient(32, 32)
    blob = encode_jpeg(img, 90, restart_interval=1)
    for cut in range(5, 60, 7):
        try:
            decode_jpeg_bytes(blob[:-cut])
        except ValueError:
            pass  # the contract: ValueError or a successful decode
