"""From-scratch PNG codec: roundtrip, all five scanline filters, color
types, and corruption rejection (RFC 2083 subset in sources/png.py)."""

import struct
import zlib

import numpy as np
import pytest

from pandas_sigproc_spark.sources import png


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_roundtrip_rgb():
    px = _rand_img(13, 17)
    out = png.decode_png_bytes(png.encode_png(px))
    assert np.array_equal(out, px)


def _filter_line(ftype, line, prev, bpp):
    """Apply a PNG filter to a RECONSTRUCTED scanline (encoder side)."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    out = np.zeros_like(line)
    for i in range(len(line)):
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i]
        ul = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = png._paeth(int(left), int(up), int(ul))
        out[i] = (line[i] - pred) & 0xFF
    return out.astype(np.uint8)


def _encode_with_filters(px, ftypes):
    """Hand-build a PNG whose scanlines use the given filter types."""
    h, w, _ = px.shape
    stride = 3 * w
    flat = px.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = ftypes[y % len(ftypes)]
        raw.append(ftype)
        raw.extend(_filter_line(ftype, flat[y], prev, 3).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + png._chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filters_reconstruct(ftypes):
    px = _rand_img(11, 7, seed=sum(ftypes) + 1)
    data = _encode_with_filters(px, ftypes)
    assert np.array_equal(png.decode_png_bytes(data), px)


def test_rgba_and_grey_decode():
    h, w = 5, 6
    rgba = np.random.default_rng(2).integers(0, 256, (h, w, 4), dtype=np.uint8)
    raw = np.zeros((h, 1 + 4 * w), np.uint8)
    raw[:, 1:] = rgba.reshape(h, 4 * w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    data = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png_bytes(data), rgba[:, :, :3])
    grey = np.random.default_rng(3).integers(0, 256, (h, w, 1), dtype=np.uint8)
    raw = np.zeros((h, 1 + w), np.uint8)
    raw[:, 1:] = grey.reshape(h, w)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    data = (
        png.SIGNATURE
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + png._chunk(b"IEND", b"")
    )
    assert np.array_equal(png.decode_png_bytes(data), np.repeat(grey, 3, axis=2))


def test_corruption_is_loud():
    good = bytearray(png.encode_png(_rand_img(4, 4)))
    with pytest.raises(ValueError, match="signature"):
        png.decode_png_bytes(b"JFIF" + bytes(good))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # flip an IHDR byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png_bytes(bytes(bad))
    with pytest.raises(ValueError, match="palette|color type"):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        png.decode_png_bytes(
            png.SIGNATURE + png._chunk(b"IHDR", ihdr) + png._chunk(b"IEND", b"")
        )


def test_multimodal_dispatch_png(spark):
    """PNG payloads flow through the REAL media operators end to end."""
    import pandas as pd
    from pandas_sigproc_spark.operators.multimodal import (
        extract_media_features,
        resize_images,
    )

    imgs = {1: _rand_img(9, 12, 1), 2: _rand_img(6, 4, 2)}
    pdf = pd.DataFrame(
        {
            "media_id": list(imgs),
            "kind": "image",
            "payload": [png.encode_png(v) for v in imgs.values()],
            "meta": [{} for _ in imgs],
        }
    )
    df = spark.createDataFrame(
        pdf, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    feats = {r.media_id: r for r in extract_media_features(df, codec="real").collect()}
    assert (feats[1].width, feats[1].height) == (12, 9)
    assert (feats[2].width, feats[2].height) == (4, 6)
    rs = {r.media_id: r for r in resize_images(df, 8, 8, codec="real").collect()}
    # format-preserving: output is PNG again, with the requested size
    out = png.decode_png_bytes(bytes(rs[1].payload))
    assert out.shape == (8, 8, 3)
