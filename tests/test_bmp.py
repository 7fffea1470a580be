"""From-scratch BMP / BMPV codec (sources/bmp.py) and the real-codec
paths of the multimodal operators (operators/multimodal.py)."""

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.sources.bmp import (
    HEADER_BYTES,
    decode_bmp_bytes,
    decode_bmpv,
    encode_bmp,
    encode_bmpv,
    resize_nearest,
    row_stride,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (16, 16), (13, 3), (2, 31)])
def test_bmp_roundtrip_exact(shape):
    px = _img(*shape)
    data = encode_bmp(px)
    assert data[:2] == b"BM"
    assert len(data) == HEADER_BYTES + row_stride(shape[1]) * shape[0]
    out = decode_bmp_bytes(data)
    assert out.dtype == np.uint8 and out.shape == px.shape
    assert (out == px).all()


def test_bmp_row_padding():
    # width 5 -> 15 bytes of pixels padded to 16 per row
    assert row_stride(5) == 16
    assert row_stride(16) == 48  # already aligned


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp_bytes(b"nope")
    with pytest.raises(ValueError):
        decode_bmp_bytes(b"BM" + b"\x00" * 60)


def test_resize_nearest_semantics():
    px = _img(4, 4, seed=1)
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 3)
    # Nearest-neighbour 2x upsample duplicates each source pixel 2x2.
    assert (up[::2, ::2] == px).all() and (up[1::2, 1::2] == px).all()
    down = resize_nearest(px, 2, 2)
    assert (down == px[::2, ::2]).all()


def test_bmpv_roundtrip():
    frames = [encode_bmp(_img(3, 4, seed=s)) for s in range(5)]
    blob = encode_bmpv(frames)
    assert decode_bmpv(blob) == frames


def test_decode_payload_real_image_and_video():
    from pandas_sigproc_spark.operators.multimodal import decode_payload

    img = encode_bmp(_img(6, 9))
    assert decode_payload(img, "image", codec="real") == (9, 6, 1)
    vid = encode_bmpv([encode_bmp(_img(6, 9, seed=s)) for s in range(7)])
    assert decode_payload(vid, "video", codec="real") == (9, 6, 7)
    with pytest.raises(NotImplementedError):
        decode_payload(b"x", "hologram", codec="real")


def test_resize_images_real_spark(spark):
    from pandas_sigproc_spark.operators.multimodal import resize_images

    src = _img(10, 12, seed=3)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [encode_bmp(src)]})
    )
    out = resize_images(media, 6, 5, codec="real").collect()
    assert len(out) == 1 and (out[0].width, out[0].height) == (6, 5)
    got = decode_bmp_bytes(bytes(out[0].payload))
    assert (got == resize_nearest(src, 6, 5)).all()


def test_sample_frames_real_spark(spark):
    from pandas_sigproc_spark.operators.multimodal import sample_frames

    frames = [encode_bmp(_img(4, 4, seed=s)) for s in range(10)]
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7], "kind": ["video"], "payload": [encode_bmpv(frames)]}
        )
    )
    rows = sorted(
        sample_frames(media, every_n=3, codec="real").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 3, 6, 9]
    for r in rows:
        # every emitted frame is itself a standalone, decodable BMP
        assert bytes(r.frame) == frames[r.frame_idx]
        assert decode_bmp_bytes(bytes(r.frame)).shape == (4, 4, 3)
