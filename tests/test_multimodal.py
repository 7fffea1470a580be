"""Multimodal plumbing tests: binary payload columns through Arrow-batched
mapInPandas — schema, batch iteration, fan-out (frame sampling), and the
deliberately-stubbed codec seam (operators/multimodal.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.operators.multimodal import (
    decode_payload,
    extract_media_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": [
                    "tiny",
                    "a bit longer payload",
                    "video-ish payload " * 20,
                    "x",
                    "audio words here",
                    "another video payload " * 9,
                ],
                "lang": ["en"] * 6,
                "source": ["s0"] * 6,
            }
        )
    )
    return synthesize_media(docs)


def test_synthesize_media_schema_and_kinds(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert dict(media.dtypes)["payload"] == "binary"
    assert rows[0]["kind"] == "image" and rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video"
    assert bytes(rows[0]["payload"]) == b"tiny"
    assert rows[3]["meta"]["source"] == "s0"


def test_extract_features_matches_local_numpy(media):
    out = {r["media_id"]: r for r in extract_media_features(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    kinds = {0: "image", 1: "audio", 2: "video", 3: "image", 4: "audio", 5: "video"}
    for mid, payload in src.items():
        buf = np.frombuffer(payload, np.uint8)
        r = out[mid]
        w, h, nf = decode_payload(payload, kinds[mid])
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["n_bytes"] == len(payload)
        assert r["byte_mean"] == pytest.approx(buf.mean())
        assert r["byte_std"] == pytest.approx(buf.std())
        assert r["head_hash"] == hashlib.md5(payload[:64]).hexdigest()[:16]


def test_resize_exact_output_size(media):
    out = resize_images(media, 8, 4).collect()
    assert len(out) == 6
    for r in out:
        assert len(bytes(r["payload"])) == 8 * 4
        assert (r["width"], r["height"]) == (8, 4)


def test_resize_tiles_short_payloads(media):
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = {r["media_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 4).collect()}
    # np.resize cycles the buffer: first len(src) bytes are the source
    assert out[3][: len(src[3])] == src[3]
    assert out[3][1:2] == src[3][0:1]  # wrapped around (1-byte source)


def test_sample_frames_video_only_fanout(media):
    out = sample_frames(media, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # only the two video payloads survive
    assert set(by_id) == {2, 5}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, rows in by_id.items():
        _, _, nf = decode_payload(src[mid], "video")
        assert len(rows) == len(range(0, nf, 10))
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs[0] == 0
        fb = max(1, len(src[mid]) // nf)
        for r in rows:
            start = r["frame_idx"] * fb
            assert bytes(r["frame"]) == src[mid][start : start + fb]


def test_real_codec_is_explicit_stub(media):
    with pytest.raises(Exception) as ei:
        extract_media_features(media, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
