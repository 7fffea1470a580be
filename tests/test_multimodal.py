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


def test_real_codec_rejects_non_bmp_image_bytes(media):
    # codec='real' images now decode 24-bit BMP for real (sources/bmp.py);
    # the fixture's payloads are raw text bytes, which must be rejected
    # loudly (missing 'BM' magic), never silently faked.
    with pytest.raises(Exception) as ei:
        extract_media_features(
            media.filter("kind = 'image'"), codec="real"
        ).collect()
    assert "BMP" in str(ei.value) or "ValueError" in str(ei.value)


def test_real_codec_decodes_wav_audio_end_to_end(spark):
    # codec='real' audio: whole WAV files as binary payloads, decoded in
    # executors by the from-scratch RIFF codec (sources/wav.py) — one real
    # media format flows through the full mapInPandas pipeline.
    from pandas_sigproc_spark.sources.wav import encode_wav_bytes

    fs = 8000
    specs = {10: 800, 11: 123, 12: 4096}  # media_id -> n_samples
    rows = []
    for mid, n in specs.items():
        t = np.arange(n) / fs
        left = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        rows.append((mid, "audio", bytearray(encode_wav_bytes(fs, left)), {}))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = {
        r["media_id"]: r
        for r in extract_media_features(media, codec="real").collect()
    }
    for mid, n in specs.items():
        r = out[mid]
        # write_wav duplicates mono into stereo (reference tools.py:246-247)
        assert (r["width"], r["height"], r["n_frames"]) == (n, 2, 1)
        assert r["n_bytes"] == 44 + n * 2 * 4  # RIFF header + stereo f32
    # golden roundtrip of the decoded samples themselves
    from pandas_sigproc_spark.sources.wav import decode_wav_bytes

    rate, arr = decode_wav_bytes(bytes(rows[0][2]))
    assert rate == fs
    expected = np.sin(2 * np.pi * 440 * (np.arange(800) / fs)).astype(np.float32)
    np.testing.assert_array_equal(arr[:, 0], expected)


class TestRoundTwelveMediaRegressions:
    """r12 review findings on the multimodal/viz/channel tier."""

    def test_sample_frames_real_gif_video(self, spark):
        import pandas as pd

        from pandas_sigproc_spark.operators.multimodal import sample_frames
        from pandas_sigproc_spark.sources.bmp import decode_bmp_bytes
        from pandas_sigproc_spark.sources.gif import encode_gif

        f0 = np.zeros((4, 4, 3), dtype=np.uint8)
        f1 = np.full((4, 4, 3), 200, dtype=np.uint8)
        gif = encode_gif([f0, f1])
        df = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": [1], "kind": ["video"], "payload": [gif]}
            )
        )
        rows = sample_frames(df, every_n=1, codec="real").collect()
        assert [r["frame_idx"] for r in rows] == [0, 1]
        # frames re-encode as decodable BMP bytes
        px = decode_bmp_bytes(bytes(rows[1]["frame"]))
        assert px.shape == (4, 4, 3) and px.max() == 200

    def test_resize_images_real_skips_non_images(self, spark):
        import pandas as pd

        from pandas_sigproc_spark.operators.multimodal import resize_images
        from pandas_sigproc_spark.sources.bmp import encode_bmp
        from pandas_sigproc_spark.sources.wav import encode_wav_bytes

        img = encode_bmp(np.zeros((6, 6, 3), dtype=np.uint8))
        wav = encode_wav_bytes(100, np.zeros(16, dtype=np.float32))
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "media_id": [1, 2],
                    "kind": ["image", "audio"],
                    "payload": [img, wav],
                }
            )
        )
        rows = resize_images(df, 3, 3, codec="real").collect()
        assert [r["media_id"] for r in rows] == [1]  # audio passed over

    def test_decode_image_refuses_bmpv(self):
        import pytest

        from pandas_sigproc_spark.operators.multimodal import _decode_image
        from pandas_sigproc_spark.sources.bmp import encode_bmp, encode_bmpv

        blob = encode_bmpv([encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))])
        with pytest.raises(NotImplementedError, match="BMPV"):
            _decode_image(blob)

    def test_fake_decode_rejects_unknown_kind_and_every_n(self, spark):
        import pandas as pd
        import pytest

        from pandas_sigproc_spark.operators.multimodal import (
            decode_payload,
            sample_frames,
        )

        with pytest.raises(ValueError, match="unknown media kind"):
            decode_payload(b"xx", "txet", codec="fake")
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [1], "kind": ["video"], "payload": [b"x"]})
        )
        with pytest.raises(ValueError, match="every_n"):
            sample_frames(df, every_n=0)

    def test_null_payload_rows_flow_as_empty(self, spark):
        # r15 review finding: a NULL payload died in np.frombuffer(None)
        # with an anonymous TypeError in all three pre-r14 operators,
        # and synthesize_media MANUFACTURED such rows from NULL-text
        # documents (F.encode propagates NULL).  The text tier's
        # null-as-empty rule applies.
        import pandas as pd

        from pandas_sigproc_spark.operators.multimodal import (
            extract_media_features,
            resize_images,
            sample_frames,
            synthesize_media,
        )

        media = spark.createDataFrame(
            [
                (1, "image", None),
                (2, "video", None),
                (3, "audio", bytearray(b"abc")),
            ],
            "media_id long, kind string, payload binary",
        )
        feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
        assert feats[1]["n_bytes"] == 0 and feats[1]["byte_mean"] == 0.0
        assert feats[3]["n_bytes"] == 3
        rows = resize_images(media, 4, 4).collect()
        assert {r["media_id"] for r in rows} == {1, 2, 3}
        assert all(len(r["payload"]) == 16 for r in rows)
        fr = sample_frames(media, every_n=1).collect()
        assert [r["media_id"] for r in fr] == [2]  # video row, empty frame
        # synthesize_media never emits NULL payloads for NULL text
        docs = spark.createDataFrame(
            [(5, None, "s", "en")], "doc_id long, text string, source string, lang string"
        )
        out = synthesize_media(docs).collect()
        assert out[0]["payload"] == bytearray(b"")

    def test_channels_to_signals_empty_list(self, spark):
        from pandas_sigproc_spark.sources.channel import channels_to_signals

        sig, cat = channels_to_signals(spark, [])
        assert sig.count() == 0 and cat.count() == 0
        assert "channel_id" in sig.columns and "channel_id" in cat.columns

    def test_svg_drops_nan_points_linear_mode(self, spark, tmp_path):
        import pandas as pd

        from pandas_sigproc_spark.viz import save_plot_svg

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": ["c"] * 4,
                    "t": [0.0, 1.0, 2.0, 3.0],
                    "value": [1.0, None, 3.0, 2.0],
                }
            )
        )
        path = str(tmp_path / "p.svg")
        save_plot_svg(df, path)
        svg = open(path).read()
        assert "nan" not in svg  # the NaN row must be dropped, not plotted
