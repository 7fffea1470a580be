"""Perceptual-hash image dedup (operators/imagedup.py): hash invariance
anchors, banding EXACTNESS vs brute-force Hamming, the keep-first
verdict, and the hot-bucket guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.imagedup import (
    PHASH_BITS,
    phash_bytes,
    phash_dedup,
    phash_images,
    phash_near_pairs,
)
from pandas_sigproc_spark.sources.bmp import encode_bmp, resize_nearest
from pandas_sigproc_spark.sources.jpeg import encode_jpeg


def _smooth(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    """Low-frequency random image — the regime pHash is built for."""
    r = np.random.default_rng(seed)
    base = r.standard_normal((8, 8))
    big = np.kron(base, np.ones((h // 8, w // 8)))
    big = (big - big.min()) / (big.max() - big.min()) * 255
    return np.repeat(big[:, :, None], 3, 2).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_hash_invariance_anchors():
    img = _smooth(1)
    h0 = phash_bytes(encode_bmp(img))
    # identical content through different containers / recompression
    assert _ham(h0, phash_bytes(encode_jpeg(img, 90))) == 0
    assert _ham(h0, phash_bytes(encode_jpeg(img, 50))) <= 4
    # geometric + photometric near-dups stay near
    assert _ham(h0, phash_bytes(encode_bmp(resize_nearest(img, 48, 48)))) <= 4
    bright = np.clip(img.astype(float) * 1.15, 0, 255).astype(np.uint8)
    assert _ham(h0, phash_bytes(encode_bmp(bright))) <= 6
    # unrelated content lands far away
    assert _ham(h0, phash_bytes(encode_bmp(_smooth(2)))) > 12
    rng = np.random.default_rng(4)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8).astype(np.uint8)
    assert _ham(h0, phash_bytes(encode_bmp(noise))) > 12


def _media_df(spark, imgs: dict[int, bytes]):
    return spark.createDataFrame(
        pd.DataFrame(
            {"media_id": list(imgs), "payload": [imgs[k] for k in imgs]}
        ),
        "media_id long, payload binary",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """20 distinct smooth images + planted near-dups: 100+i is a JPEG
    recompression of i for i in 0..4, 200 is a brightened copy of 0."""
    imgs = {i: encode_bmp(_smooth(i + 10)) for i in range(20)}
    for i in range(5):
        imgs[100 + i] = encode_jpeg(_smooth(i + 10), 85)
    b = np.clip(_smooth(10).astype(float) * 1.1, 0, 255).astype(np.uint8)
    imgs[200] = encode_bmp(b)
    return _media_df(spark, imgs), imgs


def test_banded_pairs_equal_bruteforce(corpus):
    media, imgs = corpus
    got = {
        (r.m1, r.m2): r.hamming
        for r in phash_near_pairs(media, 6).collect()
    }
    hashes = {k: phash_bytes(v) for k, v in imgs.items()}
    want = {
        (a, b): _ham(hashes[a], hashes[b])
        for a in hashes
        for b in hashes
        if a < b and _ham(hashes[a], hashes[b]) <= 6
    }
    assert got == want  # banding is EXACT in Hamming space
    # the planted recompressions are all found
    for i in range(5):
        assert (i, 100 + i) in got


def test_phash_images_schema_and_determinism(corpus):
    media, imgs = corpus
    out = phash_images(media).toPandas().set_index("media_id")["phash"]
    assert len(out) == len(imgs)
    for k, v in imgs.items():
        expect = phash_bytes(v)
        assert int(out[k]) == expect


def test_dedup_keep_first(corpus):
    media, imgs = corpus
    verdicts = {
        r.media_id: r.keep for r in phash_dedup(media, 6).collect()
    }
    assert len(verdicts) == len(imgs)
    for i in range(5):
        assert verdicts[i] is True  # lower id kept
        assert verdicts[100 + i] is False  # its recompression dropped
    # images with no near neighbor are kept
    lonely = [k for k in imgs if 5 <= k < 20]
    assert all(verdicts[k] for k in lonely)


def test_hot_bucket_guard_fires(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    payload = encode_bmp(_smooth(77))
    media = _media_df(spark, {i: payload for i in range(12)})
    with pytest.raises(SparkRuntimeException, match="phash_near_pairs"):
        phash_near_pairs(media, 3, max_bucket_rows=5).collect()
    # and the lift works
    n = phash_near_pairs(media, 3, max_bucket_rows=None).count()
    assert n == 12 * 11 // 2


def test_validation(spark):
    media = _media_df(spark, {0: encode_bmp(_smooth(1))})
    with pytest.raises(ValueError):
        phash_near_pairs(media, PHASH_BITS)
    with pytest.raises(ValueError):
        phash_near_pairs(media, -1)


def test_video_frame_hashes_compose(spark):
    """BMPV videos: sampled-frame hashes match the per-image hashes of
    the same frames, and a recompressed/identical video's frame table
    joins back at Hamming 0 per aligned frame."""
    from pandas_sigproc_spark.operators.imagedup import phash_frames
    from pandas_sigproc_spark.sources.bmp import encode_bmpv

    frames_a = [encode_bmp(_smooth(40 + i)) for i in range(6)]
    vids = {
        1: encode_bmpv(frames_a),
        2: encode_bmpv(frames_a),          # identical video
        3: encode_bmpv([encode_bmp(_smooth(90 + i)) for i in range(6)]),
    }
    media = _media_df(spark, vids)
    out = phash_frames(media, every_n=2).toPandas()
    # 3 sampled frames per video (0, 2, 4)
    assert sorted(out[out.media_id == 1]["frame_idx"]) == [0, 2, 4]
    # per-frame hashes equal the standalone image hashes
    for _, r in out[out.media_id == 1].iterrows():
        assert int(r.phash) == phash_bytes(frames_a[int(r.frame_idx)])
    # identical videos: all aligned frames at Hamming 0
    a = out[out.media_id == 1].set_index("frame_idx")["phash"]
    b = out[out.media_id == 2].set_index("frame_idx")["phash"]
    assert (a == b).all()
    # unrelated video: frames far away
    c = out[out.media_id == 3].set_index("frame_idx")["phash"]
    assert all(_ham(int(a[i]), int(c[i])) > 12 for i in a.index)


def test_video_near_pairs(spark):
    """The packaged composition (phash_frames -> banded Hamming join ->
    video roll-up): identical videos match on every aligned frame pair,
    unrelated videos do not pair, within-video frame matches are
    excluded, and the frame_hashes= seam short-circuits the decode."""
    from pandas_sigproc_spark.operators.imagedup import (
        phash_frames,
        video_near_pairs,
    )
    from pandas_sigproc_spark.sources.bmp import encode_bmpv

    frames_a = [encode_bmp(_smooth(40 + i)) for i in range(4)]
    vids = {
        1: encode_bmpv(frames_a),
        2: encode_bmpv(frames_a),  # identical video
        3: encode_bmpv([encode_bmp(_smooth(90 + i)) for i in range(4)]),
        # 4 repeats ONE frame twice internally: within-video pairs must
        # not leak into the cross-video output
        4: encode_bmpv([frames_a[0], frames_a[0]]),
    }
    media = _media_df(spark, vids)
    out = video_near_pairs(media, 3).toPandas().set_index(["v1", "v2"])
    # identical videos: 4 aligned frame pairs at Hamming 0 (plus any
    # true near-matches between different smooth frames)
    assert out.loc[(1, 2), "n_frame_pairs"] >= 4
    assert out.loc[(1, 2), "best_hamming"] == 0
    # video 4 duplicates frame_a[0]: matches videos 1 and 2 (2 frame
    # pairs each: its two copies x their frame 0), never itself
    assert out.loc[(1, 4), "n_frame_pairs"] >= 2
    assert (3, 3) not in out.index and (4, 4) not in out.index
    # unrelated video never pairs with the a-family
    for v in (1, 2):
        assert (v, 3) not in out.index
    # frame_hashes seam: identical result without re-decoding
    fh = phash_frames(media)
    out2 = (
        video_near_pairs(media, 3, frame_hashes=fh)
        .toPandas()
        .set_index(["v1", "v2"])
    )
    pd.testing.assert_frame_equal(out2.sort_index(), out.sort_index())


def test_phash_rounding_margin_audit():
    """The media_phash oracle compares ROUND(coef, 3) across two engines
    whose DCT summation orders differ by ~1e-9; that is hash-stable iff
    no gate-corpus coefficient sits within the cross-engine drift of a
    0.5e-3 rounding boundary (where the engines could round apart, and
    where np.round's half-even vs SQL ROUND's half-away would also
    disagree).  Measure the minimum boundary distance per SF so a data
    refresh that erodes the margin fails HERE, not at the driver gate."""
    import os

    import duckdb

    import __spark_entry__ as entry_mod
    from pandas_sigproc_spark.operators.imagedup import (
        PHASH_SIZE,
        _dct32,
    )
    from pandas_sigproc_spark.sources.bmp import resize_nearest

    t = _dct32()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for tbl in ("events",):
            con.sql(
                f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'"
            )
        rows = con.sql(
            f"""WITH {entry_mod._SIG_CTE}
                SELECT channel_id,
                       LIST(CAST(TRUNC(value * 10.0) AS BIGINT) % 256
                            ORDER BY t, seq) AS pb
                FROM sig GROUP BY channel_id"""
        ).fetchall()
        worst = 1.0
        for _cid, pb in rows:
            b = np.asarray(pb, dtype=np.uint8)
            h = (len(b) + 15) // 16
            flat = np.zeros(h * 16, dtype=np.uint8)
            flat[: len(b)] = b
            px = np.repeat(flat.reshape(h, 16)[:, :, None], 3, axis=2)
            small = resize_nearest(px, PHASH_SIZE, PHASH_SIZE)[:, :, 0].astype(
                np.float64
            )
            coef = (t @ small @ t.T)[:8, :8].reshape(-1)[1:]
            frac = np.abs((coef * 1000.0) % 1.0 - 0.5)
            worst = min(worst, float(frac.min() * 1e-3))
        # measured cross-engine drift (numpy BLAS matmul vs DuckDB
        # ordered LIST_SUM folds, re-measured r9): 9.1e-13 at sf0.001,
        # 1.3e-12 at sf0.01 — the bar is ~100x that, and the observed
        # minimum boundary distance (6.6e-8 at sf0.001) clears it by
        # another ~500x
        assert worst > 1e-10, (
            f"{sf}: a DCT coefficient sits {worst:.2e} from a round-3 "
            "boundary — within reach of cross-engine summation drift "
            "(~1e-12 measured); raise the rounding digits in "
            "phash_bytes AND the oracle"
        )


def test_phash_pairs_max_hamming_zero(spark):
    # r13 review finding: the single full-width band built
    # F.lit(2^64-1), overflowing LongType — exact-dup radius crashed.
    from pandas_sigproc_spark.operators.imagedup import phash_near_pairs

    hashes = spark.createDataFrame(
        [(1, 42), (2, 42), (3, 43)], "media_id long, phash long"
    )
    rows = phash_near_pairs(None, 0, hashes=hashes).collect()
    assert [(r["m1"], r["m2"], r["hamming"]) for r in rows] == [(1, 2, 0)]


def test_video_pairs_negative_media_id_refused(spark):
    from pandas_sigproc_spark.operators.imagedup import video_near_pairs

    fr = spark.createDataFrame(
        [(-1, 0, 10), (-1, 5, 10), (0, 0, 10)],
        "media_id long, frame_idx long, phash long",
    )
    with pytest.raises(Exception, match="outside"):
        video_near_pairs(None, frame_hashes=fr, max_frames=1 << 20).collect()


def test_phash_dedup_persist_hook(spark):
    from pandas_sigproc_spark.operators.imagedup import phash_dedup

    blob = encode_bmp(_smooth(3))
    media = spark.createDataFrame(
        [(1, blob), (2, blob)],
        "media_id long, payload binary",
    )
    blocks = []

    def hook(d):
        blocks.append(d)
        return d.persist()

    out = phash_dedup(media, persist=hook).collect()
    assert len(blocks) == 1 and len(out) == 2
    keep = {r["media_id"]: r["keep"] for r in out}
    assert keep == {1: True, 2: False}
    for b in blocks:
        b.unpersist()
