"""Media hash stores (operators/sigstore.py write/read/compact_media_
hash_store) and the incremental image probe (operators/imagedup.py
incremental_phash_dedup): store==recompute equality, the batch-commit
durability contract carried over from the text signature store, and
the keep-first incremental semantics."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.audiodup import (
    audio_fingerprints,
    audio_near_pairs,
    incremental_audio_dedup,
)
from pandas_sigproc_spark.operators.imagedup import (
    incremental_phash_dedup,
    phash_bytes,
    phash_images,
)
from pandas_sigproc_spark.operators.sigstore import (
    compact_media_hash_store,
    read_media_hash_store,
    write_media_hash_store,
)
from pandas_sigproc_spark.sources.bmp import encode_bmp
from pandas_sigproc_spark.sources.wav import encode_wav_bytes


def _smooth(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    r = np.random.default_rng(seed)
    base = r.standard_normal((8, 8))
    big = np.kron(base, np.ones((h // 8, w // 8)))
    big = (big - big.min()) / (big.max() - big.min()) * 255
    return np.repeat(big[:, :, None], 3, 2).astype(np.uint8)


def _media_df(spark, imgs: dict[int, bytes]):
    return spark.createDataFrame(
        pd.DataFrame(
            {"media_id": list(imgs), "payload": [imgs[k] for k in imgs]}
        ),
        "media_id long, payload binary",
    )


def _corpus_and_delta(spark):
    corpus = _media_df(
        spark, {i: encode_bmp(_smooth(i)) for i in range(6)}
    )
    # delta: 10 = exact copy of 0; 11 = brightness near-dup of 1;
    # 12 = fresh; 13 = exact copy of 12 (earlier-delta rule)
    bright = np.clip(_smooth(1).astype(float) * 1.1, 0, 255).astype(np.uint8)
    delta = _media_df(
        spark,
        {
            10: encode_bmp(_smooth(0)),
            11: encode_bmp(bright),
            12: encode_bmp(_smooth(40)),
            13: encode_bmp(_smooth(40)),
        },
    )
    return corpus, delta


def _frames(df):
    return (
        df.toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )


def test_phash_store_equals_recompute(spark, tmp_path):
    corpus, delta = _corpus_and_delta(spark)
    path = str(tmp_path / "phash_store")
    write_media_hash_store(
        phash_images(corpus), path, kind="phash", hash_col="phash",
        partitions=2,
    )
    inline = _frames(
        incremental_phash_dedup(phash_images(corpus), delta, max_hamming=6)
    )
    stored = _frames(
        incremental_phash_dedup(
            read_media_hash_store(spark, path, kind="phash"),
            delta,
            max_hamming=6,
        )
    )
    pd.testing.assert_frame_equal(stored, inline)
    # semantics on the planted structure
    row = stored.set_index("media_id")
    assert bool(row.loc[10, "is_exact_dup"])  # byte-copy of corpus 0
    assert row.loc[11, "n_near_existing"] >= 1  # brightness near-dup
    assert bool(row.loc[12, "kept"])  # fresh, and EARLIER than its copy
    assert bool(row.loc[13, "is_exact_dup"])  # defers to 12
    assert row.loc[13, "n_near_delta_earlier"] >= 1
    assert not bool(row.loc[13, "kept"])


def test_phash_store_append_equals_rebuild(spark, tmp_path):
    corpus, _ = _corpus_and_delta(spark)
    h = phash_images(corpus)
    p1 = str(tmp_path / "rebuild")
    write_media_hash_store(h, p1, kind="phash", hash_col="phash")
    p2 = str(tmp_path / "appended")
    write_media_hash_store(
        h.filter("media_id < 3"), p2, kind="phash", hash_col="phash"
    )
    write_media_hash_store(
        h.filter("media_id >= 3"), p2, kind="phash", hash_col="phash",
        mode="append",
    )
    a = _frames(read_media_hash_store(spark, p1, kind="phash"))
    b = _frames(read_media_hash_store(spark, p2, kind="phash"))
    pd.testing.assert_frame_equal(a, b)


def test_media_store_refusals(spark, tmp_path):
    corpus, _ = _corpus_and_delta(spark)
    path = str(tmp_path / "refusals")
    write_media_hash_store(
        phash_images(corpus), path, kind="phash", hash_col="phash"
    )
    # kind mismatch: the longs cannot reveal it, meta must
    with pytest.raises(ValueError, match="kind"):
        read_media_hash_store(spark, path, kind="audio_fp")
    with pytest.raises(ValueError, match="kind"):
        write_media_hash_store(
            phash_images(corpus), path, kind="audio_fp", hash_col="phash",
            mode="append",
        )
    # metaless store is a crashed write
    os.remove(os.path.join(path, "_meta.json"))
    with pytest.raises(ValueError, match="_meta.json"):
        read_media_hash_store(spark, path, kind="phash")


def test_torn_media_append_invisible(spark, tmp_path):
    corpus, _ = _corpus_and_delta(spark)
    h = phash_images(corpus)
    path = str(tmp_path / "torn")
    write_media_hash_store(
        h.filter("media_id < 3"), path, kind="phash", hash_col="phash"
    )
    before = _frames(read_media_hash_store(spark, path, kind="phash"))
    # a crash between the table write and the meta stamp: batch dir
    # exists, meta does not list it
    h.filter("media_id >= 3").write.mode("overwrite").parquet(
        f"{path}/hashes/batch=99"
    )
    after = _frames(read_media_hash_store(spark, path, kind="phash"))
    pd.testing.assert_frame_equal(after, before)


def test_media_compact_preserves_and_sweeps(spark, tmp_path):
    corpus, delta = _corpus_and_delta(spark)
    h = phash_images(corpus)
    path = str(tmp_path / "compact")
    for lo in range(0, 6, 2):
        write_media_hash_store(
            h.filter(f"media_id >= {lo} and media_id < {lo + 2}"),
            path,
            kind="phash",
            hash_col="phash",
            mode="overwrite" if lo == 0 else "append",
            partitions=2,
        )
    # orphan debris from a crashed earlier GC (uncommitted id)
    os.makedirs(os.path.join(path, "hashes", "batch=77"))
    with open(os.path.join(path, "hashes", "batch=77", "_SUCCESS"), "w"):
        pass
    before = _frames(
        incremental_phash_dedup(
            read_media_hash_store(spark, path, kind="phash"), delta
        )
    )
    n_dirs_before = len(glob.glob(f"{path}/hashes/batch=*"))
    compact_media_hash_store(spark, path, kind="phash", partitions=1)
    dirs = glob.glob(f"{path}/hashes/batch=*")
    assert len(dirs) == 1 < n_dirs_before
    assert "batch=77" not in dirs[0]
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert len(meta["batches"]) == 1
    after = _frames(
        incremental_phash_dedup(
            read_media_hash_store(spark, path, kind="phash"), delta
        )
    )
    pd.testing.assert_frame_equal(after, before)


def test_audio_fp_store_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(7)

    def song(seed):
        r = np.random.default_rng(seed)
        t = np.arange(8192) / 8000.0
        freqs = r.uniform(100, 3500, 6)
        amps = r.uniform(0.4, 1.0, 6)
        return (np.sin(2 * np.pi * np.outer(t, freqs)) @ amps).astype(
            np.float64
        )

    clips = {i: encode_wav_bytes(8000, song(i)) for i in range(4)}
    clips[10] = clips[0]  # planted copy
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": list(clips), "payload": [clips[k] for k in clips]}
        ),
        "media_id long, payload binary",
    )
    fp = audio_fingerprints(media)
    path = str(tmp_path / "afp_store")
    write_media_hash_store(
        fp, path, kind="audio_fp", hash_col="fp", partitions=2
    )
    stored = read_media_hash_store(spark, path, kind="audio_fp")
    a = fp.toPandas().sort_values(["media_id", "fp"]).reset_index(drop=True)
    b = (
        stored.toPandas()
        .sort_values(["media_id", "fp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, a[b.columns])
    # matching off the store == matching off the recomputed table
    direct = (
        audio_near_pairs(media, 0.5, fingerprints=fp)
        .toPandas()
        .sort_values(["m1", "m2"])
        .reset_index(drop=True)
    )
    via_store = (
        audio_near_pairs(media, 0.5, fingerprints=stored)
        .toPandas()
        .sort_values(["m1", "m2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_store, direct[via_store.columns])
    assert ((direct.m1 == 0) & (direct.m2 == 10)).any()  # planted copy found


def _song(seed):
    r = np.random.default_rng(seed)
    t = np.arange(8192) / 8000.0
    freqs = r.uniform(100, 3500, 6)
    amps = r.uniform(0.4, 1.0, 6)
    return (np.sin(2 * np.pi * np.outer(t, freqs)) @ amps).astype(np.float64)


def _audio_df(spark, clips):
    return spark.createDataFrame(
        pd.DataFrame(
            {"media_id": list(clips), "payload": [clips[k] for k in clips]}
        ),
        "media_id long, payload binary",
    )


def test_incremental_audio_dedup_from_store(spark, tmp_path):
    """The audio twin: delta screened against the materialized fp store
    — store==recompute equality, the planted-copy / gain-copy / fresh /
    earlier-delta semantics, and the silence edge (zero hashes)."""
    corpus = _audio_df(spark, {i: encode_wav_bytes(8000, _song(i)) for i in range(4)})
    delta = _audio_df(
        spark,
        {
            10: encode_wav_bytes(8000, _song(0)),        # byte-copy of 0
            11: encode_wav_bytes(8000, 0.5 * _song(1)),  # gain copy of 1
            12: encode_wav_bytes(8000, _song(50)),       # fresh
            13: encode_wav_bytes(8000, _song(50)),       # copy of 12
            14: encode_wav_bytes(8000, np.zeros(4096)),  # silence
        },
    )
    fp = audio_fingerprints(corpus)
    path = str(tmp_path / "afp_incr")
    write_media_hash_store(fp, path, kind="audio_fp", hash_col="fp", partitions=2)
    stored = read_media_hash_store(spark, path, kind="audio_fp")
    inline = (
        incremental_audio_dedup(fp, delta, min_match_frac=0.5)
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    via_store = (
        incremental_audio_dedup(stored, delta, min_match_frac=0.5)
        .toPandas().sort_values("media_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_store, inline[via_store.columns])
    row = via_store.set_index("media_id")
    assert row.loc[10, "n_near_existing"] >= 1 and not row.loc[10, "kept"]
    assert row.loc[11, "n_near_existing"] >= 1  # gain-invariant hashes
    assert bool(row.loc[12, "kept"])  # fresh and earlier than its copy
    assert row.loc[13, "n_near_delta_earlier"] >= 1
    assert not bool(row.loc[13, "kept"])
    # silence: zero hashes -> vacuously kept, n_fp 0
    assert row.loc[14, "n_fp"] == 0 and bool(row.loc[14, "kept"])


# -- PQ code store (the materialized IVF-PQ encode) --------------------------


def _pq_vecs(spark, n=300, dim=16):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((n, dim))
    pdf = pd.DataFrame(
        {"vec_id": range(n), "v": [row.tolist() for row in base]}
    )
    return spark.createDataFrame(pdf, "vec_id long, v array<double>")


_PQ_KW = dict(nlist=8, m=4, ksub=16, dim=16)
_PQ_STORE_KW = dict(m=4, ksub=16, nlist=8)


def test_pq_store_probe_equals_recompute(spark, tmp_path):
    from pandas_sigproc_spark.operators.ann import ivf_pq_topk, pq_code_table
    from pandas_sigproc_spark.operators.sigstore import (
        read_pq_code_store,
        write_pq_code_store,
    )

    vecs = _pq_vecs(spark)
    vecs.persist().count()
    try:
        codes = pq_code_table(vecs, **_PQ_KW)
        path = str(tmp_path / "pqstore")
        write_pq_code_store(codes, path, **_PQ_STORE_KW, partitions=4)
        store = read_pq_code_store(spark, path, **_PQ_STORE_KW)
        # the stored table is the encode, bit-for-bit
        assert sorted(
            (r.vec_id, tuple(r.codes), r.list_id) for r in store.collect()
        ) == sorted(
            (r.vec_id, tuple(r.codes), r.list_id) for r in codes.collect()
        )
        # probing the store returns exactly the recompute path's answer
        probe = F.col("vec_id") < 20
        got = ivf_pq_topk(
            vecs, probe, k=3, nprobe=4, code_table=store, **_PQ_KW
        )
        want = ivf_pq_topk(vecs, probe, k=3, nprobe=4, **_PQ_KW)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
    finally:
        vecs.unpersist()


def test_pq_store_refuses_parameter_mismatch(spark, tmp_path):
    from pandas_sigproc_spark.operators.ann import pq_code_table
    from pandas_sigproc_spark.operators.sigstore import (
        read_pq_code_store,
        write_pq_code_store,
    )

    vecs = _pq_vecs(spark, n=40)
    codes = pq_code_table(vecs, **_PQ_KW)
    path = str(tmp_path / "pqstore")
    write_pq_code_store(codes, path, **_PQ_STORE_KW, partitions=2)
    # any of (m, ksub, nlist) off by anything refuses loudly
    with pytest.raises(ValueError, match="kind"):
        read_pq_code_store(spark, path, m=8, ksub=16, nlist=8)
    with pytest.raises(ValueError, match="kind"):
        read_pq_code_store(spark, path, m=4, ksub=32, nlist=8)
    with pytest.raises(ValueError, match="kind"):
        read_pq_code_store(spark, path, m=4, ksub=16, nlist=4)
    # and a missing column refuses before touching the store
    with pytest.raises(ValueError, match="columns"):
        write_pq_code_store(
            codes.drop("list_id"), str(tmp_path / "bad"), **_PQ_STORE_KW
        )


def test_pq_store_append_and_compact(spark, tmp_path):
    from pandas_sigproc_spark.operators.ann import pq_code_table
    from pandas_sigproc_spark.operators.sigstore import (
        compact_pq_code_store,
        read_pq_code_store,
        write_pq_code_store,
    )

    vecs = _pq_vecs(spark)
    codes = pq_code_table(vecs, **_PQ_KW)
    codes.persist().count()
    try:
        path = str(tmp_path / "pqstore")
        write_pq_code_store(
            codes.filter("vec_id % 2 = 0"), path, **_PQ_STORE_KW, partitions=2
        )
        write_pq_code_store(
            codes.filter("vec_id % 2 = 1"), path, **_PQ_STORE_KW,
            mode="append", partitions=2,
        )
        want = sorted(
            (r.vec_id, tuple(r.codes), r.list_id) for r in codes.collect()
        )
        got = sorted(
            (r.vec_id, tuple(r.codes), r.list_id)
            for r in read_pq_code_store(spark, path, **_PQ_STORE_KW).collect()
        )
        assert got == want
        compact_pq_code_store(spark, path, **_PQ_STORE_KW, partitions=2)
        batches = glob.glob(os.path.join(path, "hashes", "batch=*"))
        assert len(batches) == 1
        got2 = sorted(
            (r.vec_id, tuple(r.codes), r.list_id)
            for r in read_pq_code_store(spark, path, **_PQ_STORE_KW).collect()
        )
        assert got2 == want
    finally:
        codes.unpersist()
