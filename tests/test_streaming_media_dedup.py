"""streaming_phash_dedup: cross-micro-batch image dup-drop equals the
batch operator (imagedup.incremental_phash_dedup) on replayed batches.

Replay harness as in test_streaming_incr_dedup.py: time-ordered parquet
files + maxFilesPerTrigger=1 + availableNow, delta files in media_id
order so arrival order == id order (the batch operator's earlier-wins
rule).  The pair stream aggregates into per-image verdicts and compares
column-for-column against incremental_phash_dedup's output."""

import os

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.operators.imagedup import (
    incremental_phash_dedup,
    phash_images,
)
from pandas_sigproc_spark.streaming import streaming_phash_dedup
from pandas_sigproc_spark.sources.bmp import encode_bmp

SCHEMA = "media_id long, payload binary"


def _smooth(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    r = np.random.default_rng(seed)
    base = r.standard_normal((8, 8))
    big = np.kron(base, np.ones((h // 8, w // 8)))
    big = (big - big.min()) / (big.max() - big.min()) * 255
    return np.repeat(big[:, :, None], 3, 2).astype(np.uint8)


def _corpus_and_delta():
    corpus = {i: encode_bmp(_smooth(i)) for i in range(5)}
    bright1 = np.clip(_smooth(1).astype(float) * 1.1, 0, 255).astype(np.uint8)
    delta = {
        100: corpus[0],                      # exact copy of corpus image
        101: encode_bmp(bright1),            # near dup of corpus image
        102: encode_bmp(_smooth(40)),        # unique; twinned by 105
        103: encode_bmp(_smooth(41)),        # unique
        # ---- micro-batch boundary: dups below hit batch-1 state
        104: encode_bmp(_smooth(42)),        # unique
        105: None,                           # exact copy of 102 (cross-batch)
        106: encode_bmp(_smooth(43)),        # unique
    }
    delta[105] = delta[102]
    return (
        pd.DataFrame(
            {"media_id": list(corpus), "payload": list(corpus.values())}
        ),
        pd.DataFrame(
            {"media_id": list(delta), "payload": list(delta.values())}
        ),
    )


def _write_batches(tmp_path, delta, split_at=104):
    root = str(tmp_path / "media_stream")
    os.makedirs(root, exist_ok=True)
    parts = [
        delta[delta.media_id < split_at],
        delta[delta.media_id >= split_at],
    ]
    for i, part in enumerate(parts):
        path = os.path.join(root, f"part-{i:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return root


def _pairs_to_verdicts(pairs: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
    uniq = pairs.drop_duplicates(["d_id", "match_id", "src"])
    n_ex = (
        uniq[uniq.src == "corpus"].groupby("d_id").size()
        .rename("n_near_existing")
    )
    n_dl = (
        uniq[uniq.src == "stream"].groupby("d_id").size()
        .rename("n_near_delta_earlier")
    )
    # exact = a hash-identical (hamming 0) match anywhere; dedupe pairs
    # FIRST on min hamming so a multi-band pair counts once
    best = (
        pairs.groupby(["d_id", "match_id", "src"])["hamming"].min()
        .reset_index()
    )
    ex_dup = (
        best[best.hamming == 0].groupby("d_id").size().rename("_nx")
    )
    out = pd.DataFrame({"media_id": delta.media_id.to_numpy()}).set_index(
        "media_id"
    )
    out = out.join(n_ex).join(n_dl).join(ex_dup).fillna(0).reset_index()
    out["is_exact_dup"] = out.pop("_nx") > 0
    out["n_near_existing"] = out.n_near_existing.astype("int64")
    out["n_near_delta_earlier"] = out.n_near_delta_earlier.astype("int64")
    out["kept"] = (
        ~out.is_exact_dup
        & (out.n_near_existing == 0)
        & (out.n_near_delta_earlier == 0)
    )
    cols = [
        "media_id",
        "is_exact_dup",
        "n_near_existing",
        "n_near_delta_earlier",
        "kept",
    ]
    return out[cols].sort_values("media_id", ignore_index=True)


def test_stream_equals_batch_across_micro_batches(spark, tmp_path):
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    ex_hashes = phash_images(existing)

    expected = (
        incremental_phash_dedup(
            ex_hashes, spark.createDataFrame(delta, SCHEMA), max_hamming=6
        )
        .toPandas()
        .sort_values("media_id", ignore_index=True)
        .drop(columns=["phash"])
    )
    byid = expected.set_index("media_id")
    assert bool(byid.loc[100, "is_exact_dup"])
    assert byid.loc[101, "n_near_existing"] >= 1
    assert bool(byid.loc[105, "is_exact_dup"])  # cross-batch twin
    assert byid.loc[105, "n_near_delta_earlier"] >= 1
    assert bool(byid.loc[103, "kept"]) and bool(byid.loc[106, "kept"])

    root = _write_batches(tmp_path, delta)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_phash_dedup(stream, ex_hashes, max_hamming=6)
    q = (
        out.writeStream.format("memory")
        .queryName("media_dedup_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.sql("select * from media_dedup_pairs").toPandas()
    got = _pairs_to_verdicts(pairs, delta)
    pd.testing.assert_frame_equal(
        got, expected[got.columns.tolist()]
        .sort_values("media_id", ignore_index=True)
    )


def test_batch_fallback_equals_stream_pairs(spark, tmp_path):
    """The operator's batch path must emit the same distinct pair set
    as the replayed stream."""
    corpus, delta = _corpus_and_delta()
    existing = phash_images(spark.createDataFrame(corpus, SCHEMA))
    def _canon(pdf):
        # a pair can surface from any shared band; canonicalize on the
        # smallest band so batch and stream runs compare band-stably
        return (
            pdf.groupby(["d_id", "match_id", "src"], as_index=False)
            .agg(band_id=("band_id", "min"), hamming=("hamming", "min"))
            .sort_values(["d_id", "match_id", "src"], ignore_index=True)
        )

    batch_pairs = _canon(
        streaming_phash_dedup(
            spark.createDataFrame(delta, SCHEMA), existing, max_hamming=6
        ).toPandas()
    )
    root = _write_batches(tmp_path, delta)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_phash_dedup(stream, existing, max_hamming=6)
        .writeStream.format("memory")
        .queryName("media_dedup_pairs_fb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = _canon(
        spark.sql("select * from media_dedup_pairs_fb").toPandas()
    )
    pd.testing.assert_frame_equal(
        stream_pairs[batch_pairs.columns], batch_pairs
    )


def test_state_cap_guard(spark, tmp_path):
    """The per-key state cap refuses a degenerate band key loudly."""
    corpus, delta = _corpus_and_delta()
    existing = phash_images(spark.createDataFrame(corpus, SCHEMA))
    # every delta image identical -> one band key holds them all
    same = pd.DataFrame(
        {"media_id": [200 + i for i in range(5)],
         "payload": [delta.payload.iloc[0]] * 5}
    )
    with pytest.raises(Exception, match="max_state_rows_per_key"):
        streaming_phash_dedup(
            spark.createDataFrame(same, SCHEMA),
            existing,
            max_hamming=6,
            max_state_rows_per_key=3,
        ).collect()


def test_precomputed_store_path_with_custom_id_col(spark):
    # existing = the documented (media_id, phash) store shape while the
    # stream uses its own id column name — the old code selected the
    # stream's id_col from the store table and crashed (review finding)
    import pandas as pd

    from pandas_sigproc_spark.streaming import streaming_phash_dedup

    stream = spark.createDataFrame(
        pd.DataFrame({"img_id": [100], "phash": [0b1010]})
    )
    store = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2], "phash": [0b1010, 0b1010 ^ 0xFF]})
    )
    rows = streaming_phash_dedup(
        stream, store, id_col="img_id", max_hamming=2
    ).collect()
    assert any(r["match_id"] == 1 and r["hamming"] == 0 for r in rows)
    assert not any(r["match_id"] == 2 for r in rows)


def test_null_phash_rows_are_passed_over(spark):
    # a NULL phash identifies nothing: it must neither crash the
    # stateful op (the old TypeError crash-loop) nor match anything
    import pandas as pd

    from pandas_sigproc_spark.streaming import streaming_phash_dedup

    stream = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [100, 101], "phash": [None, 0b1111]}
        ).astype({"phash": "object"})
    )
    store = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "phash": [0b1111]})
    )
    rows = streaming_phash_dedup(stream, store, max_hamming=1).collect()
    assert all(r["d_id"] == 101 for r in rows)
    assert any(r["match_id"] == 1 for r in rows)
