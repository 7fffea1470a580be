"""Materialized signature store: the store path must return the EXACT
frame the text path returns — freshly derived, parquet-roundtripped,
or assembled by appends — and refuse ngram mismatches loudly."""

import pandas as pd
import pytest

from pandas_sigproc_spark.operators import (
    incremental_dedup_from_store,
    read_signature_store,
    signature_tables,
    write_signature_store,
)
from pandas_sigproc_spark.operators.curation import incremental_dedup
from pandas_sigproc_spark.streaming import streaming_incremental_dedup

from tests.test_streaming_incr_dedup import (
    SCHEMA,
    _corpus_and_delta,
    _pairs_to_verdicts,
    _write_batches,
)


def _frames(df):
    return (
        df.toPandas()
        .sort_values("doc_id", ignore_index=True)
        [["doc_id", "is_exact_dup", "n_near_existing",
          "n_near_delta_earlier", "kept"]]
    )


def test_store_equals_text_path(spark):
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    d = spark.createDataFrame(delta, SCHEMA)
    expected = _frames(incremental_dedup(existing, d))
    store = signature_tables(existing)
    got = _frames(incremental_dedup_from_store(store, d))
    pd.testing.assert_frame_equal(got, expected)
    # the interesting rows actually fire (not a trivially-empty probe)
    assert expected.is_exact_dup.any() and (expected.n_near_existing > 0).any()


def test_roundtrip_and_append_equal_rebuild(spark, tmp_path):
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    d = spark.createDataFrame(delta, SCHEMA)
    path = str(tmp_path / "sigstore")

    # write first half, append second half — the daily-ingestion shape
    write_signature_store(
        spark.createDataFrame(corpus[corpus.doc_id < 3], SCHEMA), path
    )
    write_signature_store(
        spark.createDataFrame(corpus[corpus.doc_id >= 3], SCHEMA),
        path,
        mode="append",
    )
    store = read_signature_store(spark, path)
    assert store.ngram == 3
    assert store.digests.count() == len(corpus)
    n_bands_per_doc = store.bands.groupBy("doc_id").count().toPandas()
    assert set(n_bands_per_doc["count"]) == {4}

    expected = _frames(incremental_dedup(existing, d))
    got = _frames(incremental_dedup_from_store(store, d))
    pd.testing.assert_frame_equal(got, expected)


def test_ngram_mismatch_refused(spark, tmp_path):
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    path = str(tmp_path / "sigstore_n4")
    write_signature_store(existing, path, ngram=4)
    with pytest.raises(ValueError, match="ngram"):
        write_signature_store(existing, path, ngram=3, mode="append")
    store = read_signature_store(spark, path)
    assert store.ngram == 4
    with pytest.raises(ValueError, match="ngram"):
        incremental_dedup_from_store(
            store, spark.createDataFrame(delta, SCHEMA), ngram=3
        )
    with pytest.raises(ValueError, match="ngram"):
        streaming_incremental_dedup(
            spark.createDataFrame(delta, SCHEMA), store, ngram=3
        )


def test_streaming_corpus_probe_from_store(spark, tmp_path):
    """streaming_incremental_dedup with the store as its static side
    emits the same pair set as with the raw corpus text (batch-fallback
    mode runs the identical corpus-probe plan the stream runs)."""
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    d = spark.createDataFrame(delta, SCHEMA)
    path = str(tmp_path / "sigstore_stream")
    write_signature_store(existing, path)
    store = read_signature_store(spark, path)

    def pairs(src):
        return (
            streaming_incremental_dedup(d, src)
            .toPandas()
            .drop_duplicates(["d_id", "match_id", "src"])
            .sort_values(["d_id", "match_id", "src"], ignore_index=True)
            [["d_id", "match_id", "src", "is_exact"]]
        )

    pd.testing.assert_frame_equal(pairs(store), pairs(existing))


def test_real_stream_against_store_equals_batch(spark, tmp_path):
    """A genuine micro-batched streaming query with the STORE as its
    static side replays to the batch operator's verdicts — the full
    production path: corpus text never scanned, state crosses batches."""
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    path = str(tmp_path / "sigstore_live")
    write_signature_store(existing, path)
    store = read_signature_store(spark, path)

    expected = (
        incremental_dedup(existing, spark.createDataFrame(delta, SCHEMA))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    root = _write_batches(tmp_path, delta)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_incremental_dedup(stream, store)
        .writeStream.format("memory")
        .queryName("incr_dedup_store_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.sql("select * from incr_dedup_store_live").toPandas()
    got = _pairs_to_verdicts(pairs, delta)
    pd.testing.assert_frame_equal(
        got, expected[got.columns.tolist()].sort_values("doc_id", ignore_index=True)
    )


def test_compact_preserves_values_and_reduces_files(spark, tmp_path):
    from pandas_sigproc_spark.operators import compact_signature_store
    import glob

    corpus, delta = _corpus_and_delta()
    d = spark.createDataFrame(delta, SCHEMA)
    path = str(tmp_path / "sigstore_compact")
    # many tiny appends -> many files
    for lo in range(0, 6, 2):
        part = corpus[(corpus.doc_id >= lo) & (corpus.doc_id < lo + 2)]
        write_signature_store(
            spark.createDataFrame(part, SCHEMA),
            path,
            mode="overwrite" if lo == 0 else "append",
        )
    before = _frames(
        incremental_dedup_from_store(read_signature_store(spark, path), d)
    )
    n_files_before = len(glob.glob(f"{path}/bands/batch=*/*.parquet"))
    n_dirs_before = len(glob.glob(f"{path}/bands/batch=*"))
    compact_signature_store(spark, path, partitions=2)
    n_files_after = len(glob.glob(f"{path}/bands/batch=*/*.parquet"))
    assert n_files_after <= 2 < n_files_before
    # old batch dirs are garbage-collected; one compacted batch remains
    assert len(glob.glob(f"{path}/bands/batch=*")) == 1 < n_dirs_before
    store = read_signature_store(spark, path)
    assert store.ngram == 3
    after = _frames(incremental_dedup_from_store(store, d))
    pd.testing.assert_frame_equal(after, before)


def test_compact_sweeps_orphan_batch_dirs(spark, tmp_path):
    """An orphan batch dir leaked by a crash between a prior meta stamp
    and its GC loop (its id is uncommitted and never reused) must be
    swept by the NEXT compaction — not merely the batches committed at
    entry — or it leaks forever and stays in every scan's listing."""
    from pandas_sigproc_spark.operators import compact_signature_store
    import glob
    import os

    corpus, delta = _corpus_and_delta()
    d = spark.createDataFrame(delta, SCHEMA)
    path = str(tmp_path / "sigstore_orphan")
    write_signature_store(spark.createDataFrame(corpus, SCHEMA), path)
    # fabricate the crash debris: a batch dir whose id is NOT in meta
    for tbl in ("digests", "bands"):
        orphan = os.path.join(path, tbl, "batch=7")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "_SUCCESS"), "w"):
            pass
    before = _frames(
        incremental_dedup_from_store(read_signature_store(spark, path), d)
    )
    compact_signature_store(spark, path, partitions=2)
    for tbl in ("digests", "bands"):
        dirs = glob.glob(f"{path}/{tbl}/batch=*")
        assert len(dirs) == 1, f"orphan survived compaction: {dirs}"
        assert "batch=7" not in dirs[0]
    after = _frames(
        incremental_dedup_from_store(read_signature_store(spark, path), d)
    )
    pd.testing.assert_frame_equal(after, before)


def test_append_to_metaless_store_refused(spark, tmp_path):
    """A store directory with tables but no _meta.json is a crashed
    write — appending into it must raise, not silently mix ngrams."""
    import os

    corpus, _ = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    path = str(tmp_path / "sigstore_crashed")
    write_signature_store(existing, path)
    os.remove(os.path.join(path, "_meta.json"))
    with pytest.raises(ValueError, match="_meta.json"):
        write_signature_store(existing, path, mode="append")
    with pytest.raises(ValueError, match="_meta.json"):
        read_signature_store(spark, path)


def test_torn_append_invisible_to_probes(spark, tmp_path):
    """A crash between the table writes and the meta stamp must leave
    the torn batch INVISIBLE: readers filter to meta's committed list,
    so the exact and near tiers can never disagree about a batch.
    Simulated by writing batch files at the next id without committing
    them (exactly the state a mid-append crash leaves)."""
    import json as _json
    import os

    from pandas_sigproc_spark.operators.sigstore import (
        _write_batch,
        signature_tables,
    )

    corpus, delta = _corpus_and_delta()
    first = spark.createDataFrame(corpus[corpus.doc_id < 3], SCHEMA)
    second = spark.createDataFrame(corpus[corpus.doc_id >= 3], SCHEMA)
    d = spark.createDataFrame(delta, SCHEMA)
    path = str(tmp_path / "sigstore_torn")
    write_signature_store(first, path)
    baseline = _frames(
        incremental_dedup_from_store(read_signature_store(spark, path), d)
    )

    # the torn append: both batch dirs land, the meta stamp never does
    _write_batch(signature_tables(second), path, 1, 2)
    assert os.path.exists(os.path.join(path, "bands", "batch=1"))
    store = read_signature_store(spark, path)
    assert store.digests.count() == int((corpus.doc_id < 3).sum())
    got = _frames(incremental_dedup_from_store(store, d))
    pd.testing.assert_frame_equal(got, baseline)

    # a retried append at the same id commits and the batch appears
    write_signature_store(second, path, mode="append")
    store = read_signature_store(spark, path)
    assert store.digests.count() == len(corpus)
    meta = _json.load(open(os.path.join(path, "_meta.json")))
    assert meta["batches"] == [0, 1]


def test_unsupported_store_version_refused(spark, tmp_path):
    import json as _json
    import os

    from pandas_sigproc_spark.operators.sigstore import (
        _fs_write_text_atomic,
    )

    corpus, _ = _corpus_and_delta()
    path = str(tmp_path / "sigstore_v1")
    write_signature_store(spark.createDataFrame(corpus, SCHEMA), path)
    meta_path = os.path.join(path, "_meta.json")
    meta = _json.load(open(meta_path))
    meta["version"] = 1
    # tamper through the module's own FS writer (a plain open() write
    # would just invalidate the Hadoop local-FS .crc sidecar)
    _fs_write_text_atomic(spark, meta_path, _json.dumps(meta))
    with pytest.raises(ValueError, match="version"):
        read_signature_store(spark, path)
