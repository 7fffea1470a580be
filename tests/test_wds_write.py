"""WebDataset shard WRITER (operators/webdataset.py write_wds_shards).

The output sink of the training-data pipeline — the exact inverse of
wds_members.  Contract mirrors the container codecs: roundtrip through
our own decoder AND stdlib tarfile (cross-read), byte-determinism
across partitionings (content-addressable shards), member ordering,
state carry across Arrow batch boundaries, and empty-ext naming.
"""

import io
import tarfile

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.webdataset import (
    wds_members,
    write_wds_shards,
)
from pandas_sigproc_spark.sources.tar import decode_tar, encode_tar

MEMBER_SCHEMA = "shard long, key string, ext string, payload binary"


def _members_df(spark, rows, parts=None):
    pdf = pd.DataFrame(rows, columns=["shard", "key", "ext", "payload"])
    df = spark.createDataFrame(pdf, schema=MEMBER_SCHEMA)
    return df.repartition(parts) if parts else df


def _rows(n_docs=20, shards=3):
    rows = []
    for i in range(n_docs):
        key = f"{i:08d}"
        rows.append((i % shards, key, "txt", f"doc {i} body".encode()))
        rows.append((i % shards, key, "json", b'{"id":%d}' % i))
    return rows


def test_roundtrip_own_decoder(spark):
    rows = _rows()
    out = write_wds_shards(_members_df(spark, rows)).collect()
    assert sorted(r["shard"] for r in out) == [0, 1, 2]
    got = []
    for r in out:
        for name, payload in decode_tar(bytes(r["payload"])):
            key, _, ext = name.partition(".")
            got.append((r["shard"], key, ext, payload))
    assert sorted(got) == sorted(rows)


def test_counts_per_shard(spark):
    rows = _rows(n_docs=9, shards=3)
    out = {r["shard"]: r for r in write_wds_shards(_members_df(spark, rows)).collect()}
    for s in range(3):
        assert out[s]["n_samples"] == 3  # 3 docs per shard
        assert out[s]["n_members"] == 6  # 2 members per doc
        assert out[s]["n_bytes"] == len(bytes(out[s]["payload"]))


def test_stdlib_tarfile_cross_read(spark):
    rows = _rows(n_docs=6, shards=2)
    out = write_wds_shards(_members_df(spark, rows)).collect()
    seen = []
    for r in out:
        with tarfile.open(fileobj=io.BytesIO(bytes(r["payload"]))) as tf:
            for m in tf.getmembers():
                assert m.isfile()
                key, _, ext = m.name.partition(".")
                seen.append((r["shard"], key, ext, tf.extractfile(m).read()))
    assert sorted(seen) == sorted(rows)


def test_byte_determinism_across_partitionings(spark):
    rows = _rows(n_docs=40, shards=4)
    blobs = {}
    for parts in (1, 7, 32):
        out = write_wds_shards(_members_df(spark, rows, parts=parts)).collect()
        blobs[parts] = {r["shard"]: bytes(r["payload"]) for r in out}
    assert blobs[1] == blobs[7] == blobs[32]


def test_member_order_is_key_then_ext(spark):
    rows = [
        (0, "b", "txt", b"B"),
        (0, "a", "txt", b"A1"),
        (0, "a", "json", b"A0"),
    ]
    out = write_wds_shards(_members_df(spark, rows)).collect()
    names = [n for n, _ in decode_tar(bytes(out[0]["payload"]))]
    assert names == ["a.json", "a.txt", "b.txt"]


def test_empty_ext_uses_bare_key(spark):
    rows = [(0, "k0", "", b"payload")]
    out = write_wds_shards(_members_df(spark, rows)).collect()
    assert decode_tar(bytes(out[0]["payload"])) == [("k0", b"payload")]


def test_state_carry_across_arrow_batches(spark):
    # Force tiny Arrow batches so one shard spans MANY batches: the
    # generator must carry the open shard's members across batch
    # boundaries (the pack_sequences partition-kernel contract).
    rows = _rows(n_docs=300, shards=2)
    df = _members_df(spark, rows, parts=1)
    with_conf = spark.conf
    old = with_conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    with_conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "17")
    try:
        out = write_wds_shards(df).collect()
    finally:
        if old is None:
            with_conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            with_conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert sorted(r["shard"] for r in out) == [0, 1]
    got = []
    for r in out:
        for name, payload in decode_tar(bytes(r["payload"])):
            key, _, ext = name.partition(".")
            got.append((r["shard"], key, ext, payload))
    assert sorted(got) == sorted(rows)


def test_wds_members_inverse(spark):
    # write -> wds_members recovers (key, ext, payload) exactly.
    rows = _rows(n_docs=12, shards=3)
    shards = write_wds_shards(_members_df(spark, rows))
    back = wds_members(shards, id_col="shard").select(
        "shard_id", "key", "ext", "payload"
    )
    got = [(r["shard_id"], r["key"], r["ext"], bytes(r["payload"])) for r in back.collect()]
    assert sorted(got) == sorted(rows)


def test_oversized_member_name_raises(spark):
    # no '/' split point and > 100 bytes: the ustar encoder refuses.
    rows = [(0, "x" * 200, "txt", b"p")]
    df = _members_df(spark, rows)
    with pytest.raises(Exception, match="too long|overflow"):
        write_wds_shards(df).collect()


# --- save/load filesystem sink ----------------------------------------------


def _save_inputs(spark, n_docs=12, shards=3):
    rows = _rows(n_docs=n_docs, shards=shards)
    return rows, write_wds_shards(_members_df(spark, rows))


def test_save_load_roundtrip(spark, tmp_path):
    from pandas_sigproc_spark.operators.webdataset import (
        load_wds_shards,
        save_wds_shards,
    )

    rows, shards = _save_inputs(spark)
    root = str(tmp_path / "corpus")
    manifest = save_wds_shards(shards, root)
    assert manifest["n_shards"] == 3
    assert set(manifest["files"]) == {
        "shard-00000000.tar",
        "shard-00000001.tar",
        "shard-00000002.tar",
    }
    back = wds_members(load_wds_shards(spark, root), id_col="shard")
    got = [
        (r["shard_id"], r["key"], r["ext"], bytes(r["payload"]))
        for r in back.collect()
    ]
    assert sorted(got) == sorted(rows)


def test_save_refuses_overwrite_without_flag(spark, tmp_path):
    from pandas_sigproc_spark.operators.webdataset import save_wds_shards

    _, shards = _save_inputs(spark)
    root = str(tmp_path / "corpus2")
    save_wds_shards(shards, root)
    with pytest.raises(ValueError, match="already has a manifest"):
        save_wds_shards(shards, root)
    m2 = save_wds_shards(shards, root, overwrite=True)
    assert m2["n_shards"] == 3


def test_load_ignores_unmanifested_and_inprogress(spark, tmp_path):
    import os

    from pandas_sigproc_spark.operators.webdataset import (
        load_wds_shards,
        save_wds_shards,
    )

    _, shards = _save_inputs(spark)
    root = str(tmp_path / "corpus3")
    save_wds_shards(shards, root)
    # simulate a crashed later job: stray tar + torn .inprogress
    with open(os.path.join(root, "shard-00000099.tar"), "wb") as fh:
        fh.write(b"garbage")
    with open(
        os.path.join(root, "shard-00000007.tar.inprogress"), "wb"
    ) as fh:
        fh.write(b"torn")
    got = load_wds_shards(spark, root).select("shard").collect()
    assert sorted(r["shard"] for r in got) == [0, 1, 2]


def test_load_refuses_missing_manifest(spark, tmp_path):
    import os

    from pandas_sigproc_spark.operators.webdataset import load_wds_shards

    root = str(tmp_path / "nostamp")
    os.makedirs(root)
    with open(os.path.join(root, "shard-00000000.tar"), "wb") as fh:
        fh.write(b"x")
    with pytest.raises(ValueError, match="no _manifest.json"):
        load_wds_shards(spark, root)


def test_save_refuses_remote_scheme(spark):
    from pandas_sigproc_spark.operators.webdataset import save_wds_shards

    _, shards = _save_inputs(spark)
    with pytest.raises(NotImplementedError, match="s3a"):
        save_wds_shards(shards, "s3a://bucket/corpus")


def test_save_load_file_uri_forms(spark, tmp_path):
    # 'file:/x' and 'file:///x' must resolve to the URI PATH — a naive
    # 'file://' prefix strip turns 'file:/x' into a relative dir
    # literally named 'file:' (a round-11 review finding).
    from pandas_sigproc_spark.operators.webdataset import (
        load_wds_shards,
        save_wds_shards,
    )

    rows, shards = _save_inputs(spark, n_docs=4, shards=2)
    root = tmp_path / "uri_corpus"
    save_wds_shards(shards, f"file:{root}")
    assert (root / "_manifest.json").exists()
    got = load_wds_shards(spark, f"file://{root}").select("shard").collect()
    assert sorted(r["shard"] for r in got) == [0, 1]


def test_save_refuses_negative_shard_ids(spark, tmp_path):
    # 'shard--0000001.tar' would be unparseable by the loader's regex
    # (NULL shard id) — refuse loudly at write time instead.
    from pandas_sigproc_spark.operators.webdataset import save_wds_shards

    rows = [(-1, "k", "txt", b"x")]
    shards = write_wds_shards(_members_df(spark, rows))
    with pytest.raises(Exception, match="negative shard id"):
        save_wds_shards(shards, str(tmp_path / "neg"))


def test_null_member_refused_loudly(spark):
    rows_pdf = pd.DataFrame(
        {"shard": [0], "key": ["k"], "ext": ["txt"], "payload": [None]}
    )
    df = spark.createDataFrame(rows_pdf, MEMBER_SCHEMA)
    with pytest.raises(Exception, match="NULL member field"):
        write_wds_shards(df).collect()


def test_overwrite_sweeps_stale_committed_shards(spark, tmp_path):
    # a shrinking rerun must not leave the old corpus's extra shards
    # where a *.tar-globbing loader would pick them up.
    from pandas_sigproc_spark.operators.webdataset import save_wds_shards

    root = str(tmp_path / "shrink")
    _, shards4 = _save_inputs(spark, n_docs=8, shards=4)
    save_wds_shards(shards4, root)
    _, shards2 = _save_inputs(spark, n_docs=8, shards=2)
    save_wds_shards(shards2, root, overwrite=True)
    import os

    tars = sorted(f for f in os.listdir(root) if f.endswith(".tar"))
    assert tars == ["shard-00000000.tar", "shard-00000001.tar"]


def test_unmanifested_tars_refused_without_overwrite(spark, tmp_path):
    # no manifest + shard-*.tar present (crashed prior run, or a corpus
    # this writer does not own): overwrite=False must refuse LOUDLY
    # (silent deletion was a review finding against the r12 sweep
    # widening; silent stale data was the r10/ADVICE finding — the
    # refusal satisfies both), overwrite=True sweeps and rewrites.
    import os

    import pytest

    from pandas_sigproc_spark.operators.webdataset import save_wds_shards

    root = str(tmp_path / "crashed")
    os.makedirs(root)
    with open(os.path.join(root, "shard-00000009.tar"), "wb") as fh:
        fh.write(b"leftover")
    _, shards = _save_inputs(spark, n_docs=4, shards=2)
    with pytest.raises(ValueError, match="without a manifest"):
        save_wds_shards(shards, root)
    assert os.path.exists(os.path.join(root, "shard-00000009.tar"))
    save_wds_shards(shards, root, overwrite=True)
    tars = sorted(f for f in os.listdir(root) if f.endswith(".tar"))
    assert tars == ["shard-00000000.tar", "shard-00000001.tar"]


def test_wds_store_roundtrip_any_scheme(spark, tmp_path):
    # r13: the object-store layout — parquet-payload rows through
    # Spark's JVM writers + a Hadoop-FS manifest stamp, exercised here
    # through an explicit file:// URI (the same FileSystem API route an
    # s3a://hdfs:// path takes).
    from pandas_sigproc_spark.operators.webdataset import (
        load_wds_store,
        save_wds_store,
        wds_members,
        write_wds_shards,
    )

    shards = write_wds_shards(_members_df(spark, _rows()))
    uri = "file://" + str(tmp_path / "store")
    manifest = save_wds_store(shards, uri)
    assert manifest["layout"] == "parquet-payloads"
    assert manifest["n_shards"] == 3 and manifest["n_bytes"] > 0

    back = load_wds_store(spark, uri)
    # byte-identical tars per shard vs the in-memory result
    want = {r["shard"]: bytes(r["payload"]) for r in shards.collect()}
    got = {r["shard"]: bytes(r["payload"]) for r in back.collect()}
    assert got == want
    # and the members decode through the normal path
    m = wds_members(back.selectExpr("shard as shard_id", "payload"))
    assert m.count() == 40


def test_wds_store_refuses_unstamped_and_overwrite(spark, tmp_path):
    from pandas_sigproc_spark.operators.webdataset import (
        load_wds_store,
        save_wds_store,
        write_wds_shards,
    )

    shards = write_wds_shards(_members_df(spark, _rows()))
    uri = "file://" + str(tmp_path / "store2")
    save_wds_store(shards, uri)
    # second write without overwrite refuses
    with pytest.raises(ValueError, match="overwrite=True"):
        save_wds_store(shards, uri)
    # overwrite replaces cleanly
    m2 = save_wds_store(shards, uri, overwrite=True)
    assert m2["n_shards"] == 3
    # a store missing its stamp refuses to load
    import os

    os.remove(str(tmp_path / "store2" / "_manifest.json"))
    with pytest.raises(ValueError, match="no _manifest.json"):
        load_wds_store(spark, uri)


def test_wds_store_refuses_duplicate_shard_ids(spark, tmp_path):
    from pandas_sigproc_spark.operators.webdataset import save_wds_store

    dup = spark.createDataFrame(
        [(1, b"x"), (1, b"y")], "shard long, payload binary"
    )
    with pytest.raises(ValueError, match="duplicate shard"):
        save_wds_store(dup, "file://" + str(tmp_path / "store3"))


def test_decode_tar_gnu_longname_and_pax_path(spark):
    # r13 review finding: >100-char names arrive via GNU 'L' / PAX
    # 'path=' members; taking the truncated ustar field mis-keyed the
    # sample silently.  Cross-check against stdlib tarfile output.
    import io
    import tarfile

    long_name = "d/" + "x" * 120 + ".jpg"
    for fmt in (tarfile.GNU_FORMAT, tarfile.PAX_FORMAT):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
            info = tarfile.TarInfo(long_name)
            info.size = 3
            tf.addfile(info, io.BytesIO(b"abc"))
            info2 = tarfile.TarInfo("short.txt")
            info2.size = 2
            tf.addfile(info2, io.BytesIO(b"ok"))
        got = decode_tar(buf.getvalue())
        assert got == [(long_name, b"abc"), ("short.txt", b"ok")], fmt


def test_decode_tar_truncation_and_empty_are_loud(spark):
    import pytest as _pytest

    blob = encode_tar([("a.txt", b"hello"), ("b.txt", b"world")])
    # cut mid-second-header: partial members must NOT look successful
    with _pytest.raises(ValueError, match="truncated|trailing"):
        decode_tar(blob[: 512 + 512 + 200])
    with _pytest.raises(ValueError, match="empty input"):
        decode_tar(b"")


def test_encode_tar_refuses_nul_and_empty_names(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="NUL-free"):
        encode_tar([("a\x00b.cls", b"x")])
    with _pytest.raises(ValueError, match="NUL-free"):
        encode_tar([("", b"x")])


def test_decode_tar_pax_global_path_is_ignored(spark):
    # r14 advice: a PAX 'g' (global) header's path= was applied like
    # 'x' — renaming only the next member — where POSIX says global
    # values default ALL subsequent members; a global path is
    # ill-defined (GNU tar ignores it with a warning), so decode_tar
    # now ignores it entirely and keeps every member's own name.
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf,
        mode="w",
        format=tarfile.PAX_FORMAT,
        pax_headers={"path": "global-override"},
    ) as tf:
        for name, data in (("a.txt", b"aa"), ("b.txt", b"bb")):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = decode_tar(buf.getvalue())
    assert got == [("a.txt", b"aa"), ("b.txt", b"bb")]
