"""ustar + WARC codecs (sources/tar.py, sources/warc.py) and the
distributed shard/archive ingestion (operators/webdataset.py,
operators/webcrawl.py): byte-level roundtrips against the STDLIB
readers (tarfile, gzip — independent implementations), malformed-input
refusals, the WebDataset key/ext convention, and Spark-side extraction
equality."""

import gzip
import io
import tarfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.webcrawl import warc_documents, warc_records
from pandas_sigproc_spark.operators.webdataset import wds_members, wds_samples
from pandas_sigproc_spark.sources.tar import decode_tar, encode_tar
from pandas_sigproc_spark.sources.warc import decode_warc, encode_warc


# ---------------------------------------------------------------------------
# tar codec
# ---------------------------------------------------------------------------

MEMBERS = [
    ("000001.bmp", b"\x42\x4d" + bytes(100)),
    ("000001.cls", b"7"),
    ("a/b/000002.json", b'{"k": 1}'),
    ("exactly512", bytes(512)),
    ("empty.txt", b""),
]


def test_tar_roundtrip():
    blob = encode_tar(MEMBERS)
    assert len(blob) % 512 == 0
    assert decode_tar(blob) == MEMBERS


def test_tar_readable_by_stdlib_tarfile():
    """The encoder writes genuine ustar: the INDEPENDENT stdlib reader
    must extract identical members."""
    blob = encode_tar(MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
            if m.isfile()
        ]
    assert got == MEMBERS


def test_tar_decodes_stdlib_output():
    """And the decoder reads what the INDEPENDENT stdlib writer
    produces (ustar format)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    assert decode_tar(buf.getvalue()) == MEMBERS


def test_tar_long_name_prefix_split():
    name = "shards/" + "d" * 90 + "/" + "f" * 60 + ".bin"
    blob = encode_tar([(name, b"xyz")])
    assert decode_tar(blob) == [(name, b"xyz")]
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        assert tf.getmembers()[0].name == name


def test_tar_refusals():
    blob = bytearray(encode_tar(MEMBERS))
    blob[148] ^= 0x01  # corrupt the checksum field
    with pytest.raises(ValueError, match="checksum"):
        decode_tar(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        decode_tar(b"\x01" * 1024)
    with pytest.raises(ValueError, match="truncated"):
        decode_tar(encode_tar([("x", bytes(600))])[:700])


# ---------------------------------------------------------------------------
# WARC codec
# ---------------------------------------------------------------------------

RECORDS = [
    {"uri": "http://example.com/1", "payload": "hello WARC é".encode()},
    {"uri": "http://example.com/2", "payload": b"\r\n\r\nbinary-ish\x00"},
    {
        "uri": "http://example.com/meta",
        "payload": b"{}",
        "type": "metadata",
        "content_type": "application/json",
    },
]


def _strip(recs):
    return [(r["type"], r["uri"], r["payload"]) for r in recs]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip-records"])
def test_warc_roundtrip(gz):
    blob = encode_warc(RECORDS, gzip_records=gz)
    got = decode_warc(blob)
    assert _strip(got) == [
        (r.get("type", "response"), r["uri"], r["payload"]) for r in RECORDS
    ]
    # deterministic bytes (record ids derived, gzip mtime pinned)
    assert blob == encode_warc(RECORDS, gzip_records=gz)


def test_warc_gzip_members_are_independent():
    """Record-gzipped archives must be per-record members (the split
    layout crawl readers rely on): each member decompresses alone."""
    import zlib

    blob = encode_warc(RECORDS, gzip_records=True)
    # stdlib gzip.read() transparently concatenates members, so split
    # the FIRST member explicitly via zlib (wbits=31 stops at member end)
    d = zlib.decompressobj(wbits=31)
    first = d.decompress(blob) + d.flush()
    assert d.eof and d.unused_data  # more members follow
    assert first.startswith(b"WARC/1.1")
    assert b"http://example.com/1" in first
    assert b"http://example.com/2" not in first


def test_warc_refusals():
    with pytest.raises(ValueError, match="version"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    blob = encode_warc(RECORDS)
    with pytest.raises(ValueError, match="truncated|bad WARC"):
        decode_warc(blob[: len(blob) - 30])
    with pytest.raises(ValueError, match="truncated gzip"):
        decode_warc(encode_warc(RECORDS, gzip_records=True)[:-8])


# ---------------------------------------------------------------------------
# distributed extraction
# ---------------------------------------------------------------------------


def test_wds_members_and_samples(spark):
    shard0 = encode_tar(
        [
            ("000000.bmp", b"A" * 10),
            ("000000.cls", b"3"),
            ("000001.seg.png", b"B" * 4),
            ("000001.bmp", b"C" * 7),
        ]
    )
    shard1 = encode_tar([("d/000002.json", b"{}")])
    shards = spark.createDataFrame(
        pd.DataFrame({"shard_id": [0, 1], "payload": [shard0, shard1]}),
        "shard_id long, payload binary",
    )
    m = wds_members(shards).toPandas().sort_values(["shard_id", "key", "ext"])
    assert list(map(tuple, m[["shard_id", "key", "ext", "n_bytes"]].values)) == [
        (0, "000000", "bmp", 10),
        (0, "000000", "cls", 1),
        (0, "000001", "bmp", 7),
        (0, "000001", "seg.png", 4),  # ext = everything after FIRST dot
        (1, "d/000002", "json", 2),
    ]
    s = (
        wds_samples(wds_members(shards))
        .toPandas()
        .sort_values(["shard_id", "key"])
        .reset_index(drop=True)
    )
    assert list(s.n_members) == [2, 2, 1]
    assert list(s.exts.iloc[0]) == ["bmp", "cls"]
    assert bytes(s.payloads.iloc[0]["cls"]) == b"3"


def test_warc_documents_roundtrip_spark(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha", "beta ü", "gamma"],
        }
    )
    recs = [
        {"uri": f"http://corpus/{r.doc_id}", "payload": r.text.encode()}
        for r in docs.itertuples()
    ]
    blob = encode_warc(recs, gzip_records=True)
    archives = spark.createDataFrame(
        pd.DataFrame({"archive_id": [0], "payload": [blob]}),
        "archive_id long, payload binary",
    )
    out = (
        warc_documents(archives)
        .toPandas()
        .sort_values("uri")
        .reset_index(drop=True)
    )
    assert list(out.text) == ["alpha", "beta ü", "gamma"]
    assert list(out.n_bytes) == [5, 7, 5]
    r = warc_records(archives).toPandas()
    assert set(r.rec_type) == {"response"}


def test_domain_curation(spark):
    from pandas_sigproc_spark.operators.webcrawl import (
        cap_per_domain,
        domain_stats,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "uri": [
                    "http://A.example.com/1",  # host parse lowercases
                    "http://a.example.com/2",
                    "http://a.example.com/3",
                    "http://b.example.com/4",
                    "https://b.example.com:8080/5",  # scheme/port ignored
                ],
                "text": ["aa", "bbb", "c", "dd", "e"],
            }
        )
    )
    st = (
        domain_stats(docs).toPandas().sort_values("host").reset_index(drop=True)
    )
    byhost = st.set_index("host")
    assert "a.example.com" in byhost.index  # case folded
    assert byhost.loc["a.example.com", "n_docs"] == 3
    assert byhost.loc["a.example.com", "total_bytes"] == 6
    capped = cap_per_domain(docs, 2).toPandas().set_index("doc_id")
    assert bool(capped.loc[1, "kept"]) and bool(capped.loc[2, "kept"])
    assert not bool(capped.loc[3, "kept"])  # third doc of host a dropped
    assert bool(capped.loc[4, "kept"])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cap_per_domain(docs, 0)


def test_streaming_domain_cap_equals_batch(spark, tmp_path):
    """The stateful streaming cap admits exactly the batch window's
    first-N-per-host set across micro-batch boundaries."""
    import os

    from pandas_sigproc_spark.streaming import streaming_domain_cap

    delta = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7, 8],
            "uri": [
                "http://a.example.com/1",
                "http://b.example.com/2",
                "http://a.example.com/3",
                "http://a.example.com/4",
                # ---- micro-batch boundary: host a is already at cap
                "http://a.example.com/5",
                "http://b.example.com/6",
                "http://c.example.com/7",
                "http://b.example.com/8",
            ],
        }
    )
    expected = (
        streaming_domain_cap(
            spark.createDataFrame(delta, "doc_id long, uri string"), 2
        )
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    byid = expected.set_index("doc_id")
    assert list(byid.kept) == [True, True, True, False, False, True, True, False]

    root = str(tmp_path / "domcap_stream")
    os.makedirs(root, exist_ok=True)
    for i, part in enumerate(
        (delta[delta.doc_id < 5], delta[delta.doc_id >= 5])
    ):
        path = os.path.join(root, f"part-{i:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, uri string")
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_domain_cap(stream, 2)
        .writeStream.format("memory")
        .queryName("domcap_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from domcap_pairs")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[expected.columns], expected)
    with pytest.raises(ValueError):
        streaming_domain_cap(stream, 0)


def test_tar_skips_non_file_members():
    """Dirs/symlinks/PAX headers are skipped, not surfaced as payloads
    (and not mistaken for truncation)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("adir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("alink")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "target"
        tf.addfile(ln)
        info = tarfile.TarInfo("real.bin")
        info.size = 3
        tf.addfile(info, io.BytesIO(b"abc"))
    assert decode_tar(buf.getvalue()) == [("real.bin", b"abc")]


def test_wds_duplicate_member_names_last_wins(spark):
    """tar legally carries duplicate names (append/update semantics);
    wds_samples must resolve them last-wins instead of raising Spark's
    DUPLICATED_MAP_KEY error."""
    shard = encode_tar(
        [("k.cls", b"old"), ("k.bmp", b"img"), ("k.cls", b"new")]
    )
    shards = spark.createDataFrame(
        pd.DataFrame({"shard_id": [0], "payload": [shard]}),
        "shard_id long, payload binary",
    )
    s = wds_samples(wds_members(shards)).toPandas()
    assert len(s) == 1
    assert s.n_members[0] == 2  # distinct exts after last-wins
    assert bytes(s.payloads[0]["cls"]) == b"new"


def test_shard_to_dedup_composition(spark):
    """End-to-end ingestion story: WebDataset shards in, pHash dedup
    verdicts out — the member explode feeds phash_images directly."""
    import numpy as np

    from pandas_sigproc_spark.operators.imagedup import phash_dedup
    from pandas_sigproc_spark.sources.bmp import encode_bmp

    def smooth(seed):
        r = np.random.default_rng(seed)
        base = r.standard_normal((8, 8))
        big = np.kron(base, np.ones((8, 8)))
        big = (big - big.min()) / (big.max() - big.min()) * 255
        return np.repeat(big[:, :, None], 3, 2).astype(np.uint8)

    # two shards; image 3 is a byte-copy of image 0 across shards
    s0 = encode_tar(
        [(f"{i}.bmp", encode_bmp(smooth(i))) for i in range(3)]
    )
    s1 = encode_tar(
        [("3.bmp", encode_bmp(smooth(0))), ("4.bmp", encode_bmp(smooth(9)))]
    )
    shards = spark.createDataFrame(
        pd.DataFrame({"shard_id": [0, 1], "payload": [s0, s1]}),
        "shard_id long, payload binary",
    )
    imgs = (
        wds_members(shards)
        .filter(F.col("ext") == "bmp")
        .select(F.col("key").cast("long").alias("media_id"), "payload")
    )
    out = phash_dedup(imgs, 3).toPandas().set_index("media_id")
    assert not bool(out.loc[3, "keep"])  # the cross-shard copy drops
    assert bool(out.loc[0, "keep"]) and bool(out.loc[4, "keep"])


def test_ingestion_operators_are_stream_safe(spark, tmp_path):
    """wds_members and warc_documents are stateless mapInPandas passes,
    so they run unchanged on a stream of shards/archives — the
    continuous-ingestion front door.  Replayed-stream output == batch."""
    import os

    shard = encode_tar([("0.bmp", b"A" * 10), ("0.cls", b"7")])
    blob = encode_warc(
        [{"uri": "http://corpus/1", "payload": b"doc one"}],
        gzip_records=True,
    )
    for name, pdf, schema, op, sort_cols in (
        (
            "wds",
            pd.DataFrame({"shard_id": [0], "payload": [shard]}),
            "shard_id long, payload binary",
            lambda df: wds_members(df).drop("payload"),
            ["shard_id", "key", "ext"],
        ),
        (
            "warc",
            pd.DataFrame({"archive_id": [0], "payload": [blob]}),
            "archive_id long, payload binary",
            warc_documents,
            ["archive_id", "uri"],
        ),
    ):
        batch = (
            op(spark.createDataFrame(pdf, schema))
            .toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )
        root = str(tmp_path / f"{name}_stream")
        os.makedirs(root, exist_ok=True)
        pdf.to_parquet(os.path.join(root, "part-000.parquet"), index=False)
        q = (
            op(spark.readStream.schema(schema).parquet(root))
            .writeStream.format("memory")
            .queryName(f"{name}_ingest")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql(f"select * from {name}_ingest")
            .toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )
        pd.testing.assert_frame_equal(got[batch.columns], batch)


# --- hypothesis properties ---------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_name_st = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789._-"),
    min_size=1,
    max_size=40,
).filter(lambda s: s not in (".", "..") and not s.startswith("."))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(_name_st, st.binary(max_size=1500)),
        min_size=0,
        max_size=6,
    )
)
def test_tar_roundtrip_property(members):
    # tar keys on names; duplicate names are legal and preserved in order
    blob = encode_tar(members)
    assert len(blob) % 512 == 0
    assert decode_tar(blob) == members
    # cross-check against the independent stdlib reader
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [
            (m.name, tf.extractfile(m).read())
            for m in tf.getmembers()
            if m.isfile()
        ]
    assert got == members


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FFF
                ),
                min_size=1,
                max_size=60,
            ),
            st.binary(max_size=2000),
        ),
        # min 1: encode_warc([]) is b'', and decode_warc refuses empty
        # input BY DESIGN (a zero-byte blob at the ingestion seam is a
        # failed fetch, indistinguishable from a valid empty archive —
        # r13 container-codec taxonomy)
        min_size=1,
        max_size=5,
    ),
    st.booleans(),
)
def test_warc_roundtrip_property(recs, gz):
    # WARC header field values are whitespace-TRIMMED on parse (spec
    # behavior), so URIs with leading/trailing whitespace are not
    # representable — normalize the generated ones the same way
    records = [
        {
            "uri": ("http://h/" + u.replace("\r", "").replace("\n", "")).strip(),
            "payload": p,
        }
        for u, p in recs
    ]
    got = decode_warc(encode_warc(records, gzip_records=gz))
    assert [(r["uri"], r["payload"]) for r in got] == [
        (r["uri"], r["payload"]) for r in records
    ]


def test_on_error_skip_tolerates_corrupt_containers(spark):
    """A 100 TB crawl job must not die on one truncated shard: with
    on_error='skip' the corrupt container drops and the rest survive;
    the default still raises."""
    good_shard = encode_tar([("0.bmp", b"AA")])
    bad = bytearray(good_shard)
    bad[148] ^= 0x01  # corrupt the header checksum
    bad_shard = bytes(bad)
    shards = spark.createDataFrame(
        pd.DataFrame(
            {"shard_id": [0, 1], "payload": [good_shard, bad_shard]}
        ),
        "shard_id long, payload binary",
    )
    with pytest.raises(Exception):
        wds_members(shards).count()
    m = wds_members(shards, on_error="skip").toPandas()
    assert set(m.shard_id) == {0} and len(m) == 1
    with pytest.raises(ValueError, match="on_error"):
        wds_members(shards, on_error="ignore")

    good_arc = encode_warc(
        [{"uri": "http://h/1", "payload": b"x"}], gzip_records=True
    )
    archives = spark.createDataFrame(
        pd.DataFrame(
            {"archive_id": [0, 1], "payload": [good_arc, good_arc[:-6]]}
        ),
        "archive_id long, payload binary",
    )
    with pytest.raises(Exception):
        warc_documents(archives).count()
    d = warc_documents(archives, on_error="skip").toPandas()
    assert set(d.archive_id) == {0} and list(d.text) == ["x"]

    # bit-corrupted gzip member: zlib raises zlib.error, which must
    # surface as ValueError so on_error='skip' survives it
    flipped = bytearray(good_arc)
    flipped[len(flipped) // 2] ^= 0xFF
    flipped = bytes(flipped)
    with pytest.raises(ValueError):
        decode_warc(flipped)
    arcs2 = spark.createDataFrame(
        pd.DataFrame({"archive_id": [0, 1], "payload": [good_arc, flipped]}),
        "archive_id long, payload binary",
    )
    d2 = warc_documents(arcs2, on_error="skip").toPandas()
    assert set(d2.archive_id) == {0} and list(d2.text) == ["x"]

    # record missing its Content-Length header: ValueError, not KeyError
    headerless = (
        b"WARC/1.1\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://h/1\r\n"
        b"\r\n"
        b"x\r\n\r\n"
    )
    with pytest.raises(ValueError, match="Content-Length"):
        decode_warc(headerless)
    arcs3 = spark.createDataFrame(
        pd.DataFrame(
            {"archive_id": [0, 1], "payload": [good_arc, headerless]}
        ),
        "archive_id long, payload binary",
    )
    d3 = warc_documents(arcs3, on_error="skip").toPandas()
    assert set(d3.archive_id) == {0} and list(d3.text) == ["x"]


def test_warc_records_skip_survives_null_payload(spark):
    # r13 review finding: bytes(None) leaked TypeError past on_error='skip'.
    from pandas_sigproc_spark.operators.webcrawl import warc_records
    from pandas_sigproc_spark.sources.warc import encode_warc

    good = encode_warc(
        [{"type": "response", "uri": "http://e/x", "date": "2024",
          "content_type": "text/html", "payload": b"<p>hi</p>"}]
    )
    df = spark.createDataFrame(
        [(1, good), (2, None), (None, good)],
        "archive_id long, payload binary",
    )
    rows = warc_records(df, on_error="skip").collect()
    assert {r["archive_id"] for r in rows} == {1}
    import pytest as _pytest

    with _pytest.raises(Exception, match="NULL archive_id/payload"):
        warc_records(df, on_error="raise").collect()


def test_url_host_null_on_malformed_uri(spark):
    # r13 review finding: parse_url raised INVALID_URL under ANSI and
    # killed domain_stats/cap_per_domain/linkgraph on the first bad URI.
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import url_host

    df = spark.createDataFrame(
        [("http://a b/x",), ("http://ok.example/y",)], "uri string"
    )
    got = [r[0] for r in df.select(url_host(F.col("uri"))).collect()]
    assert got == [None, "ok.example"]


def test_canonicalize_url_schemeless_is_null(spark):
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import canonicalize_url

    df = spark.createDataFrame(
        [("about.html",), ("//cdn.example/x",),
         ("HTTP://E.example:80/p?b=2&a=1#f",)],
        "u string",
    )
    got = [r[0] for r in df.select(canonicalize_url(F.col("u"))).collect()]
    assert got[0] is None and got[1] is None
    assert got[2] == "http://e.example/p?a=1&b=2"


def test_registrable_domain_trailing_dot(spark):
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import (
        registrable_domain_expr,
    )

    df = spark.createDataFrame(
        [("badnet.example.",), ("spam.co.uk.",), ("plain.example",)],
        "h string",
    )
    got = [r[0] for r in df.select(registrable_domain_expr(F.col("h"))).collect()]
    assert got == ["badnet.example", "spam.co.uk", "plain.example"]


def test_sitemap_locs_decodes_entities(spark):
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import sitemap_locs

    xml = ("<urlset><url><loc>http://e/x?a=1&amp;b=2</loc></url>"
           "<url><loc> http://e/y </loc></url></urlset>")
    df = spark.createDataFrame([(xml,)], "xml string")
    (got,) = df.select(sitemap_locs(F.col("xml")).alias("ls")).first()
    assert got == ["http://e/x?a=1&b=2", "http://e/y"]


def test_resolve_url_matches_urljoin(spark):
    # r13: RFC 3986 reference resolution as a native expression — the
    # step html_links output needs before canonicalize_url (which NULLs
    # schemeless input by design).  Reference: urllib.parse.urljoin
    # with fragments stripped (resolve_url drops them, documented).
    import re

    from urllib.parse import urldefrag, urljoin

    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import resolve_url

    bases = [
        "http://h.example/a/b/c?x=1",   # file-ish path + query
        "http://h.example",             # no path at all
        "http://h.example/a/dir/",      # directory path
        "http://h.example:8080/a/b",    # explicit port
    ]
    base = bases[0]
    hrefs = [
        "http://other.example/q",          # absolute
        "https://other.example/q?z=2",     # absolute with query
        "//cdn.example/lib.js",            # protocol-relative
        "/rooted/path",                    # origin-absolute
        "/rooted/../up",                   # dot segments in rooted
        "?y=2",                            # query-only
        "",                                # same-document
        "#frag",                           # fragment-only
        "d",                               # sibling file
        "d/e",                             # deeper
        "./d",                             # explicit cwd
        "../d",                            # parent
        "../../d",                         # grandparent
        "../../../d",                      # above root (clamps)
        "d/",                              # trailing slash
        "..",                              # bare parent (dir form)
        ".",                               # bare cwd (dir form)
        "mailto:x@example.com",            # non-http scheme passes
    ]
    pairs = [(b, h) for b in bases for h in hrefs]
    df = spark.createDataFrame(pairs, "base string, href string")
    got = [
        r[0]
        for r in df.select(
            resolve_url(F.col("base"), F.col("href"))
        ).collect()
    ]
    def _w(b, h):
        # second documented deviation: resolve_url emits the CANONICAL
        # '/' for an empty base path ('http://h?y' -> 'http://h/?y'),
        # matching canonicalize_url's empty-path rule; urljoin keeps ''
        w = urldefrag(urljoin(b, h))[0]
        return re.sub(r"^([A-Za-z+.-]+://[^/?]+)(\?|$)", r"\1/\2", w)

    want = [_w(b, h) for b, h in pairs]
    assert got == want, [
        (b, h, g, w)
        for (b, h), g, w in zip(pairs, got, want)
        if g != w
    ]
    # Documented deviation from urllib: RFC 3986 PRESERVES interior
    # empty segments ('a//b' merges to '/a/b/a//b'); CPython's urljoin
    # collapses them.  resolve_url follows the RFC.
    (rfc,) = (
        df.limit(0)
        .sparkSession.createDataFrame(
            [(base, "a//b")], "base string, href string"
        )
        .select(resolve_url(F.col("base"), F.col("href")))
        .first()
    )
    assert rfc == "http://h.example/a/b/a//b"


def test_resolve_url_null_and_schemeless_base(spark):
    from pyspark.sql import functions as F

    from pandas_sigproc_spark.operators.webcrawl import resolve_url

    df = spark.createDataFrame(
        [(None, "d"), ("relative/base", "d"), ("http://h/x", None)],
        "base string, href string",
    )
    got = [
        r[0]
        for r in df.select(
            resolve_url(F.col("base"), F.col("href"))
        ).collect()
    ]
    assert got == [None, None, None]
