"""From-scratch ZIP codec (sources/pkzip.py) + zip_members extraction.

Contract mirrors the tar/WARC codecs: stdlib cross-reads in BOTH
directions (zipfile reads our bytes, we read zipfile's — stored and
deflate), hypothesis roundtrips, deterministic bytes, and a loud
refusal matrix (truncation, CRC corruption, encryption flags, ZIP64).
"""

import io
import struct
import zipfile

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pandas_sigproc_spark.operators.webdataset import zip_members
from pandas_sigproc_spark.sources.pkzip import decode_zip, encode_zip

MEMBERS = [
    {"name": "a.txt", "payload": b"hello world"},
    {"name": "dir/b.bin", "payload": bytes(range(256)) * 10},
    {"name": "empty", "payload": b""},
]


def test_roundtrip_stored_and_deflate():
    for compress in (False, True):
        blob = encode_zip(MEMBERS, compress=compress)
        got = decode_zip(blob)
        assert [(m["name"], m["payload"]) for m in got] == [
            (m["name"], m["payload"]) for m in MEMBERS
        ]


def test_per_member_compress_override():
    ms = [
        {"name": "s", "payload": b"x" * 1000, "compress": False},
        {"name": "d", "payload": b"x" * 1000, "compress": True},
    ]
    blob = encode_zip(ms)
    # the deflate member must actually be smaller on the wire
    zf = zipfile.ZipFile(io.BytesIO(blob))
    infos = {i.filename: i for i in zf.infolist()}
    assert infos["s"].compress_type == zipfile.ZIP_STORED
    assert infos["d"].compress_type == zipfile.ZIP_DEFLATED
    assert infos["d"].compress_size < 1000 <= infos["s"].compress_size
    assert decode_zip(blob)[1]["payload"] == b"x" * 1000


def test_stdlib_reads_our_bytes():
    blob = encode_zip(MEMBERS, compress=True)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert zf.testzip() is None  # CRC check over every member
    for m in MEMBERS:
        assert zf.read(m["name"]) == m["payload"]


def test_we_read_stdlib_bytes():
    for method in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", method) as zf:
            for m in MEMBERS:
                zf.writestr(m["name"], m["payload"])
        got = decode_zip(buf.getvalue())
        assert [(m["name"], m["payload"]) for m in got] == [
            (m["name"], m["payload"]) for m in MEMBERS
        ]


def test_deterministic_bytes():
    assert encode_zip(MEMBERS, compress=True) == encode_zip(
        MEMBERS, compress=True
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8",
                    exclude_characters="\x00",
                    exclude_categories=("Cs", "Cc"),
                ),
                min_size=1,
                max_size=30,
            ),
            st.binary(max_size=300),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda t: t[0],
    )
)
def test_roundtrip_property(items):
    ms = [
        {"name": n, "payload": p, "compress": c} for n, p, c in items
    ]
    got = decode_zip(encode_zip(ms))
    assert [(m["name"], m["payload"]) for m in got] == [
        (n, p) for n, p, _ in items
    ]
    # stdlib agrees on every member
    zf = zipfile.ZipFile(io.BytesIO(encode_zip(ms)))
    for n, p, _ in items:
        assert zf.read(n) == p


# ---------------------------------------------------------------------------
# refusal matrix
# ---------------------------------------------------------------------------


def test_refuses_truncation():
    blob = encode_zip(MEMBERS)
    with pytest.raises(ValueError):
        decode_zip(blob[:10])
    # cut inside the central directory: EOCD gone
    with pytest.raises(ValueError):
        decode_zip(blob[: len(blob) - 23])


def test_comment_containing_eocd_signature():
    # A trailing archive comment whose bytes happen to contain the
    # EOCD signature must not shadow the real record: the scan walks
    # candidates backwards and accepts the one whose comment length is
    # consistent with the remaining bytes (stdlib-compatible).
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"hello world")
        zf.comment = b"xx" + struct.pack("<I", 0x06054B50) + b"trailing"
    blob = buf.getvalue()
    # sanity: the decoy signature really is in the tail
    assert blob.rfind(struct.pack("<I", 0x06054B50)) > blob.find(
        struct.pack("<I", 0x06054B50)
    )
    got = decode_zip(blob)
    assert [(m["name"], m["payload"]) for m in got] == [
        ("a.txt", b"hello world")
    ]


def test_refuses_crc_corruption():
    blob = bytearray(encode_zip([{"name": "a", "payload": b"abcdef"}]))
    # flip a payload byte (local header is 30 + name 1)
    blob[31] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_zip(bytes(blob))


def test_refuses_encrypted_and_descriptor_flags():
    for flag in (0x1, 0x8):
        blob = bytearray(encode_zip([{"name": "a", "payload": b"x"}]))
        # central directory flag field sits 8 bytes into the entry;
        # the CD starts right after local header+name+payload
        cd = 30 + 1 + 1
        struct.pack_into("<H", blob, cd + 8, flag)
        with pytest.raises(ValueError, match="not supported"):
            decode_zip(bytes(blob))


def test_refuses_zip64_markers():
    blob = bytearray(encode_zip([{"name": "a", "payload": b"x"}]))
    # overwrite EOCD total-entry count with the ZIP64 sentinel
    eocd = len(blob) - 22
    struct.pack_into("<HH", blob, eocd + 8, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError, match="ZIP64"):
        decode_zip(bytes(blob))


def test_refuses_garbage():
    with pytest.raises(ValueError):
        decode_zip(b"not a zip archive at all........")


# ---------------------------------------------------------------------------
# distributed extraction
# ---------------------------------------------------------------------------


def test_zip_members_explodes_archives(spark):
    rows = [
        (0, encode_zip(MEMBERS)),
        (1, encode_zip([{"name": "x", "payload": b"q" * 50}], compress=True)),
    ]
    df = spark.createDataFrame(rows, "shard_id long, payload binary")
    got = (
        zip_members(df)
        .orderBy("shard_id", "member_idx")
        .collect()
    )
    assert [(r.shard_id, r.member_idx, r.name, r.n_bytes) for r in got] == [
        (0, 0, "a.txt", 11),
        (0, 1, "dir/b.bin", 2560),
        (0, 2, "empty", 0),
        (1, 0, "x", 50),
    ]
    assert bytes(got[3].payload) == b"q" * 50


def test_zip_members_on_error_skip(spark):
    good = encode_zip([{"name": "ok", "payload": b"fine"}])
    bad = bytearray(encode_zip([{"name": "bad", "payload": b"abcdef"}]))
    bad[35] ^= 0xFF  # corrupt a payload byte (30 + name 3 = 33) -> CRC refusal
    df = spark.createDataFrame(
        [(0, good), (1, bytes(bad))], "shard_id long, payload binary"
    )
    with pytest.raises(Exception):
        zip_members(df).collect()
    got = zip_members(df, on_error="skip").collect()
    assert [(r.shard_id, r.name) for r in got] == [(0, "ok")]


def test_zip_members_composes_with_wds_samples(spark):
    from pandas_sigproc_spark.operators.webdataset import wds_samples
    from pyspark.sql import functions as F

    ms = [
        {"name": "000/1.txt", "payload": b"t"},
        {"name": "000/1.cls", "payload": b"7"},
    ]
    df = spark.createDataFrame(
        [(0, encode_zip(ms))], "shard_id long, payload binary"
    )
    members = zip_members(df).select(
        "shard_id",
        "member_idx",
        F.concat_ws(
            "/",
            F.slice(F.split("name", "/"), 1, 1)[0],
            F.split(F.element_at(F.split("name", "/"), -1), "\\.")[0],
        ).alias("key"),
        F.element_at(F.split("name", "\\."), -1).alias("ext"),
        "n_bytes",
        "payload",
    )
    samples = wds_samples(members).collect()
    assert len(samples) == 1
    assert samples[0].key == "000/1"
    assert sorted(samples[0].exts) == ["cls", "txt"]


def test_refuses_decompression_bomb_without_inflating(spark=None):
    import zlib as _z

    # 10 MB of zeros deflates to ~10 KB; header claims usize=4
    bomb_payload = b"\x00" * (10 << 20)
    co = _z.compressobj(9, _z.DEFLATED, -15)
    blob = co.compress(bomb_payload) + co.flush()
    from pandas_sigproc_spark.sources.pkzip import _inflate_raw

    with pytest.raises(ValueError, match="exceeds the declared"):
        _inflate_raw(blob, 4)


def test_refuses_cd_name_len_overflow():
    blob = bytearray(encode_zip([{"name": "a", "payload": b"x"}]))
    cd = 30 + 1 + 1  # central directory start
    # name_len field sits 28 bytes into the CD entry
    struct.pack_into("<H", blob, cd + 28, 0xFF00)
    with pytest.raises(ValueError, match="extends past"):
        decode_zip(bytes(blob))


def test_trailing_garbage_after_archive_still_parses():
    # stdlib zipfile accepts a ZIP with appended bytes (the comment
    # slice need only be complete, not EOF-exact); the EOCD scan's
    # exact-EOF preference must fall back rather than reject
    # (review finding on the round-10 comment-scan fix).
    blob = encode_zip(MEMBERS) + b"appended-garbage-not-a-comment"
    got = decode_zip(blob)
    assert [(m["name"], m["payload"]) for m in got] == [
        (m["name"], m["payload"]) for m in MEMBERS
    ]
    # stdlib agrees this is readable
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert [i.filename for i in zf.infolist()] == [m["name"] for m in MEMBERS]


def test_truncated_eocd_triage_message():
    blob = encode_zip(MEMBERS)
    # cut mid-EOCD: signature present but record incomplete
    cut = blob[: len(blob) - 10]
    with pytest.raises(ValueError, match="truncated end-of-central"):
        decode_zip(cut)


def test_prepended_data_offsets_shift_like_stdlib():
    # r13 review finding: self-extracting stubs / shebang prefixes
    # shift every stored offset; stdlib zipfile applies the concat
    # correction and reads them — so must we.
    import io
    import zipfile

    blob = encode_zip([{"name": "a.txt", "payload": b"hello"},
                       {"name": "b.bin", "payload": b"\x00\x01", "compress": True}])
    pre = b"#!/bin/sh\necho self-extracting\n" + blob
    assert zipfile.ZipFile(io.BytesIO(pre)).read("a.txt") == b"hello"
    got = {m["name"]: m["payload"] for m in decode_zip(pre)}
    assert got == {"a.txt": b"hello", "b.bin": b"\x00\x01"}


def test_encode_zip_field_overflow_raises_valueerror():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="65535-byte field"):
        encode_zip([{"name": "a" * 70000, "payload": b""}])
    with _pytest.raises(ValueError, match="max 65535"):
        encode_zip([{"name": f"{i}", "payload": b""} for i in range(65536)])


def test_refuses_zip64_compressed_size(monkeypatch):
    # r14 advice: the stored size field is the COMPRESSED blob's —
    # deflate can exceed the raw size on incompressible data near the
    # 4 GiB limit, so the raw-payload pre-check alone still let pack()
    # die with a cryptic struct.error.
    import pandas_sigproc_spark.sources.pkzip as pk

    class _Huge(bytes):
        def __len__(self):
            return 0x100000000

    monkeypatch.setattr(pk, "_deflate_raw", lambda payload: _Huge())
    with pytest.raises(ValueError, match="compressed member size"):
        pk.encode_zip([{"name": "a", "payload": b"x", "compress": True}])
