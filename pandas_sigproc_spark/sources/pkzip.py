"""From-scratch ZIP codec (PKWARE APPNOTE.TXT) — pure stdlib.

The third container seam of the ingestion tier (tar shards:
``sources/tar.py``; WARC crawls: ``sources/warc.py``): many public
datasets ship as ZIP archives, and at 100 TB the engine splits work
per archive, so the codec only ever sees one archive's bytes inside
one task.

Encoder: writes stored (method 0) or raw-deflate (method 8) members
with deterministic bytes — fixed DOS timestamp (1980-01-01 00:00),
zero flags, no data descriptors, no extra fields — so executors
re-encoding the same members produce identical archives.

Decoder: locates the end-of-central-directory record by scanning the
tail, walks the central directory, re-reads each LOCAL header (name /
extra lengths may legally differ from the central copy), inflates
method-8 payloads with ``zlib`` (wbits=-15), and verifies CRC-32 and
both sizes.  Malformed input refuses loudly (`ValueError`): bad
signatures, encrypted members (flag bit 0), data-descriptor members
(flag bit 3), unsupported methods, ZIP64 markers, CRC/size mismatches,
and truncation.

tests/test_pkzip.py pins stdlib-``zipfile`` cross-reads in BOTH
directions (including deflate), hypothesis roundtrips, and the
refusal matrix; ``operators/webdataset.py::zip_members`` is the
distributed extraction.
"""

from __future__ import annotations

import struct
import zlib

_LOCAL_SIG = 0x04034B50
_CENTRAL_SIG = 0x02014B50
_EOCD_SIG = 0x06054B50

# 1980-01-01 00:00:00 in DOS packed form: deterministic encoder bytes
_DOS_TIME = 0
_DOS_DATE = (0 << 9) | (1 << 5) | 1  # year-1980, month 1, day 1

STORED = 0
DEFLATED = 8


def _deflate_raw(data: bytes) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def _inflate_raw(data: bytes, expect_size: int) -> bytes:
    d = zlib.decompressobj(-15)
    try:
        out = d.decompress(data, expect_size + 1)
        # bomb guard: raise BEFORE flush() — flush would materialize
        # the entire remaining stream, so a member whose header claims
        # 10 bytes but inflates to gigabytes must be refused here, not
        # after the allocation (the on_error="skip" path depends on
        # this being a ValueError, not an executor OOM).
        if len(out) > expect_size:
            raise ValueError(
                "deflate stream exceeds the declared member size"
            )
        out += d.flush()
    except zlib.error as e:
        raise ValueError(f"bad deflate stream in ZIP member: {e}") from e
    return out


def encode_zip(
    members: list[dict],
    *,
    compress: bool = False,
) -> bytes:
    """Serialize ``members`` (dicts with ``name`` str and ``payload``
    bytes, optional per-member ``compress`` overriding the archive
    default) as a ZIP archive.  Member order is preserved; bytes are
    deterministic."""
    if len(members) > 0xFFFF:
        raise ValueError(
            f"{len(members)} members need ZIP64, which this encoder"
            " does not write (max 65535)"
        )
    out = bytearray()
    central = bytearray()
    for m in members:
        name = m["name"].encode("utf-8")
        payload = bytes(m["payload"])
        # pre-validate the 16/32-bit fields: struct.error from pack()
        # is a cryptic unlocated crash, not the module's documented
        # ValueError refusal (a review finding)
        if len(name) > 0xFFFF:
            raise ValueError(
                f"member name of {len(name)} bytes exceeds the ZIP"
                " 65535-byte field"
            )
        if len(payload) >= 0xFFFFFFFF or len(out) >= 0xFFFFFFFF:
            raise ValueError(
                "member or archive size needs ZIP64, which this encoder"
                " does not write (max 4 GiB)"
            )
        do_comp = bool(m.get("compress", compress))
        method = DEFLATED if do_comp else STORED
        blob = _deflate_raw(payload) if do_comp else payload
        if len(blob) >= 0xFFFFFFFF:
            # the stored field is the COMPRESSED size — deflate can
            # exceed the raw size on incompressible data near the limit
            raise ValueError(
                "compressed member size needs ZIP64, which this encoder"
                " does not write (max 4 GiB)"
            )
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        # bit 11 = UTF-8 name (APPNOTE appendix D); without it readers
        # decode names as cp437, so non-ASCII names would corrupt on a
        # stdlib cross-read.  ASCII names stay flagless for byte
        # compatibility with common tools.
        flags = 0x800 if any(b > 0x7F for b in name) else 0
        offset = len(out)
        out += struct.pack(
            "<IHHHHHIIIHH",
            _LOCAL_SIG,
            20,  # version needed
            flags,  # no encryption, no data descriptor
            method,
            _DOS_TIME,
            _DOS_DATE,
            crc,
            len(blob),
            len(payload),
            len(name),
            0,  # extra len
        )
        out += name + blob
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _CENTRAL_SIG,
            20,  # version made by
            20,  # version needed
            flags,
            method,
            _DOS_TIME,
            _DOS_DATE,
            crc,
            len(blob),
            len(payload),
            len(name),
            0,  # extra len
            0,  # comment len
            0,  # disk number start
            0,  # internal attrs
            0,  # external attrs
            offset,
        )
        central += name
    cd_offset = len(out)
    if cd_offset >= 0xFFFFFFFF or len(central) >= 0xFFFFFFFF:
        # the loop-entry check bounds each member's OFFSET field, but
        # the last member's blob can still push the central-directory
        # offset past the 32-bit EOCD field — and the directory's own
        # SIZE field can overflow independently (central entries are 16
        # bytes larger per member than local headers, so max-length
        # names can blow the size while the offset stays legal)
        raise ValueError(
            "archive size needs ZIP64, which this encoder does not"
            " write (max 4 GiB)"
        )
    out += central
    out += struct.pack(
        "<IHHHHIIH",
        _EOCD_SIG,
        0,
        0,
        len(members),
        len(members),
        len(central),
        cd_offset,
        0,
    )
    return bytes(out)


def _find_eocd(data: bytes) -> tuple[int, int, int, int]:
    """(entry_count, cd_size, cd_offset, eocd_pos) from the end-of-
    central-directory record (scanned backwards through any trailing
    comment)."""
    n = len(data)
    if n < 22:
        raise ValueError("too short to be a ZIP archive")
    # EOCD is in the last 22 + 65535 bytes (comment max).  Scan
    # candidate signatures backwards, preferring the first whose
    # comment length ends exactly at EOF — a trailing comment may
    # itself contain the 4 signature bytes, and blindly taking the
    # LAST occurrence would reject a valid archive.  Archives with
    # trailing bytes AFTER the comment (appended padding/garbage —
    # `cat a.zip garbage` — which stdlib zipfile reads fine, since it
    # only requires the comment slice to be complete, not EOF-exact)
    # fall back to the last candidate whose comment merely FITS; the
    # exact-EOF pass keeps signature-in-comment archives parsing to
    # their real record.
    lo = max(0, n - 22 - 0xFFFF)
    sig = struct.pack("<I", _EOCD_SIG)
    fallback = -1
    saw_truncated = False
    pos = data.rfind(sig, lo, n)
    while pos >= 0:
        if pos + 22 <= n:
            (comment_len,) = struct.unpack("<H", data[pos + 20 : pos + 22])
            if pos + 22 + comment_len == n:
                break
            if fallback < 0 and pos + 22 + comment_len <= n:
                fallback = pos
        else:
            saw_truncated = True
        pos = data.rfind(sig, lo, pos)
    if pos < 0:
        pos = fallback
    if pos < 0:
        if saw_truncated:
            raise ValueError("truncated end-of-central-directory record")
        raise ValueError("no end-of-central-directory record")
    (
        _sig,
        disk,
        cd_disk,
        n_disk,
        n_total,
        cd_size,
        cd_offset,
        _comment_len,
    ) = struct.unpack("<IHHHHIIH", data[pos : pos + 22])
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        raise ValueError("multi-disk ZIP archives are not supported")
    if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        raise ValueError("ZIP64 archives are not supported")
    return n_total, cd_size, cd_offset, pos


def decode_zip(data: bytes) -> list[dict]:
    """Members of a ZIP archive as ``{name, payload}`` dicts, in
    central-directory order, CRC- and size-verified."""
    data = bytes(data)
    n_total, cd_size, cd_offset, eocd_pos = _find_eocd(data)
    # Data PREPENDED to the archive (self-extracting stubs, shebang
    # lines) shifts every stored offset: stdlib zipfile computes the
    # same "concat" correction (eocd - cd_offset - cd_size) and reads
    # such archives fine, while this decoder refused them (a review
    # finding).  A negative shift means the directory claims to extend
    # past its own EOCD record — corrupt.
    shift = eocd_pos - (cd_offset + cd_size)
    if shift < 0:
        raise ValueError(
            "central directory overlaps the end-of-central-directory"
            " record"
        )
    cd_offset += shift
    if cd_offset + cd_size > len(data):
        raise ValueError("central directory extends past end of archive")
    out: list[dict] = []
    pos = cd_offset
    for _ in range(n_total):
        if pos + 46 > cd_offset + cd_size:
            raise ValueError("truncated central directory")
        (
            sig,
            _ver_made,
            _ver_need,
            flags,
            method,
            _t,
            _d,
            crc,
            csize,
            usize,
            name_len,
            extra_len,
            comment_len,
            _disk,
            _iattr,
            _eattr,
            local_off,
        ) = struct.unpack("<IHHHHHHIIIHHHHHII", data[pos : pos + 46])
        if sig != _CENTRAL_SIG:
            raise ValueError(f"bad central-directory signature at {pos}")
        if flags & 0x1:
            raise ValueError("encrypted ZIP members are not supported")
        if flags & 0x8:
            raise ValueError(
                "data-descriptor ZIP members are not supported"
            )
        if method not in (STORED, DEFLATED):
            raise ValueError(f"unsupported ZIP compression method {method}")
        if pos + 46 + name_len + extra_len + comment_len > cd_offset + cd_size:
            raise ValueError(
                "central-directory entry extends past the directory"
            )
        name = data[pos + 46 : pos + 46 + name_len].decode("utf-8")
        pos += 46 + name_len + extra_len + comment_len
        local_off += shift  # the same prepended-data correction
        # the LOCAL header's name/extra lengths govern the payload
        # offset and may differ from the central copy
        if local_off + 30 > len(data):
            raise ValueError(f"truncated local header for {name!r}")
        (lsig, _lv, _lf, _lm, _lt, _ld, _lcrc, _lcs, _lus, lname, lextra) = (
            struct.unpack("<IHHHHHIIIHH", data[local_off : local_off + 30])
        )
        if lsig != _LOCAL_SIG:
            raise ValueError(f"bad local-header signature for {name!r}")
        start = local_off + 30 + lname + lextra
        if start + csize > len(data):
            raise ValueError(f"truncated member payload for {name!r}")
        blob = data[start : start + csize]
        payload = _inflate_raw(blob, usize) if method == DEFLATED else blob
        if len(payload) != usize:
            raise ValueError(
                f"size mismatch for {name!r}: got {len(payload)}, "
                f"header says {usize}"
            )
        if zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch for {name!r}")
        out.append({"name": name, "payload": payload})
    return out


__all__ = ["DEFLATED", "STORED", "decode_zip", "encode_zip"]
