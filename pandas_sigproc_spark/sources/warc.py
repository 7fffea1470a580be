"""From-scratch WARC 1.1 codec (ISO 28500) — pure stdlib.

The ingestion seam of web-crawl training corpora: Common-Crawl-style
archives are WARC files — a sequence of records, each a header block
(``WARC/1.1`` + named fields, CRLF-terminated) followed by
``Content-Length`` payload octets and a blank-line separator — usually
stored with every record as its own gzip member so readers can split
archives without decompressing the whole file.

Encoder: writes ``response`` records (plus any caller-specified type)
with deterministic record ids (``urn:md5:...`` over the payload + URI
— reproducible on every executor, unlike the spec's example uuids) and
a fixed date, either plain or per-record-gzipped (``gzip_records``).

Decoder: parses plain OR record-gzipped archives (gzip members are
split via zlib's ``unused_data`` — stdlib only), validates the version
line, reads exactly ``Content-Length`` octets, and returns one dict
per record: ``{type, uri, date, content_type, record_id, payload}``.

``operators/webcrawl.py`` is the distributed extraction;
tests/test_warc.py pins byte-level roundtrips and malformed-input
refusals.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib

_CRLF = b"\r\n"
_DATE = "2024-01-01T00:00:00Z"  # deterministic; callers may override


def encode_warc(
    records: list[dict],
    *,
    gzip_records: bool = False,
) -> bytes:
    """Serialize ``records`` (dicts with ``uri``, ``payload`` bytes,
    optional ``type``/``content_type``/``date``) as a WARC 1.1 archive.
    With ``gzip_records`` every record is its own gzip member (the
    Common Crawl layout)."""
    out = bytearray()
    for rec in records:
        payload = bytes(rec["payload"])
        uri = rec["uri"]
        rid = hashlib.md5(uri.encode() + b"\x00" + payload).hexdigest()
        headers = [
            b"WARC/1.1",
            b"WARC-Type: " + rec.get("type", "response").encode(),
            b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
            b"WARC-Date: " + rec.get("date", _DATE).encode(),
            b"WARC-Target-URI: " + uri.encode(),
            b"Content-Type: "
            + rec.get("content_type", "text/plain").encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        body = _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_records:
            # mtime=0: deterministic bytes (gzip stores a timestamp)
            body = gzip.compress(body, mtime=0)
        out += body
    return bytes(out)


_GZ_CHUNK = 1 << 20


def _split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members into per-member
    plaintexts (stdlib only).  LINEAR in archive size: each member is
    fed bounded memoryview chunks, so neither a per-member tail slice
    nor zlib's ``unused_data`` ever copies more than one chunk — the
    naive ``decompress(data[pos:])`` form is quadratic for
    Common-Crawl-scale member counts (50k members x a full-tail memcpy
    each)."""
    out = []
    view = memoryview(data)
    pos, n = 0, len(view)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        parts = []
        # zlib.error -> ValueError so the on_error='skip' contract
        # (which catches ValueError) survives bit-corrupted members,
        # matching pkzip._inflate_raw's conversion.
        try:
            while not d.eof and pos < n:
                chunk = view[pos : pos + _GZ_CHUNK]
                pos += len(chunk)
                parts.append(d.decompress(chunk))
            if not d.eof:
                raise ValueError("truncated gzip member in WARC archive")
            parts.append(d.flush())
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member in WARC archive: {exc}")
        out.append(b"".join(parts))
        pos -= len(d.unused_data)  # rewind the next member's head
    return out


def decode_warc(data: bytes) -> list[dict]:
    """Records of a plain or record-gzipped WARC 1.1/1.0 archive."""
    if data[:2] == b"\x1f\x8b":
        chunks = _split_gzip_members(bytes(data))
    else:
        chunks = [bytes(data)]
    out: list[dict] = []
    for chunk in chunks:
        pos = 0
        n = len(chunk)
        while pos < n:
            # skip inter-record blank lines
            while chunk[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            end = chunk.find(_CRLF + _CRLF, pos)
            if end < 0:
                raise ValueError(
                    f"truncated WARC header block at offset {pos}"
                )
            header_block = chunk[pos:end].decode("utf-8")
            lines = header_block.split("\r\n")
            if not lines[0].startswith("WARC/1."):
                raise ValueError(
                    f"bad WARC version line at offset {pos}: {lines[0]!r}"
                )
            fields: dict[str, str] = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                fields[k.strip().lower()] = v.strip()
            if "content-length" not in fields:
                raise ValueError(
                    f"WARC record at offset {pos} has no Content-Length"
                )
            length = int(fields["content-length"])
            body_start = end + 4
            payload = chunk[body_start : body_start + length]
            if len(payload) != length:
                raise ValueError("truncated WARC record payload")
            out.append(
                {
                    "type": fields.get("warc-type", ""),
                    "uri": fields.get("warc-target-uri", ""),
                    "date": fields.get("warc-date", ""),
                    "content_type": fields.get("content-type", ""),
                    "record_id": fields.get("warc-record-id", ""),
                    "payload": bytes(payload),
                }
            )
            pos = body_start + length
    return out


__all__ = ["encode_warc", "decode_warc"]
