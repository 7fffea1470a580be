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
Header VALUES are validated control-character-free: crawl URIs are
attacker-controlled (extracted hrefs), and an embedded CR/LF would
inject forged header lines or terminate the block early (a review
finding) — refused loudly instead.

Decoder: parses plain OR record-gzipped archives (gzip members are
split via zlib's ``unused_data`` — stdlib only, STREAMED one member at
a time so peak task memory is one record, not the whole inflated
archive), validates the version line, unfolds ISO 28500 continuation
lines, requires ``Content-Length`` to be ASCII digits, reads exactly
that many octets, and returns one dict per record: ``{type, uri, date,
content_type, record_id, payload}``.  Empty input refuses (a zero-byte
blob is a corrupt fetch, not a valid empty archive — the decode_zip
taxonomy).

``operators/webcrawl.py`` is the distributed extraction;
tests/test_warc.py pins byte-level roundtrips and malformed-input
refusals.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

_CRLF = b"\r\n"
_DATE = "2024-01-01T00:00:00Z"  # deterministic; callers may override


def _hval(rec: dict, key: str, default: str) -> bytes:
    v = str(rec.get(key, default))
    if any(c in v for c in "\r\n\x00"):
        raise ValueError(
            f"WARC header value for {key!r} contains a control character"
            f" — header injection refused: {v!r}"
        )
    return v.encode()


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
        rtype = _hval(rec, "type", "response")
        if not rec.get("uri"):
            # uri is MANDATORY for target-addressed record types —
            # missing, None, OR empty-string (a malformed extraction
            # that yielded '' would otherwise silently encode an empty
            # WARC-Target-URI with the id hashed over '', the data-loss
            # path this guard closes; a review finding caught the ''
            # hole).  warcinfo/metadata records legitimately carry no
            # WARC-Target-URI (WARC 1.1 §5.12) — those omit the header.
            if rtype not in (b"warcinfo", b"metadata"):
                raise ValueError(
                    "encode_warc: record is missing its 'uri' — every"
                    f" {rtype.decode()!r} record needs a non-empty"
                    " target URI (only warcinfo/metadata may omit it)"
                )
            uri = None
        else:
            uri = _hval(rec, "uri", "")
        rid = hashlib.md5(
            (uri if uri is not None else b"\x00" + rtype)
            + b"\x00"
            + payload
        ).hexdigest()
        headers = [
            b"WARC/1.1",
            b"WARC-Type: " + rtype,
            b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
            b"WARC-Date: " + _hval(rec, "date", _DATE),
            *(
                [b"WARC-Target-URI: " + uri]
                if uri is not None
                else []
            ),
            b"Content-Type: " + _hval(rec, "content_type", "text/plain"),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        body = _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_records:
            # mtime=0: deterministic bytes (gzip stores a timestamp)
            body = gzip.compress(body, mtime=0)
        out += body
    return bytes(out)


_GZ_CHUNK = 1 << 20


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members, YIELDING one
    member's plaintext at a time (stdlib only).  LINEAR in archive
    size: each member is fed bounded memoryview chunks, so neither a
    per-member tail slice nor zlib's ``unused_data`` ever copies more
    than one chunk — the naive ``decompress(data[pos:])`` form is
    quadratic for Common-Crawl-scale member counts (50k members x a
    full-tail memcpy each).  A generator, not a list: materializing
    every inflated member at once held ~the whole decompressed archive
    in one task (a review finding) — consumers release each member
    after parsing it."""
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
        yield b"".join(parts)
        pos -= len(d.unused_data)  # rewind the next member's head


def _unfold(lines: list[str]) -> list[str]:
    """ISO 28500 §4 header folding: a line starting with SP/HTAB
    continues the previous field's value (previously mis-parsed as a
    junk new field, silently truncating long URIs — a review
    finding)."""
    out: list[str] = []
    for line in lines:
        if line[:1] in (" ", "\t") and out:
            out[-1] += " " + line.strip()
        else:
            out.append(line)
    return out


def decode_warc(data: bytes) -> list[dict]:
    """Records of a plain or record-gzipped WARC 1.1/1.0 archive."""
    if not data:
        raise ValueError(
            "WARC: empty input is not an archive (a zero-byte fetch is"
            " corrupt under the skip contract, not an empty corpus)"
        )
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _split_gzip_members(bytes(data))
    else:
        chunks = iter([bytes(data)])
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
            lines = _unfold(header_block.split("\r\n"))
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
            cl = fields["content-length"]
            if not (cl.isascii() and cl.isdigit()):
                # bare int() accepts '1_0', '+5', unicode digits — all
                # non-spec forms other readers refuse (a review finding)
                raise ValueError(
                    f"WARC Content-Length is not ASCII digits: {cl!r}"
                )
            length = int(cl)
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
