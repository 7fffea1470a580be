"""From-scratch ustar (POSIX.1-1988 tar) codec — pure stdlib.

The container seam of WebDataset-style training shards: large-scale
multimodal pipelines ship samples as tar files of members that share a
basename key (``000123.jpg`` + ``000123.cls`` + ``000123.json`` = one
sample), sharded across thousands of tars.  This module is the byte
layer; ``operators/webdataset.py`` is the distributed extraction.

Profile: plain ustar, 512-byte blocks — name(100) mode(8) uid(8)
gid(8) size(12, octal) mtime(12) chksum(8) typeflag(1) linkname(100)
magic("ustar\\0") version("00") uname(32) gname(32) devmajor(8)
devminor(8) prefix(155).  The encoder writes regular files only, with
deterministic metadata (mode 0644, uid/gid 0, mtime 0) so the same
members always produce the same bytes on every executor.  The decoder
validates the checksum (sum of header bytes with the chksum field
blanked to spaces) and magic on every header, handles both NUL- and
space-terminated octal, supports the ``prefix`` field, applies GNU
long-name (``L``) and PAX (``x``/``g`` ``path=`` override) extensions
so third-party tars with >100-char names keep their real keys, skips
other non-file members, refuses non-zero trailing garbage (a truncated
archive must never look successfully decoded), and stops at the two
terminating zero blocks (or clean EOF).

Reference parity note: the reference engine (jscans12/pandas-sigproc)
has no container formats at all — this is part of the training-data
extension surface, like sources/mp4.py and sources/wav.py.
"""

from __future__ import annotations

BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    """NUL-terminated zero-padded octal field (the ustar convention)."""
    s = oct(n)[2:].encode()
    if len(s) > width - 1:
        raise ValueError(f"value {n} overflows a {width}-byte octal field")
    return s.rjust(width - 1, b"0") + b"\x00"


def _header(name: str, size: int) -> bytes:
    nb = name.encode("utf-8")
    if not nb or b"\x00" in nb:
        # a NUL inside the 100-byte name field writes a VALID header
        # that decodes to the name truncated at the NUL — a silent
        # rename the roundtrip can never detect (a review finding);
        # empty names are equally unaddressable
        raise ValueError(
            f"tar member name must be non-empty and NUL-free: {name!r}"
        )
    prefix = b""
    if len(nb) > 100:
        # split at a '/' so name <= 100 and prefix <= 155
        for i in range(min(155, len(nb) - 1), 0, -1):
            if nb[i] == 0x2F and len(nb) - i - 1 <= 100:
                prefix, nb = nb[:i], nb[i + 1 :]
                break
        else:
            raise ValueError(f"member name too long for ustar: {name!r}")
    h = bytearray(BLOCK)
    h[0:100] = nb.ljust(100, b"\x00")
    h[100:108] = _octal(0o644, 8)  # mode
    h[108:116] = _octal(0, 8)  # uid
    h[116:124] = _octal(0, 8)  # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(0, 12)  # mtime: deterministic
    h[148:156] = b" " * 8  # chksum placeholder
    h[156:157] = b"0"  # typeflag: regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    h[345 : 345 + len(prefix)] = prefix
    chk = sum(h)
    h[148:156] = oct(chk)[2:].encode().rjust(6, b"0") + b"\x00 "
    return bytes(h)


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """One ustar archive holding ``members`` as regular files, in the
    given order, with deterministic metadata."""
    out = bytearray()
    for name, payload in members:
        payload = bytes(payload)
        out += _header(name, len(payload))
        out += payload
        pad = -len(payload) % BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * BLOCK)
    return bytes(out)


def _read_octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    return int(s, 8) if s else 0


def _pax_path(payload: bytes) -> str | None:
    """The ``path=`` override of a PAX extended-header payload
    ("LEN key=value\\n" records), or None."""
    pos = 0
    n = len(payload)
    while pos < n:
        sp = payload.find(b" ", pos)
        if sp < 0:
            raise ValueError("malformed PAX record: no length field")
        try:
            rec_len = int(payload[pos:sp])
        except ValueError:
            raise ValueError("malformed PAX record length") from None
        if rec_len <= 0 or pos + rec_len > n:
            raise ValueError("malformed PAX record length")
        rec = payload[sp + 1 : pos + rec_len]
        if rec.endswith(b"\n"):
            rec = rec[:-1]
        key, eq, val = rec.partition(b"=")
        if eq and key == b"path":
            return val.decode("utf-8")
        pos += rec_len
    return None


def decode_tar(data: bytes) -> list[tuple[str, bytes]]:
    """Members of a ustar archive as ``(name, payload)`` in file order.
    Raises on checksum/magic corruption and on non-zero trailing bytes
    (a truncated archive); GNU long-name (``L``) and PAX ``path=``
    extensions override the next member's name (third-party tars carry
    >100-char names this way — taking the truncated 100-char field
    would silently mis-key the sample, a review finding); other
    non-file members (dirs, symlinks) are skipped."""
    if not data:
        # align the corrupt-input taxonomy with decode_zip/decode_warc:
        # a zero-byte blob is a failed read, not a valid empty archive
        # (a review finding — it previously decoded as [] and looked
        # successfully processed under on_error='skip')
        raise ValueError("tar: empty input is not an archive")
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(data)
    next_name: str | None = None  # pending GNU-L / PAX path override
    terminated = False
    while pos + BLOCK <= n:
        h = data[pos : pos + BLOCK]
        if h == b"\x00" * BLOCK:  # first terminator block
            terminated = True
            pos += BLOCK
            break
        if h[257:262] != b"ustar":
            raise ValueError(f"bad tar magic at offset {pos}")
        stored = _read_octal(h[148:156])
        blank = h[:148] + b" " * 8 + h[156:]
        if sum(blank) != stored:
            raise ValueError(f"tar header checksum mismatch at offset {pos}")
        size = _read_octal(h[124:136])
        name = h[0:100].split(b"\x00")[0].decode("utf-8")
        prefix = h[345:500].split(b"\x00")[0].decode("utf-8")
        if prefix:
            name = prefix + "/" + name
        typeflag = h[156:157]
        pos += BLOCK
        payload = data[pos : pos + size]
        if len(payload) != size:
            raise ValueError(f"truncated tar member {name!r}")
        pos += size + (-size % BLOCK)
        if typeflag == b"L":  # GNU long name: payload names the NEXT member
            next_name = payload.split(b"\x00")[0].decode("utf-8")
        elif typeflag == b"x":  # PAX extended header (next member only)
            p = _pax_path(bytes(payload))
            if p is not None:
                next_name = p
        elif typeflag == b"g":
            # PAX GLOBAL header: per POSIX its values default ALL
            # subsequent members, but a global path= would name every
            # member identically — ill-defined, and GNU tar ignores it
            # with a warning.  Ignore path= here too (documented
            # choice); treating it like 'x' mis-keyed every member
            # after the first (an advice finding).
            pass
        elif typeflag in (b"0", b"\x00"):
            out.append((next_name or name, bytes(payload)))
            next_name = None
        else:
            next_name = None  # overrides apply to the NEXT member only
    if not terminated:
        # clean EOF without terminator blocks is tolerated (widespread
        # in the wild) — but only at a block boundary
        if pos != n:
            raise ValueError(
                f"tar archive truncated: {n - pos} trailing byte(s) do"
                " not form a whole block"
            )
    else:
        # after the terminator: everything must be zero padding
        # (non-zero tail = a torn concatenation or truncated append)
        if data[pos:].strip(b"\x00"):
            raise ValueError(
                "tar archive carries non-zero bytes after its"
                " terminator blocks"
            )
    return out


__all__ = ["encode_tar", "decode_tar"]
