"""From-scratch PNG codec on stdlib ``zlib`` — the second real image
format behind the multimodal decode seam (operators/multimodal.py).

PNG's wire format is public (RFC 2083 / ISO 15948): an 8-byte signature,
then length-prefixed CRC32-checked chunks.  This module implements the
baseline truecolor subset end to end:

- :func:`encode_png` — 8-bit RGB (color type 2), filter 0 scanlines,
  one zlib IDAT; any viewer/browser opens the output.
- :func:`decode_png_bytes` — full five-filter reconstruction (None /
  Sub / Up / Average / Paeth per the spec's decode algorithm), 8-bit
  RGB and RGBA (alpha dropped), greyscale expanded; multiple IDAT
  chunks concatenated; CRC verified; interlaced/palette/16-bit images
  rejected loudly rather than mis-decoded.

Per-row reconstruction is sequential by definition (each byte depends on
the reconstructed left neighbour), so the Up filter is vectorized and
Sub/Average/Paeth run a tight per-row loop — payload-scale work inside
the Arrow-batched media operators, same as sources/bmp.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline PNG."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_png expects an (h, w, 3) RGB array")
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 (None) per scanline, one zlib stream
    raw = np.zeros((h, 1 + 3 * w), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, 3 * w)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct scanlines per RFC 2083 §6 — returns (h, stride) bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub
            rec = line
            for i in range(bpp, stride):
                rec[i] = (rec[i] + rec[i - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = line
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png_bytes(data: bytes) -> np.ndarray:
    """Decode a baseline PNG to an (h, w, 3) uint8 RGB array."""
    if data[:8] != SIGNATURE:
        raise ValueError("PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("PNG: truncated chunk")
        if pos + 12 + length > len(data):
            # a cut inside the CRC field leaked struct.error, breaking
            # the module's ValueError contract (a review finding)
            raise ValueError(f"PNG: truncated CRC for chunk {tag!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"PNG: CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"PNG: unsupported depth/compression ({depth}, {comp})")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlacing not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"PNG: unsupported color type {ctype} (palette?)")
    bpp = channels
    stride = channels * w
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # corrupt IDAT leaked zlib.error past callers that catch
        # ValueError for skip handling (a review finding)
        raise ValueError(f"PNG: corrupt IDAT stream: {exc}") from None
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG: decompressed size mismatch")
    rec = _unfilter(raw, h, stride, bpp).reshape(h, w, channels)
    if ctype == 2:
        return rec
    if ctype == 6:
        return rec[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(rec, 3, axis=2)
    # ctype 4: grey + alpha
    return np.repeat(rec[:, :, :1], 3, axis=2)
