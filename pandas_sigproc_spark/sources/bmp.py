"""From-scratch BMP (and a minimal multi-frame container) codec.

The environment has no PIL/libjpeg/ffmpeg, but the multimodal operators
(operators/multimodal.py) should still run REAL bytes through their
decode / resize / frame-sample paths — the same precedent as the stdlib
RIFF/WAVE codec in sources/wav.py.  This module implements the simplest
real, widely-interoperable image format:

- 24-bit uncompressed Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up BGR rows padded to 4-byte boundaries) — the format layout is
  public (Windows GDI documentation); any image viewer opens the output.
- ``BMPV``, a trivial length-prefixed concatenation of BMP frames, used
  as the deterministic stand-in for a video container so the
  frame-sampling operator parses real frame bytes (each extracted frame
  IS a standalone, viewable BMP).

Everything is NumPy-vectorized: encode/decode cost is a couple of array
reshapes per payload, so the Arrow-batched media operators stay at
memory bandwidth.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
HEADER_BYTES = _FILE_HEADER.size + _INFO_HEADER.size  # 14 + 40 = 54


def row_stride(width: int) -> int:
    """Bytes per stored row: 3 * width padded up to a 4-byte multiple."""
    return (3 * width + 3) & ~3


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) RGB array")
    h, w, _ = px.shape
    stride = row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BGR order, bottom-up row storage.
    rows[:, : 3 * w] = px[::-1, :, ::-1].reshape(h, 3 * w)
    img = rows.tobytes()
    file_size = HEADER_BYTES + len(img)
    head = _FILE_HEADER.pack(b"BM", file_size, 0, 0, HEADER_BYTES)
    info = _INFO_HEADER.pack(40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
    return head + info + img


def decode_bmp_bytes(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.

    Handles both bottom-up (positive height) and top-down (negative
    height) row orders; rejects palettized/compressed variants loudly.
    """
    if len(data) < HEADER_BYTES:
        raise ValueError("truncated BMP: missing headers")
    magic, _size, _r1, _r2, offset = _FILE_HEADER.unpack_from(data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (hdr_size, w, h, planes, bpp, comp, _isz, _xp, _yp, _nc, _ni) = (
        _INFO_HEADER.unpack_from(data, _FILE_HEADER.size)
    )
    if hdr_size < 40 or planes != 1:
        raise ValueError(f"unsupported BMP header (size={hdr_size})")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        # a negative width makes row_stride negative and numpy reads
        # the reshape dim as -1 — a silently wrong-shaped garbage image
        # (a review finding); zero dims are equally meaningless
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    stride = row_stride(w)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(data)}")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample of an (h, w, 3) array — a real resize
    (the classic index-mapping algorithm), no external libs."""
    h, w, _ = px.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return px[yi][:, xi]


# -- BMPV: length-prefixed BMP frame concatenation ("video") ----------------

_BMPV_MAGIC = b"BMPV"


def encode_bmpv(frames: list[bytes]) -> bytes:
    """Concatenate standalone BMP frames into one payload:
    ``BMPV | u32 n | u32 len[n] | frame bytes...``."""
    head = _BMPV_MAGIC + struct.pack("<I", len(frames))
    lens = struct.pack(f"<{len(frames)}I", *(len(f) for f in frames))
    return head + lens + b"".join(frames)


def decode_bmpv(data: bytes) -> list[bytes]:
    """Split a BMPV payload back into its standalone BMP frames."""
    if data[:4] != _BMPV_MAGIC:
        raise ValueError("not a BMPV payload")
    if len(data) < 8:
        raise ValueError("truncated BMPV header")
    (n,) = struct.unpack_from("<I", data, 4)
    if len(data) < 8 + 4 * n:
        # struct.error from a corrupt frame count is a cryptic
        # unlocated crash, not the module's ValueError contract
        # (a review finding)
        raise ValueError(
            f"truncated BMPV length table: {n} frames declared,"
            f" {len(data)} bytes held"
        )
    lens = struct.unpack_from(f"<{n}I", data, 8)
    out = []
    pos = 8 + 4 * n
    for ln in lens:
        if pos + ln > len(data):
            raise ValueError("truncated BMPV frame")
        out.append(data[pos: pos + ln])
        pos += ln
    return out
