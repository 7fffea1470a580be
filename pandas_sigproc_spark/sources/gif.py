"""From-scratch GIF (87a/89a) codec — pure stdlib + NumPy.

The crawl web's other image/animation container (alongside JPEG/PNG):
GIF is indexed-color with LZW entropy coding — variable-width codes
packed LEAST-significant-bit first (the opposite of JPEG's bit order),
a 12-bit dictionary cap with in-band clear codes, optional interlacing
(4-pass row shuffle), and multi-frame animation with per-frame
graphic-control extensions.

Encoder: single- or multi-frame RGB -> GIF89a with one global color
table built from the frames' distinct colors (deterministic sorted
palette; > 256 distinct colors raises — palette quantization is a
documented seam, not a silent approximation), full-canvas frames,
optional interlace, per-frame delays, and the NETSCAPE loop extension
for animations.

Decoder: header + logical screen descriptor, global/local color
tables, graphic-control extensions (delay, transparency, disposal),
interlaced and non-interlaced frames, full LZW with dictionary growth
and clear-code resets, and frame COMPOSITING onto the logical screen
(disposal 0/1 leave, 2 restores background; 3 "restore previous"
raises — the rare case, loudly).  Returns full-canvas RGB frames.

Like the JPEG codec there is no in-container reference decoder in
this environment, so tests/test_gif.py pins: exact roundtrips (GIF is
lossless given a palette), an INDEPENDENT hand-packed LZW bit-stream
vector, interlace reordering, dictionary-growth stress (random
<=256-color noise), animation compositing with transparency, and the
refusal matrix.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21
_GFX_CONTROL = 0xF9
_MAX_CODE_WIDTH = 12

# interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    """Row order of the GIF 4-pass interlace for an h-row frame — ONE
    definition (the encoder and decoder each hand-built it; a drift
    would silently break interlaced roundtrips, a review finding)."""
    order: list[int] = []
    for first, step in _INTERLACE:
        order += list(range(first, h, step))
    return order


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first packing, 12-bit cap)
# ---------------------------------------------------------------------------


class _LSBWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= (code & ((1 << width) - 1)) << self._n
        self._n += width
        while self._n >= 8:
            self.buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.buf.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.buf)


def _lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    wtr = _LSBWriter()
    width = mcs + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = end + 1
    wtr.write(clear, width)
    if not indices:
        wtr.write(end, width)
        return wtr.flush()
    prefix = bytes(indices[:1])
    data_since_clear = False  # decoder appends for the final code only
    # if it is not the first data code after a clear
    for b in indices[1:]:
        cand = prefix + bytes((b,))
        if cand in table:
            prefix = cand
            continue
        wtr.write(table[prefix], width)
        data_since_clear = True
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:  # dictionary full: in-band reset
            wtr.write(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
            data_since_clear = False
        prefix = bytes((b,))
    wtr.write(table[prefix], width)
    # the decoder appends one more dictionary entry for this final
    # code (unless it is the first after a clear) and bumps its code
    # width when the table lands exactly on 1<<width — mirror that
    # bookkeeping or the end code is written at a stale width and the
    # decode desyncs at the stream tail
    if (
        data_since_clear
        and next_code < (1 << _MAX_CODE_WIDTH)
        and next_code == (1 << width)
        and width < _MAX_CODE_WIDTH
    ):
        width += 1
    wtr.write(end, width)
    return wtr.flush()


def _lzw_decode(data: bytes, mcs: int, expect: int) -> bytes:
    clear = 1 << mcs
    end = clear + 1
    width = mcs + 1
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream in GIF frame")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = table[: end + 1]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad initial LZW code in GIF frame")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range in GIF frame")
        out += entry
        if (
            len(table) == (1 << width)
            and width < _MAX_CODE_WIDTH
        ):
            width += 1
        prev = entry
        if len(out) > expect:
            raise ValueError("LZW output overruns the frame size")
    if len(out) != expect:
        raise ValueError(
            f"LZW output size {len(out)} != frame size {expect}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# sub-block plumbing
# ---------------------------------------------------------------------------


def _write_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block payload")
        out += data[pos : pos + n]
        pos += n


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames,
    *,
    delays_cs=None,
    loop: bool = True,
    interlace: bool = False,
) -> bytes:
    """Serialize one (h, w, 3) uint8 frame or a list of same-shape
    frames as GIF89a.  The global palette is the frames' distinct
    colors in sorted packed-RGB order (> 256 raises — quantization is
    a documented seam); ``delays_cs`` gives per-frame delays in
    centiseconds for animations; bytes are deterministic."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError("frames must be (h, w, 3) uint8")
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("frame shape outside GIF limits")

    packed = [
        (f[:, :, 0].astype(np.int64) << 16)
        | (f[:, :, 1].astype(np.int64) << 8)
        | f[:, :, 2].astype(np.int64)
        for f in frames
    ]
    palette = np.unique(np.concatenate([p.reshape(-1) for p in packed]))
    if palette.size > 256:
        raise ValueError(
            f"{palette.size} distinct colors exceed GIF's 256-color "
            "palette; quantize first (documented seam — the encoder "
            "never approximates silently)"
        )
    # color-table size: power of two >= max(2, n)
    ct_bits = max(1, int(palette.size - 1).bit_length())
    ct_size = 1 << ct_bits
    mcs = max(2, ct_bits)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0)
    for c in palette:
        out += bytes(((int(c) >> 16) & 0xFF, (int(c) >> 8) & 0xFF, int(c) & 0xFF))
    out += b"\x00" * (3 * (ct_size - palette.size))
    if loop and len(frames) > 1:
        out += bytes((_EXTENSION, 0xFF, 11)) + b"NETSCAPE2.0"
        out += bytes((3, 1, 0, 0, 0))  # sub-block: loop forever
    if delays_cs is not None:
        if len(delays_cs) != len(frames):
            raise ValueError(
                f"delays_cs has {len(delays_cs)} entries for"
                f" {len(frames)} frames"
            )
        if any(not 0 <= int(d) <= 0xFFFF for d in delays_cs):
            raise ValueError(
                "GIF frame delays must be 0..65535 centiseconds"
            )
    for fi, p in enumerate(packed):
        if delays_cs is not None:
            out += bytes((_EXTENSION, _GFX_CONTROL, 4, 0))
            out += struct.pack("<H", int(delays_cs[fi]))
            out += bytes((0, 0))
        # palette came from np.unique, so every value is present and
        # searchsorted IS the exact index map (vectorized, no per-pixel
        # Python call)
        idx = np.searchsorted(palette, p).astype(np.uint8)
        if interlace:
            idx = idx[_interlace_order(h)]
        out += struct.pack(
            "<BHHHHB", _IMAGE_SEP, 0, 0, w, h,
            0x40 if interlace else 0x00,
        )
        out.append(mcs)
        out += _write_subblocks(_lzw_encode(idx.tobytes(), mcs))
    out.append(_TRAILER)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> list[np.ndarray]:
    """Full-canvas (h, w, 3) uint8 RGB frames of a GIF87a/89a stream,
    composited per the graphic-control disposal/transparency rules
    (disposal 3 "restore previous" raises — documented seam)."""
    data = bytes(data)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF logical screen descriptor")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        raw = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if raw.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = raw.reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:, :] = gct[bg] if bg < len(gct) else 0
    background = canvas.copy()
    disposal = 0
    transparent: int | None = None
    pending_restore: np.ndarray | None = None

    while True:
        if pos >= len(data):
            raise ValueError("GIF stream ends without a trailer")
        block = data[pos]
        pos += 1
        if block == _TRAILER:
            return frames
        if block == _EXTENSION:
            if pos >= len(data):
                # bare IndexError leaked here on a stream cut right
                # after the 0x21 introducer (a review finding)
                raise ValueError("truncated GIF extension block")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == _GFX_CONTROL and len(body) >= 4:
                flags = body[0]
                disposal = (flags >> 2) & 0x7
                transparent = body[3] if flags & 0x1 else None
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x7)
            raw = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
            if raw.size != 3 * n:
                raise ValueError("truncated local color table")
            ct = raw.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without any color table")
        if pos >= len(data):
            raise ValueError("truncated GIF frame (missing LZW size)")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(lzw, mcs, fw * fh), np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:  # interlaced: invert the 4-pass shuffle
            deinter = np.empty_like(idx)
            deinter[_interlace_order(fh)] = idx
            idx = deinter
        if np.any(idx >= len(ct)):
            raise ValueError("GIF pixel index outside the color table")

        if pending_restore is not None:
            canvas = pending_restore
            pending_restore = None
        region = canvas[top : top + fh, left : left + fw]
        if region.shape[:2] != (fh, fw):
            raise ValueError("GIF frame rectangle outside the canvas")
        px = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:, :] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore background before the next frame
            nxt = canvas.copy()
            nxt[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw
            ]
            pending_restore = nxt
        elif disposal == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore previous) is outside "
                "the supported profile (sources/gif.py:decode_gif)"
            )
        disposal = 0
        transparent = None


def is_gif_bytes(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


__all__ = ["decode_gif", "encode_gif", "is_gif_bytes"]
