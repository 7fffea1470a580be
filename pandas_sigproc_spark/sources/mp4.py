"""From-scratch MP4 (ISO Base Media File Format, ISO/IEC 14496-12)
muxer + demuxer — the real video CONTAINER for the multimodal tier.

The engine's video model so far used the BMPV toy container; this
module speaks actual ISO BMFF: ``encode_mp4`` writes a playable
one-track video file (ftyp + mdat + moov with the full stbl sample
tables), and ``decode_mp4`` walks the box tree of any unfragmented
MP4/MOV-style file and reconstructs per-sample byte ranges from
stsd/stts/stsc/stsz/stco(co64) — the standard chunk-walk.

Codec split (the brief's multimodal contract): CONTAINER parsing is
real and complete for unfragmented single-trak video; SAMPLE decode is
dispatched by the stsd fourcc — the engine's own image codecs decode
``bmp ``/``png ``/``jpg `` samples to pixels (so an MP4 written by
:func:`encode_mp4` round-trips to real frames end to end), while
compressed codecs (avc1/hev1/...) surface their sample BYTES and
metadata with a NotImplementedError naming this seam when pixels are
demanded.  That keeps the Spark-side plumbing (schema, batching, frame
sampling, per-frame hashing) real and tested without shipping an
H.264 decoder.

Limitations (documented, checked loudly): one video trak (the first is
used), no movie fragments (moof), no edit lists applied, 32-bit box
sizes on the write side.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

_VIDEO_FOURCC = {b"bmp ", b"png ", b"jpg "}


class Mp4Track(NamedTuple):
    codec: bytes  # stsd sample-entry fourcc, e.g. b"bmp ", b"avc1"
    width: int
    height: int
    timescale: int
    durations: list[int]  # per-sample, in timescale units
    samples: list[bytes]


# ---------------------------------------------------------------------------
# box plumbing
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _full(typ: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        typ = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt box {typ!r} at {pos}")
        yield typ, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at ``path`` (nested types), or None."""
    lo, hi = start, end
    for typ in path:
        found = None
        for t, b, e in _walk(data, lo, hi):
            if t == typ:
                found = (b, e)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


# ---------------------------------------------------------------------------
# muxer
# ---------------------------------------------------------------------------


def encode_mp4(
    frames: list[bytes],
    *,
    codec: bytes = b"bmp ",
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    frame_duration: int = 40,
    sample_entry_ext: bytes = b"",
) -> bytes:
    """Write an unfragmented single-video-trak MP4: every element of
    ``frames`` becomes one sample (one chunk holding all samples).
    ``width``/``height`` default to the first frame's decoded
    dimensions when the codec is one of the engine's image codecs.
    ``sample_entry_ext`` appends raw extension boxes to the stsd sample
    entry (e.g. an ``avcC`` record for ``codec=b"avc1"`` — build one
    with ``sources/h264.py`` semantics; ``video_sample_entry_boxes``
    reads it back)."""
    if not frames:
        raise ValueError("need at least one frame")
    if len(codec) != 4:
        raise ValueError("codec must be a 4-byte fourcc")
    if width == 0 and codec in _VIDEO_FOURCC:
        from pandas_sigproc_spark.operators.multimodal import _decode_image

        px = _decode_image(frames[0])
        height, width = px.shape[0], px.shape[1]
    n = len(frames)
    mdat_payload = b"".join(frames)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # chunk offset = absolute position of the first sample byte:
    # ftyp + mdat header (8 bytes)
    chunk_off = len(ftyp) + 8
    duration = n * frame_duration

    # sample tables ---------------------------------------------------------
    stsd_entry = (
        struct.pack(">I", 86 + len(sample_entry_ext))
        + codec
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">H", 0x0018)  # depth
        + struct.pack(">h", -1)
        + sample_entry_ext
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, n, frame_duration)
    )
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"engine\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def is_mp4_bytes(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == b"ftyp"


def decode_mp4(data: bytes) -> Mp4Track:
    """Parse an unfragmented MP4 and slice out the first video trak's
    samples via the standard stsc/stco/stsz chunk walk.  Malformed
    containers raise ValueError by name — a missing/truncated sample
    table surfaces as the module's corrupt-container taxonomy, never a
    bare KeyError/struct.error (a review finding: an stsz-less trak and
    a lying stsz count leaked both through ``on_error='skip'``
    contracts, which catch ValueError)."""
    b, e = _first_video_trak(data)
    try:
        return _parse_video_trak(data, b, e)
    except KeyError as ex:
        raise ValueError(
            f"video trak is missing its {ex.args[0]!r} sample-table box"
        ) from ex
    except struct.error as ex:
        raise ValueError(
            f"video trak sample tables are truncated/corrupt: {ex}"
        ) from ex


def _first_video_trak(data: bytes):
    """(payload_start, payload_end) of the first video trak — ONE home
    for the moov/trak/hdlr discovery walk (decode_mp4 and
    video_sample_entry_boxes previously carried hand-kept copies; a
    review finding)."""
    if not is_mp4_bytes(data):
        raise ValueError("not an ISO BMFF stream (no ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box (fragmented or truncated stream?)")
    if _find(data, 0, len(data), b"moof") is not None:
        raise NotImplementedError(
            "fragmented MP4 (moof) is outside the supported profile"
            " (sources/mp4.py)"
        )
    for t, b, e in _walk(data, *moov):
        if t != b"trak":
            continue
        hdlr = _find(data, b, e, b"mdia", b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        return b, e
    raise ValueError("no video trak in moov")


def video_sample_entry_boxes(data: bytes) -> dict[bytes, bytes]:
    """Extension boxes of the first video trak's first stsd sample
    entry — ``{fourcc: payload}`` for ``avcC`` (the H.264 decoder
    configuration record sources/h264.py parses), ``btrt``, ``pasp``,
    etc.  Extensions start after the 86-byte VisualSampleEntry fixed
    layout (ISO 14496-12 §12.1.3); entries without extensions (the
    engine's own image-codec tracks) return {}."""
    b, e = _first_video_trak(data)
    stsd = _find(data, b, e, b"mdia", b"minf", b"stbl", b"stsd")
    if stsd is None:
        raise ValueError("video trak has no stsd")
    if stsd[1] - stsd[0] < 8:
        # module taxonomy again: an stsd truncated to <8 payload bytes
        # at end-of-file died in the entry_count unpack with a bare
        # struct.error, escaping the ValueError contract on_error='skip'
        # callers rely on (an ADVICE finding)
        raise ValueError(
            f"stsd payload of {stsd[1] - stsd[0]} bytes is shorter than"
            " its version/flags + entry_count header"
        )
    n_entries = struct.unpack(">I", data[stsd[0] + 4 : stsd[0] + 8])[0]
    entry = stsd[0] + 8  # version/flags + entry_count
    if n_entries < 1 or entry + 4 > stsd[1]:
        # module taxonomy: malformed containers raise ValueError by
        # name, never struct.error (a review finding: a truncated stsd
        # previously died in struct.unpack)
        raise ValueError(
            f"stsd declares {n_entries} sample entries but holds no"
            " readable entry"
        )
    entry_size = struct.unpack(">I", data[entry : entry + 4])[0]
    ext_start, ext_end = entry + 86, entry + entry_size
    if ext_end > stsd[1] or entry_size < 86:
        # no room for extensions (or a malformed entry size): the
        # engine's own minimal entries are exactly 86 bytes
        return {}
    return {
        typ: data[bb:ee] for typ, bb, ee in _walk(data, ext_start, ext_end)
    }


def _u32s(buf: bytes, n: int, off: int = 0) -> list[int]:
    return list(struct.unpack(f">{n}I", buf[off : off + 4 * n]))


def _parse_video_trak(data: bytes, b: int, e: int) -> Mp4Track:
    mdhd = _find(data, b, e, b"mdia", b"mdhd")
    if mdhd is None:
        # the stbl lookup below refuses by name; a missing mdhd leaked
        # a bare TypeError instead (a review finding)
        raise ValueError("video trak has no mdhd")
    ver = data[mdhd[0]]
    timescale = struct.unpack(
        ">I", data[mdhd[0] + (20 if ver else 12) : mdhd[0] + (24 if ver else 16)]
    )[0]
    stbl = _find(data, b, e, b"mdia", b"minf", b"stbl")
    if stbl is None:
        raise ValueError("video trak has no stbl")
    boxes = {t: (bb, ee) for t, bb, ee in _walk(data, *stbl)}

    # stsd: fourcc + dimensions from the first sample entry
    sb, _se = boxes[b"stsd"]
    entry = sb + 8  # version/flags + entry_count
    fourcc = data[entry + 4 : entry + 8]
    width, height = struct.unpack(">HH", data[entry + 32 : entry + 36])

    # stsz
    zb, _ze = boxes[b"stsz"]
    sample_size, n = struct.unpack(">II", data[zb + 4 : zb + 12])
    sizes = (
        [sample_size] * n
        if sample_size
        else _u32s(data[zb + 12 : zb + 12 + 4 * n], n)
    )

    # stco / co64
    if b"stco" in boxes:
        cb, _ce = boxes[b"stco"]
        nch = struct.unpack(">I", data[cb + 4 : cb + 8])[0]
        chunk_offs = _u32s(data[cb + 8 : cb + 8 + 4 * nch], nch)
    else:
        cb, _ce = boxes[b"co64"]
        nch = struct.unpack(">I", data[cb + 4 : cb + 8])[0]
        chunk_offs = list(
            struct.unpack(f">{nch}Q", data[cb + 8 : cb + 8 + 8 * nch])
        )

    # stsc: expand (first_chunk, samples_per_chunk) runs over the chunks
    scb, _sce = boxes[b"stsc"]
    nruns = struct.unpack(">I", data[scb + 4 : scb + 8])[0]
    runs = [
        struct.unpack(">III", data[scb + 8 + 12 * i : scb + 20 + 12 * i])
        for i in range(nruns)
    ]
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < nruns else nch
        per_chunk += [spc] * (last - first + 1)

    # stts durations
    tb, _te = boxes[b"stts"]
    ntt = struct.unpack(">I", data[tb + 4 : tb + 8])[0]
    durations: list[int] = []
    for i in range(ntt):
        cnt, dur = struct.unpack(">II", data[tb + 8 + 8 * i : tb + 16 + 8 * i])
        durations += [dur] * cnt

    # the chunk walk: slice every sample's bytes
    samples: list[bytes] = []
    si = 0
    for ci, off in enumerate(chunk_offs):
        pos = off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n:
                break
            if pos + sizes[si] > len(data):
                # a truncated mdat on a moov-first file previously
                # yielded silently short/empty samples while the
                # count check still passed (a review finding) —
                # refuse by name, never a partial track
                raise ValueError(
                    f"MP4 sample {si} extends past end of data"
                    f" ({pos + sizes[si]} > {len(data)})"
                )
            samples.append(data[pos : pos + sizes[si]])
            pos += sizes[si]
            si += 1
    if si != n:
        raise ValueError(
            f"chunk walk produced {si} samples, stsz declares {n}"
        )
    return Mp4Track(fourcc, width, height, timescale, durations[:n], samples)


def decode_mp4_frames(data: bytes):
    """Decoded pixel frames of an MP4 whose samples use one of the
    engine's image codecs; compressed codecs raise at THIS seam (their
    sample bytes and metadata are still available via decode_mp4)."""
    trk = decode_mp4(data)
    if trk.codec not in _VIDEO_FOURCC:
        raise NotImplementedError(
            f"MP4 sample codec {trk.codec!r} has no pixel decoder in this"
            " engine — container parsing is complete (decode_mp4 returns"
            " the sample bytes); compressed-codec decode plugs in at"
            " sources/mp4.py:decode_mp4_frames"
        )
    from pandas_sigproc_spark.operators.multimodal import _decode_image

    return [_decode_image(s) for s in trk.samples]


__all__ = [
    "Mp4Track",
    "encode_mp4",
    "decode_mp4",
    "decode_mp4_frames",
    "is_mp4_bytes",
    "video_sample_entry_boxes",
]
