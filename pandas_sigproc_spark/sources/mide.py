"""From-scratch EBML reader + a MIDE-style recording profile.

The reference ingests enDAQ ``.ide`` logs through the ``endaq``/``idelib``
packages (``daq/io.py:161-301``), which are not installable in this
environment.  ``.ide`` is EBML — the same public wire format Matroska
uses (RFC 8794): every element is ``VINT id | VINT size | payload``,
containers nest by size.  This module implements that wire format for
real, from bytes:

- :func:`iter_elements` — RFC 8794 variable-length integer parsing
  (length-descriptor leading-zero scheme, marker bit stripped for sizes
  and kept for ids, unknown-size rejected) and container walking;
- a RECORDING PROFILE — channel definitions + int16 data blocks — whose
  element IDs are documented below.  The profile mirrors the SHAPE of
  MIDE recordings (channel metadata elements + ChannelDataBlock streams);
  genuine ``.ide`` files use the element IDs of Mide's published
  ``mide_ide.xml`` schema, so adapting this reader to them is a table
  swap plus their calibration polynomials, not a new parser.

Channel field semantics match ``EndaqChannel`` (``daq/io.py:242-301``):
seconds time base from the block start + sample rate, display name,
unit string, and ``start_time`` = the earliest absolute timestamp.

Profile (all inside one EBML body):

====================  ======  =====================================
element               id      payload
====================  ======  =====================================
EBML header           1A45DFA3  standard; DocType 'spark-sigproc-rec'
Segment               18538067  container of everything below
ChannelDef            4100    container
  ChId                4101    unsigned int
  ChName              4102    UTF-8
  ChUnit              4103    UTF-8
  ChRate              4104    float64 (Hz)
  ChStartUs           4105    unsigned int (epoch microseconds)
DataBlock             4200    container
  ChRef               4201    unsigned int
  BlockT0             4202    float64 (seconds, channel-relative)
  Scale               4203    float64 (value = sample * scale)
  Samples             4204    int16 little-endian payload
====================  ======  =====================================
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

import numpy as np

from pandas_sigproc_spark.sources.channel import Channel

EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
DOCTYPE = 0x4282  # standard EBML DocType element id
CHANNEL_DEF, CH_ID, CH_NAME, CH_UNIT, CH_RATE, CH_START_US = (
    0x4100, 0x4101, 0x4102, 0x4103, 0x4104, 0x4105,
)
DATA_BLOCK, CH_REF, BLOCK_T0, SCALE, SAMPLES = (
    0x4200, 0x4201, 0x4202, 0x4203, 0x4204,
)
DOCTYPE_NAME = b"spark-sigproc-rec"


# -- RFC 8794 varints --------------------------------------------------------


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Read one EBML variable-length integer at ``pos``.

    Width = 1 + count of leading zero bits in the first byte; ids keep
    the marker bit (they are compared as stored), sizes strip it.
    """
    if pos >= len(buf):
        raise ValueError("EBML: truncated varint")
    first = buf[pos]
    if first == 0:
        raise ValueError("EBML: varint wider than 8 bytes")
    width = 1
    mask = 0x80
    while not first & mask:
        width += 1
        mask >>= 1
    if pos + width > len(buf):
        raise ValueError("EBML: truncated varint body")
    val = first if keep_marker else first & (mask - 1)
    for b in buf[pos + 1: pos + width]:
        val = (val << 8) | b
    if not keep_marker and val == (1 << (7 * width)) - 1:
        raise ValueError("EBML: unknown-size elements are not supported")
    return val, pos + width


def iter_elements(buf: bytes, pos: int, end: int):
    """Yield ``(element_id, payload_start, payload_end)`` at one level."""
    while pos < end:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError(f"EBML: element {eid:#x} overruns its container")
        yield eid, pos, pos + size
        pos += size


def _uint(buf, s, e) -> int:
    v = 0
    for b in buf[s:e]:
        v = (v << 8) | b
    return v


def _f64(buf, s, e) -> float:
    if e - s != 8:
        raise ValueError("EBML: expected 8-byte float payload")
    return struct.unpack(">d", buf[s:e])[0]


# -- encode (fixture builder / sink) ----------------------------------------


def _enc_vint_size(val: int) -> bytes:
    for width in range(1, 9):
        if val < (1 << (7 * width)) - 1:
            out = val | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError("EBML: size too large")


def _enc_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_vint_size(len(payload)) + payload


def _el_uint(eid: int, val: int) -> bytes:
    n = max((val.bit_length() + 7) // 8, 1)
    return _el(eid, val.to_bytes(n, "big"))


def encode_recording(channels: list[dict]) -> bytes:
    """Encode channel dicts (ch_id, name, unit, rate, start_us, scale,
    blocks=[(t0, int16 ndarray), ...]) as one EBML recording."""
    body = []
    for ch in channels:
        body.append(_el(CHANNEL_DEF,
                        _el_uint(CH_ID, ch["ch_id"])
                        + _el(CH_NAME, ch["name"].encode())
                        + _el(CH_UNIT, ch["unit"].encode())
                        + _el(CH_RATE, struct.pack(">d", ch["rate"]))
                        + _el_uint(CH_START_US, ch["start_us"])))
    for ch in channels:
        for t0, samples in ch["blocks"]:
            arr = np.asarray(samples, dtype="<i2")
            body.append(_el(DATA_BLOCK,
                            _el_uint(CH_REF, ch["ch_id"])
                            + _el(BLOCK_T0, struct.pack(">d", float(t0)))
                            + _el(SCALE, struct.pack(">d", float(ch["scale"])))
                            + _el(SAMPLES, arr.tobytes())))
    header = _el(EBML_HEADER, _el(DOCTYPE, DOCTYPE_NAME))
    return header + _el(SEGMENT, b"".join(body))


# -- decode -------------------------------------------------------------------


def is_recording(buf: bytes) -> bool:
    """True when the EBML header carries this module's DocType."""
    try:
        for eid, s, e in iter_elements(buf, 0, len(buf)):
            if eid != EBML_HEADER:
                return False
            for eid2, s2, e2 in iter_elements(buf, s, e):
                if eid2 == DOCTYPE:
                    return buf[s2:e2] == DOCTYPE_NAME
            return False
    except ValueError:
        return False
    return False


def read_recording_channels(buf: bytes, source: str = "mide") -> list[Channel]:
    """Parse EBML bytes -> Channels (reference field semantics:
    ``daq/io.py:242-301`` — seconds time base, displayName, unit,
    start_time = earliest absolute timestamp)."""
    defs: dict[int, dict] = {}
    blocks: dict[int, list] = {}
    seen_header = False
    for eid, s, e in iter_elements(buf, 0, len(buf)):
        if eid == EBML_HEADER:
            seen_header = True
            continue
        if eid != SEGMENT:
            continue
        for eid2, s2, e2 in iter_elements(buf, s, e):
            if eid2 == CHANNEL_DEF:
                d: dict = {}
                for eid3, s3, e3 in iter_elements(buf, s2, e2):
                    if eid3 == CH_ID:
                        d["ch_id"] = _uint(buf, s3, e3)
                    elif eid3 == CH_NAME:
                        d["name"] = buf[s3:e3].decode()
                    elif eid3 == CH_UNIT:
                        d["unit"] = buf[s3:e3].decode()
                    elif eid3 == CH_RATE:
                        d["rate"] = _f64(buf, s3, e3)
                    elif eid3 == CH_START_US:
                        d["start_us"] = _uint(buf, s3, e3)
                defs[d["ch_id"]] = d
            elif eid2 == DATA_BLOCK:
                ref = None
                t0 = 0.0
                scale = 1.0
                samples = np.zeros(0, np.int16)
                for eid3, s3, e3 in iter_elements(buf, s2, e2):
                    if eid3 == CH_REF:
                        ref = _uint(buf, s3, e3)
                    elif eid3 == BLOCK_T0:
                        t0 = _f64(buf, s3, e3)
                    elif eid3 == SCALE:
                        scale = _f64(buf, s3, e3)
                    elif eid3 == SAMPLES:
                        samples = np.frombuffer(buf[s3:e3], dtype="<i2")
                if ref is None:
                    raise ValueError("EBML: DataBlock without ChRef")
                blocks.setdefault(ref, []).append((t0, scale, samples))
    if not seen_header:
        raise ValueError("EBML: missing header element")
    out = []
    for ch_id, d in defs.items():
        ts = []
        vs = []
        for t0, scale, samples in sorted(blocks.get(ch_id, []), key=lambda b: b[0]):
            n = len(samples)
            ts.append(t0 + np.arange(n, dtype=np.float64) / d["rate"])
            vs.append(samples.astype(np.float64) * scale)
        t = np.concatenate(ts) if ts else np.zeros(0)
        v = np.concatenate(vs) if vs else np.zeros(0)
        start = datetime.fromtimestamp(d["start_us"] / 1e6, tz=timezone.utc)
        out.append(
            Channel(
                channel_id=f"{source}:{d['name']}",
                time=t,
                data=v,
                name=d["name"],
                unit=d["unit"],
                start_time=start.replace(tzinfo=None),
            )
        )
    return out
