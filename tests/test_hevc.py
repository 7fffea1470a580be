"""HEVC stream inspection (sources/hevc.py + hevc_stream_info): SPS
geometry and hvcC records against an independent test-side bit writer
(the tests/test_h264.py device), IRAP keyframe indexing, and the Spark
operator end to end on a muxed hvc1 MP4."""

import struct

import pytest

from pandas_sigproc_spark.sources.hevc import (
    is_irap,
    nal_type,
    parse_hevc_sps,
    parse_hvcc,
    sample_nal_index,
)
from tests.h26x_writers import BW, _hevc_sps, _hvcc_record, _ptl  # noqa: F401


def test_hevc_sps_geometry():
    info = parse_hevc_sps(_hevc_sps(320, 240))
    assert (info.width, info.height) == (320, 240)
    assert info.profile_idc == 1 and info.level_idc == 93
    assert info.chroma_format_idc == 1 and info.bit_depth_luma == 8


def test_hevc_sps_conformance_window():
    # 1920x1088 coded, bottom crop 4 units x SubHeightC 2 = 8 -> 1080
    info = parse_hevc_sps(_hevc_sps(1920, 1088, conf_win=(0, 0, 0, 4)))
    assert (info.width, info.height) == (1920, 1080)


def test_hevc_nal_header_and_irap():
    idr = bytes([19 << 1, 1]) + b"\x00"
    trail = bytes([1 << 1, 1]) + b"\x00"
    assert nal_type(idr) == 19 and is_irap(idr)
    assert nal_type(trail) == 1 and not is_irap(trail)
    with pytest.raises(ValueError, match="2-byte header"):
        nal_type(b"\x42")


def test_parse_hvcc():
    sps = _hevc_sps()
    cfg = parse_hvcc(_hvcc_record(sps))
    assert cfg.length_size == 4 and cfg.profile_idc == 1
    assert cfg.level_idc == 93
    assert cfg.nals[33] == [sps] and 34 in cfg.nals
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_hvcc(b"\x02" + b"\x00" * 30)


def _hvc1_mp4(n_delta=2):
    from pandas_sigproc_spark.sources.mp4 import encode_mp4

    sps = _hevc_sps(64, 48)

    def frame(*nals):
        return b"".join(len(x).to_bytes(4, "big") + x for x in nals)

    samples = [frame(sps, bytes([19 << 1, 1]) + b"\x11" * 6)] + [
        frame(bytes([1 << 1, 1]) + bytes([0x20 + i]) * 5)
        for i in range(n_delta)
    ]
    rec = _hvcc_record(sps)
    box = struct.pack(">I", 8 + len(rec)) + b"hvcC" + rec
    return encode_mp4(
        samples, codec=b"hvc1", width=64, height=48, sample_entry_ext=box
    )


def test_hevc_sample_nal_index():
    sps = _hevc_sps()
    sample = (
        len(sps).to_bytes(4, "big") + sps
        + (8).to_bytes(4, "big") + bytes([21 << 1, 1]) + b"\x00" * 6
    )
    idx = sample_nal_index(sample)
    assert idx.nal_types == [33, 21] and idx.is_keyframe  # CRA is IRAP


def test_hevc_length_prefix_collision():
    # r15 ADVICE (high): the start-code-first heuristic misparsed
    # length-prefixed samples whose first NAL is 256-511 bytes
    # (hevc.sample_nal_index shared h264.is_annexb).  A 300-byte IDR_W
    # NAL (type 19) must index as one IRAP keyframe.
    idr = bytes([19 << 1, 1]) + bytes(254) + b"\x11" * 44  # 300 bytes
    assert len(idr) == 300
    sample = len(idr).to_bytes(4, "big") + idr
    assert sample[:3] == b"\x00\x00\x01"  # the collision shape
    idx = sample_nal_index(sample)
    assert idx.n_nals == 1 and idx.nal_types == [19] and idx.is_keyframe
    # explicit framing from the container bypasses the heuristic
    assert sample_nal_index(sample, framing="length").nal_types == [19]


def test_hevc_stream_info_end_to_end(spark):
    from pandas_sigproc_spark.operators.multimodal import hevc_stream_info

    df = spark.createDataFrame(
        [(1, bytearray(_hvc1_mp4()))], "media_id long, payload binary"
    )
    rows = sorted(
        hevc_stream_info(df).collect(), key=lambda r: r["sample_idx"]
    )
    assert len(rows) == 3
    assert [r["is_keyframe"] for r in rows] == [True, False, False]
    assert rows[0]["nal_types"] == [33, 19]
    assert all((r["width"], r["height"]) == (64, 48) for r in rows)
    assert all(r["profile"] == 1 and r["level"] == 93 for r in rows)


def test_hevc_h264_cross_refusal(spark):
    from pandas_sigproc_spark.operators.multimodal import (
        h264_stream_info,
        hevc_stream_info,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_hvc1_mp4()))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="h264 tracks only"):
        h264_stream_info(df).collect()
    assert hevc_stream_info(df, on_error="skip").count() == 3
