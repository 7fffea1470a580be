"""H.264 stream inspection (sources/h264.py + the mp4 avcC plumbing +
operators/multimodal.h264_stream_info): SPS geometry against bitstreams
constructed by an INDEPENDENT bit writer (spec arithmetic, not a replay
of the parser), NAL framing for both Annex-B and avcC, emulation
prevention, and the Spark operator end to end on a muxed avc1 MP4."""

import struct

import pytest

from pandas_sigproc_spark.sources.h264 import (
    nal_type,
    parse_avcc,
    parse_sps,
    sample_nal_index,
    split_annexb,
    split_avcc,
    strip_emulation,
)


from tests.h26x_writers import (  # the pytest-free writer home
    BW,
    _avcc_record,
    _baseline_sps,
)


def test_sps_baseline_geometry():
    info = parse_sps(_baseline_sps(4, 3))
    assert (info.width, info.height) == (64, 48)
    assert info.profile_idc == 66 and info.level_idc == 30
    assert info.chroma_format_idc == 1 and info.bit_depth_luma == 8
    assert info.frame_mbs_only


def test_sps_1080p_cropping():
    # 120x68 macroblocks = 1920x1088 coded; bottom crop 4 units x 2
    # (4:2:0, frame_mbs_only) = 8 rows -> 1080 display
    info = parse_sps(_baseline_sps(120, 68, crop=(0, 0, 0, 4)))
    assert (info.width, info.height) == (1920, 1080)


def test_sps_high_profile_with_scaling_list():
    w = BW()
    w.u(100, 8)  # High profile
    w.u(0, 8)
    w.u(40, 8)  # level 4.0
    w.ue(0)  # sps_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime bypass
    w.u(1, 1)  # seq_scaling_matrix_present
    w.u(1, 1)  # list 0 present
    for _ in range(16):
        w.se(0)  # delta_scale 0: nextScale stays 8
    for _ in range(7):
        w.u(0, 1)  # lists 1..7 absent
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)
    w.ue(7)  # 8 MBs wide
    w.ue(5)  # 6 MBs tall
    w.u(1, 1)
    w.u(1, 1)
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no vui
    info = parse_sps(b"\x67" + w.rbsp())
    assert (info.width, info.height) == (128, 96)
    assert info.profile_idc == 100 and info.bit_depth_luma == 8


def test_emulation_prevention():
    assert strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert strip_emulation(b"\x00\x00\x03\x03\x00") == b"\x00\x00\x03\x00"
    assert strip_emulation(b"\x01\x02\x03") == b"\x01\x02\x03"
    # an SPS whose escaped form round-trips through the parser: inject
    # the escape by hand where the raw rbsp carries 00 00 01
    raw = _baseline_sps(4, 3)
    rbsp = raw[1:]
    if b"\x00\x00" in rbsp:  # construction-dependent; the direct checks
        pass  # above pin the algorithm either way
    escaped = bytearray(b"\x67")
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            escaped.append(3)
            zeros = 0
        escaped.append(b)
        zeros = zeros + 1 if b == 0 else 0
    info = parse_sps(bytes(escaped))
    assert (info.width, info.height) == (64, 48)


def test_nal_framing():
    # NALs end with the nonzero rbsp-stop byte; trailing zeros
    # before a start code are trailing_zero_8bits and strip
    n1, n2 = b"\x67\x42\x12", b"\x41\xaa"
    annexb = b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x01" + n2
    assert split_annexb(annexb) == [n1, n2]
    with pytest.raises(ValueError, match="start code"):
        split_annexb(b"\x41\xaa\xbb")
    sample = len(n1).to_bytes(4, "big") + n1 + len(n2).to_bytes(4, "big") + n2
    assert split_avcc(sample) == [n1, n2]
    with pytest.raises(ValueError, match="extends past"):
        split_avcc(len(n1).to_bytes(4, "big") + n1[:1])
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        nal_type(b"\x80")


def test_parse_avcc_roundtrip():
    sps, pps = _baseline_sps(), b"\x68\xce\x38\x80"
    cfg = parse_avcc(_avcc_record(sps, pps))
    assert cfg.length_size == 4 and cfg.profile_idc == 66
    assert cfg.sps == [sps] and cfg.pps == [pps]
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_avcc(b"\x02" + b"\x00" * 8)


def _avc1_mp4(n_delta=3):
    from pandas_sigproc_spark.sources.mp4 import encode_mp4

    sps, pps = _baseline_sps(), b"\x68\xce\x38\x80"

    def frame(*nals):
        return b"".join(len(x).to_bytes(4, "big") + x for x in nals)

    samples = [frame(sps, pps, b"\x65" + b"\x11" * 8)] + [
        frame(b"\x41" + bytes([0x20 + i]) * 6) for i in range(n_delta)
    ]
    avcc_box = (
        struct.pack(">I", 8 + len(_avcc_record(sps, pps)))
        + b"avcC"
        + _avcc_record(sps, pps)
    )
    return encode_mp4(
        samples, codec=b"avc1", width=64, height=48, sample_entry_ext=avcc_box
    )


def test_video_sample_entry_boxes_roundtrip():
    from pandas_sigproc_spark.sources.mp4 import (
        decode_mp4,
        encode_mp4,
        video_sample_entry_boxes,
    )

    blob = _avc1_mp4()
    ext = video_sample_entry_boxes(blob)
    assert b"avcC" in ext
    assert parse_avcc(ext[b"avcC"]).length_size == 4
    assert decode_mp4(blob).codec == b"avc1"
    # an engine-codec track (86-byte entry, no extensions) returns {}
    from pandas_sigproc_spark.sources.bmp import encode_bmp
    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    plain = encode_mp4([encode_bmp(px)] * 2, codec=b"bmp ")
    assert video_sample_entry_boxes(plain) == {}


def test_sample_nal_index():
    sps = _baseline_sps()
    sample = (
        len(sps).to_bytes(4, "big") + sps
        + (9).to_bytes(4, "big") + b"\x65" + b"\x00" * 8
    )
    idx = sample_nal_index(sample)
    assert idx.n_nals == 2 and idx.nal_types == [7, 5] and idx.is_keyframe


def test_h264_stream_info_end_to_end(spark):
    from pandas_sigproc_spark.operators.multimodal import h264_stream_info

    df = spark.createDataFrame(
        [(1, bytearray(_avc1_mp4()))], "media_id long, payload binary"
    )
    rows = sorted(
        h264_stream_info(df).collect(), key=lambda r: r["sample_idx"]
    )
    assert len(rows) == 4
    assert [r["is_keyframe"] for r in rows] == [True, False, False, False]
    assert rows[0]["nal_types"] == [7, 8, 5]
    assert all((r["width"], r["height"]) == (64, 48) for r in rows)
    assert all(r["profile"] == 66 and r["level"] == 30 for r in rows)


def test_h264_stream_info_refusal_and_skip(spark):
    import numpy as np

    from pandas_sigproc_spark.operators.multimodal import h264_stream_info
    from pandas_sigproc_spark.sources.bmp import encode_bmp
    from pandas_sigproc_spark.sources.mp4 import encode_mp4

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    bmp_mp4 = encode_mp4([encode_bmp(px)] * 2, codec=b"bmp ")
    df = spark.createDataFrame(
        [(1, bytearray(_avc1_mp4())), (2, bytearray(bmp_mp4))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="h264 tracks only"):
        h264_stream_info(df).collect()
    kept = h264_stream_info(df, on_error="skip").collect()
    assert {r["media_id"] for r in kept} == {1}
    with pytest.raises(ValueError, match="raise|skip"):
        h264_stream_info(df, on_error="drop")


def test_split_nals_autodetects_annexb():
    # r14 review finding: feeding a start-coded sample to the avcC
    # length walk read 0x00000001 as a NAL length and emitted garbage.
    from pandas_sigproc_spark.sources.h264 import sample_nal_index, split_nals

    n1, n2 = b"\x67\x42\x12", b"\x65\xaa"
    annexb = b"\x00\x00\x00\x01" + n1 + b"\x00\x00\x01" + n2
    assert split_nals(annexb) == [n1, n2]
    idx = sample_nal_index(annexb)
    assert idx.nal_types == [7, 5] and idx.is_keyframe
    avcc = len(n1).to_bytes(4, "big") + n1 + len(n2).to_bytes(4, "big") + n2
    assert split_nals(avcc) == [n1, n2]


def test_resolve_framing_length_prefix_collision():
    # r15 ADVICE (high): a length-prefixed sample whose first NAL is
    # 256-511 bytes long STARTS WITH 00 00 01 xx, so the old
    # start-code-first heuristic misparsed it as Annex-B — a single
    # 300-byte IDR came back as types=[12] filler, is_keyframe=False.
    from pandas_sigproc_spark.sources.h264 import (
        is_annexb,
        resolve_framing,
        split_nals,
    )

    idr = b"\x65" + bytes(255) + b"\x11" * 44  # 300-byte IDR NAL
    assert len(idr) == 300
    sample = len(idr).to_bytes(4, "big") + idr
    assert is_annexb(sample)  # the collision shape the heuristic hit
    assert resolve_framing(sample) == "length"
    idx = sample_nal_index(sample)
    assert idx.n_nals == 1 and idx.nal_types == [5] and idx.is_keyframe
    assert split_nals(sample) == [idr]
    # multi-NAL variant (300-byte SPS-sized NAL + IDR): the old path
    # raised a spurious forbidden_zero_bit error that on_error='skip'
    # silently swallowed
    nal2 = b"\x41" + b"\x22" * 6
    multi = sample + len(nal2).to_bytes(4, "big") + nal2
    assert resolve_framing(multi) == "length"
    assert sample_nal_index(multi).nal_types == [5, 1]
    # a genuine Annex-B elementary stream still resolves: the length
    # walk fails fast (mid-NAL bytes read as a huge length field)
    annexb = b"\x00\x00\x00\x01" + b"\x67\x42\x12" + b"\x00\x00\x01" + b"\x65\xaa"
    assert resolve_framing(annexb) == "annexb"
    assert sample_nal_index(annexb).nal_types == [7, 5]
    # neither framing -> named refusal, not garbage
    with pytest.raises(ValueError, match="neither"):
        resolve_framing(b"\x41\x22\x33\x44\x55")


def test_resolve_framing_truncation_is_named_not_annexb():
    # r15 code-review finding: a TRUNCATED length-prefixed sample whose
    # first NAL is 256-511 bytes fails the walk AND opens with
    # 00 00 01 — the old fallback silently reparsed it as Annex-B
    # (one garbage filler NAL), re-opening the ADVICE misparse class
    # through the error path.  The 3-byte-code case is genuinely
    # ambiguous: refuse by name so on_error='skip' callers drop it.
    from pandas_sigproc_spark.sources.h264 import resolve_framing

    idr = b"\x65" + bytes(255) + b"\x11" * 44  # 300 bytes
    truncated = len(idr).to_bytes(4, "big") + idr[:-1]  # 299 present
    assert truncated[:3] == b"\x00\x00\x01"
    with pytest.raises(ValueError, match="ambiguous NAL framing"):
        resolve_framing(truncated)
    with pytest.raises(ValueError, match="ambiguous NAL framing"):
        sample_nal_index(truncated)
    # a 4-byte start code is NOT ambiguous (it cannot be a plausible
    # length prefix): genuine elementary streams still auto-resolve
    annexb = b"\x00\x00\x00\x01" + b"\x67\x42\x12"
    assert resolve_framing(annexb) == "annexb"


def test_split_nals_explicit_framing():
    # the container owns the framing decision when it has one
    # (avcC/hvcC present => length-prefixed by ISO 14496-15); explicit
    # framing must bypass the heuristic entirely
    from pandas_sigproc_spark.sources.h264 import split_nals

    n1 = b"\x65" + bytes(255) + b"\x11" * 44
    sample = len(n1).to_bytes(4, "big") + n1
    assert split_nals(sample, framing="length") == [n1]
    assert sample_nal_index(sample, framing="length").is_keyframe
    annexb = b"\x00\x00\x00\x01" + b"\x67\x42\x12"
    assert split_nals(annexb, framing="annexb") == [b"\x67\x42\x12"]
    with pytest.raises(ValueError, match="framing"):
        split_nals(sample, framing="avcc")
    with pytest.raises(ValueError, match="framing"):
        sample_nal_index(sample, framing="avcc")


def test_split_annexb_strips_final_trailing_zeros():
    # r15 ADVICE: mid-stream NALs had trailing_zero_8bits stripped but
    # the FINAL NAL kept them — identical NALs hashed differently
    # depending on stream position.
    nal = b"\x65\xaa\xbb"
    data = (
        b"\x00\x00\x00\x01" + nal + b"\x00"
        + b"\x00\x00\x01" + nal + b"\x00\x00"
    )
    assert split_annexb(data) == [nal, nal]


def test_mp4_stream_info_large_first_nal_keyframe(spark):
    # r15 ADVICE end-to-end: an avc1 MP4 whose IDR sample is a single
    # 300-byte NAL (the 00 00 01 xx collision shape).  The container's
    # avcC record establishes length framing, so the keyframe index
    # must be exact — the old per-sample heuristic returned filler.
    from pandas_sigproc_spark.operators.multimodal import h264_stream_info
    from pandas_sigproc_spark.sources.mp4 import encode_mp4

    sps, pps = _baseline_sps(), b"\x68\xce\x38\x80"

    def frame(*nals):
        return b"".join(len(x).to_bytes(4, "big") + x for x in nals)

    big_idr = b"\x65" + bytes(255) + b"\x11" * 44  # 300 bytes
    samples = [
        frame(sps, pps, big_idr),
        frame(b"\x41" + b"\x20" * 6),
    ]
    avcc_box = (
        struct.pack(">I", 8 + len(_avcc_record(sps, pps)))
        + b"avcC"
        + _avcc_record(sps, pps)
    )
    blob = encode_mp4(
        samples, codec=b"avc1", width=64, height=48, sample_entry_ext=avcc_box
    )
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, payload binary"
    )
    rows = sorted(
        h264_stream_info(df).collect(), key=lambda r: r["sample_idx"]
    )
    assert [r["is_keyframe"] for r in rows] == [True, False]
    assert rows[0]["nal_types"] == [7, 8, 5]


def test_stsd_truncated_is_valueerror():
    # r15 ADVICE: an stsd whose declared size leaves <8 payload bytes
    # raised struct.error from the entry_count unpack (the slice comes
    # back short), escaping the ValueError taxonomy on_error='skip'
    # callers catch.
    from pandas_sigproc_spark.sources.mp4 import video_sample_entry_boxes

    blob = _avc1_mp4()
    i = blob.find(b"stsd")  # fourcc offset; 4-byte size precedes it
    shrunk = blob[: i - 4] + struct.pack(">I", 12) + blob[i:]
    with pytest.raises(ValueError, match="stsd payload"):
        video_sample_entry_boxes(shrunk)


def test_decode_mp4_corrupt_tables_are_valueerror():
    # r14 review finding: an stsz-less trak leaked KeyError and a lying
    # stsz count leaked struct.error through on_error='skip' contracts
    # (which catch ValueError).
    from pandas_sigproc_spark.sources.mp4 import decode_mp4

    blob = bytearray(_avc1_mp4())
    i = bytes(blob).find(b"stsz")
    mutated = bytes(blob[: i - 4]) + b"\x00\x00\x00\x10" + b"free" + bytes(
        blob[i + 4 :]
    )[8:]  # clobber the stsz box header into a free box
    # simpler robust mutation: rename the stsz fourcc so the box vanishes
    renamed = bytes(blob).replace(b"stsz", b"stsX", 1)
    with pytest.raises(ValueError, match="stsz|sample-table|corrupt"):
        decode_mp4(renamed)
    # lie about the stsz entry count (more entries than the box holds)
    j = bytes(blob).find(b"stsz")
    lied = bytearray(blob)
    lied[j + 12 : j + 16] = (10_000).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated|corrupt"):
        decode_mp4(bytes(lied))


def test_stream_info_skips_fragmented_and_null(spark):
    from pandas_sigproc_spark.operators.multimodal import h264_stream_info
    from pandas_sigproc_spark.sources.mp4 import _box

    # a minimal "fragmented" container: ftyp + moov-less moof marker
    frag = (
        _box(b"ftyp", b"isom" + b"\x00" * 4 + b"iso2")
        + _box(b"moof", b"\x00" * 8)
        + _box(b"moov", b"\x00" * 8)
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(_avc1_mp4())),
            (2, bytearray(frag)),
            (3, None),
        ],
        "media_id long, payload binary",
    )
    kept = h264_stream_info(df, on_error="skip").collect()
    assert {r["media_id"] for r in kept} == {1}
