"""Test-side H.264/HEVC reference bit writers — spec-order encoders,
independent of the parsers under test (sources/h264.py, sources/hevc.py
re-derive everything from the bitstream; these build it from ITU-T
H.264 §7.3 / H.265 §7.3 field order directly).

Pytest-free ON PURPOSE (an r15 review finding): the driver-checked
``video_stream_info`` gate builds its 12 MP4 variants from these
writers at query time, so they must import without dev-only
dependencies and without the pytest module.  The test batteries
(tests/test_h264.py, tests/test_hevc.py) import from here too — one
home for the spec arithmetic on the writer side, mirroring the
single-homing rule the engine applies to its own expressions.
"""

from __future__ import annotations


class BW:
    """Minimal spec-order bit writer (test-side reference encoder)."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]

    def ue(self, v):
        c = v + 1
        n = c.bit_length()
        self.bits += [0] * (n - 1)
        self.u(c, n)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self):
        bits = self.bits + [1]  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def _sps_tail(w, width_mbs, height_mus, crop=None):
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type -> lsb field follows
    w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)
    w.ue(height_mus - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present


def _baseline_sps(width_mbs=4, height_mus=3, crop=None):
    w = BW()
    w.u(66, 8)  # profile_idc baseline
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level 3.0
    _sps_tail(w, width_mbs, height_mus, crop)
    return b"\x67" + w.rbsp()


def _avcc_record(sps, pps):
    return (
        bytes([1, 66, 0, 30, 0xFC | 3, 0xE0 | 1])
        + len(sps).to_bytes(2, "big")
        + sps
        + bytes([1])
        + len(pps).to_bytes(2, "big")
        + pps
    )


def _ptl(w, profile=1, tier=0, level=93):
    w.u(0, 2)   # general_profile_space
    w.u(tier, 1)
    w.u(profile, 5)
    w.u(0, 32)  # compatibility flags
    w.u(0, 48)  # source flags + reserved
    w.u(level, 8)


def _hevc_sps(width=320, height=240, conf_win=None, profile=1, level=93):
    w = BW()
    w.u(0, 4)  # sps_video_parameter_set_id
    w.u(0, 3)  # sps_max_sub_layers_minus1
    w.u(1, 1)  # sps_temporal_id_nesting
    _ptl(w, profile=profile, level=level)
    w.ue(0)  # sps_seq_parameter_set_id
    w.ue(1)  # chroma_format_idc 4:2:0
    w.ue(width)
    w.ue(height)
    if conf_win:
        w.u(1, 1)
        for c in conf_win:
            w.ue(c)
    else:
        w.u(0, 1)
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    # (parser stops here; trailing fields unread)
    # HEVC 2-byte NAL header: type 33 -> (33 << 1) = 0x42, layer 0,
    # temporal_id_plus1 1 -> second byte 0x01
    return bytes([33 << 1, 1]) + w.rbsp()


def _hvcc_record(sps, pps=b"\x44\x01\xc0"):
    head = bytearray(23)
    head[0] = 1  # configurationVersion
    head[1] = (0 << 6) | (0 << 5) | 1  # space/tier/profile_idc 1
    head[12] = 93  # general_level_idc
    head[13] = 0xF0
    head[21] = 0xFC | 3  # lengthSizeMinusOne = 3
    head[22] = 2  # numOfArrays

    def arr(ntype, units):
        out = bytes([0x80 | ntype]) + len(units).to_bytes(2, "big")
        for u in units:
            out += len(u).to_bytes(2, "big") + u
        return out

    return bytes(head) + arr(33, [sps]) + arr(34, [pps])
