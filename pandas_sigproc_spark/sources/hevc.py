"""HEVC / H.265 stream INSPECTION — the hvc1/hev1 sibling of
``sources/h264.py``, from the public spec (ITU-T H.265 §7.3-7.4; the
``hvcC`` record is ISO 14496-15 §8.3.3.1).

Same scope contract as the H.264 module: no pixel decode (the
entropy/reconstruction seam stays a loud refusal), but the structure a
100 TB video-curation pipeline keys on is fully parsed —

- :func:`nal_type` / :func:`is_irap` — HEVC's 2-byte NAL header and
  the IRAP sync-point range (BLA/IDR/CRA, types 16-23: the frames that
  decode standalone, i.e. what keyframe-aware sampling samples);
- :func:`parse_hvcc` — the HEVCDecoderConfigurationRecord (profile/
  tier/level, NAL length-prefix size, the type-grouped out-of-band
  VPS/SPS/PPS arrays);
- :func:`parse_hevc_sps` — profile_tier_level (general + sub-layer
  skipping) and TRUE display geometry: HEVC codes luma samples
  directly plus a chroma-format-aware conformance window;
- :func:`sample_nal_index` — the header-bytes-only per-sample NAL
  inventory (no body copies), both length-prefix and Annex-B framings.

Bit plumbing (exp-Golomb, emulation prevention) is shared with
``sources/h264.py`` — one home, the NAL escaping is byte-identical
between the two specs."""

from __future__ import annotations

from typing import NamedTuple

from pandas_sigproc_spark.sources.h264 import (
    _BitReader,
    iter_length_prefixed,
    resolve_framing,
    split_annexb,
    strip_emulation,
)

#: IRAP picture range (§7.4.2.2: BLA_W_LP..RSV_IRAP_VCL23 — the
#: reserved IRAP types 22/23 are IRAP by spec definition) — sync points
IRAP_TYPES = frozenset(range(16, 24))
NAL_TYPE_NAMES = {
    0: "trail_n",
    1: "trail_r",
    16: "bla_w_lp",
    17: "bla_w_radl",
    18: "bla_n_lp",
    19: "idr_w_radl",
    20: "idr_n_lp",
    21: "cra",
    32: "vps",
    33: "sps",
    34: "pps",
    35: "aud",
    39: "sei_prefix",
    40: "sei_suffix",
}


def nal_type(nal: bytes) -> int:
    """nal_unit_type from HEVC's 2-byte NAL header (§7.3.1.2)."""
    if len(nal) < 2:
        raise ValueError("HEVC NAL shorter than its 2-byte header")
    if nal[0] & 0x80:
        raise ValueError("NAL forbidden_zero_bit set — not a NAL header")
    return (nal[0] >> 1) & 0x3F


def is_irap(nal: bytes) -> bool:
    """True for BLA/IDR/CRA sync points (decode standalone)."""
    return nal_type(nal) in IRAP_TYPES


def _skip_profile_tier_level(r: _BitReader, max_sub_layers_minus1: int):
    """Walk profile_tier_level (§7.3.3), returning the GENERAL
    (profile_space, tier, profile_idc, level_idc)."""
    space = r.u(2)
    tier = r.u(1)
    profile = r.u(5)
    r.u(32)  # general_profile_compatibility_flags
    r.u(48)  # progressive/interlaced/non_packed/frame_only + 44 reserved
    level = r.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(r.u(1))
        sub_level.append(r.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(max_sub_layers_minus1, 8):
            r.u(2)  # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            r.u(88)
        if sub_level[i]:
            r.u(8)
    return space, tier, profile, level


class HevcSpsInfo(NamedTuple):
    profile_idc: int
    tier: int
    level_idc: int
    width: int
    height: int
    chroma_format_idc: int
    bit_depth_luma: int


def parse_hevc_sps(nal: bytes) -> HevcSpsInfo:
    """Decode an HEVC SPS NAL (type 33) down to geometry (§7.3.2.2.1):
    luma samples minus the chroma-format-aware conformance window."""
    if nal_type(nal) != 33:
        raise ValueError(
            f"NAL type {nal_type(nal)} is not an HEVC SPS (expected 33)"
        )
    r = _BitReader(strip_emulation(nal[2:]))
    r.u(4)  # sps_video_parameter_set_id
    max_sub_layers_minus1 = r.u(3)
    r.u(1)  # sps_temporal_id_nesting_flag
    _space, tier, profile, level = _skip_profile_tier_level(
        r, max_sub_layers_minus1
    )
    r.ue()  # sps_seq_parameter_set_id
    chroma_format_idc = r.ue()
    if chroma_format_idc == 3:
        r.u(1)  # separate_colour_plane_flag
    width = r.ue()  # pic_width_in_luma_samples
    height = r.ue()  # pic_height_in_luma_samples
    if r.u(1):  # conformance_window_flag
        left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        width -= sub_w * (left + right)
        height -= sub_h * (top + bottom)
    bit_depth_luma = r.ue() + 8
    return HevcSpsInfo(
        profile, tier, level, width, height, chroma_format_idc, bit_depth_luma
    )


class HvcConfig(NamedTuple):
    profile_idc: int
    tier: int
    level_idc: int
    length_size: int
    nals: dict[int, list[bytes]]  # nal_unit_type -> parameter sets


def parse_hvcc(box: bytes) -> HvcConfig:
    """Decode an ``hvcC`` HEVCDecoderConfigurationRecord
    (ISO 14496-15 §8.3.3.1.2)."""
    if len(box) < 23:
        raise ValueError("hvcC record shorter than its fixed header")
    if box[0] != 1:
        raise ValueError(f"hvcC configurationVersion {box[0]} != 1")
    profile = box[1] & 0x1F
    tier = (box[1] >> 5) & 1
    level = box[12]
    length_size = (box[21] & 0x03) + 1
    n_arrays = box[22]
    pos = 23
    nals: dict[int, list[bytes]] = {}
    for _ in range(n_arrays):
        if pos + 3 > len(box):
            raise ValueError("hvcC truncated in an array header")
        ntype = box[pos] & 0x3F
        n_units = int.from_bytes(box[pos + 1 : pos + 3], "big")
        pos += 3
        for _ in range(n_units):
            if pos + 2 > len(box):
                raise ValueError("hvcC truncated in a NAL length field")
            ln = int.from_bytes(box[pos : pos + 2], "big")
            pos += 2
            if pos + ln > len(box):
                raise ValueError("hvcC NAL extends past the record end")
            nals.setdefault(ntype, []).append(box[pos : pos + ln])
            pos += ln
    return HvcConfig(profile, tier, level, length_size, nals)


class SampleNals(NamedTuple):
    n_nals: int
    nal_types: list[int]
    is_keyframe: bool  # carries an IRAP picture (BLA/IDR/CRA)


def sample_nal_index(
    sample: bytes, length_size: int = 4, framing: str = "auto"
) -> SampleNals:
    """Per-sample NAL inventory: count, types in order, and the IRAP
    keyframe flag.  The length-prefix walk is h264.iter_length_prefixed
    (one home; reads ONLY each NAL's header byte — no body copies).
    ``framing`` as in h264.split_nals — thread the container's explicit
    framing when known; ``"auto"`` resolves via the length-walk-first
    h264.resolve_framing (an ADVICE finding: the old start-code
    heuristic misindexed length-prefixed samples whose first NAL is
    256-511 bytes)."""
    if framing == "auto":
        framing = resolve_framing(sample, length_size)
    if framing == "annexb":
        types = [nal_type(x) for x in split_annexb(sample)]
        return SampleNals(len(types), types, bool(IRAP_TYPES & set(types)))
    if framing != "length":
        raise ValueError(
            f"framing must be auto|annexb|length, got {framing!r}"
        )
    types: list[int] = []
    for pos, ln in iter_length_prefixed(sample, length_size):
        if ln < 2:
            raise ValueError("HEVC NAL shorter than its 2-byte header")
        hdr = sample[pos]
        if hdr & 0x80:
            raise ValueError("NAL forbidden_zero_bit set — not a NAL header")
        types.append((hdr >> 1) & 0x3F)
    return SampleNals(len(types), types, bool(IRAP_TYPES & set(types)))


__all__ = [
    "IRAP_TYPES",
    "NAL_TYPE_NAMES",
    "HevcSpsInfo",
    "HvcConfig",
    "SampleNals",
    "is_irap",
    "nal_type",
    "parse_hevc_sps",
    "parse_hvcc",
    "sample_nal_index",
]
