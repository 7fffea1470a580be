"""H.264 / AVC stream INSPECTION — NAL access units, SPS geometry, and
keyframe structure, from scratch against the public spec (ITU-T H.264 /
ISO 14496-10 §7.3-7.4; the avcC record is ISO 14496-15 §5.2.4).

Scope (the documented compressed-video seam, sources/mp4.py): this
module does NOT decode pixels — entropy decode + reconstruction stay a
loud ``NotImplementedError`` seam — but everything a 100 TB video
CURATION pipeline needs short of pixels is here:

- :func:`split_annexb` / :func:`split_avcc` — NAL unit access for both
  framings (start-code elementary streams; length-prefixed MP4 samples);
- :func:`parse_avcc` — the ``avcC`` decoder-configuration record
  (profile/level, NAL length size, the out-of-band SPS/PPS sets);
- :func:`parse_sps` — sequence parameter set: true DISPLAY geometry
  (macroblock grid minus frame cropping, chroma-format-aware crop
  units), profile/level, bit depths, frame/field mode — the exp-Golomb
  bit walk including high-profile scaling-list skipping and
  emulation-prevention (00 00 03) removal;
- :func:`nal_type` / :data:`NAL_TYPE_NAMES` and :func:`sample_nal_index`
  — per-sample NAL inventory and the IDR/recovery keyframe flag, which
  is what frame-sampling for video dedup actually needs (sample the
  sync points, not every 10th compressed delta frame).

Everything raises ``ValueError`` with located messages on malformed
input (the engine's corrupt-container taxonomy, like sources/mp4.py),
so ``on_error='skip'`` contracts upstream keep working.
"""

from __future__ import annotations

from typing import NamedTuple

NAL_TYPE_NAMES = {
    1: "slice_non_idr",
    2: "slice_part_a",
    3: "slice_part_b",
    4: "slice_part_c",
    5: "slice_idr",
    6: "sei",
    7: "sps",
    8: "pps",
    9: "aud",
    10: "end_of_seq",
    11: "end_of_stream",
    12: "filler",
    13: "sps_ext",
    14: "prefix_nal",
    15: "subset_sps",
    19: "slice_aux",
    20: "slice_ext",
}


def nal_type(nal: bytes) -> int:
    """The nal_unit_type of one NAL unit (header byte & 0x1F)."""
    if not nal:
        raise ValueError("empty NAL unit")
    if nal[0] & 0x80:
        raise ValueError("NAL forbidden_zero_bit set — not a NAL header")
    return nal[0] & 0x1F


def strip_emulation(data: bytes) -> bytes:
    """RBSP from a NAL payload: drop every emulation-prevention byte
    (00 00 03 -> 00 00; H.264 §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # the emulation byte itself is dropped
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise ValueError("SPS truncated mid-field")
            bit = 7 - (self._pos & 7)
            v = (v << 1) | ((self._d[byte] >> bit) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        """Unsigned exp-Golomb (§9.1)."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb run too long — corrupt SPS")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        """Signed exp-Golomb (§9.1.1)."""
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    # §7.3.2.1.1.1 — values are discarded; only the bit walk matters
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = last if nxt == 0 else nxt


class SpsInfo(NamedTuple):
    profile_idc: int
    level_idc: int
    width: int
    height: int
    chroma_format_idc: int
    bit_depth_luma: int
    frame_mbs_only: bool


# profiles whose SPS carries the chroma/bit-depth/scaling block (§7.3.2.1.1)
_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def parse_sps(nal: bytes) -> SpsInfo:
    """Decode a sequence parameter set NAL (type 7) down to geometry.

    Width/height are the DISPLAY dimensions: the macroblock grid
    (16-pixel units) minus frame cropping in chroma-format-aware crop
    units — a 1080p stream is coded as 1088 rows and crops 8."""
    if nal_type(nal) != 7:
        raise ValueError(
            f"NAL type {nal_type(nal)} is not an SPS (expected 7)"
        )
    r = _BitReader(strip_emulation(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # 4:2:0 default for non-high profiles
    separate_colour_plane = 0
    bit_depth_luma = 8
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        bit_depth_luma = r.ue() + 8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            n_lists = 8 if chroma_format_idc != 3 else 12
            for i in range(n_lists):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):  # num_ref_frames_in_pic_order_cnt_cycle
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (§7.4.2.1.1): chroma subsampling widens the crop step
    if separate_colour_plane or chroma_format_idc == 0:
        cw, ch = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        cw, ch = sub_w, sub_h * (2 - frame_mbs_only)
    width = pic_width_in_mbs * 16 - cw * (crop_l + crop_r)
    height = (
        (2 - frame_mbs_only) * pic_height_in_map_units * 16
        - ch * (crop_t + crop_b)
    )
    return SpsInfo(
        profile_idc,
        level_idc,
        width,
        height,
        chroma_format_idc,
        bit_depth_luma,
        bool(frame_mbs_only),
    )


def split_annexb(data: bytes) -> list[bytes]:
    """NAL units of an Annex-B elementary stream (00 00 01 /
    00 00 00 01 start codes), start codes removed."""
    nals: list[bytes] = []
    i, n = 0, len(data)
    start = None
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            if start is not None:
                end = i
                while end > start and data[end - 1] == 0:
                    end -= 1  # the 4-byte code's extra zero
                nals.append(data[start:end])
            i += 3
            start = i
        else:
            i += 1
    if start is None:
        raise ValueError("no Annex-B start code found")
    end = n
    while end > start and data[end - 1] == 0:
        end -= 1  # trailing_zero_8bits — mid-stream NALs already strip
    nals.append(data[start:end])
    return [x for x in nals if x]


def split_avcc(sample: bytes, length_size: int = 4) -> list[bytes]:
    """NAL units of one length-prefixed MP4 sample (avcC framing)."""
    if length_size not in (1, 2, 3, 4):
        raise ValueError(f"NAL length size must be 1-4, got {length_size}")
    nals: list[bytes] = []
    pos, n = 0, len(sample)
    while pos < n:
        if pos + length_size > n:
            raise ValueError(
                f"truncated NAL length field at offset {pos}"
            )
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if pos + ln > n:
            raise ValueError(
                f"NAL of {ln} bytes at offset {pos} extends past the"
                f" sample end ({n})"
            )
        if ln:
            nals.append(sample[pos : pos + ln])
        pos += ln
    return nals


class AvcConfig(NamedTuple):
    profile_idc: int
    level_idc: int
    length_size: int
    sps: list[bytes]
    pps: list[bytes]


def parse_avcc(box: bytes) -> AvcConfig:
    """Decode an ``avcC`` AVCDecoderConfigurationRecord
    (ISO 14496-15 §5.2.4.1): profile/level, the NAL length-prefix size
    MP4 samples use, and the out-of-band SPS/PPS sets."""
    if len(box) < 7:
        raise ValueError("avcC record shorter than its fixed header")
    if box[0] != 1:
        raise ValueError(f"avcC configurationVersion {box[0]} != 1")
    profile, level = box[1], box[3]
    length_size = (box[4] & 0x03) + 1
    n_sps = box[5] & 0x1F
    pos = 6
    sps: list[bytes] = []
    for _ in range(n_sps):
        if pos + 2 > len(box):
            raise ValueError("avcC truncated in the SPS table")
        ln = int.from_bytes(box[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(box):
            raise ValueError("avcC SPS extends past the record end")
        sps.append(box[pos : pos + ln])
        pos += ln
    if pos >= len(box):
        raise ValueError("avcC truncated before the PPS table")
    n_pps = box[pos]
    pos += 1
    pps: list[bytes] = []
    for _ in range(n_pps):
        if pos + 2 > len(box):
            raise ValueError("avcC truncated in the PPS table")
        ln = int.from_bytes(box[pos : pos + 2], "big")
        pos += 2
        if pos + ln > len(box):
            raise ValueError("avcC PPS extends past the record end")
        pps.append(box[pos : pos + ln])
        pos += ln
    return AvcConfig(profile, level, length_size, sps, pps)


def is_annexb(sample: bytes) -> bool:
    """True when ``sample`` opens with an Annex-B start code — some
    muxers (and all elementary streams) frame NALs with start codes
    instead of avcC length prefixes.  A START-CODE CHECK ALONE IS NOT
    A FRAMING DETECTOR: a length-prefixed sample whose first NAL is
    256-511 bytes long also opens with ``00 00 01 xx`` (an ADVICE
    finding) — use :func:`resolve_framing`, or thread the container's
    explicit framing, instead of branching on this predicate."""
    return sample[:3] == b"\x00\x00\x01" or sample[:4] == b"\x00\x00\x00\x01"


def resolve_framing(sample: bytes, length_size: int = 4) -> str:
    """Resolve ``"auto"`` NAL framing for one sample: ``"length"`` or
    ``"annexb"``.

    The bounds-checked length-prefix walk is attempted FIRST (with the
    codec-neutral forbidden_zero_bit check on every NAL header byte —
    the MSB is forbidden-zero in both H.264 §7.3.1 and HEVC §7.3.1.2):
    MP4 samples are length-prefixed per ISO 14496-15, and a
    length-prefixed sample whose first NAL is 256-511 bytes long
    *starts with* ``00 00 01 xx``, so the old start-code-first
    heuristic misparsed exactly those samples (an ADVICE finding —
    a single 300-byte IDR came back as a type-12 filler non-keyframe).
    Annex-B is the fallback for raw elementary streams, where the walk
    fails within a NAL or two (mid-NAL compressed bytes read as a huge
    length field)."""
    try:
        for pos, _ln in iter_length_prefixed(sample, length_size):
            if sample[pos] & 0x80:
                raise ValueError(
                    "NAL forbidden_zero_bit set — not a NAL header"
                )
        return "length"
    except ValueError as e:
        if sample[:4] == b"\x00\x00\x00\x01":
            # a 4-byte start code cannot be a plausible length prefix
            # (it declares a 1-byte NAL and the walk then reads mid-NAL
            # garbage as the next length) — genuine Annex-B
            return "annexb"
        if sample[:3] == b"\x00\x00\x01":
            # 00 00 01 xx is genuinely AMBIGUOUS once the walk fails:
            # either a TRUNCATED length-prefixed sample whose first NAL
            # is 256-511 bytes, or a 3-byte-start-code Annex-B stream.
            # Guessing Annex-B here re-opened the ADVICE misparse class
            # through the error path — a truncated sample parsed as one
            # garbage filler NAL instead of raising the named truncation
            # error on_error='skip' callers rely on (an r15 review
            # finding).  Refuse by name; callers with container
            # knowledge pass framing explicitly.
            raise ValueError(
                f"ambiguous NAL framing: the length-prefix walk failed"
                f" ({e}) but the sample opens with a 3-byte start code —"
                " either a truncated length-prefixed sample or a"
                " 3-byte-code Annex-B stream; pass framing='length' or"
                " 'annexb' explicitly"
            ) from e
        raise ValueError(
            "sample matches neither length-prefix nor Annex-B framing"
        ) from e


def split_nals(
    sample: bytes, length_size: int = 4, framing: str = "auto"
) -> list[bytes]:
    """NAL units of one sample under either framing.  ``framing`` is
    ``"length"`` (avcC/hvcC prefixes), ``"annexb"`` (start codes), or
    ``"auto"`` (:func:`resolve_framing`, length-walk-first).  Callers
    that know the container's framing — an avcC/hvcC record was
    present, or the source is a raw elementary stream — MUST pass it
    explicitly; per-sample auto-detection is only for sources with no
    established framing."""
    if framing == "auto":
        framing = resolve_framing(sample, length_size)
    if framing == "annexb":
        return split_annexb(sample)
    if framing == "length":
        return split_avcc(sample, length_size)
    raise ValueError(
        f"framing must be auto|annexb|length, got {framing!r}"
    )


class SampleNals(NamedTuple):
    n_nals: int
    nal_types: list[int]
    is_keyframe: bool  # carries an IDR slice (type 5)


def iter_length_prefixed(sample: bytes, length_size: int = 4):
    """Yield ``(header_start, nal_len)`` for each length-prefixed NAL —
    ONE home for the bounds-checked walk (the HEVC module shares it;
    a review finding counted two hand-kept copies).  Reads no body
    bytes: callers index only the header byte(s) they need."""
    if length_size not in (1, 2, 3, 4):
        raise ValueError(f"NAL length size must be 1-4, got {length_size}")
    pos, n = 0, len(sample)
    while pos < n:
        if pos + length_size > n:
            raise ValueError(f"truncated NAL length field at offset {pos}")
        ln = int.from_bytes(sample[pos : pos + length_size], "big")
        pos += length_size
        if pos + ln > n:
            raise ValueError(
                f"NAL of {ln} bytes at offset {pos} extends past the"
                f" sample end ({n})"
            )
        if ln:
            yield pos, ln
        pos += ln


def sample_nal_index(
    sample: bytes, length_size: int = 4, framing: str = "auto"
) -> SampleNals:
    """NAL inventory of one MP4 sample: count, types in stream order,
    and the IDR keyframe flag — the structure frame-sampling for video
    dedup keys on (sync points decode standalone; delta frames don't).
    ``framing`` as in :func:`split_nals` — thread the container's
    explicit framing when it is known (an ADVICE finding: the old
    start-code heuristic misindexed length-prefixed samples whose
    first NAL is 256-511 bytes).  The length walk reads ONLY each
    NAL's header byte (no body slices — copying every NAL body to
    read one byte doubled the operator's per-payload byte traffic,
    a review finding)."""
    if framing == "auto":
        framing = resolve_framing(sample, length_size)
    if framing == "annexb":
        types = [nal_type(x) for x in split_annexb(sample)]
        return SampleNals(len(types), types, 5 in types)
    if framing != "length":
        raise ValueError(
            f"framing must be auto|annexb|length, got {framing!r}"
        )
    types: list[int] = []
    for pos, _ln in iter_length_prefixed(sample, length_size):
        hdr = sample[pos]
        if hdr & 0x80:
            raise ValueError("NAL forbidden_zero_bit set — not a NAL header")
        types.append(hdr & 0x1F)
    return SampleNals(len(types), types, 5 in types)


__all__ = [
    "NAL_TYPE_NAMES",
    "AvcConfig",
    "SampleNals",
    "SpsInfo",
    "is_annexb",
    "iter_length_prefixed",
    "nal_type",
    "parse_avcc",
    "parse_sps",
    "resolve_framing",
    "sample_nal_index",
    "split_annexb",
    "split_avcc",
    "split_nals",
    "strip_emulation",
]
