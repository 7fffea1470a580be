"""From-scratch baseline JPEG (JFIF) codec — pure NumPy + stdlib.

Closes the container seam `operators/multimodal.py` documents for
image payloads (reference parity target: the reference delegates all
media to external libraries; this engine carries its own codecs —
WAV/BMP/PNG already, JPEG here) without any imaging dependency.

Encoder profile: baseline sequential DCT (SOF0) in one interleaved
scan, OR progressive DCT (SOF2, ``progressive=True`` — T.81 Annex G
spectral selection plus one level of successive approximation with
EOB-run batching, the web-dominant delivery layout); 3-component
YCbCr at 4:4:4 (the bit-fidelity default) or 4:2:0 chroma
subsampling, or 1-component grayscale, 8-bit.  Huffman tables are
CANONICAL FIXED-LENGTH tables built by :func:`_flat_table` (every DC
category 4 bits, every AC (run,size) symbol 8 bits; progressive adds
the EOBn symbols) and written to DHT — legal JPEG any decoder reads
(DHT defines the file's tables; Annex K's are merely the customary
defaults), chosen so the table constants are *derived* by a ten-line
procedure instead of transcribed.  Quantization uses the standard
Annex-K base matrices scaled by the libjpeg quality formula.

Decoder: general baseline AND progressive — parses
DQT/SOF0/SOF2/DHT/SOS/DRI, decodes any canonical Huffman tables
(Annex K included), handles restart markers (baseline),
accumulates multi-scan progressive coefficients (DC first/refine,
AC first/refine, EOB runs), dequantizes, IDCTs, and converts to RGB.
Any integer sampling-factor ratio is supported (4:4:4, 4:2:0, 4:2:2,
... — subsampled planes are nearest-upsampled); non-integer ratios,
restarts inside progressive scans, and the lossless/extended/
arithmetic SOFs raise NotImplementedError naming the seam.

The progressive and baseline paths share the quantized-coefficient
pipeline, so at equal settings both streams decode to IDENTICAL
pixels — the decisive contract tests/test_jpeg_progressive.py pins.

All arithmetic is float64 DCT via the orthonormal 8x8 cosine matrix
(T F T^t), which IS the JPEG FDCT/IDCT definition.  Determinism: both
directions are pure functions of the bytes — the same payload decodes
to the same pixels on every executor.

Quality anchors (pinned in tests/test_jpeg.py): flat-color images
round-trip EXACTLY at quality 100 (DC-only blocks, unit quantizers);
smooth gradients round-trip within PSNR bounds; every encoded stream
re-parses through the general decoder path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# Annex-K base quantization matrices (public spec constants)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# orthonormal 8x8 DCT matrix: T @ B @ T.T == the JPEG FDCT definition
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K base matrices."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# canonical Huffman plumbing (shared by encoder + decoder)
# ---------------------------------------------------------------------------


def _flat_table(symbols: list[int], length: int):
    """(bits, huffval) for a canonical table giving every symbol the
    same code ``length`` — legal iff count < 2^length (the all-ones
    code must stay unassigned; JPEG reserves it)."""
    if len(symbols) >= (1 << length):
        raise ValueError("flat table too small for symbol count")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the standard canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[huffval[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [16 * r + s for r in range(16) for s in range(1, 11)] + [
    0x00,  # EOB
    0xF0,  # ZRL
]
DC_BITS, DC_HUFFVAL = _flat_table(_DC_SYMBOLS, 4)
AC_BITS, AC_HUFFVAL = _flat_table(_AC_SYMBOLS, 8)
# progressive AC scans additionally use EOBn symbols (r<<4 for run
# lengths 2^1..2^14 blocks — T.81 G.1.2.2); EOB0/ZRL are already in
# the baseline set.
_AC_PROG_SYMBOLS = _AC_SYMBOLS + [r << 4 for r in range(1, 15)]
AC_PROG_BITS, AC_PROG_HUFFVAL = _flat_table(_AC_PROG_SYMBOLS, 8)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker (RSTn handled by the caller via ``sync``)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # past a marker: feed 1-bits (spec: missing data reads as 1s)
            self._acc = (self._acc << 8) | 0xFF
            self._n += 8
            return
        try:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    self.marker = nxt
                    self.pos += 1
                    b = 0xFF
        except IndexError:
            # truncated stream: every malformed-input path in this
            # module raises ValueError — callers skip corrupt payloads
            # by catching it (a review finding: this path leaked
            # IndexError)
            raise ValueError(
                "JPEG: truncated entropy-coded segment"
            ) from None
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        bit = (self._acc >> self._n) & 1
        # Mask consumed bits out (the writer's symmetric rule at
        # write()): without this the accumulator grows by 8 bits per
        # byte and every _fill shifts the whole history — decode time
        # goes QUADRATIC in scan size (measured 57s for a 256x256
        # noise image vs 0.67s masked; a review finding).
        self._acc &= (1 << self._n) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Drop padding bits, consume the RSTn marker, realign."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # the padding bits were never read, so the marker bytes are
            # still ahead of pos — skip to and over them
            try:
                while not (
                    self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7
                ):
                    self.pos += 1
            except IndexError:
                # same ValueError contract as _fill: truncated input
                # never leaks IndexError to callers skipping corrupt
                # payloads (a review finding)
                raise ValueError(
                    "JPEG: truncated stream — no restart marker found"
                ) from None
            self.pos += 2
        self.marker = None


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym
        for sym, (code, ln) in _canonical_codes(bits, huffval).items()
    }


def _magnitude(v: int) -> tuple[int, int]:
    """(size, offset bits) of a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# color transforms (JFIF full-range BT.601)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _blocks(comp: np.ndarray, n_by: int, n_bx: int) -> np.ndarray:
    """(n_by, n_bx, 8, 8) view of the component edge-padded to exactly
    that block grid."""
    h, w = comp.shape
    pad = np.pad(
        comp, ((0, n_by * 8 - h), (0, n_bx * 8 - w)), mode="edge"
    )
    return pad.reshape(n_by, 8, n_bx, 8).transpose(0, 2, 1, 3)


def _encode_component_grid(
    comp: np.ndarray, qt: np.ndarray, n_by: int, n_bx: int
) -> np.ndarray:
    """Quantized zigzag coefficients as a (n_by, n_bx, 64) block grid."""
    bl = _blocks(comp, n_by, n_bx) - 128.0
    coef = np.einsum("ux,byxw,vw->byuv", _T, bl, _T)
    q = np.round(coef / qt).astype(np.int64)
    grid = q.reshape(n_by, n_bx, 64)[:, :, _ZZ]
    # 8-bit baseline bound: quantized ACs must fit 10 magnitude bits
    # (at quality 100 a +/-128 checkerboard block can hit 1024)
    grid[:, :, 1:] = np.clip(grid[:, :, 1:], -1023, 1023)
    return grid


def _box_downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean chroma downsample (edge-padded to even dims)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def _write_block(wtr, blk, prev_dc, ci, dc_codes, ac_codes) -> None:
    diff = int(blk[0]) - prev_dc[ci]
    prev_dc[ci] = int(blk[0])
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    wtr.write(code, ln)
    if size:
        wtr.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for i in range(1, 64):
        v = int(blk[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[16 * run + size]
        wtr.write(code, ln)
        wtr.write(bits, size)
        run = 0
        if i == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)


# ---------------------------------------------------------------------------
# progressive entropy coders (T.81 Annex G: spectral selection +
# successive approximation; EOB-run batching per G.1.2.2-G.1.2.3)
# ---------------------------------------------------------------------------


class _ProgACState:
    """Cross-block AC-scan state: the pending EOB run and, in
    refinement scans, the correction bits buffered inside it."""

    def __init__(self) -> None:
        self.eobrun = 0
        self.pending: list[int] = []


def _flush_eobrun(wtr: _BitWriter, ac_codes, st: _ProgACState) -> None:
    if st.eobrun == 0:
        return
    r = st.eobrun.bit_length() - 1
    code, ln = ac_codes[r << 4]
    wtr.write(code, ln)
    if r:
        wtr.write(st.eobrun - (1 << r), r)
    for b in st.pending:
        wtr.write(b, 1)
    st.eobrun = 0
    st.pending = []


def _enc_dc_first(wtr, dc_codes, zz, prev_dc, ci, al) -> None:
    v = int(zz[0]) >> al  # DC point transform is an ARITHMETIC shift
    diff = v - prev_dc[ci]
    prev_dc[ci] = v
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    wtr.write(code, ln)
    if size:
        wtr.write(bits, size)


def _enc_ac_first_block(wtr, ac_codes, zz, ss, se, al, st) -> None:
    last = 0
    for k in range(ss, se + 1):
        if abs(int(zz[k])) >> al:
            last = k
    if last == 0:  # nothing significant at this precision: EOB block
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, st)
        return
    _flush_eobrun(wtr, ac_codes, st)
    run = 0
    for k in range(ss, last + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform truncates the MAGNITUDE
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            run -= 16
        size, bits = _magnitude(t if v >= 0 else -t)
        code, ln = ac_codes[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(bits, size)
        run = 0
    if last < se:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eobrun(wtr, ac_codes, st)


def _enc_ac_refine_block(wtr, ac_codes, zz, ss, se, al, st) -> None:
    # t == 1: newly significant at this precision (encoded as run/1 +
    # sign); t > 1: already significant (one correction bit); t == 0:
    # still insignificant (zero-run member).
    tvals = [abs(int(zz[k])) >> al for k in range(64)]
    eob = ss - 1
    for k in range(ss, se + 1):
        if tvals[k] == 1:
            eob = k
    run = 0
    local: list[int] = []  # correction bits inside the current run
    for k in range(ss, se + 1):
        t = tvals[k]
        if t == 0:
            run += 1
            continue
        # ZRLs are only needed up to the last new significance; zero
        # runs beyond it fold into the EOB run (G.1.2.3)
        while run > 15 and k <= eob:
            _flush_eobrun(wtr, ac_codes, st)
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            run -= 16
            for b in local:
                wtr.write(b, 1)
            local = []
        if t > 1:
            local.append(t & 1)
            continue
        _flush_eobrun(wtr, ac_codes, st)
        code, ln = ac_codes[(run << 4) | 1]
        wtr.write(code, ln)
        _, sign_bit = _magnitude(1 if int(zz[k]) >= 0 else -1)
        wtr.write(sign_bit, 1)
        for b in local:
            wtr.write(b, 1)
        local = []
        run = 0
    if run > 0 or local:
        st.eobrun += 1
        st.pending += local
        if st.eobrun == 0x7FFF or len(st.pending) > 900:
            _flush_eobrun(wtr, ac_codes, st)


def _comp_block_grid(fh, fw, hs, vs, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved scans cover the COMPONENT's true block grid,
    not the MCU-padded grid (A.2.2): ceil(ceil(dim*f/fmax)/8)."""
    ch = (fh * vs + vmax - 1) // vmax
    cw = (fw * hs + hmax - 1) // hmax
    return (ch + 7) // 8, (cw + 7) // 8


def _encode_progressive(grids, samps, fh, fw, mby, mbx, dc_codes, ac_codes):
    """The scan sequence as (sos_suffix, entropy_bytes) pairs: DC
    first (Al=1, interleaved) -> DC refine -> per component AC first
    (Ss=1..63, Al=1) -> per component AC refine (Ah=1, Al=0) — the
    classic simple progression, exercising all four scan kinds."""
    nc = len(grids)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    scans = []

    def dc_scan(ah, al):
        wtr = _BitWriter()
        prev_dc = [0] * nc
        if nc == 1:
            nby, nbx = _comp_block_grid(fh, fw, 1, 1, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    zz = grids[0][by, bx]
                    if ah == 0:
                        _enc_dc_first(wtr, dc_codes, zz, prev_dc, 0, al)
                    else:
                        wtr.write((int(zz[0]) >> al) & 1, 1)
        else:
            for mcu in range(mby * mbx):
                my, mx = divmod(mcu, mbx)
                for ci, (grid, (hs, vs)) in enumerate(zip(grids, samps)):
                    for dy in range(vs):
                        for dx in range(hs):
                            zz = grid[my * vs + dy, mx * hs + dx]
                            if ah == 0:
                                _enc_dc_first(
                                    wtr, dc_codes, zz, prev_dc, ci, al
                                )
                            else:
                                wtr.write((int(zz[0]) >> al) & 1, 1)
        wtr.flush()
        comps = bytes(
            b for ci in range(nc) for b in (ci + 1, 0x00)
        )
        hdr = struct.pack(">HB", 6 + 2 * nc, nc) + comps + bytes(
            (0, 0, (ah << 4) | al)
        )
        return hdr, bytes(wtr.buf)

    def ac_scan(ci, ah, al):
        hs, vs = samps[ci]
        nby, nbx = _comp_block_grid(fh, fw, hs, vs, hmax, vmax)
        wtr = _BitWriter()
        st = _ProgACState()
        for by in range(nby):
            for bx in range(nbx):
                zz = grids[ci][by, bx]
                if ah == 0:
                    _enc_ac_first_block(wtr, ac_codes, zz, 1, 63, al, st)
                else:
                    _enc_ac_refine_block(wtr, ac_codes, zz, 1, 63, al, st)
        _flush_eobrun(wtr, ac_codes, st)
        wtr.flush()
        hdr = struct.pack(">HB", 8, 1) + bytes(
            (ci + 1, 0x00, 1, 63, (ah << 4) | al)
        )
        return hdr, bytes(wtr.buf)

    scans.append(dc_scan(0, 1))
    scans.append(dc_scan(1, 0))
    for ci in range(nc):
        scans.append(ac_scan(ci, 0, 1))
    for ci in range(nc):
        scans.append(ac_scan(ci, 1, 0))
    return scans


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    *,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    JFIF byte string — baseline sequential in one interleaved scan by
    default, or an SOF2 multi-scan progressive stream with
    ``progressive=True``.

    ``subsampling``: ``"444"`` (no chroma subsampling, the bit-fidelity
    profile) or ``"420"`` (2x2 box-mean chroma downsample, Y sampling
    factors 2x2 — the dominant real-world profile, halving the encoded
    chroma area twice).  ``restart_interval`` > 0 emits DRI and
    byte-aligned RSTn markers every that many MCUs (error-resilience
    segments; also the decoder's restart-path test hook).

    ``progressive`` emits an SOF2 multi-scan stream (T.81 Annex G:
    spectral selection + one level of successive approximation, with
    EOB-run batching) — the web-dominant delivery profile.  The
    quantized coefficients are IDENTICAL to the baseline encoding at
    the same settings, so both decode to the same pixels (pinned by
    tests/test_jpeg_progressive.py).  Restart markers are not
    combined with progressive (documented seam)."""
    if progressive and restart_interval:
        raise NotImplementedError(
            "restart markers inside progressive scans are outside the "
            "supported profile (sources/jpeg.py:encode_jpeg)"
        )
    px = np.asarray(px)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) grayscale")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for a JPEG frame header")
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        planes = [px.astype(np.float64)]
        qts = [qt_l]
        qids = [0]
        samps = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            planes = [y, _box_downsample2(cb), _box_downsample2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mby = (h + 8 * vmax - 1) // (8 * vmax)
    mbx = (w + 8 * hmax - 1) // (8 * hmax)
    dc_codes = _canonical_codes(DC_BITS, DC_HUFFVAL)
    ac_bits, ac_hv = (
        (AC_PROG_BITS, AC_PROG_HUFFVAL)
        if progressive
        else (AC_BITS, AC_HUFFVAL)
    )
    ac_codes = _canonical_codes(ac_bits, ac_hv)
    grids = [
        _encode_component_grid(p, qt, mby * vs, mbx * hs)
        for p, qt, (hs, vs) in zip(planes, qts, samps)
    ]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density + no thumbnail
    # DQT (one marker per table)
    for tid, qt in enumerate(qts[:1] if gray else (qt_l, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt.reshape(-1)[_ZZ])
    # SOF0 (baseline) or SOF2 (progressive)
    nc = len(planes)
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hs, vs = samps[ci]
        out += struct.pack(">BBB", ci + 1, (hs << 4) | vs, qids[ci])
    # DHT: same flat tables for both classes/ids used
    for tclass, tid, bits, hv in (
        (0, 0, DC_BITS, DC_HUFFVAL),
        (1, 0, ac_bits, ac_hv),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 3 + 16 + len(hv), (tclass << 4) | tid
        )
        out += bytes(bits) + bytes(hv)

    if progressive:
        for sos_suffix, entropy in _encode_progressive(
            grids, samps, h, w, mby, mbx, dc_codes, ac_codes
        ):
            out += b"\xff\xda" + sos_suffix + entropy
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    wtr = _BitWriter()
    prev_dc = [0] * len(planes)
    rst = 0
    for mcu in range(mby * mbx):  # interleaved MCUs
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            wtr.buf += bytes((0xFF, 0xD0 + rst))
            rst = (rst + 1) & 7
            prev_dc = [0] * len(planes)
        my, mx = divmod(mcu, mbx)
        for ci, (grid, (hs, vs)) in enumerate(zip(grids, samps)):
            for dy in range(vs):
                for dx in range(hs):
                    _write_block(
                        wtr,
                        grid[my * vs + dy, mx * hs + dx],
                        prev_dc,
                        ci,
                        dc_codes,
                        ac_codes,
                    )
    wtr.flush()

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS: every component uses table id 0 for DC and AC
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack(">BB", ci + 1, 0x00)
    out += b"\x00\x3f\x00"  # spectral selection 0..63, Ah/Al 0
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_bytes(data: bytes) -> np.ndarray:
    """Decode a JFIF byte string to an (h, w, 3) uint8 RGB array
    (grayscale replicates to 3 channels, like the BMP/PNG decoders).
    Supports 1- or 3-component BASELINE sequential scans (SOF0/SOF1 —
    Annex-K or custom Huffman tables, DRI/RSTn handled) and
    PROGRESSIVE streams (SOF2 — spectral selection + successive
    approximation with EOB runs, T.81 Annex G), both with any integer
    sampling-factor ratio (subsampled chroma is nearest-upsampled).
    Non-integer ratios, restart markers inside progressive scans, and
    the extended/lossless/arithmetic SOFs raise NotImplementedError
    naming the seam."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    coefs = None  # progressive: per-component zigzag coef grids
    prog_scan_decoded = False
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while data[pos + 1] == 0xFF:  # optional fill bytes
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and prog_scan_decoded:
                return _render_progressive(frame, coefs, qtabs)
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT — possibly several tables
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZZ] = vals.astype(np.int64)
                qtabs[tid] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                hv = list(seg[i + 17 : i + 17 + n])
                htabs[(tclass, tid)] = _decode_table(bits, hv)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            _prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if _prec != 8:
                # SOF1 legally allows 12-bit samples; this decoder's
                # level shift (+128) and 0..255 clip are 8-bit only, so
                # decoding would return garbage silently (a review
                # finding) — refuse by name instead
                raise NotImplementedError(
                    f"{_prec}-bit sample precision is outside the "
                    "supported profile (8-bit only, "
                    "sources/jpeg.py:decode_jpeg_bytes)"
                )
            comps = []
            for ci in range(nc):
                cid, samp, qid = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, qid))
            frame = (fh, fw, comps)
            if progressive:
                # same profile guards as the baseline path
                # (_decode_scan) — the docstring promises loud seams
                if len(comps) not in (1, 3):
                    raise NotImplementedError(
                        "only 1- or 3-component scans supported"
                    )
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if any(
                    hmax % hs or vmax % vs for _, hs, vs, _ in comps
                ):
                    raise NotImplementedError(
                        "non-integer chroma upsampling ratios are "
                        "outside the supported profile "
                        "(sources/jpeg.py:decode_jpeg_bytes)"
                    )
                mby = (fh + 8 * vmax - 1) // (8 * vmax)
                mbx = (fw + 8 * hmax - 1) // (8 * hmax)
                coefs = [
                    np.zeros((mby * vs, mbx * hs, 64), dtype=np.int64)
                    for _, hs, vs, _ in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/SOF1) and progressive (SOF2) JPEG "
                f"are supported; got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tids = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan.append((cid, tids >> 4, tids & 0xF))
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan, qtabs, htabs, restart_interval
                )
            if restart_interval:
                raise NotImplementedError(
                    "restart markers inside progressive scans are "
                    "outside the supported profile "
                    "(sources/jpeg.py:decode_jpeg_bytes)"
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos, frame, scan, (ss, se, ahal >> 4, ahal & 0xF),
                htabs, coefs,
            )
            prog_scan_decoded = True
        # else: APPn/COM etc. — skipped


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise NotImplementedError("only 1- or 3-component scans supported")
    if len(scan) != len(comps):
        # A spec-legal baseline stream may ship one SCAN PER COMPONENT
        # (non-interleaved, T.81 A.2.2: one block per MCU over the TRUE
        # component grid).  This decoder only implements the interleaved
        # single-scan layout every common encoder emits; decoding a
        # partial scan as interleaved would return garbage pixels
        # silently (a review finding) — refuse by name.
        raise NotImplementedError(
            f"baseline scan covers {len(scan)} of {len(comps)} "
            "components — non-interleaved multi-scan baseline JPEG is "
            "outside the supported profile "
            "(sources/jpeg.py:_decode_scan)"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
        raise NotImplementedError(
            "non-integer chroma upsampling ratios are outside the "
            "supported profile (sources/jpeg.py:_decode_scan)"
        )
    mby = (fh + 8 * vmax - 1) // (8 * vmax)
    mbx = (fw + 8 * hmax - 1) // (8 * hmax)
    n_mcu = mby * mbx
    order = []  # (component idx, hs, vs, dc table, ac table, qt)
    for cid, dct, act in scan:
        ci = next(i for i, c in enumerate(comps) if c[0] == cid)
        _, hs, vs, qid = comps[ci]
        order.append(
            (ci, hs, vs, htabs[(0, dct)], htabs[(1, act)], qtabs[qid])
        )
    planes = [
        np.zeros((mby * 8 * vs, mbx * 8 * hs))
        for _, hs, vs, _ in comps
    ]
    rdr = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # reader already hit the RSTn marker; realign and reset DC
            rdr.sync_restart()
            prev_dc = [0] * len(comps)
        myy, mxx = divmod(mcu, mbx)
        for ci, hs, vs, dc_tab, ac_tab, qt in order:
            for dy in range(vs):
                for dx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    size = _huff_decode(rdr, dc_tab)
                    diff = _extend(rdr.read_bits(size), size)
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    i = 1
                    while i < 64:
                        sym = _huff_decode(rdr, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        run, sz = sym >> 4, sym & 0xF
                        if sz == 0:
                            if run != 15:
                                raise ValueError("invalid AC symbol")
                            i += 16  # ZRL
                            continue
                        i += run
                        if i >= 64:
                            raise ValueError("AC run overflows block")
                        zz[i] = _extend(rdr.read_bits(sz), sz)
                        i += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[_ZZ] = zz * qt.reshape(-1)[_ZZ]
                    pix = _T.T @ blk.reshape(8, 8) @ _T + 128.0
                    y0 = (myy * vs + dy) * 8
                    x0 = (mxx * hs + dx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    # nearest upsampling of subsampled components, then crop to frame
    full = []
    for p, (_, hs, vs, _) in zip(planes, comps):
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


def _decode_progressive_scan(data, pos, frame, scan, band, htabs, coefs):
    """One SOS of a progressive stream, accumulated into ``coefs``
    (per-component zigzag grids).  Returns the byte position of the
    next marker.  T.81 Annex G: DC first/refine (interleaved when
    ns > 1), AC first/refine (always single-component, over the
    component's TRUE block grid, with EOB-run batching)."""
    ss, se, ah, al = band
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mby = (fh + 8 * vmax - 1) // (8 * vmax)
    mbx = (fw + 8 * hmax - 1) // (8 * hmax)
    rdr = _BitReader(data, pos)

    def correction(zz, k):
        # refinement bit for an already-significant coefficient: 1
        # moves the magnitude up by 1<<al toward the sign
        if rdr.read_bit():
            zz[k] += (1 << al) if zz[k] >= 0 else -(1 << al)

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise ValueError("DC progressive scan with Se != 0")
        order = []
        for cid, dct, _act in scan:
            ci = next(i for i, c in enumerate(comps) if c[0] == cid)
            _, hs, vs, _ = comps[ci]
            order.append(
                (ci, hs, vs, htabs.get((0, dct)) if ah == 0 else None)
            )
        prev_dc = [0] * len(comps)

        def dc_block(zz, ci, dc_tab):
            if ah == 0:
                size = _huff_decode(rdr, dc_tab)
                prev_dc[ci] += _extend(rdr.read_bits(size), size)
                zz[0] = prev_dc[ci] << al
            else:
                zz[0] += rdr.read_bit() << al

        if len(scan) > 1:  # interleaved MCU order over the padded grid
            for mcu in range(mby * mbx):
                my, mx = divmod(mcu, mbx)
                for ci, hs, vs, dc_tab in order:
                    for dy in range(vs):
                        for dx in range(hs):
                            dc_block(
                                coefs[ci][my * vs + dy, mx * hs + dx],
                                ci,
                                dc_tab,
                            )
        else:
            ci, hs, vs, dc_tab = order[0]
            nby, nbx = _comp_block_grid(fh, fw, hs, vs, hmax, vmax)
            for by in range(nby):
                for bx in range(nbx):
                    dc_block(coefs[ci][by, bx], ci, dc_tab)
    else:  # AC scan: single component, true block grid
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cid, _dct, act = scan[0]
        ci = next(i for i, c in enumerate(comps) if c[0] == cid)
        _, hs, vs, _ = comps[ci]
        ac_tab = htabs[(1, act)]
        nby, nbx = _comp_block_grid(fh, fw, hs, vs, hmax, vmax)
        eobrun = 0

        def ac_first_block(zz):
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                sym = _huff_decode(rdr, ac_tab)
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rdr.read_bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflows progressive band")
                zz[k] = _extend(rdr.read_bits(s), s) << al
                k += 1

        def ac_refine_block(zz):
            nonlocal eobrun
            if eobrun > 0:
                for k in range(ss, se + 1):
                    if zz[k]:
                        correction(zz, k)
                eobrun -= 1
                return
            k = ss
            while k <= se:
                sym = _huff_decode(rdr, ac_tab)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rdr.read_bits(r)
                        break
                    # ZRL: r stays 15 -> skip 16 insignificant slots
                else:
                    if s != 1:
                        raise ValueError(
                            "refinement scan symbol with size != 1"
                        )
                    newval = _extend(rdr.read_bits(1), 1) << al
                # advance over r insignificant positions, correcting
                # significant ones along the way
                while k <= se:
                    if zz[k]:
                        correction(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError(
                            "AC run overflows progressive band"
                        )
                    zz[k] = newval
                k += 1
            if eobrun > 0:
                # this block is the first of the EOB run: its remaining
                # significant coefficients still carry correction bits
                while k <= se:
                    if zz[k]:
                        correction(zz, k)
                    k += 1
                eobrun -= 1

        block = ac_first_block if ah == 0 else ac_refine_block
        for by in range(nby):
            for bx in range(nbx):
                block(coefs[ci][by, bx])

    # the scan's entropy data ends at the next marker
    if rdr.marker is not None:
        return rdr.pos - 2
    p = rdr.pos
    try:
        while not (data[p] == 0xFF and data[p + 1] != 0x00):
            p += 1
    except IndexError:
        raise ValueError(
            "JPEG: truncated stream — no marker after scan data"
        ) from None
    return p


def _render_progressive(frame, coefs, qtabs):
    """Dequantize + IDCT the accumulated coefficient grids and
    assemble the RGB image (same math as the baseline path)."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = []
    for grid, (_, hs, vs, qid) in zip(coefs, comps):
        qt = qtabs[qid].reshape(-1)
        nby, nbx, _ = grid.shape
        deq = np.zeros((nby, nbx, 64), dtype=np.float64)
        deq[:, :, _ZZ] = grid * qt[_ZZ]
        blocks = deq.reshape(nby, nbx, 8, 8)
        pix = np.einsum("ux,byuv,vw->byxw", _T, blocks, _T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


__all__ = ["encode_jpeg", "decode_jpeg_bytes", "QUANT_LUMA", "QUANT_CHROMA"]
