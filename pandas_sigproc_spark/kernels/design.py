"""IIR filter design in pure NumPy.

Implements the designs the reference obtains from SciPy / hand-coded math:

- Butterworth low/high/band-pass/stop (used by ``filt_butter``,
  reference ``extension.py:452-497``) via the textbook zpk pipeline:
  analog prototype -> frequency transform -> bilinear transform.
- SAE J211 CFC filter coefficients (``extension.py:516-524`` computes these
  in closed form; same published standard formulas re-derived here).
- IEC 1672 A-weighting analog prototype + bilinear digitization
  (reference ``tools.py:257-301``; the pole frequencies f1..f4 and the
  1000 Hz normalization constant are published in the IEC standard).

All formulas are standard DSP-textbook material (Oppenheim & Schafer;
Parks & Burrus) — nothing here is translated from the reference's code.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# zpk helpers
# ---------------------------------------------------------------------------

def _buttap(order: int):
    """Analog Butterworth lowpass prototype (cutoff 1 rad/s) as (z, p, k).

    Poles are equally spaced on the left half of the unit circle:
    ``p_m = exp(j*pi*(2m + n - 1) / (2n))`` for ``m = 1..n``.
    """
    if order < 1 or int(order) != order:
        raise ValueError(f"order must be a positive integer, got {order!r}")
    n = int(order)
    m = np.arange(1, n + 1)
    theta = np.pi * (2.0 * m + n - 1.0) / (2.0 * n)
    p = np.exp(1j * theta)
    # Force exact conjugate symmetry (kills 1e-16 imaginary dust in poly()).
    p = 0.5 * (p + np.conj(p[::-1]))
    z = np.array([], dtype=complex)
    k = 1.0
    return z, p, k


def _relative_degree(z: np.ndarray, p: np.ndarray) -> int:
    d = len(p) - len(z)
    if d < 0:
        raise ValueError("filter must have at least as many poles as zeros")
    return d


def _lp2lp_zpk(z, p, k, wo):
    deg = _relative_degree(z, p)
    return z * wo, p * wo, k * wo ** deg


def _lp2hp_zpk(z, p, k, wo):
    deg = _relative_degree(z, p)
    z_hp = wo / z if len(z) else np.array([], dtype=complex)
    p_hp = wo / p
    z_hp = np.append(z_hp, np.zeros(deg, dtype=complex))
    k_hp = k * float(np.real(np.prod(-z) / np.prod(-p)))
    return z_hp, p_hp, k_hp


def _lp2bp_zpk(z, p, k, wo, bw):
    deg = _relative_degree(z, p)
    z_lp = z * (bw / 2.0)
    p_lp = p * (bw / 2.0)
    z_bp = np.concatenate(
        [z_lp + np.sqrt(z_lp ** 2 - wo ** 2), z_lp - np.sqrt(z_lp ** 2 - wo ** 2)]
    )
    p_bp = np.concatenate(
        [p_lp + np.sqrt(p_lp ** 2 - wo ** 2), p_lp - np.sqrt(p_lp ** 2 - wo ** 2)]
    )
    z_bp = np.append(z_bp, np.zeros(deg, dtype=complex))
    k_bp = k * bw ** deg
    return z_bp, p_bp, k_bp


def _lp2bs_zpk(z, p, k, wo, bw):
    deg = _relative_degree(z, p)
    z_hp = (bw / 2.0) / z if len(z) else np.array([], dtype=complex)
    p_hp = (bw / 2.0) / p
    z_bs = np.concatenate(
        [z_hp + np.sqrt(z_hp ** 2 - wo ** 2), z_hp - np.sqrt(z_hp ** 2 - wo ** 2)]
    )
    p_bs = np.concatenate(
        [p_hp + np.sqrt(p_hp ** 2 - wo ** 2), p_hp - np.sqrt(p_hp ** 2 - wo ** 2)]
    )
    # Degree-matching zeros land at +/- j*wo for a bandstop.
    z_bs = np.append(z_bs, np.full(deg, 1j * wo, dtype=complex))
    z_bs = np.append(z_bs, np.full(deg, -1j * wo, dtype=complex))
    k_bs = k * float(np.real(np.prod(-z) / np.prod(-p)))
    return z_bs, p_bs, k_bs


def _bilinear_zpk(z, p, k, fs):
    deg = _relative_degree(z, p)
    fs2 = 2.0 * fs
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    z_d = np.append(z_d, -np.ones(deg, dtype=complex))
    k_d = k * float(np.real(np.prod(fs2 - z) / np.prod(fs2 - p)))
    return z_d, p_d, k_d


def _zpk2tf(z, p, k):
    b = np.atleast_1d(k * np.poly(z)) if len(z) else np.atleast_1d(np.array([k]))
    a = np.atleast_1d(np.poly(p))
    return np.real(b).astype(np.float64), np.real(a).astype(np.float64)


# ---------------------------------------------------------------------------
# Public designs
# ---------------------------------------------------------------------------

def butter(order: int, wn, btype: str = "lowpass"):
    """Digital Butterworth design; returns transfer-function ``(b, a)``.

    ``wn`` is the cutoff normalized by Nyquist (0 < wn < 1), matching the
    call site in the reference (``extension.py:477, 486``).  ``btype`` in
    lowpass/highpass/bandpass/bandstop.
    """
    btype = btype.lower()
    aliases = {
        "low": "lowpass",
        "high": "highpass",
        "band": "bandpass",
        "stop": "bandstop",
        "bands": "bandstop",
    }
    btype = aliases.get(btype, btype)
    wn = np.atleast_1d(np.asarray(wn, dtype=np.float64))
    if np.any(wn <= 0) or np.any(wn >= 1):
        raise ValueError("normalized cutoff must be in (0, 1)")

    z, p, k = _buttap(order)
    fs = 2.0
    warped = 2.0 * fs * np.tan(np.pi * wn / fs)

    if btype in ("lowpass", "highpass"):
        if wn.size != 1:
            raise ValueError(f"{btype} needs a scalar cutoff")
        if btype == "lowpass":
            z, p, k = _lp2lp_zpk(z, p, k, warped[0])
        else:
            z, p, k = _lp2hp_zpk(z, p, k, warped[0])
    elif btype in ("bandpass", "bandstop"):
        if wn.size != 2:
            raise ValueError(f"{btype} needs a [low, high] cutoff pair")
        bw = warped[1] - warped[0]
        wo = math.sqrt(warped[0] * warped[1])
        if btype == "bandpass":
            z, p, k = _lp2bp_zpk(z, p, k, wo, bw)
        else:
            z, p, k = _lp2bs_zpk(z, p, k, wo, bw)
    else:
        raise ValueError(f"unknown btype {btype!r}")

    z, p, k = _bilinear_zpk(z, p, k, fs)
    return _zpk2tf(z, p, k)


def cfc_coefficients(cfc: float, samplerate: float):
    """SAE J211 Channel Frequency Class 2nd-order coefficients -> (b, a).

    The published standard defines a 2-pole Butterworth-style filter from
    the CFC value and the sample interval; the reference computes the same
    closed form at ``extension.py:516-524`` and feeds it to ``filtfilt``
    (zero-phase, so the effective response is 4-pole per the standard).
    """
    dt = 1.0 / samplerate
    wd = 2.0 * math.pi * cfc * 2.0775
    wa = math.tan(wd * dt / 2.0)
    denom = 1.0 + math.sqrt(2.0) * wa + wa * wa
    a0 = wa * wa / denom
    b = np.array([a0, 2.0 * a0, a0], dtype=np.float64)
    # Recurrence y[n] = b·x - a1*y[n-1] - a2*y[n-2] with a = [1, a1, a2]:
    a1 = (2.0 * (wa * wa - 1.0)) / denom
    a2 = (1.0 - math.sqrt(2.0) * wa + wa * wa) / denom
    a = np.array([1.0, a1, a2], dtype=np.float64)
    return b, a


def bilinear_tf(b_analog, a_analog, fs: float):
    """Bilinear transform of an analog transfer function (s -> z).

    Equivalent of the reference's ``scipy.signal.bilinear`` call at
    ``tools.py:301``: roots -> map via ``z = (2fs + s)/(2fs - s)`` ->
    re-polynomialize.
    """
    b_analog = np.atleast_1d(np.asarray(b_analog, dtype=np.float64))
    a_analog = np.atleast_1d(np.asarray(a_analog, dtype=np.float64))
    # Strip leading zeros so np.roots sees the true polynomial degree.
    b_trim = np.trim_zeros(b_analog, "f")
    a_trim = np.trim_zeros(a_analog, "f")
    if len(b_trim) == 0:
        raise ValueError("numerator is identically zero")
    z = np.roots(b_trim) if len(b_trim) > 1 else np.array([], dtype=complex)
    p = np.roots(a_trim) if len(a_trim) > 1 else np.array([], dtype=complex)
    k = float(b_trim[0] / a_trim[0])
    z_d, p_d, k_d = _bilinear_zpk(z, p, k, fs)
    return _zpk2tf(z_d, p_d, k_d)


def a_weighting(fs: float):
    """IEC 1672 A-weighting digital filter (b, a) at sample rate ``fs``.

    Analog prototype per the standard: two double poles at f1 and f4, single
    poles at f2 and f3, a quadruple zero at s=0, and gain normalized to
    0 dB at 1 kHz (A1000 = 1.9997 dB).  Matches the design the reference
    builds at ``tools.py:284-301``; applied *causally* with ``lfilter``
    (phase-distorting by design, ``extension.py:563``).
    """
    f1 = 20.598997
    f2 = 107.65265
    f3 = 737.86223
    f4 = 12194.217
    a1000 = 1.9997
    two_pi = 2.0 * math.pi

    # Zeros: s^4 at the origin.  Poles: double at -2πf1 and -2πf4, single at
    # -2πf2 and -2πf3.  Gain sets |H(j·2π·1000)| ≈ 10^(A1000/20).
    z = np.zeros(4, dtype=complex)
    p = np.array(
        [
            -two_pi * f4,
            -two_pi * f4,
            -two_pi * f1,
            -two_pi * f1,
            -two_pi * f3,
            -two_pi * f2,
        ],
        dtype=complex,
    )
    k = (two_pi * f4) ** 2 * (10.0 ** (a1000 / 20.0))
    z_d, p_d, k_d = _bilinear_zpk(z, p, k, fs)
    return _zpk2tf(z_d, p_d, k_d)
