"""Shock response spectrum (SRS) via Smallwood's ramp-invariant recursion.

Computes, for each natural frequency on an octave-spaced grid, the peak
absolute acceleration of a single-degree-of-freedom oscillator driven by
the input record — the maximax SRS.  Coefficient formulas are from the
published Smallwood paper ("An Improved Recursive Formula for Calculating
Shock Response Spectra", Sandia; see also vibrationdata.com/ramp_invariant),
the same source the reference cites (``tools.py:315-317``).

Reference behavior being matched (``tools.py:304-376``,
``extension.py:627-662``):

- default grid 10 -> 1000 Hz at 1/12-octave steps (``tools.py:379-413``);
- damping ``zeta = 1 / (2 Q)``, default Q = 50;
- sample interval taken as ``mean(diff(time))``;
- per-frequency digital filter ``(b, a)`` applied causally; the reported
  envelope is ``max(max(y), |min(y)|)`` per frequency.

Unlike the reference's serial Python loop over frequencies
(``tools.py:371-374``), the Spark operator fans the frequency axis out
across the cluster (see operators/srs.py); this kernel vectorizes the
recursion across all requested frequencies at once so a single task
handles its whole frequency slice with NumPy-level work per time step.
"""

from __future__ import annotations

import numpy as np

from pandas_sigproc_spark.kernels.iir import lfilter


def build_freq_array(
    fn_start: float = 10.0, fn_end: float = 1000.0, oct_step_size: float = 1.0 / 12.0
) -> np.ndarray:
    """Octave-spaced natural-frequency grid.

    Multiplicative ladder ``f_{k+1} = f_k * 2^step`` from ``fn_start`` until
    the first point exceeding ``fn_end`` (inclusive of that point), matching
    the reference's loop-with-break construction (``tools.py:404-410``)
    including its quirk of keeping the first point past ``fn_end``.
    """
    out = [fn_start]
    f = fn_start
    limit = int(fn_end - fn_start)
    for _ in range(limit):
        f = f * 2.0 ** oct_step_size
        out.append(f)
        if f > fn_end:
            break
    return np.asarray(out, dtype=np.float64)


def smallwood_coefficients(fn_array: np.ndarray, dt: float, quality_factor: float):
    """Ramp-invariant SDOF filter coefficients for each natural frequency.

    Returns ``(b, a)`` arrays of shape (F, 3) with ``a[:, 0] == 1``.
    """
    fn_array = np.asarray(fn_array, dtype=np.float64)
    zeta = 1.0 / (2.0 * quality_factor)
    omega_n = 2.0 * np.pi * fn_array
    omega_d = omega_n * np.sqrt(1.0 - zeta ** 2)
    e = np.exp(-zeta * omega_n * dt)
    k = dt * omega_d
    c = e * np.cos(k)
    s = e * np.sin(k)
    s_over_k = s / k
    b = np.stack(
        [1.0 - s_over_k, 2.0 * (s_over_k - c), e ** 2 - s_over_k], axis=1
    )
    a = np.stack([np.ones_like(fn_array), -2.0 * c, e ** 2], axis=1)
    return b, a


def _sdof_responses_batch(accel: np.ndarray, b: np.ndarray, a: np.ndarray):
    """Peak +/- responses for all frequencies, vectorized across the F axis.

    Runs the order-2 recursion once over time with NumPy ops over the
    frequency dimension (direct form II transposed), so the Python-level
    loop is over samples only, shared by every frequency.
    """
    n = len(accel)
    nf = b.shape[0]
    z1 = np.zeros(nf)
    z2 = np.zeros(nf)
    pos = np.full(nf, -np.inf)
    neg = np.full(nf, np.inf)
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    a1, a2 = a[:, 1], a[:, 2]
    for i in range(n):
        x = accel[i]
        y = b0 * x + z1
        z1 = b1 * x + z2 - a1 * y
        z2 = b2 * x - a2 * y
        np.maximum(pos, y, out=pos)
        np.minimum(neg, y, out=neg)
    return pos, np.abs(neg)


def srs_multi(
    X: np.ndarray,
    dt: float,
    fn_array: np.ndarray,
    quality_factor: float = 50.0,
):
    """SRS for MANY equal-rate channels at once.

    ``X[channels, time]`` -> ``(pos[channels, F], abs_neg[channels, F])``.
    One Python-level loop over time with NumPy ops over the
    (channels x frequencies) plane — per-channel overhead vanishes, which
    is what makes bucketed execution (operators/srs.py) fast for fleets of
    short channels.
    """
    fn_array = np.asarray(fn_array, dtype=np.float64)
    b, a = smallwood_coefficients(fn_array, dt, quality_factor)
    nb, n = X.shape
    nf = len(fn_array)
    z1 = np.zeros((nb, nf))
    z2 = np.zeros((nb, nf))
    pos = np.full((nb, nf), -np.inf)
    neg = np.full((nb, nf), np.inf)
    b0, b1, b2 = b[:, 0], b[:, 1], b[:, 2]
    a1, a2 = a[:, 1], a[:, 2]
    for i in range(n):
        x = X[:, i : i + 1]
        y = b0 * x + z1
        z1 = b1 * x + z2 - a1 * y
        z2 = b2 * x - a2 * y
        np.maximum(pos, y, out=pos)
        np.minimum(neg, y, out=neg)
    return pos, np.abs(neg)


def srs(
    time: np.ndarray,
    accel: np.ndarray,
    fn_array: np.ndarray | None = None,
    quality_factor: float = 50.0,
    batch_frequencies: bool = True,
):
    """Maximax SRS: returns ``(pos_peaks, abs_neg_peaks)`` per frequency."""
    if fn_array is None:
        fn_array = build_freq_array()
    time = np.asarray(time, dtype=np.float64)
    accel = np.asarray(accel, dtype=np.float64)
    dt = float(np.mean(np.diff(time)))
    b, a = smallwood_coefficients(fn_array, dt, quality_factor)

    if batch_frequencies and len(fn_array) > 4:
        return _sdof_responses_batch(accel, b, a)

    pos = np.zeros(len(fn_array))
    neg = np.zeros(len(fn_array))
    for i in range(len(fn_array)):
        y = lfilter(b[i], a[i], accel)
        pos[i] = y.max()
        neg[i] = abs(y.min())
    return pos, neg
