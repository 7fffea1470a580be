"""Batched IIR execution: filter MANY equal-length channels at once.

``lfilter``/``filtfilt`` in :mod:`.iir` are 1-D.  At scale the dominant
cost is not the math but per-channel overhead (Arrow group dispatch, FFT
setup, Python call overhead) — 1500 channels of 700 samples each cost far
more as 1500 kernel calls than as one (1500, 700) matrix op.  This module
vectorizes the same algorithms across a leading batch axis:

- ``lfilter_batch(b, a, X)`` — zero-state response for ``X[batch, time]``:
  FIR part via one batched ``rfft``; AR part via one batched convolution
  with the shared truncated impulse response (same coefficients for the
  whole batch — the equal-samplerate case, which is exactly when batching
  applies).
- ``filtfilt_batch(b, a, X)`` — SciPy-default zero-phase: batched odd
  padding, ``zi * x0`` initial state handled by superposition with a
  zero-input response computed once per unit state and scaled per row
  (linearity), forward and backward.

Numerical parity with the 1-D kernels is asserted in tests (rtol 1e-9).
"""

from __future__ import annotations

import numpy as np

from pandas_sigproc_spark.kernels.iir import (
    _LOOP_CUTOVER,
    _ar_impulse_response,
    _lfilter_loop,
    _normalize_ba,
    lfilter_zi,
)


def _lfilter_loop_batch(b, a, X: np.ndarray, Zi: np.ndarray | None = None):
    """DF2T recursion vectorized across the batch axis.

    The same per-sample difference equation as ``iir._lfilter_loop``, with
    every scalar op replaced by the elementwise op over the batch column —
    IEEE semantics are identical per element, so each row's output is
    BIT-IDENTICAL to running the 1-D loop on that row.  This is what makes
    bucketed execution exactly equal (not merely rtol-close) to
    per-channel execution for short channels, and what lets the
    production-leg DuckDB oracles (oracle_prod.py) replay bucketed filter
    queries bit-for-bit.
    """
    nb, nlen = X.shape
    n = max(len(a), len(b))
    bp = np.zeros(n)
    ap = np.zeros(n)
    bp[: len(b)] = b
    ap[: len(a)] = a
    Z = (
        np.zeros((nb, max(n - 1, 1)))
        if Zi is None
        else np.asarray(Zi, dtype=np.float64).copy()
    )
    Y = np.empty_like(X)
    if n == 1:
        Y[:] = bp[0] * X
        return (Y, Z) if Zi is not None else Y
    for i in range(nlen):
        x = X[:, i]
        y = bp[0] * x + Z[:, 0]
        for j in range(n - 2):
            Z[:, j] = bp[j + 1] * x + Z[:, j + 1] - ap[j + 1] * y
        Z[:, n - 2] = bp[n - 1] * x - ap[n - 1] * y
        Y[:, i] = y
    return (Y, Z) if Zi is not None else Y


def _fft_convolve_batch(X: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Row-wise convolution of X[batch, n] with 1-D kernel h (full, cropped
    to n)."""
    n = X.shape[-1]
    nfull = n + len(h) - 1
    nfft = 1 << (nfull - 1).bit_length()
    Xf = np.fft.rfft(X, nfft, axis=-1)
    Hf = np.fft.rfft(h, nfft)
    return np.fft.irfft(Xf * Hf, nfft, axis=-1)[..., :n]


def lfilter_batch(b, a, X: np.ndarray) -> np.ndarray:
    """Zero-state IIR/FIR response along the last axis of ``X[batch, time]``."""
    b, a = _normalize_ba(b, a)
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 1:
        X = X[None, :]
    # Mirror the 1-D kernel's path-selection rule EXACTLY (iir.lfilter:
    # len <= _LOOP_CUTOVER or order > 16 -> exact recursion): which
    # numerics serve a request must be a pure function of the request,
    # never of how channels happened to be grouped — so a channel filtered
    # inside a bucket yields the same bits as the same channel alone.
    n_taps = max(len(a), len(b))
    if X.shape[-1] <= _LOOP_CUTOVER or n_taps > 16:
        return _lfilter_loop_batch(b, a, X)
    if len(a) == 1:
        return _fft_convolve_batch(X, b)
    h = _ar_impulse_response(a, max_len=X.shape[-1])
    if h is None:
        # Degenerate tf-form design (see kernels.iir._ar_ir_fft): exact
        # per-row recursion, matching scipy tf-form numerics.
        with np.errstate(over="ignore", invalid="ignore"):
            return np.stack([_lfilter_loop(b, a, row) for row in X])
    F = _fft_convolve_batch(X, b)
    # Taps beyond the row length cannot reach the cropped output (see
    # kernels.iir.lfilter) — cap h so short-channel batches through
    # slow-decay filters stay proportional to the data, not the IR.
    return _fft_convolve_batch(F, h[: X.shape[-1]])


def _pad_stack(arrays: list[np.ndarray]) -> np.ndarray:
    n = max(len(a) for a in arrays)
    X = np.zeros((len(arrays), n))
    for i, a in enumerate(arrays):
        X[i, : len(a)] = a
    return X


def lfilter_batch_ragged(b, a, arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Causal filter for UNEQUAL-length channels in one call.

    Short channels (the 1-D loop-path rule: len <= _LOOP_CUTOVER, or
    order > 16) are right-zero-padded into ONE vectorized recursion —
    rows never interact in the elementwise DF2T step, so each row's
    valid prefix is bit-identical to filtering it alone, regardless of
    which channels share the batch.  Long channels group by exact length
    through the FFT batch path (nfft stays a function of the channel's
    own length, never of its neighbours).  This is what lets the
    bucketed operators group by samplerate alone instead of
    (length, samplerate) — one batched kernel per bucket instead of one
    per distinct length.
    """
    bn, an = _normalize_ba(b, a)
    ntaps = max(len(bn), len(an))
    out: list = [None] * len(arrays)
    shorts = [
        i for i, x in enumerate(arrays)
        if len(x) <= _LOOP_CUTOVER or ntaps > 16
    ]
    if shorts:
        X = _pad_stack([np.asarray(arrays[i], np.float64) for i in shorts])
        Y = _lfilter_loop_batch(bn, an, X)
        for r, i in enumerate(shorts):
            out[i] = Y[r, : len(arrays[i])].copy()
    by_len: dict[int, list[int]] = {}
    for i, x in enumerate(arrays):
        if out[i] is None:
            by_len.setdefault(len(x), []).append(i)
    for _n, idxs in by_len.items():
        Y = lfilter_batch(b, a, np.stack([arrays[i] for i in idxs]))
        for r, i in enumerate(idxs):
            out[i] = Y[r]
    return out


def filtfilt_batch_ragged(b, a, arrays: list[np.ndarray]) -> list[np.ndarray]:
    """Zero-phase filtering for UNEQUAL-length channels in one call —
    same path rules and bit-exactness contract as lfilter_batch_ragged
    (the short path replays iir.filtfilt's two seeded loop passes row
    by row on a padded matrix)."""
    bn, an = _normalize_ba(b, a)
    ntaps = max(len(bn), len(an))
    padlen = 3 * ntaps
    out: list = [None] * len(arrays)
    shorts = [
        i for i, x in enumerate(arrays)
        if len(x) + 2 * padlen <= _LOOP_CUTOVER or ntaps > 16
    ]
    if shorts:
        zi = lfilter_zi(bn, an)
        exts = []
        for i in shorts:
            x = np.asarray(arrays[i], np.float64)
            if len(x) <= padlen:
                raise ValueError(
                    f"input length ({len(x)}) must exceed padlen ({padlen}) "
                    "for filtfilt"
                )
            front = 2.0 * x[0] - x[padlen:0:-1]
            back = 2.0 * x[-1] - x[-2: -padlen - 2: -1]
            exts.append(np.concatenate([front, x, back]))
        X = _pad_stack(exts)
        Y, _ = _lfilter_loop_batch(bn, an, X, Zi=zi[None, :] * X[:, :1])
        R = np.zeros_like(Y)
        for r, e in enumerate(exts):
            m = len(e)
            R[r, :m] = Y[r, :m][::-1]
        Y2, _ = _lfilter_loop_batch(bn, an, R, Zi=zi[None, :] * R[:, :1])
        for r, i in enumerate(shorts):
            m = len(exts[r])
            yr = Y2[r, :m][::-1]
            out[i] = yr[padlen: m - padlen].copy()
    by_len: dict[int, list[int]] = {}
    for i, x in enumerate(arrays):
        if out[i] is None:
            by_len.setdefault(len(x), []).append(i)
    for _n, idxs in by_len.items():
        Y = filtfilt_batch(b, a, np.stack([arrays[i] for i in idxs]))
        for r, i in enumerate(idxs):
            out[i] = Y[r]
    return out


def _unit_zir(b, a, zi_unit: np.ndarray, length: int) -> np.ndarray:
    """Zero-input response for initial state ``zi_unit`` over ``length``."""
    y, _ = _lfilter_loop(b, a, np.zeros(length), zi=zi_unit.copy())
    return y


def filtfilt_batch(b, a, X: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering of every row of ``X``.

    Matches ``kernels.iir.filtfilt`` row-for-row: odd extension of
    ``3 * max(len(a), len(b))`` samples, ``lfilter_zi``-scaled initial
    conditions per pass.  The initial-state correction uses linearity:
    the zero-input response for the unit state vector ``zi`` is computed
    once (a short sequential run at the filter's decay length) and scaled
    by each row's first sample.
    """
    b, a = _normalize_ba(b, a)
    X = np.asarray(X, dtype=np.float64)
    squeeze = X.ndim == 1
    if squeeze:
        X = X[None, :]
    nb, n = X.shape
    ntaps = max(len(a), len(b))
    padlen = 3 * ntaps
    if n <= padlen:
        raise ValueError(
            f"input length ({n}) must exceed padlen ({padlen}) for filtfilt"
        )

    front = 2.0 * X[:, :1] - X[:, padlen:0:-1]
    back = 2.0 * X[:, -1:] - X[:, -2 : -padlen - 2 : -1]
    ext = np.concatenate([front, X, back], axis=1)
    next_ = ext.shape[1]

    zi = lfilter_zi(b, a)
    if next_ <= _LOOP_CUTOVER or ntaps > 16:
        # Exact-recursion path, mirroring iir.filtfilt's two lfilter loop
        # passes bit-for-bit per row (zi seeded directly, no
        # superposition) — see _lfilter_loop_batch.
        Y, _ = _lfilter_loop_batch(b, a, ext, Zi=zi[None, :] * ext[:, :1])
        Yr = np.ascontiguousarray(Y[:, ::-1])
        Y, _ = _lfilter_loop_batch(b, a, Yr, Zi=zi[None, :] * Yr[:, :1])
        out = Y[:, ::-1][:, padlen:-padlen]
        return out[0] if squeeze else out
    if len(a) > 1:
        h = _ar_impulse_response(a, max_len=next_)
        # Degenerate designs (h is None) have no finite decay length;
        # the correction must then span the whole extended signal.
        h_len = len(h) if h is not None else next_
    else:
        h_len = ntaps
    zir_len = min(next_, h_len)
    zir_unit = _unit_zir(b, a, zi, zir_len)

    def one_pass(M: np.ndarray) -> np.ndarray:
        Y = lfilter_batch(b, a, M)
        Y[:, :zir_len] += M[:, :1] * zir_unit[None, :]
        return Y

    Y = one_pass(ext)
    Y = one_pass(Y[:, ::-1])[:, ::-1]
    out = Y[:, padlen:-padlen]
    return out[0] if squeeze else out
