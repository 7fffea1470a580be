"""1-D interpolation kernels (pure NumPy).

Covers the ``kind`` surface the reference exposes through
``scipy.interpolate.interp1d`` (``extension.py:819-851, 986-996``):
linear / slinear, nearest, nearest-up, previous, next, zero
(piecewise-constant 0th-order spline) and cubic (not-a-knot cubic spline —
the same boundary condition SciPy's spline-based kinds use).  ``quadratic``
is intentionally unsupported (documented deviation; it is an unusual
half-way spline with no analytic anchor — callers get a clear error).

Out-of-range targets raise ``ValueError`` like SciPy with
``bounds_error=True`` (the reference inherits that default).
"""

from __future__ import annotations

import numpy as np

_EPS = np.finfo(np.float64).eps


def _check_bounds(x: np.ndarray, x2: np.ndarray):
    if len(x) < 2:
        raise ValueError("need at least 2 sample points to interpolate")
    if np.any(x2 < x[0]) or np.any(x2 > x[-1]):
        raise ValueError("a value in x_new is out of the interpolation range")


def _cubic_spline_coeffs(x: np.ndarray, y: np.ndarray):
    """Not-a-knot cubic spline second-derivative solve (Thomas + fold-in).

    Returns the second derivatives ``m`` at the knots.  For n < 4 falls back
    to the natural boundary (matches the spline being unconstrained there).
    """
    n = len(x)
    h = np.diff(x)
    if np.any(h <= 0):
        raise ValueError("x must be strictly increasing for spline interpolation")
    if n == 2:
        return np.zeros(2)
    if n == 3:
        # Single interior equation with natural ends.
        m = np.zeros(3)
        rhs = 6.0 * ((y[2] - y[1]) / h[1] - (y[1] - y[0]) / h[0])
        m[1] = rhs / (2.0 * (h[0] + h[1]))
        return m

    # Build the full (n x n) tridiagonal-with-corners system for m:
    #   interior i: h[i-1] m[i-1] + 2(h[i-1]+h[i]) m[i] + h[i] m[i+1] = rhs_i
    #   not-a-knot: m[0](h[1]) - m[1](h[0]+h[1]) + m[2](h[0]) = 0  (and
    #   symmetric at the right end) — third derivative continuity at the
    #   second and penultimate knots.
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2.0 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 6.0 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    A[0, 0] = h[1]
    A[0, 1] = -(h[0] + h[1])
    A[0, 2] = h[0]
    A[n - 1, n - 3] = h[n - 2]
    A[n - 1, n - 2] = -(h[n - 3] + h[n - 2])
    A[n - 1, n - 1] = h[n - 3]
    return np.linalg.solve(A, rhs)


def interp1d(x: np.ndarray, y: np.ndarray, x2, kind: str = "linear") -> np.ndarray:
    """Interpolate ``(x, y)`` samples onto targets ``x2``."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    _check_bounds(x, x2)
    kind = kind.lower()

    if kind in ("linear", "slinear"):
        return np.interp(x2, x, y)

    if kind in ("nearest", "nearest-up"):
        # Midpoint decision: 'nearest' rounds half-intervals down,
        # 'nearest-up' rounds them up.
        mids = 0.5 * (x[:-1] + x[1:])
        side = "right" if kind == "nearest-up" else "left"
        idx = np.searchsorted(mids, x2, side=side)
        return y[idx]

    if kind in ("previous", "zero"):
        # 'zero' is the 0th-order spline: value of the left knot; exact
        # knots map to their own value, like 'previous'.
        idx = np.searchsorted(x, x2, side="right") - 1
        idx = np.clip(idx, 0, len(x) - 1)
        return y[idx]

    if kind == "next":
        idx = np.searchsorted(x, x2, side="left")
        idx = np.clip(idx, 0, len(x) - 1)
        return y[idx]

    if kind == "cubic":
        m = _cubic_spline_coeffs(x, y)
        h = np.diff(x)
        idx = np.clip(np.searchsorted(x, x2, side="right") - 1, 0, len(x) - 2)
        hi = h[idx]
        d0 = x2 - x[idx]
        d1 = x[idx + 1] - x2
        return (
            m[idx] * d1 ** 3 / (6.0 * hi)
            + m[idx + 1] * d0 ** 3 / (6.0 * hi)
            + (y[idx] / hi - m[idx] * hi / 6.0) * d1
            + (y[idx + 1] / hi - m[idx + 1] * hi / 6.0) * d0
        )

    if kind == "quadratic":
        raise NotImplementedError(
            "kind='quadratic' is not supported by this engine (documented "
            "deviation from the reference's scipy.interpolate surface)"
        )
    raise ValueError(f"unknown interpolation kind {kind!r}")


def interp1d_loglog(x: np.ndarray, y: np.ndarray, x2) -> np.ndarray:
    """Linear interpolation in log10-log10 space, then de-log.

    Equivalent of the reference's ``interp1d_log`` (``extension.py:201-230``)
    — the standard way to interpolate sparse PSD specs.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    lx, ly, lx2 = np.log10(x), np.log10(y), np.log10(x2)
    _check_bounds(lx, lx2)
    return 10.0 ** np.interp(lx2, lx, ly)
