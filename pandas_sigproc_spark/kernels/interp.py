"""1-D interpolation kernels (pure NumPy).

Covers the full ``kind`` surface the reference exposes through
``scipy.interpolate.interp1d`` (``extension.py:819-851, 986-996``):
linear / slinear, nearest, nearest-up, previous, next, zero
(piecewise-constant 0th-order spline), quadratic (interpolating quadratic
B-spline on midpoint knots, SciPy's default knot choice for even-degree
splines) and cubic (not-a-knot cubic spline — SciPy's boundary condition).

Both spline solves are O(n) banded (Thomas algorithm): a channel is one
Arrow batch inside ``applyInPandas``, so a dense n x n collocation matrix
would be O(n^2) memory and O(n^3) time on a million-sample channel — the
banded form keeps huge channels linear in time and memory.

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


def _solve_tridiag(dl: np.ndarray, d: np.ndarray, du: np.ndarray, b: np.ndarray):
    """Tridiagonal solve by vectorized odd-even cyclic reduction.

    ``dl``/``d``/``du`` are the sub/main/super diagonals (dl[0] and du[-1]
    ignored).  O(n) total work spread over O(log n) fully-NumPy passes — a
    Python-level Thomas loop would cost ~1 s per million knots inside the
    Arrow worker; this stays at memory bandwidth.
    """
    a = np.asarray(dl, dtype=np.float64).copy()
    bb = np.asarray(d, dtype=np.float64).copy()
    c = np.asarray(du, dtype=np.float64).copy()
    r = np.asarray(b, dtype=np.float64).copy()
    a[0] = 0.0
    c[-1] = 0.0
    return _cyclic_reduction(a, bb, c, r)


def _cyclic_reduction(a, b, c, r):
    n = len(b)
    if n == 1:
        return r / b
    if n == 2:
        det = b[0] * b[1] - c[0] * a[1]
        return np.array(
            [(r[0] * b[1] - c[0] * r[1]) / det, (b[0] * r[1] - a[1] * r[0]) / det]
        )
    # Ghost-pad one identity row on each side so every even row has both
    # neighbors; eliminate the odd rows, recurse on the even half.
    ap = np.concatenate(([0.0], a, [0.0]))
    bp = np.concatenate(([1.0], b, [1.0]))
    cp = np.concatenate(([0.0], c, [0.0]))
    rp = np.concatenate(([0.0], r, [0.0]))
    j = np.arange(1, n + 1, 2)  # padded positions of original even rows
    alpha = ap[j] / bp[j - 1]
    beta = cp[j] / bp[j + 1]
    nb = bp[j] - alpha * cp[j - 1] - beta * ap[j + 1]
    nr = rp[j] - alpha * rp[j - 1] - beta * rp[j + 1]
    na = -alpha * ap[j - 1]
    nc = -beta * cp[j + 1]
    x_even = _cyclic_reduction(na, nb, nc, nr)
    x = np.empty(n)
    x[0::2] = x_even
    xp = np.concatenate(([0.0], x, [0.0]))
    odd = np.arange(1, n, 2)
    x[odd] = (r[odd] - a[odd] * xp[odd] - c[odd] * xp[odd + 2]) / b[odd]
    return x


def _cubic_spline_coeffs(x: np.ndarray, y: np.ndarray):
    """Not-a-knot cubic spline second-derivative solve, O(n) banded.

    Returns the second derivatives ``m`` at the knots.  For n < 4 falls back
    to the natural boundary (matches the spline being unconstrained there).

    Interior equations (second-derivative continuity):
      h[i-1] m[i-1] + 2(h[i-1]+h[i]) m[i] + h[i] m[i+1] = rhs_i .
    The not-a-knot conditions (third-derivative continuity at the second
    and penultimate knots)
      h[1] m[0] - (h[0]+h[1]) m[1] + h[0] m[2] = 0
    are *substituted into* the adjacent interior rows rather than kept as
    system rows: the substituted system over m[1..n-2] is strictly
    diagonally dominant (the boundary-row-as-equation form has a zero
    pivot on uniform grids, which a pivotless banded solver cannot take),
    and m[0], m[n-1] are recovered in closed form afterwards.
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

    dif = np.diff(y) / h
    r = 6.0 * (dif[1:] - dif[:-1])  # rhs for interior knots 1..n-2

    k = n - 2  # unknowns m[1..n-2]
    dl = np.zeros(k)
    d = np.zeros(k)
    du = np.zeros(k)
    rhs = r.copy()
    dl[1:] = h[1:-1]
    d[:] = 2.0 * (h[:-1] + h[1:])
    du[:-1] = h[1:-1]
    # Fold m[0] = ((h0+h1) m[1] - h0 m[2]) / h1 into interior row 1:
    d[0] = (h[0] + h[1]) * (h[0] + 2.0 * h[1]) / h[1]
    du[0] = (h[1] * h[1] - h[0] * h[0]) / h[1]
    # Fold m[n-1] = ((h[-2]+h[-1]) m[n-2] - h[-1] m[n-3]) / h[-2] into
    # interior row n-2:
    d[-1] = (h[-2] + h[-1]) * (2.0 * h[-2] + h[-1]) / h[-2]
    dl[-1] = (h[-2] * h[-2] - h[-1] * h[-1]) / h[-2]

    m = np.empty(n)
    m[1:-1] = _solve_tridiag(dl, d, du, rhs)
    m[0] = ((h[0] + h[1]) * m[1] - h[0] * m[2]) / h[1]
    m[-1] = ((h[-2] + h[-1]) * m[-2] - h[-1] * m[-3]) / h[-2]
    return m


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
        # Explicit cubes, not ** 3: numpy's pow is neither x*x*x nor libm
        # pow bit-for-bit, and plain multiplies are both faster and
        # deterministically replayable (the SQL oracle mirrors them).
        d0c = d0 * d0 * d0
        d1c = d1 * d1 * d1
        return (
            m[idx] * d1c / (6.0 * hi)
            + m[idx + 1] * d0c / (6.0 * hi)
            + (y[idx] / hi - m[idx] * hi / 6.0) * d1
            + (y[idx + 1] / hi - m[idx + 1] * hi / 6.0) * d0
        )

    if kind == "quadratic":
        return _quadratic_eval(x, y, x2)
    raise ValueError(f"unknown interpolation kind {kind!r}")


def _quad_basis(t: np.ndarray, u: np.ndarray, span: np.ndarray):
    """The three nonzero degree-2 B-spline basis values at each ``u``.

    ``span[i]`` is the knot interval index m with t[m] <= u[i] < t[m+1];
    returns (N_{m-2}, N_{m-1}, N_m) per the de Boor recursion.  Zero-width
    spans (clamped end knots) divide to 0 via the where-guards.
    """

    def frac(num, den):
        return np.where(den > 0, num / np.where(den > 0, den, 1.0), 0.0)

    tm, tm1, tm2 = t[span], t[span + 1], t[span + 2]
    tm_1 = t[span - 1]
    # degree 1 on the containing span
    n1_left = frac(tm1 - u, tm1 - tm)  # N_{m-1,1}
    n1_right = frac(u - tm, tm1 - tm)  # N_{m,1}
    # degree 2
    b0 = frac(tm1 - u, tm1 - tm_1) * n1_left  # N_{m-2,2}
    b1 = frac(u - tm_1, tm1 - tm_1) * n1_left + frac(tm2 - u, tm2 - tm) * n1_right
    b2 = frac(u - tm, tm2 - tm) * n1_right  # N_{m,2}
    return b0, b1, b2


def _quadratic_eval(x: np.ndarray, y: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Interpolating quadratic spline (SciPy ``kind='quadratic'`` surface).

    B-spline of degree 2 on the clamped knot vector with interior knots at
    the data midpoints (the standard knot choice for even-degree
    interpolation, as used by ``scipy.interpolate.make_interp_spline``):
    ``t = [x0 x0 x0, (x1+x2)/2 … (x_{n-3}+x_{n-2})/2, xn xn xn]``.  The
    collocation system is tridiagonal (each data point sees at most three
    basis functions, and the clamped ends pin the first/last coefficients),
    so the solve is the same O(n) banded path as the cubic kind.
    """
    n = len(x)
    if n < 3:
        # Two points under-determine a quadratic; fall back to the line
        # through them (what the unique degree<=1 interpolant is).
        return np.interp(x2, x, y)
    h = np.diff(x)
    if np.any(h <= 0):
        raise ValueError("x must be strictly increasing for spline interpolation")
    mids = 0.5 * (x[:-1] + x[1:])
    t = np.concatenate((np.repeat(x[0], 3), mids[1:-1], np.repeat(x[-1], 3)))
    n_basis = len(t) - 3  # == n

    # Collocation rows: basis values at the data sites.
    span = np.clip(np.searchsorted(t, x, side="right") - 1, 2, n_basis - 1)
    b0, b1, b2 = _quad_basis(t, x, span)
    cols = np.stack((span - 2, span - 1, span))  # (3, n)
    vals = np.stack((b0, b1, b2))
    dl = np.zeros(n)
    d = np.zeros(n)
    du = np.zeros(n)
    rows = np.broadcast_to(np.arange(n), (3, n))
    off = cols - rows
    # Entries outside the tridiagonal band must be numerically zero (they
    # only arise at the clamped ends where the basis vanishes).
    outside = (off < -1) | (off > 1)
    if np.any(np.abs(vals[outside]) > 1e-12):
        raise AssertionError("quadratic collocation fell outside the band")
    for o, diag in ((-1, dl), (0, d), (1, du)):
        sel = off == o
        np.add.at(diag, rows[sel], vals[sel])
    coef = _solve_tridiag(dl, d, du, y)

    # Evaluate at the targets.
    span2 = np.clip(np.searchsorted(t, x2, side="right") - 1, 2, n_basis - 1)
    e0, e1, e2 = _quad_basis(t, x2, span2)
    return coef[span2 - 2] * e0 + coef[span2 - 1] * e1 + coef[span2] * e2


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
