"""Vectorized (NumPy) twins of the embedding tier's ordered array folds.

Catalyst higher-order functions (``aggregate``/``zip_with``/``transform``)
are CodegenFallback expressions: every element of every lambda is
evaluated by the interpreted expression walker, so a plane-dot fold over
a 64-wide vector costs ~2 orders of magnitude more than the same
arithmetic on an Arrow batch in NumPy (optimization guide §4.2 — hand
whole batches to vectorized native code, keep Spark for distribution and
shuffles).  The ANN/kmeans tier evaluates tens of millions of such
lambda steps per query at bench scale; these kernels run the identical
arithmetic batch-wise inside ``mapInPandas`` stages.

BIT-EXACTNESS CONTRACT (the reason these are not plain ``np.dot``):
every fold in the JVM tier is an *ordered left fold* —

    acc_0 = 0.0;  acc_{d+1} = acc_d + f(x_d, y_d)

with ``f`` a single correctly-rounded IEEE-754 double op (multiply,
squared difference).  The kernels below reproduce that exact sequence
per row with one vectorized ufunc step per dimension::

    acc += X[:, d] * Y[:, d]        # same multiply, same add, same order

so every output double is bit-identical to the JVM fold (and therefore
to the DuckDB oracle replay, which was proven bit-equal to the JVM
expressions in earlier rounds).  ``np.dot``/``einsum`` would use pairwise
summation / FMA and drift in the last ulps — NEVER substitute them for
float64 paths (integer dots are exact in any order and may use ``einsum``).

Where the JVM tier *rounds before ranking* (``F.round(x, 9)`` =
``java.math.BigDecimal.valueOf(x).setScale(9, HALF_UP)``), ranking on the
raw doubles is identical except when two candidates sit within 1e-9 of
each other; :func:`order_by_round9` / :func:`argmin_round9` detect that
(rare) window and fall back to an exact replay of the JVM rounding via
``decimal.Decimal(repr(x))`` — ``repr`` and ``Double.toString`` both
produce the shortest round-trip decimal, so the decimal being rounded is
identical — with ``ROUND_HALF_UP`` matching BigDecimal's HALF_UP
(away-from-zero ties) for either sign.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

__all__ = [
    "stack_vectors",
    "ordered_matmul",
    "ordered_rowdot",
    "ordered_sqnorm",
    "norms",
    "lsh_buckets",
    "sq8_codes",
    "sq8_codes_rowwise",
    "ordered_sqdist",
    "ordered_subspace_ip",
    "round9_halfup",
    "order_by_round9",
    "argmin_round9",
]


def stack_vectors(series, dim: int | None, op: str) -> np.ndarray:
    """A pandas Series of per-row arrays as one (n, d) float64 matrix.

    Raises ``ValueError`` on a null vector or a row whose length differs
    from ``dim`` (or from the first row's length when ``dim`` is None) —
    the same loud refusal as the JVM expressions, with the same
    'plane dim' / 'vector length' phrases the tests pin (a silent
    null-pad is a bucket collapse / slice truncation at scale).
    """
    vals = series.to_numpy()
    n = len(vals)
    if n == 0:
        return np.empty((0, dim or 0), dtype=np.float64)
    for row in vals:
        if row is None:
            raise ValueError(f"{op}: null vector — cannot compute")
        if dim is not None and len(row) != dim:
            raise ValueError(
                f"{op}: vector length {len(row)} != plane dim={dim} — "
                "every bucket would silently collapse to 0 (a full cross "
                "join); pass dim=<vector length>"
            )
    if dim is None:
        dim = len(vals[0])
        for row in vals:
            if len(row) != dim:
                raise ValueError(
                    f"{op}: ragged vector length {len(row)} != {dim}"
                )
    out = np.empty((n, dim), dtype=np.float64)
    for i, row in enumerate(vals):
        out[i] = row
    return out


def ordered_matmul(X: np.ndarray, W: np.ndarray) -> np.ndarray:
    """(n, d) x (d, m) with the ordered-left-fold accumulation over d —
    bit-identical to m independent JVM ``aggregate(zip_with(v, w, *))``
    folds per row."""
    n = X.shape[0]
    m = W.shape[1]
    acc = np.zeros((n, m), dtype=np.float64)
    for d in range(X.shape[1]):
        acc += X[:, d, None] * W[None, d, :]
    return acc


def ordered_rowdot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Per-row dot of two (n, d) matrices, ordered accumulation."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def ordered_sqnorm(X: np.ndarray) -> np.ndarray:
    acc = np.zeros(X.shape[0], dtype=np.float64)
    for d in range(X.shape[1]):
        acc += X[:, d] * X[:, d]
    return acc


def norms(X: np.ndarray) -> np.ndarray:
    """sqrt(ordered sum of squares), floored at 1e-30 (ann._norm)."""
    return np.maximum(np.sqrt(ordered_sqnorm(X)), 1e-30)


def lsh_buckets(X: np.ndarray, signs: np.ndarray, band: int) -> np.ndarray:
    """(n, tables) int64 bucket keys from the (dim, tables*band) ±1 sign
    matrix: bucket[t] = sum_p 2^p * [dot(v, w_{t,p}) > 0].  The dots are
    ordered folds (bit-identical signs to the JVM expression); the
    bit-assembly is exact integer arithmetic."""
    dots = ordered_matmul(X, signs)  # (n, tables*band)
    n = X.shape[0]
    tables = signs.shape[1] // band
    bits = (dots > 0.0).astype(np.int64)
    weights = np.tile(1 << np.arange(band, dtype=np.int64), tables)
    weighted = bits * weights[None, :]
    return weighted.reshape(n, tables, band).sum(axis=2)


def sq8_codes(X: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """int8-range codes floor(x / s * 127.0) as int64 — every step is a
    correctly-rounded double op in both engines, so bit-exact."""
    return np.floor(X / scales[None, :] * 127.0).astype(np.int64)


def sq8_codes_rowwise(X: np.ndarray, S: np.ndarray) -> np.ndarray:
    """sq8_codes with a per-row scale matrix (the broadcast ``sarr``
    column as it arrives per Arrow row)."""
    return np.floor(X / S * 127.0).astype(np.int64)


def ordered_sqdist(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances, ordered fold over d of
    (x_d - c_d)^2 — the JVM ``sqdist``/``_pq_l2`` sequence."""
    n, d = X.shape
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for j in range(d):
        t = X[:, j, None] - C[None, :, j]
        acc += t * t
    return acc


def ordered_subspace_ip(
    X: np.ndarray, CB: np.ndarray, m: int, sub: int
) -> np.ndarray:
    """(n, m, ksub) inner products of each row's m subvectors against
    the (ksub, m*sub) codebook's matching slices — ordered fold over the
    ``sub`` dims of each subspace (``_pq_ip``)."""
    n = X.shape[0]
    ksub = CB.shape[0]
    out = np.zeros((n, m, ksub), dtype=np.float64)
    for j in range(m):
        off = j * sub
        for d in range(off, off + sub):
            out[:, j, :] += X[:, d, None] * CB[None, :, d]
    return out


def round9_halfup(x: float) -> float:
    """Exact replay of Spark's ``F.round(x, 9)`` on a double:
    BigDecimal.valueOf (shortest round-trip decimal) + HALF_UP at scale
    9 + back to the nearest double."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP)
    )


def _near_tie_rows(D: np.ndarray, window: float = 1.2e-9) -> np.ndarray:
    """Row mask: some pair of entries within ``window`` of each other.
    Two doubles can only round9-equal (and so need the exact decimal
    path) when they differ by <= 1e-9; 1.2e-9 adds comparison slack."""
    if D.shape[1] < 2:
        return np.zeros(D.shape[0], dtype=bool)
    S = np.sort(D, axis=1)
    return (np.diff(S, axis=1) <= window).any(axis=1)


def order_by_round9(D: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Per row, ``ids`` ordered by (round9_halfup(D), id) ascending —
    the JVM ``array_sort`` of (F.round(d, 9), id) structs.

    Fast path (no two entries within 1.2e-9): rounding is monotone and
    collision-free, so ordering by (raw, id) is identical.  Slow path
    (rare): exact decimal rounding per entry, then the same sort.
    """
    n, k = D.shape
    order = np.argsort(D, axis=1, kind="stable")  # ids pre-sorted asc
    out = np.take_along_axis(
        np.broadcast_to(ids, (n, k)).copy(), order, axis=1
    )
    for i in np.flatnonzero(_near_tie_rows(D)):
        keyed = sorted(
            ((round9_halfup(D[i, j]), ids[j]) for j in range(k))
        )
        out[i] = [cid for _, cid in keyed]
    return out


def argmin_round9(D: np.ndarray) -> np.ndarray:
    """Per row, the first index attaining the minimum of round9(D) —
    the JVM running-min fold over (round(d, 9), index) structs with
    strict ``<`` (first occurrence on ties), replayed exactly.

    Fast path: if no other entry lies within 1.2e-9 above the raw
    minimum, the raw argmin (first occurrence) is the rounded argmin.
    """
    n, k = D.shape
    idx = np.argmin(D, axis=1)
    dmin = D[np.arange(n), idx]
    if k > 1:
        near = (D <= dmin[:, None] + 1.2e-9).sum(axis=1) > 1
        for i in np.flatnonzero(near):
            rmin = round9_halfup(dmin[i])
            for j in range(k):
                if D[i, j] <= dmin[i] + 1.2e-9 and round9_halfup(D[i, j]) == rmin:
                    idx[i] = j
                    break
    return idx
