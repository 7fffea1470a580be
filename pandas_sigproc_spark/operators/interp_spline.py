"""Spline interpolation operator (kernel tier).

Every two-point kind — linear/slinear, nearest/nearest-up,
previous/zero, next — is native relational algebra in
``operators/joins.py`` (``NATIVE_INTERP_KINDS``); only the true SPLINE
kinds (``cubic``, ``quadratic``), whose coefficients couple the whole
channel through a tridiagonal solve, run here as a grouped-map UDF over
the vendored ``kernels.interp`` (reference surface:
``extension.py:819-851`` via ``scipy.interpolate.interp1d``).  (An
earlier version of this docstring claimed the nearest family and
``zero`` lived here — stale since the native tier took them; a review
finding.)

The target grid is cogrouped with the source channel so both sides
arrive in one task without a driver round-trip.  Scale caveat: the
chunked path bounds tasks by SOURCE knots; a huge target grid over a
small source still cogroups each channel's targets into one task —
use a native kind (whose range chunking bounds both sides) or pre-split
the grid when upsampling a small channel by orders of magnitude.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pandas_sigproc_spark.kernels import interp as _interp

_OUT_SCHEMA = "channel_id string, t double, value double"


def interp1d_spline(
    df: DataFrame,
    grid: DataFrame,
    kind: str = "cubic",
    axis: str = "t",
    chunk_rows: int | None | str = "auto",
    overlap_knots: int = 64,
) -> DataFrame:
    """Interpolate each channel onto its grid rows with the given kind.

    ``chunk_rows="auto"``: above ``planner.HUGE_CHANNEL_ROWS`` the
    spline runs per (channel, chunk) with ``overlap_knots`` extra knots
    duplicated on each side (uniform grids only — the chunk index is
    arithmetic, same precondition as the chunked window ops).  A cubic
    spline's coefficients are formally global, but a knot's influence
    decays geometrically with distance ((2-sqrt(3))^d ~ 0.268^d for the
    natural/not-a-knot tridiagonal solves), so 64 overlap knots put the
    chunk-boundary error near 1e-37 of signal scale — below float64
    resolution; the equality is pinned to 1e-10 in
    tests/test_interp_chunked.py.  Targets route to the chunk whose core
    knot range contains them; out-of-span targets raise from the kernel
    in both plans (SciPy parity — ``extension.py:986-996``).
    """
    from pandas_sigproc_spark.operators.windows import (
        _chunked_src,
        _resolve_chunk_rows,
    )

    chunk_rows = _resolve_chunk_rows(df, chunk_rows)

    if chunk_rows is None:
        def kernel(src: pd.DataFrame, tgt: pd.DataFrame) -> pd.DataFrame:
            if src.empty or tgt.empty:
                return pd.DataFrame(columns=["channel_id", "t", "value"])
            src = src.sort_values(axis)
            x = src[axis].to_numpy(dtype=np.float64)
            y = src["value"].to_numpy(dtype=np.float64)
            x2 = np.sort(tgt[axis].to_numpy(dtype=np.float64))
            y2 = _interp.interp1d(x, y, x2, kind=kind)
            return pd.DataFrame(
                {"channel_id": src["channel_id"].iloc[0], "t": x2, "value": y2}
            )

        return (
            df.select("channel_id", axis, "value")
            .groupBy("channel_id")
            .cogroup(grid.select("channel_id", axis).groupBy("channel_id"))
            .applyInPandas(kernel, _OUT_SCHEMA)
        )

    L, O = int(chunk_rows), int(overlap_knots)
    src = df.select(
        "channel_id", F.col(axis).alias("t"), "value"
    )
    # ONE per-channel MIN/MAX/COUNT aggregate feeds both the chunk
    # explosion and the target routing (passing it into _chunked_src —
    # the source is huge by construction, and Spark does not guarantee
    # exchange reuse across the two differently-shaped parents).
    geo = src.groupBy("channel_id").agg(
        F.min("t").alias("_t0"),
        F.max("t").alias("_t1"),
        F.count("*").alias("_n"),
    )
    chunked = _chunked_src(src, L, overlap_back=O, overlap_fwd=O, geo=geo)
    # route each target to the chunk whose CORE knot range contains it
    # (clamped: out-of-span targets evaluate in the true end chunks)
    sr = (F.col("_n") - 1) / (F.col("_t1") - F.col("_t0"))
    nseg = (F.floor((F.col("_n") - 1) / L) + 1).cast("long")
    tpos = (F.col("t") - F.col("_t0")) * sr / L
    # Degenerate channels: the division by the time span must stay
    # behind a lazy CaseWhen branch (ANSI Spark throws DIVIDE_BY_ZERO
    # eagerly otherwise).  A 1-knot channel routes its targets to chunk
    # 0, where the kernel raises its own 'need at least 2 sample
    # points' — same loud failure as the global plan; a zero-span
    # multi-row channel raises here, mirroring _chunked_src.
    tseg = (
        F.when(F.col("_n") <= 1, F.lit(0))
        .when(
            F.col("_t1") == F.col("_t0"),
            F.raise_error(
                F.concat(
                    F.lit("chunked spline interp: channel "),
                    F.col("channel_id"),
                    F.lit(
                        " has multiple rows with zero time span (all "
                        "timestamps equal) — no sample grid exists"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(
            F.least(
                F.greatest(F.floor(tpos).cast("long"), F.lit(0)), nseg - 1
            )
        )
    )
    tgt = (
        grid.select("channel_id", F.col(axis).alias("t"))
        .join(F.broadcast(geo), "channel_id")
        .select("channel_id", "t", tseg.alias("_seg"))
    )

    def kernel_chunk(src_pdf: pd.DataFrame, tgt_pdf: pd.DataFrame) -> pd.DataFrame:
        if src_pdf.empty or tgt_pdf.empty:
            return pd.DataFrame(columns=["channel_id", "t", "value"])
        src_pdf = src_pdf.sort_values("_i")
        iv = src_pdf["_i"].to_numpy()
        if len(iv) > 1 and (np.diff(iv) != 1).any():
            raise ValueError(
                "interp1d_spline chunked: non-consecutive sample index in "
                f"channel {src_pdf['channel_id'].iloc[0]!r} — chunked "
                "spline interpolation requires a uniform strictly-"
                "increasing grid (pass chunk_rows=None)"
            )
        x = src_pdf["t"].to_numpy(dtype=np.float64)
        y = src_pdf["value"].to_numpy(dtype=np.float64)
        x2 = np.sort(tgt_pdf["t"].to_numpy(dtype=np.float64))
        y2 = _interp.interp1d(x, y, x2, kind=kind)
        return pd.DataFrame(
            {"channel_id": src_pdf["channel_id"].iloc[0], "t": x2, "value": y2}
        )

    return (
        chunked.groupBy("channel_id", "_seg")
        .cogroup(tgt.groupBy("channel_id", "_seg"))
        .applyInPandas(kernel_chunk, _OUT_SCHEMA)
    )
