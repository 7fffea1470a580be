"""Native ordered-window operators: moving RMS, integral, derivative,
detrend.

Intra-channel order is declared explicitly via ``Window.partitionBy(
"channel_id").orderBy("t", ...)`` — order is not ambient in Spark
(SURVEY.md §2.6).  All four compile to whole-stage-codegen window plans;
one shuffle on ``channel_id`` that AQE coalesces, amortized across any
number of chained window ops on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _wspec(order_col: str, tiebreak_col: str | None):
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    return Window.partitionBy("channel_id").orderBy(*order)


def mov_rms(
    df: DataFrame,
    window: float,
    samplerate: float,
    tiebreak_col: str | None = None,
    drop_last: bool = True,
) -> DataFrame:
    """Trailing moving RMS over ``round(window * samplerate)`` samples.

    Reference ``timedomain.mov_rms`` (``extension.py:664-700``): rolling
    mean of squares -> sqrt; warm-up rows dropped; time base re-centered
    by ``window/2``.  ``drop_last=True`` replicates the reference's
    off-by-one discard of the final sample (``extension.py:696`` slices
    ``[window_n-1:-1]``) — pass False for the corrected variant.
    """
    n = int(round(window * samplerate))
    if n < 1:
        raise ValueError("window shorter than one sample")
    w = _wspec("t", tiebreak_col)
    roll = w.rowsBetween(-(n - 1), 0)
    # Whole-partition count (computed ONCE per partition) instead of a
    # (0, unboundedFollowing) frame: Spark evaluates unbounded-FOLLOWING
    # frames by re-aggregating from each row to the partition end —
    # O(n^2) per channel, a multi-minute stall on a 5M-sample hot channel
    # (caught by tools/skew_bench.py).  row_number vs the total is the
    # same "not the last row" predicate at O(n).
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n_tot",
            F.count("*").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .withColumn(
            "mov_rms", F.sqrt(F.avg(F.col("value") * F.col("value")).over(roll))
        )
        .filter(F.col("_rn") >= n)
    )
    if drop_last:
        out = out.filter(F.col("_rn") < F.col("_n_tot"))
    return out.select(
        "channel_id",
        (F.col("t") - window / 2.0).alias("t"),
        F.col("mov_rms").alias("value"),
    )


def integral(df: DataFrame, tiebreak_col: str | None = None) -> DataFrame:
    """Cumulative trapezoidal integral per channel, first sample = 0.

    Reference ``timedomain.integral`` (``extension.py:702-723``,
    ``scipy.integrate.cumulative_trapezoid(initial=0)``): lag-pair segment
    areas, then a running sum — two stacked window functions over the same
    partitioning, a single shuffle.
    """
    w = _wspec("t", tiebreak_col)
    seg = (
        (F.col("value") + F.lag("value").over(w))
        / 2.0
        * (F.col("t") - F.lag("t").over(w))
    )
    running = F.sum(F.coalesce(seg, F.lit(0.0))).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("value", running).select("channel_id", "t", "value")


def derivative(df: DataFrame, tiebreak_col: str | None = None) -> DataFrame:
    """Finite difference on the midpoint time base (one fewer row).

    Reference ``timedomain.derivative`` (``extension.py:725-749``):
    ``Δy/Δt`` reported at ``(t_i + t_{i+1})/2``.
    """
    w = _wspec("t", tiebreak_col)
    out = (
        df.withColumn("_t2", F.lead("t").over(w))
        .withColumn("_y2", F.lead("value").over(w))
        .filter(F.col("_t2").isNotNull())
    )
    return out.select(
        "channel_id",
        ((F.col("t") + F.col("_t2")) / 2.0).alias("t"),
        ((F.col("_y2") - F.col("value")) / (F.col("_t2") - F.col("t"))).alias("value"),
    )


def detrend(df: DataFrame, dt_type: str = "linear", breakpoints=None) -> DataFrame:
    """Remove the per-channel mean or the least-squares line.

    Reference ``timedomain.detrend`` (``extension.py:751-781``).
    ``constant``: ``value - avg(value) over channel``.  ``linear``:
    closed-form OLS on (t, value) from the channel's sufficient statistics
    (Σ1, Σt, Σy, Σty, Σt²) — a single window aggregation, no UDF, no
    second scan.

    ``breakpoints`` (scipy.signal.detrend ``bp`` semantics): sample
    indices splitting each channel into segments, each detrended by its
    own independent linear fit.  Still fully native: the segment id is a
    ``row_number`` bucketed by the breakpoint list, and the same OLS
    window runs partitioned by (channel, segment) — no UDF, one extra
    window pass.
    """
    if breakpoints:
        if dt_type != "linear":
            raise ValueError("breakpoints require dt_type='linear'")
        bps = sorted(int(b) for b in breakpoints)
        wseq = Window.partitionBy("channel_id").orderBy("t")
        idx = F.row_number().over(wseq) - 1
        seg = sum(
            (F.when(idx >= b, 1).otherwise(0) for b in bps), F.lit(0)
        )
        dfb = df.withColumn("_seg", seg)
        w = Window.partitionBy("channel_id", "_seg")
        centered = dfb.withColumn(
            "_tc", F.col("t") - F.avg("t").over(w)
        ).withColumn("_yc", F.col("value") - F.avg("value").over(w))
        # try_divide: a 1-row segment has zero t-variance (0/0 would throw
        # under ANSI mode); detrend of a single point is its mean removal.
        slope = F.try_divide(
            F.avg(F.col("_tc") * F.col("_yc")).over(w),
            F.avg(F.col("_tc") * F.col("_tc")).over(w),
        )
        safe = F.coalesce(slope, F.lit(0.0))
        return (
            centered.withColumn("value", F.col("_yc") - safe * F.col("_tc"))
            .select("channel_id", "t", "value")
        )
    w = Window.partitionBy("channel_id")
    if dt_type == "constant":
        return df.withColumn(
            "value", F.col("value") - F.avg("value").over(w)
        ).select("channel_id", "t", "value")
    if dt_type != "linear":
        raise ValueError(f"unknown detrend type {dt_type!r}")
    # Two-pass centered OLS: E[t^2] - E[t]^2 at epoch-seconds magnitude
    # (~1.7e9) loses ~9 digits to cancellation; centering first keeps the
    # slope accurate to ~1e-13 relative.  Same partitioning both passes —
    # one shuffle, Catalyst reuses the exchange.
    centered = df.withColumn("_tc", F.col("t") - F.avg("t").over(w)).withColumn(
        "_yc", F.col("value") - F.avg("value").over(w)
    )
    slope = F.avg(F.col("_tc") * F.col("_yc")).over(w) / F.avg(
        F.col("_tc") * F.col("_tc")
    ).over(w)
    return (
        centered.withColumn("value", F.col("_yc") - slope * F.col("_tc"))
        .select("channel_id", "t", "value")
    )
