"""Native aggregations: RMS family, PSD integrals, Welch summarize stats.

All of these reduce with Spark's partial+final hash aggregation — at
100 TB the map-side combine means the shuffle carries one row per
(channel, grouping key), not per sample.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def rms(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Per-channel scalar RMS: ``sqrt(mean(y^2))``.

    Reference ``timedomain.rms`` (``extension.py:896-911``, kernel
    ``tools.py:103-120``).
    """
    return df.groupBy("channel_id").agg(
        F.sqrt(F.avg(F.col(value_col) * F.col(value_col))).alias("rms")
    )


def spl(df: DataFrame, p_ref: float = 20e-6, value_col: str = "value") -> DataFrame:
    """Per-channel sound pressure level ``20*log10(rms/p_ref)``.

    Reference ``timedomain.spl`` (``extension.py:913-934``,
    ``tools.py:204-224``); default reference pressure 20 µPa.
    """
    r = F.sqrt(F.avg(F.col(value_col) * F.col(value_col)))
    return df.groupBy("channel_id").agg(
        (20.0 * F.log10(r / F.lit(float(p_ref)))).alias("spl")
    )


def _pairs(df: DataFrame, x: str, y: str):
    """Adjacent (x,y) pairs per channel via a lead window."""
    w = Window.partitionBy("channel_id").orderBy(x)
    return (
        df.withColumn("_x2", F.lead(x).over(w))
        .withColumn("_y2", F.lead(y).over(w))
        .filter(F.col("_x2").isNotNull())
    )


def rms_lin(df: DataFrame, freq_col: str = "freq", power_col: str = "power") -> DataFrame:
    """Spectrum RMS via trapezoidal integration: ``sqrt(trapz(p, f))``.

    Reference ``freqdomain.rms_lin`` (``extension.py:126-143``,
    ``tools.py:123-143``).  The trapezoid becomes a lead-window pair sum —
    whole-stage-codegen'd, no UDF.
    """
    pairs = _pairs(df, freq_col, power_col)
    seg = (F.col(power_col) + F.col("_y2")) / 2.0 * (F.col("_x2") - F.col(freq_col))
    return pairs.groupBy("channel_id").agg(F.sqrt(F.sum(seg)).alias("rms_lin"))


def rms_log(
    df: DataFrame,
    freq_col: str = "freq",
    power_col: str = "power",
    slope_tol: float = 1e-10,
) -> DataFrame:
    """Spectrum RMS via piecewise power-law (log-log) integration.

    Implements the vibrationdata psdinteg method the reference uses
    (``tools.py:146-201``): per-segment log-log slope
    ``n = log10(p2/p1)/log10(f2/f1)``; area ``p1*f1*ln(f2/f1)`` when
    ``n ≈ -1`` else the closed-form power-law integral; falls back to the
    linear trapezoid when the closed form under/overflows
    (``tools.py:191-196``).  Expressed as one CASE tree — the reference's
    Python loop (``tools.py:178-199``) disappears into codegen.
    """
    pairs = _pairs(df, freq_col, power_col)
    f1, p1 = F.col(freq_col), F.col(power_col)
    f2, p2 = F.col("_x2"), F.col("_y2")
    # try_divide throughout the slope/log terms, not just area_pow (a
    # review finding): a zero power bin (p1 == 0), a DC bin (f1 == 0),
    # or duplicate freq rows (log10(f2/f1) == 0) are plain '/' 0-denominator
    # cases that THROW under ANSI mode (the Spark 4 default this
    # function's own area_pow comment designs for) — with try_divide
    # they yield NULL, which joins the trapezoid fallback below exactly
    # like the reference's overflow handling (tools.py:191-196).
    n = F.try_divide(F.log10(F.try_divide(p2, p1)), F.log10(F.try_divide(f2, f1)))
    area_log = p1 * f1 * F.log(F.try_divide(f2, f1))
    # try_divide: with ANSI mode on (Spark 4 default), pow(f1, n) underflow
    # to 0 for steeply falling segments would otherwise throw DIVIDE_BY_ZERO
    # — the exact machine-precision case the reference's fallback handles
    # (tools.py:191-196); NULL joins the fallback condition instead.
    area_pow = F.try_divide(p1, F.pow(f1, n)) * F.try_divide(
        F.lit(1.0), n + 1.0
    ) * (F.pow(f2, n + 1.0) - F.pow(f1, n + 1.0))
    area_trap = (p1 + p2) / 2.0 * (f2 - f1)
    area = F.when(F.abs(n + 1.0) < slope_tol, area_log).otherwise(area_pow)
    area = F.when(
        area.isNull()
        | F.isnan(area)
        | (area == 0.0)
        | (F.abs(area) == float(math.inf)),
        area_trap,
    ).otherwise(area)
    return pairs.groupBy("channel_id").agg(F.sqrt(F.sum(area)).alias("rms_log"))


def segment_stats(
    df: DataFrame,
    n_window: int,
    order_col: str = "t",
    tiebreak_col: str | None = None,
    fatigue_exponent: float = 4.0,
) -> DataFrame:
    """Welch-style segment statistics, fully relational.

    Splits each channel into consecutive non-overlapping ``n_window``-row
    segments (trailing partial dropped, matching the strided truncation at
    ``tools.py:67``), computes per-segment RMS, then the reference's
    summarize statistics across segments (``tools.py:74-98``): mean /
    median (exact) / max / min of segment RMS, plus the 'max rms' scale
    factor ``(max/mean)^2`` and the fatigue 'damage' acceleration factor
    ``mean((rms_i/mean)^b)^(2/b)`` — the SQUARE of the b-norm ratio,
    matching the reference's power-domain scale and the hash-pinned
    oracle (an earlier docstring wrote ^(1/b); the code was right, the
    text wasn't — a review finding).

    Two shuffles total: (channel, segment) partial agg, then channel agg.
    """
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy("channel_id").orderBy(*order)
    seg = (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_seg", F.floor(F.col("_rn") / n_window))
        .groupBy("channel_id", "_seg")
        .agg(
            F.sqrt(F.avg(F.col("value") * F.col("value"))).alias("_seg_rms"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") == n_window)
    )
    b = float(fatigue_exponent)
    out = seg.groupBy("channel_id").agg(
        F.count("*").alias("n_segments"),
        F.avg("_seg_rms").alias("mean_rms"),
        F.expr("percentile(_seg_rms, 0.5)").alias("median_rms"),
        F.max("_seg_rms").alias("max_rms"),
        F.min("_seg_rms").alias("min_rms"),
        F.avg(F.pow(F.col("_seg_rms"), F.lit(b))).alias("_mean_pow"),
    )
    return out.select(
        "channel_id",
        "n_segments",
        "mean_rms",
        "median_rms",
        "max_rms",
        "min_rms",
        F.pow(F.col("max_rms") / F.col("mean_rms"), 2.0).alias("max_rms_scale"),
        F.pow(
            F.pow(F.col("_mean_pow"), 1.0 / b) / F.col("mean_rms"), 2.0
        ).alias("damage_scale"),
    )
