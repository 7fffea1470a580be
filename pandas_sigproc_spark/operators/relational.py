"""Native row-level operators: selection, projection, dedup, samplerate.

Every operator here compiles to a pure Catalyst plan — predicate pushdown
and column pruning reach the parquet scan, and nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Relative spread of Δt above which a channel is declared non-uniform.
#: Clean replacement for the reference's buggy tolerance check
#: (``extension.py:288-292`` compares a rate error against ``min_sr * tol``,
#: and its integer-snap then crashes on the None path, ``extension.py:297``).
UNIFORMITY_TOL = 1e-4
#: Snap to an integer rate when within this of one and >= 1 Hz
#: (``extension.py:294-298``).
INTEGER_SNAP_TOL = 0.01


def between(df: DataFrame, start: float, end: float, axis: str = "t") -> DataFrame:
    """Inclusive range selection on the time (or frequency) axis.

    Reference: ``timedomain.between`` / ``freqdomain.between``
    (``extension.py:410-434, 100-124``; kernel ``extension.py:974-983``).
    Compiles to a pushed-down parquet filter: with signals sorted by ``t``
    inside channel partitions, row-group min/max stats prune I/O — the
    100 TB-scale reason this is *not* a UDF.
    """
    return df.filter(F.col(axis).between(F.lit(start), F.lit(end)))


def timeshift(df: DataFrame, offset: float) -> DataFrame:
    """Constant offset of the time base (``extension.py:371-392``)."""
    out = df.withColumn("t", F.col("t") + F.lit(float(offset)))
    if "ts" in df.columns:
        out = out.withColumn(
            "ts", F.col("ts") + F.make_interval(secs=F.lit(float(offset)))
        )
    return out


def deduplicate(df: DataFrame, keys=("channel_id", "t")) -> DataFrame:
    """Mean of values sharing a time stamp (``extension.py:394-408``).

    Documented deviation (SURVEY.md §5.2.4): the reference *discards* the
    time base afterwards (``reset_index(drop=True)``,
    ``extension.py:408``); this engine keeps ``t`` — a positional index is
    meaningless in a distributed table.

    Output columns are exactly ``(*keys, value)``: any other input
    column (e.g. the optional ``ts`` timestamp) is DROPPED — duplicate
    stamps give it no single defined value.  Re-derive ``ts`` from
    ``(t, start_time)`` afterwards if needed (a review finding: the
    drop was silent and a later ``timeshift`` quietly skipped its
    ts-adjustment branch).
    """
    return (
        df.groupBy(*keys)
        .agg(F.avg("value").alias("value"))
        .select(*keys, "value")
    )


def samplerate(df: DataFrame, order_col: str | None = None) -> DataFrame:
    """Per-channel sample-rate inference -> (channel_id, samplerate).

    NULL ⇔ non-uniform beyond :data:`UNIFORMITY_TOL` (clean semantics for
    ``extension.py:273-300``); integer snap within
    :data:`INTEGER_SNAP_TOL` preserved.  One window pass + one aggregation:
    the shuffle is on ``channel_id`` only, and the result is meant to be
    cached in the channel catalog, not recomputed per operator like the
    reference does (``extension.py:474, 516, 553, 606, 684``).
    """
    order = [F.col("t")] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy("channel_id").orderBy(*order)
    dt = F.col("t") - F.lag("t").over(w)
    # Aggregate over ALL rows (the lag NULLs skipped by the aggs, not a
    # pre-filter): a 1-row channel has no lag at all, and the old
    # filter-then-group dropped it from the OUTPUT entirely — a caller
    # inner-joining this into the channel catalog silently lost the
    # channel (a review finding).  Such a channel now gets the NULL
    # samplerate row the "NULL <=> no uniform rate" contract promises.
    stats = (
        df.withColumn("dt", dt)
        .groupBy("channel_id")
        .agg(
            F.max("dt").alias("max_dt"),
            F.min("dt").alias("min_dt"),
            F.avg("dt").alias("mean_dt"),
        )
    )
    raw_sr = 1.0 / F.col("mean_dt")
    uniform = (
        F.col("min_dt").isNotNull()
        & (F.col("min_dt") > 0)
        & ((F.col("max_dt") - F.col("min_dt")) / F.col("mean_dt") <= UNIFORMITY_TOL)
    )
    snapped = F.when(
        (F.abs(raw_sr - F.round(raw_sr)) < INTEGER_SNAP_TOL) & (raw_sr >= 1),
        F.round(raw_sr),
    ).otherwise(raw_sr)
    return stats.select(
        "channel_id",
        F.when(uniform, snapped).otherwise(F.lit(None)).alias("samplerate"),
    )
