"""Catalog-driven scale-path selection for the kernel-tier operators.

SURVEY.md §7.3.1 gives every whole-channel kernel three execution modes:

- per-channel  — one Arrow group per channel (few medium channels);
- bucketed     — hash channels into K buckets, one batched matrix kernel
                 per task (fleets of SMALL channels: amortizes Arrow
                 dispatch ~bucket-size times);
- segmented / chunked — split ONE channel across tasks (channels too big
                 for any single task: overlap-save filtering, relational
                 Welch segmentation).

Through round 3 these were opt-in kwargs, so a naive 100 TB user got the
one-task-per-channel plan by default.  This module makes the scale path
the DEFAULT: operators pass ``"auto"`` and the planner picks the mode
from per-channel row statistics.

Cost model for the stats: ONE count aggregation over the input (a
map-side partial agg + a tiny shuffle — far cheaper than the kernel pass
that follows, and cached by the plan's semantic hash so chained operators
over the same input reuse it).  A deployment that already knows its
channel geometry can pre-register stats from its channel catalog with
:func:`register_stats` and never pay the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

#: Above this many rows, one channel is too big to give a single task
#: (4M float64 samples = 32 MB of values plus kernel workspace): split it.
HUGE_CHANNEL_ROWS = 1 << 22
#: At or below this many rows a channel is "small": batching many per task
#: amortizes Arrow/FFT dispatch.  One bucket of ~64 such channels stays
#: well under the per-task target.
SMALL_CHANNEL_ROWS = 1 << 16

_STATS_CACHE: dict[int, "ChannelStats"] = {}


@dataclass(frozen=True)
class ChannelStats:
    n_channels: int
    max_rows: int
    total_rows: int


def register_stats(df: DataFrame, stats: ChannelStats) -> None:
    """Pre-register known channel geometry for an input (e.g. from a
    maintained channel catalog) so auto-selection never scans it."""
    _STATS_CACHE[df.semanticHash()] = stats


def invalidate_stats(df: DataFrame | None = None) -> None:
    """Drop cached stats for ``df`` (or all of them) — call after the
    files behind a logically-identical plan change (appended partitions):
    the cache is keyed on the PLAN (``semanticHash``), not on file
    state, so refreshed inputs would otherwise serve stale geometry."""
    if df is None:
        _STATS_CACHE.clear()
    else:
        _STATS_CACHE.pop(df.semanticHash(), None)


def get_stats(df: DataFrame) -> ChannelStats:
    """Per-channel row statistics for ``df``.

    NOTE: an ``"auto"``-mode operator constructor calling this runs one
    EAGER Spark count job at plan-BUILD time (cached per plan semantic
    hash).  Callers that build plans they never execute, or that know
    their channel geometry, should pass explicit mode kwargs or
    pre-register with :func:`register_stats`; refreshed inputs need
    :func:`invalidate_stats`."""
    key = df.semanticHash()
    hit = _STATS_CACHE.get(key)
    if hit is not None:
        return hit
    row = (
        df.groupBy("channel_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_channels"),
            F.max("n").alias("max_rows"),
            F.sum("n").alias("total_rows"),
        )
        .first()
    )
    stats = ChannelStats(
        n_channels=int(row["n_channels"] or 0),
        max_rows=int(row["max_rows"] or 0),
        total_rows=int(row["total_rows"] or 0),
    )
    if len(_STATS_CACHE) > 256:
        _STATS_CACHE.clear()
    _STATS_CACHE[key] = stats
    return stats


def bucket_expr(col: str = "channel_id", n_buckets: int = 1):
    """Deterministic channel->bucket id in [0, n_buckets) for the
    batched-kernel operators (filters/psd/srs/rainflow/custom/fused) —
    ONE home for the formula (a review finding counted six hand
    copies).  ``pmod``, not ``abs(hash) % n``: ``F.hash`` is 32-bit and
    ``abs(Integer.MIN_VALUE)`` stays negative, so the old form could
    emit a stray negative bucket id (harmless for batching, but a
    surprise to anything keying on the range)."""
    return F.pmod(F.hash(col), F.lit(int(n_buckets)))


def _cpus(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def auto_filter_mode(df: DataFrame, samplerate: float | None):
    """(n_buckets, chunk_rows) for the IIR filter operators.

    Huge channels -> overlap-save chunking (needs an explicit samplerate
    for driver-side design; without one the per-channel plan stands and
    the kernel's own FFT path keeps the task O(n log n)).  Small-channel
    fleets -> bucketed batch kernels.  Else per-channel.
    """
    s = get_stats(df)
    if s.max_rows > HUGE_CHANNEL_ROWS and samplerate is not None:
        return None, HUGE_CHANNEL_ROWS // 4
    if s.max_rows <= SMALL_CHANNEL_ROWS and s.n_channels > 1:
        return min(4 * _cpus(df), max(s.n_channels // 4, 1)), None
    return None, None


def auto_psd_mode(df: DataFrame, samplerate: float | None, window_length):
    """(n_buckets, segmented) for get_psd."""
    s = get_stats(df)
    if (
        s.max_rows > HUGE_CHANNEL_ROWS
        and samplerate is not None
        and window_length is not None
    ):
        return None, True
    if s.max_rows <= SMALL_CHANNEL_ROWS and s.n_channels > 1:
        return min(4 * _cpus(df), max(s.n_channels // 4, 1)), False
    return None, False


def auto_window_mode(df: DataFrame):
    """chunk_rows for the native ordered-window operators (mov_rms /
    integral / derivative), or None for the single-window-per-channel
    plan.  A channel above HUGE_CHANNEL_ROWS would otherwise pass whole
    through ONE task (Window.partitionBy sorts the full channel in a
    single partition — SKEW.md measures a 5M-row hot channel at ~50x its
    peers); the overlap-chunked plan bounds every task at chunk_rows +
    overlap rows."""
    s = get_stats(df)
    if s.max_rows > HUGE_CHANNEL_ROWS:
        return HUGE_CHANNEL_ROWS // 4
    return None


def auto_srs_mode(df: DataFrame):
    """(n_buckets, n_freq_slices) for get_srs."""
    s = get_stats(df)
    if s.max_rows > HUGE_CHANNEL_ROWS:
        # One huge channel: fan the frequency axis out instead.
        return None, 8
    if s.max_rows <= SMALL_CHANNEL_ROWS and s.n_channels > 1:
        return min(4 * _cpus(df), max(s.n_channels // 4, 1)), 1
    return None, 1
