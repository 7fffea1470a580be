"""Native ordered-window operators: moving RMS, integral, derivative,
detrend.

Intra-channel order is declared explicitly via ``Window.partitionBy(
"channel_id").orderBy("t", ...)`` — order is not ambient in Spark
(SURVEY.md §2.6).  All four compile to whole-stage-codegen window plans;
one shuffle on ``channel_id`` that AQE coalesces, amortized across any
number of chained window ops on the same key.

Scale path (SURVEY.md §7.3.1): ``Window.partitionBy("channel_id")``
funnels each whole channel through ONE task — a 5M-row hot channel costs
50x the per-task budget of its peers (measured in SKEW.md), and at
100 TB a year-long 48 kHz channel would OOM a single executor.  For
channels above :data:`planner.HUGE_CHANNEL_ROWS` the operators therefore
auto-select an *overlap-chunked* plan: every row gets an arithmetic
per-channel sample index (one broadcast-joined MIN/MAX/COUNT aggregate —
no sort, no single-task stage), rows within the operator's warm-up
distance of a chunk boundary are duplicated into the neighbouring chunk,
and the same window expressions run partitioned by ``(channel, chunk)``
so every task holds at most ``chunk_rows + overlap`` rows.  The chunked
plans are row-for-row BIT-IDENTICAL to the single-window plans for
``mov_rms``/``derivative`` (frames are equal row sets folded in the same
order) and identical up to summation association for ``integral``
(pinned in tests/test_chunked_windows.py).

The chunked plans require each channel to sit on a uniform,
strictly-increasing time grid (the same precondition as the IIR
``filt_chunked`` path — the arithmetic index IS the ordinal index only
there).  A native guard raises inside the task if the reconstructed
index has duplicates or gaps, instead of silently mis-framing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _wspec(order_col: str, tiebreak_col: str | None):
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    return Window.partitionBy("channel_id").orderBy(*order)


def _resolve_chunk_rows(
    df: DataFrame, chunk_rows, *, overlap: int = 0, tiebreak_col=None
):
    """Resolve the ``"auto"`` scale mode from channel statistics
    (planner.py): huge channels chunk, everything else keeps the
    single-window plan.  Explicit ints/None always win.

    Two auto-mode adjustments keep ``"auto"`` from ever failing a call
    that the single-window plan accepts:

    - ``tiebreak_col`` set → stay on the window plan (the chunked path's
      arithmetic sample index cannot disambiguate duplicate timestamps;
      an explicit ``chunk_rows`` int with a tiebreak raises instead of
      silently dropping the tiebreak);
    - warm-up ``overlap`` at or above the planner's chunk size (a very
      long mov_rms window) → grow the chunk to ``4 * overlap``: every
      task then holds ≤ 5×overlap rows — still bounded, because no
      chunking scheme can bound a trailing-window task below the window
      length itself.
    """
    if chunk_rows == "auto":
        from pandas_sigproc_spark import planner

        if tiebreak_col is not None:
            # The degradation is deliberate (see docstring) but must not
            # be SILENT: above the huge-channel threshold the caller
            # loses exactly the single-task-window protection auto mode
            # exists for, so say so once per call site (r5 advice).
            resolved = planner.auto_window_mode(df)
            if resolved is not None:
                import warnings

                warnings.warn(
                    "chunk_rows='auto' detected a huge channel but "
                    "tiebreak_col forces the single-task whole-channel "
                    "window plan (the chunked path's arithmetic sample "
                    "index cannot disambiguate duplicate timestamps). "
                    "Deduplicate the time base (deduplicate()) or drop "
                    "tiebreak_col to regain bounded-task chunking.",
                    stacklevel=3,
                )
            return None
        resolved = planner.auto_window_mode(df)
        if resolved is not None and overlap >= resolved:
            resolved = 4 * overlap
        return resolved
    if chunk_rows is not None and tiebreak_col is not None:
        raise ValueError(
            "chunked window ops cannot honor tiebreak_col: the arithmetic "
            "sample index requires unique uniform timestamps — pass "
            "chunk_rows=None for the sort-based window plan"
        )
    return chunk_rows


def _chunked_src(
    df: DataFrame,
    chunk_rows: int,
    overlap_back: int,
    overlap_fwd: int,
    geo: DataFrame | None = None,
) -> DataFrame:
    """Explode ``df`` into overlapping (channel, chunk) groups.

    Adds ``_i`` (arithmetic per-channel sample index), ``_n`` (channel
    row count) and ``_seg`` (chunk id; boundary rows are duplicated into
    the neighbouring chunk per the requested overlaps).  The index is
    ``round((t - t0) * sr)`` with the per-channel rate inferred from one
    broadcast MIN/MAX/COUNT aggregate — sort-free, so no stage ever holds
    a whole channel (the point of chunking).  ``overlap_back`` rows from
    the tail of each chunk feed the next chunk's leading frames (trailing
    windows / lag); ``overlap_fwd`` rows from the head feed the previous
    chunk's trailing frames (lead).
    """
    L = int(chunk_rows)
    O_b, O_f = int(overlap_back), int(overlap_fwd)
    if max(O_b, O_f) >= L:
        raise ValueError(
            f"chunk_rows={L} must exceed the window overlap "
            f"({max(O_b, O_f)}); pick a larger chunk"
        )
    if geo is None:
        # Callers that already aggregated per-channel MIN/MAX/COUNT for
        # their own routing (chunked spline interp) pass it in — the
        # source table this path exists for is huge by construction, and
        # exchange reuse across differently-shaped parents is not
        # guaranteed.
        geo = df.groupBy("channel_id").agg(
            F.min("t").alias("_t0"),
            F.max("t").alias("_t1"),
            F.count("*").alias("_n"),
        )
    # Per-channel inferred rate: exact on the uniform grids this path
    # requires; mixed-rate tables are fine (each channel gets its own).
    sr = (F.col("_n") - 1) / (F.col("_t1") - F.col("_t0"))
    src = df.join(F.broadcast(geo), "channel_id").withColumn(
        "_i",
        F.when(F.col("_n") <= 1, F.lit(0))
        .when(
            # zero time span with >1 row: sr is inf, the index NaN->null,
            # and every downstream filter would silently DROP the channel
            F.col("_t1") == F.col("_t0"),
            F.raise_error(
                F.concat(
                    F.lit("chunked window op: channel "),
                    F.col("channel_id"),
                    F.lit(
                        " has multiple rows with zero time span (all "
                        "timestamps equal) — no sample grid exists"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.floor((F.col("t") - F.col("_t0")) * sr + 0.5))
        .cast("long"),
    )
    segno = (F.col("_i") / L).cast("long")
    members = F.array(segno)
    if O_b:
        members = F.when(
            F.col("_i") % L >= L - O_b, F.array(segno, segno + 1)
        ).otherwise(members)
    if O_f:
        members = F.when(
            (F.col("_i") % L < O_f) & (segno > 0),
            F.array_union(members, F.array(segno - 1)),
        ).otherwise(members)
    return src.withColumn("_seg", F.explode(members)).drop("_t0", "_t1")


def _chunk_guard(wseg, value_col):
    """Wrap ``value_col`` so the task RAISES if the arithmetic index has
    duplicates or gaps within a chunk (non-uniform grid / timestamp
    jitter) — the frames would silently be wrong otherwise."""
    gap = F.col("_i") - F.lag("_i").over(wseg)
    bad = gap.isNotNull() & (gap != 1)
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    "chunked window op: non-consecutive sample index in "
                    "channel "
                ),
                F.col("channel_id"),
                F.lit(
                    " (duplicate timestamps or a non-uniform grid); "
                    "chunked execution requires a uniform strictly-"
                    "increasing time base — pass chunk_rows=None"
                ),
            )
        ).cast("double"),
    ).otherwise(value_col)


def mov_rms(
    df: DataFrame,
    window: float,
    samplerate: float,
    tiebreak_col: str | None = None,
    drop_last: bool = True,
    chunk_rows: int | None | str = "auto",
) -> DataFrame:
    """Trailing moving RMS over ``round(window * samplerate)`` samples.

    Reference ``timedomain.mov_rms`` (``extension.py:664-700``): rolling
    mean of squares -> sqrt; warm-up rows dropped; time base re-centered
    by ``window/2``.  ``drop_last=True`` replicates the reference's
    off-by-one discard of the final sample (``extension.py:696`` slices
    ``[window_n-1:-1]``) — pass False for the corrected variant.

    ``chunk_rows="auto"`` (default) lets the planner switch huge channels
    to the overlap-chunked plan (module docstring): each chunk carries the
    previous ``n-1`` rows as warm-up overlap, so every trailing frame is
    the same row set as the single-window plan — bit-identical output,
    bounded task memory.  NOTE: ``"auto"`` consults one cached COUNT
    aggregate over the input (planner.get_stats) at plan-build time.
    """
    n = int(round(window * samplerate))
    if n < 1:
        raise ValueError("window shorter than one sample")
    chunk_rows = _resolve_chunk_rows(
        df, chunk_rows, overlap=n - 1, tiebreak_col=tiebreak_col
    )
    if chunk_rows is not None:
        return _mov_rms_chunked(df, window, n, int(chunk_rows), drop_last)
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


def _mov_rms_chunked(df, window, n, chunk_rows, drop_last):
    src = _chunked_src(df, chunk_rows, overlap_back=n - 1, overlap_fwd=0)
    wseg = Window.partitionBy("channel_id", "_seg").orderBy("_i")
    roll = wseg.rowsBetween(-(n - 1), 0)
    L = chunk_rows
    val = _chunk_guard(
        wseg, F.sqrt(F.avg(F.col("value") * F.col("value")).over(roll))
    )
    out = (
        src.withColumn("mov_rms", val)
        # core rows only (overlap copies computed their neighbour's warm-up)
        .filter((F.col("_i") / L).cast("long") == F.col("_seg"))
        # warm-up: the first n-1 samples of the CHANNEL have no full frame
        .filter(F.col("_i") >= n - 1)
    )
    if drop_last:
        out = out.filter(F.col("_i") < F.col("_n") - 1)
    return out.select(
        "channel_id",
        (F.col("t") - window / 2.0).alias("t"),
        F.col("mov_rms").alias("value"),
    )


def integral(
    df: DataFrame,
    tiebreak_col: str | None = None,
    chunk_rows: int | None | str = "auto",
) -> DataFrame:
    """Cumulative trapezoidal integral per channel, first sample = 0.

    Reference ``timedomain.integral`` (``extension.py:702-723``,
    ``scipy.integrate.cumulative_trapezoid(initial=0)``): lag-pair segment
    areas, then a running sum — two stacked window functions over the same
    partitioning, a single shuffle.

    ``chunk_rows="auto"``: huge channels run the distributed prefix-sum
    plan instead — per-chunk running sums with a 1-row lag overlap, plus
    a cumulative offset over the (tiny) per-chunk totals table joined
    back by broadcast.  Equal to the single-window plan up to summation
    association (~1e-15 relative); every partial sum is an ordered left
    fold, so the result is deterministic bit-for-bit on any cluster
    layout (and SQL-replayable — the driver oracle replays the same
    association).
    """
    chunk_rows = _resolve_chunk_rows(
        df, chunk_rows, overlap=1, tiebreak_col=tiebreak_col
    )
    if chunk_rows is not None:
        return _integral_chunked(df, int(chunk_rows))
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


def _integral_chunked(df, chunk_rows):
    L = chunk_rows
    src = _chunked_src(df, L, overlap_back=1, overlap_fwd=0)
    wseg = Window.partitionBy("channel_id", "_seg").orderBy("_i")
    # The overlap row (previous chunk's tail) contributes lag(t/value) to
    # the chunk's first core row; its own area coalesces to 0 here — it
    # was already counted in its home chunk.
    area = F.coalesce(
        (F.col("value") + F.lag("value").over(wseg))
        / 2.0
        * (F.col("t") - F.lag("t").over(wseg)),
        F.lit(0.0),
    )
    prefix = F.sum(area).over(wseg.rowsBetween(Window.unboundedPreceding, 0))
    base = src.withColumn("_prefix", _chunk_guard(wseg, prefix))
    # Chunk totals = the prefix at each chunk's last core row (arithmetic
    # predicate, no extra window); offsets = exclusive running sum over
    # the tiny (channel, seg) totals table, broadcast back.  Left folds
    # all the way down -> deterministic bits on any layout.  The totals
    # branch re-derives the windowed subtree (AQE reuses the shuffle
    # where it can) — deliberately so: persisting the exploded
    # intermediate would trade a second bounded pass for materializing
    # the whole corpus, the wrong trade at 100 TB.
    last_i = F.least(F.col("_n") - 1, (F.col("_seg") + 1) * L - 1)
    tots = base.filter(F.col("_i") == last_i).select(
        "channel_id", "_seg", F.col("_prefix").alias("_T")
    )
    woff = (
        Window.partitionBy("channel_id")
        .orderBy("_seg")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tots.select(
        "channel_id",
        "_seg",
        F.coalesce(F.sum("_T").over(woff), F.lit(0.0)).alias("_off"),
    )
    return (
        base.filter((F.col("_i") / L).cast("long") == F.col("_seg"))
        .join(F.broadcast(offs), ["channel_id", "_seg"])
        .select(
            "channel_id", "t", (F.col("_off") + F.col("_prefix")).alias("value")
        )
    )


def derivative(
    df: DataFrame,
    tiebreak_col: str | None = None,
    chunk_rows: int | None | str = "auto",
) -> DataFrame:
    """Finite difference on the midpoint time base (one fewer row).

    Reference ``timedomain.derivative`` (``extension.py:725-749``):
    ``Δy/Δt`` reported at ``(t_i + t_{i+1})/2``.

    ``chunk_rows="auto"``: huge channels chunk with a 1-row *forward*
    overlap (each chunk borrows the next chunk's first row for its tail
    ``lead``) — purely row-local arithmetic, so the chunked output is
    bit-identical to the single-window plan.
    """
    chunk_rows = _resolve_chunk_rows(
        df, chunk_rows, overlap=1, tiebreak_col=tiebreak_col
    )
    if chunk_rows is not None:
        return _derivative_chunked(df, int(chunk_rows))
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


def _derivative_chunked(df, chunk_rows):
    L = chunk_rows
    src = _chunked_src(df, L, overlap_back=0, overlap_fwd=1)
    wseg = Window.partitionBy("channel_id", "_seg").orderBy("_i")
    out = (
        src.withColumn("_t2", F.lead("t").over(wseg))
        .withColumn("_y2", _chunk_guard(wseg, F.lead("value").over(wseg)))
        .filter((F.col("_i") / L).cast("long") == F.col("_seg"))
        .filter(F.col("_t2").isNotNull())
    )
    return out.select(
        "channel_id",
        ((F.col("t") + F.col("_t2")) / 2.0).alias("t"),
        ((F.col("_y2") - F.col("value")) / (F.col("_t2") - F.col("t"))).alias("value"),
    )


def detrend(
    df: DataFrame,
    dt_type: str = "linear",
    breakpoints=None,
    mode: str = "auto",
    uniform_grid: bool = False,
) -> DataFrame:
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

    ``mode``: ``"agg"`` computes the per-channel sufficient statistics
    with partial-aggregated ``groupBy`` + broadcast joins instead of
    whole-partition windows — no channel is ever materialized in one
    task, so a 5-billion-row channel detrends as well as a 5-thousand-row
    one (the window form funnels each channel through a single task; see
    module docstring).  ``"window"`` is the one-shuffle window plan —
    measured ~30% cheaper at small scale (the agg form scans the input
    three times).  ``"auto"`` (default) picks window unless the planner
    stats show a channel above HUGE_CHANNEL_ROWS (one cached count job at
    build time).  The two agree to summation-association rounding
    (~1e-15 relative).  ``breakpoints`` defaults to the window form —
    segment membership needs the per-channel ordinal index, which has no
    sort-free equivalent on a NON-uniform grid — but callers whose
    channels sit on uniform grids can pass ``uniform_grid=True`` to get
    the agg form: the ordinal index is reconstructed arithmetically from
    one broadcast MIN/MAX/COUNT aggregate (per-channel inferred rate,
    guarded like the chunked ops), so no whole-channel sort/window
    remains anywhere in the piecewise plan either.
    """
    if breakpoints:
        if dt_type != "linear":
            raise ValueError("breakpoints require dt_type='linear'")
        bps = sorted(int(b) for b in breakpoints)
        if uniform_grid:
            return _detrend_piecewise_agg(df, bps)
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
    if dt_type not in ("constant", "linear"):
        raise ValueError(f"unknown detrend type {dt_type!r}")
    if mode not in ("auto", "agg", "window"):
        raise ValueError(f"unknown detrend mode {mode!r}")
    if mode == "auto":
        mode = "agg" if _resolve_chunk_rows(df, "auto") is not None else "window"
    if mode == "agg":
        return _detrend_agg(df, dt_type)
    w = Window.partitionBy("channel_id")
    if dt_type == "constant":
        return df.withColumn(
            "value", F.col("value") - F.avg("value").over(w)
        ).select("channel_id", "t", "value")
    # Two-pass centered OLS: E[t^2] - E[t]^2 at epoch-seconds magnitude
    # (~1.7e9) loses ~9 digits to cancellation; centering first keeps the
    # slope accurate to ~1e-13 relative.  Same partitioning both passes —
    # one shuffle, Catalyst reuses the exchange.
    centered = df.withColumn("_tc", F.col("t") - F.avg("t").over(w)).withColumn(
        "_yc", F.col("value") - F.avg("value").over(w)
    )
    # try_divide + coalesce(0): a 1-row channel (or one whose rows share
    # a single timestamp) has zero t-variance — the plain division gave
    # NULL values (or DIVIDE_BY_ZERO under ANSI) where the agg and
    # breakpoints forms, which claim parity with this path, return mean
    # removal (a review finding).  Detrend of a zero-variance channel is
    # its mean removal in all three forms.
    slope = F.coalesce(
        F.try_divide(
            F.avg(F.col("_tc") * F.col("_yc")).over(w),
            F.avg(F.col("_tc") * F.col("_tc")).over(w),
        ),
        F.lit(0.0),
    )
    return (
        centered.withColumn("value", F.col("_yc") - slope * F.col("_tc"))
        .select("channel_id", "t", "value")
    )


def _detrend_piecewise_agg(df, bps):
    """Piecewise-linear detrend with NO whole-channel window: the ordinal
    sample index is reconstructed arithmetically (uniform grids only),
    segments bucket on it, and each (channel, segment) fit comes from
    groupBy sufficient statistics + broadcast joins.

    A residual guard raises when a timestamp sits off its reconstructed
    grid slot (mixed-rate / jittered channels).  A channel with DROPPED
    samples keeps small residuals but shifts ordinal indices — gapped
    grids are not detectable here; use the window form for those.
    """
    geo = df.groupBy("channel_id").agg(
        F.min("t").alias("_t0"),
        F.max("t").alias("_t1"),
        F.count("*").alias("_n"),
    )
    sr = (F.col("_n") - 1) / (F.col("_t1") - F.col("_t0"))
    pos = (F.col("t") - F.col("_t0")) * sr
    i = F.floor(pos + 0.5).cast("long")
    off_grid = F.abs(pos - i) > 0.25
    # The span division must stay behind a lazy CaseWhen branch: ANSI
    # Spark throws DIVIDE_BY_ZERO eagerly for a 1-row channel (0/0)
    # otherwise.  1-row channels index to slot 0 (their 1-point segment
    # fit is handled by the try_divide below, matching the window form);
    # multi-row zero-span channels raise loudly like _chunked_src.
    idx = (
        F.when(F.col("_n") <= 1, F.lit(0).cast("long"))
        .when(
            F.col("_t1") == F.col("_t0"),
            F.raise_error(
                F.concat(
                    F.lit("detrend(uniform_grid=True): channel "),
                    F.col("channel_id"),
                    F.lit(
                        " has multiple rows with zero time span (all "
                        "timestamps equal) — no sample grid exists"
                    ),
                )
            ).cast("long"),
        )
        .when(
            off_grid,
            F.raise_error(
                F.concat(
                    F.lit("detrend(uniform_grid=True): channel "),
                    F.col("channel_id"),
                    F.lit(
                        " is not on a uniform time grid (timestamp off its "
                        "reconstructed slot); use the default window form"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(i)
    )
    seg = sum(
        (F.when(idx >= b, 1).otherwise(0) for b in bps), F.lit(0)
    )
    src = (
        df.join(F.broadcast(geo), "channel_id")
        .withColumn("_seg", seg)
        .select("channel_id", "_seg", "t", "value")
    )
    means = src.groupBy("channel_id", "_seg").agg(
        F.avg("t").alias("_mt"), F.avg("value").alias("_my")
    )
    centered = src.join(F.broadcast(means), ["channel_id", "_seg"]).select(
        "channel_id",
        "_seg",
        "t",
        (F.col("t") - F.col("_mt")).alias("_tc"),
        (F.col("value") - F.col("_my")).alias("_yc"),
    )
    fits = centered.groupBy("channel_id", "_seg").agg(
        F.avg(F.col("_tc") * F.col("_yc")).alias("_sxy"),
        F.avg(F.col("_tc") * F.col("_tc")).alias("_sxx"),
    )
    slope = F.coalesce(F.try_divide(F.col("_sxy"), F.col("_sxx")), F.lit(0.0))
    return (
        centered.join(F.broadcast(fits), ["channel_id", "_seg"])
        .select(
            "channel_id", "t", (F.col("_yc") - slope * F.col("_tc")).alias("value")
        )
    )


def _detrend_agg(df, dt_type):
    """Scale-safe detrend: groupBy sufficient statistics + broadcast joins
    (one tiny row per channel), value-level arithmetic per row.  No
    whole-channel windows anywhere in the plan."""
    if dt_type == "constant":
        means = df.groupBy("channel_id").agg(F.avg("value").alias("_m"))
        return (
            df.join(F.broadcast(means), "channel_id")
            .select("channel_id", "t", (F.col("value") - F.col("_m")).alias("value"))
        )
    means = df.groupBy("channel_id").agg(
        F.avg("t").alias("_mt"), F.avg("value").alias("_my")
    )
    centered = df.join(F.broadcast(means), "channel_id").select(
        "channel_id",
        "t",
        (F.col("t") - F.col("_mt")).alias("_tc"),
        (F.col("value") - F.col("_my")).alias("_yc"),
    )
    fits = centered.groupBy("channel_id").agg(
        F.avg(F.col("_tc") * F.col("_yc")).alias("_sxy"),
        F.avg(F.col("_tc") * F.col("_tc")).alias("_sxx"),
    )
    # try_divide: a 1-row channel has zero t-variance; detrend of a single
    # point is its mean removal (slope 0), matching the window form.
    slope = F.coalesce(F.try_divide(F.col("_sxy"), F.col("_sxx")), F.lit(0.0))
    return (
        centered.join(F.broadcast(fits), "channel_id")
        .select(
            "channel_id",
            "t",
            (F.col("_yc") - slope * F.col("_tc")).alias("value"),
        )
    )
