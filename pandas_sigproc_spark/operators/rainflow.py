"""Rainflow cycle counting operator (fatigue analysis).

Reference ``timedomain.rainflow`` (``extension.py:936-961``) → the
vendored ASTM E1049-85 kernel per channel.  The stack algorithm is
inherently sequential per channel (SURVEY.md §2.4), so this is a
grouped-map UDF producing the ``rainflow_counts`` table
(channel_id, bin, cycles).

Scale path for channels exceeding one task (SURVEY.md §7.3.1): segmented
counting with residue-stack merge — count full cycles inside chunks, carry
each chunk's unresolved reversal residue to a final merge pass.  The
residues are tiny (monotone-envelope stacks), so the merge is a cheap
second round.  Not enabled by default; whole-channel groups are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pandas_sigproc_spark.planner import bucket_expr as _bucket_expr

from pandas_sigproc_spark.kernels import rainflow as _rf

_OUT_SCHEMA = "channel_id string, bin double, cycles double"


def rainflow(
    df: DataFrame,
    ndigits: int | None = None,
    nbins: int | None = None,
    binsize: float | None = None,
    n_buckets: int | None | str = "auto",
    order_cols: tuple[str, ...] = ("t",),
) -> DataFrame:
    """Per-channel (bin, cycles) pairs, kwargs forwarded like the
    reference (``extension.py:961``).

    ``n_buckets``: hash channels into K buckets, one Arrow group per
    bucket, looping channels inside the kernel — the kernel itself is
    ~30 ns/sample, so for many small channels the per-group Arrow/job
    overhead dominates and bucketing amortizes it (same trade as the
    filters, operators/filters.py).  The default ``"auto"`` picks the
    mode from channel statistics (planner.py): small-channel fleets
    bucket, a channel above the per-task bound switches to the segmented
    residue-merge plan (``rainflow_chunked`` — identical counts by the
    residue decomposition theorem), explicit values win.

    ``order_cols``: intra-channel sample ordering.  Rainflow is
    order-sensitive, so when timestamps can tie, pass a tiebreak column
    (e.g. ``("t", "seq")``) — otherwise equal-stamp samples arrive in
    nondeterministic shuffle order and the counts can vary run to run.
    """
    if n_buckets == "auto":
        from pandas_sigproc_spark import planner

        stats = planner.get_stats(df)
        if stats.max_rows > planner.HUGE_CHANNEL_ROWS:
            return rainflow_chunked(
                df,
                chunk_rows=planner.HUGE_CHANNEL_ROWS // 4,
                ndigits=ndigits,
                nbins=nbins,
                binsize=binsize,
                order_cols=order_cols,
            )
        if stats.max_rows <= planner.SMALL_CHANNEL_ROWS and stats.n_channels > 1:
            cpus = df.sparkSession.sparkContext.defaultParallelism
            n_buckets = min(4 * cpus, max(stats.n_channels // 4, 1))
        else:
            n_buckets = None

    def one(cid, y: np.ndarray) -> pd.DataFrame:
        pairs = _rf.count_cycles(y, ndigits=ndigits, nbins=nbins, binsize=binsize)
        if not pairs:
            return pd.DataFrame(columns=["channel_id", "bin", "cycles"])
        bins, cycles = zip(*pairs)
        return pd.DataFrame(
            {
                "channel_id": cid,
                "bin": np.asarray(bins, dtype=np.float64),
                "cycles": np.asarray(cycles, dtype=np.float64),
            }
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["channel_id", *order_cols], kind="mergesort")
        pieces = [
            one(cid, grp["value"].to_numpy(dtype=np.float64))
            for cid, grp in pdf.groupby("channel_id", sort=False)
        ]
        if not pieces:
            return pd.DataFrame(columns=["channel_id", "bin", "cycles"])
        return pd.concat(pieces, ignore_index=True)

    src = df.select("channel_id", *order_cols, "value")
    if n_buckets is None:
        return src.groupBy("channel_id").applyInPandas(kernel, _OUT_SCHEMA)
    from pyspark.sql import functions as F

    bucketed = src.withColumn("_b", _bucket_expr("channel_id", n_buckets))
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns=["_b"])), _OUT_SCHEMA
    )


def rainflow_chunked(
    df: DataFrame,
    chunk_rows: int,
    ndigits: int | None = None,
    nbins: int | None = None,
    binsize: float | None = None,
    order_cols: tuple[str, ...] = ("t",),
) -> DataFrame:
    """Segmented rainflow for channels exceeding one task (SURVEY.md §7.3.1).

    Stage 1 (parallel over (channel, chunk)): the 4-point rule extracts
    every *full* cycle whose reversals live inside the chunk and emits the
    chunk's residue — the divergent reversal envelope, typically a few
    dozen points regardless of chunk length.  Stage 2 (per channel, tiny):
    residues concatenate in chunk order and the standard 3-point E1049
    pass counts the rest (cross-chunk fulls + half cycles).  The merge is
    exact — rainflow's residue decomposition theorem, pinned against the
    whole-channel kernel in tests/test_rainflow_chunked.py over random
    signals, chunk sizes, and every binning mode.

    Binning runs relationally on the unioned cycle stream (groupBy after a
    per-channel max-range window for nbins/binsize), so no stage ever
    needs the whole channel.
    """
    from pyspark.sql import Window, functions as F

    given = sum(arg is not None for arg in (ndigits, nbins, binsize))
    if given > 1:
        raise ValueError("specify at most one of ndigits, nbins, binsize")

    L = int(chunk_rows)
    w = Window.partitionBy("channel_id").orderBy(*order_cols)
    src = df.select(
        "channel_id", *order_cols, "value",
        ((F.row_number().over(w) - 1) / L).cast("long").alias("_seg"),
    )

    stage1_schema = (
        "channel_id string, seg long, pos long, rng double, cnt double, val double"
    )

    def stage1(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        fulls, residue = _rf.extract_full_cycles_4pt(
            pdf["value"].to_numpy(dtype=np.float64)
        )
        cid = pdf["channel_id"].iloc[0]
        seg = int(pdf["_seg"].iloc[0])
        rows = [(cid, seg, -1, r, c, np.nan) for r, c in fulls]
        rows += [(cid, seg, i, np.nan, np.nan, v) for i, v in enumerate(residue)]
        return pd.DataFrame(
            rows, columns=["channel_id", "seg", "pos", "rng", "cnt", "val"]
        )

    mixed = src.groupBy("channel_id", "_seg").applyInPandas(stage1, stage1_schema)
    mixed = mixed.persist()
    cycle_rows = mixed.filter(F.col("pos") == -1).select("channel_id", "rng", "cnt")

    residue_schema = "channel_id string, rng double, cnt double"

    def stage2(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["seg", "pos"])
        pairs = _rf.extract_cycles(pdf["val"].to_numpy(dtype=np.float64))
        cid = pdf["channel_id"].iloc[0]
        return pd.DataFrame(
            [(cid, r, c) for r, _m, c, _i0, _i1 in pairs],
            columns=["channel_id", "rng", "cnt"],
        )

    residue_rows = (
        mixed.filter(F.col("pos") >= 0)
        .select("channel_id", "seg", "pos", "val")
        .groupBy("channel_id")
        .applyInPandas(stage2, residue_schema)
    )
    cycles = cycle_rows.unionByName(residue_rows)

    if ndigits is not None:
        key = F.round(F.col("rng"), ndigits)
    elif nbins is not None or binsize is not None:
        wch = Window.partitionBy("channel_id")
        max_rng = F.max("rng").over(wch)
        bsz = F.lit(float(binsize)) if binsize is not None else max_rng / nbins
        nb = (
            F.lit(int(nbins))
            if nbins is not None
            else F.greatest(F.ceil(max_rng / bsz), F.lit(1))
        )
        b = F.when(F.col("rng") == 0, F.lit(0)).otherwise(
            F.greatest(
                F.least(F.ceil(F.col("rng") / bsz) - 1, nb.cast("long") - 1),
                F.lit(0),
            )
        )
        key = (b + 1) * bsz
    else:
        key = F.col("rng")
    # Materialize the key first: window expressions (the per-channel max
    # range) are not allowed inside GROUP BY.
    return (
        cycles.withColumn("bin", key)
        .groupBy("channel_id", "bin")
        .agg(F.sum("cnt").alias("cycles"))
        .select("channel_id", "bin", "cycles")
    )
