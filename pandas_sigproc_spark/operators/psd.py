"""PSD operator: relational Welch segmentation + per-segment FFT kernel.

Reference ``get_psd`` (``extension.py:569-625``, kernel ``tools.py:13-100``).

Spark-first decomposition (SURVEY.md §2.8 row get_psd):

1. **Segmentation is relational** — per-channel row numbers assign each
   sample to the Welch segments it belongs to (an overlapping segment
   membership is a bounded explode of at most
   ``ceil(n_window / n_step)`` copies — 2 for the default 50% overlap).
2. **FFT per (channel, segment)** via ``applyInPandas`` — this
   parallelizes *within* a channel, which the reference's whole-array
   kernel cannot do.
3. **Summarize across segments is a native aggregation** — mean / exact
   median / max / min per frequency bin; the 'max rms' / 'damage' global
   rescales are a per-channel broadcast join of a 1-row factor table.

For moderate channels (fits comfortably in one task) the whole-channel
kernel path (``welch_psd``) avoids the explode; ``segmented=True`` picks
the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from pandas_sigproc_spark.planner import bucket_expr as _bucket_expr

from pandas_sigproc_spark.kernels import spectral as _spectral

_SPECTRA_SCHEMA = "channel_id string, freq double, power double"
_SEG_SCHEMA = "channel_id string, seg long, freq double, power double"


def get_psd(
    df: DataFrame,
    window_length: float | None = None,
    overlap: float = 0.5,
    window_type: str = "hann",
    summarize: str = "mean",
    fatigue_exponent: float = 4.0,
    detrend="constant",
    samplerate: float | None = None,
    segmented: bool | str = "auto",
    tiebreak_col: str | None = None,
    n_buckets: int | None | str = "auto",
) -> DataFrame:
    """Per-channel PSD -> spectra(channel_id, freq, power).

    ``summarize='all'`` returns (channel_id, seg, freq, power).
    ``samplerate=None`` infers per group from the time base.
    Execution modes by channel size (SURVEY.md §7.3.1): ``n_buckets=K``
    batches many small channels per task with one stacked FFT;
    ``segmented=True`` splits one huge channel across tasks (relational
    segment ids + per-segment FFT); per-channel otherwise.  Both default
    to ``"auto"``: the mode is picked from per-channel row statistics
    (planner.py) so the 100 TB plan needs no kwargs; explicit values win.
    """
    if segmented == "auto" or n_buckets == "auto":
        from pandas_sigproc_spark import planner

        auto_nb, auto_seg = planner.auto_psd_mode(df, samplerate, window_length)
        if segmented == "auto":
            # Respect an explicit bucket request; only auto-segment when
            # bucketing was left to the planner too.
            segmented = auto_seg if n_buckets in ("auto", None) else False
        if n_buckets == "auto":
            n_buckets = None if segmented else auto_nb
    if segmented is True and window_length is None:
        # an explicit segmented=True was previously IGNORED without a
        # window_length, silently falling back to the one-task-per-
        # channel plan the caller asked to avoid (a review finding)
        raise ValueError(
            "segmented PSD requires window_length (the segment size);"
            " got segmented=True with window_length=None"
        )
    if window_length is None or not segmented:
        if n_buckets is not None and summarize != "all":
            return _bucketed_psd(
                df,
                window_length,
                overlap,
                window_type,
                summarize,
                fatigue_exponent,
                detrend,
                samplerate,
                n_buckets,
            )
        return _whole_channel_psd(
            df,
            window_length,
            overlap,
            window_type,
            summarize,
            fatigue_exponent,
            detrend,
            samplerate,
        )
    return _segmented_psd(
        df,
        window_length,
        overlap,
        window_type,
        summarize,
        fatigue_exponent,
        detrend,
        samplerate,
        tiebreak_col,
    )


def _whole_channel_psd(
    df, window_length, overlap, window_type, summarize, fatigue_exponent, detrend, sr
):
    out_schema = _SEG_SCHEMA if summarize == "all" else _SPECTRA_SCHEMA

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        t = pdf["t"].to_numpy(dtype=np.float64)
        y = pdf["value"].to_numpy(dtype=np.float64)
        rate = sr if sr is not None else _infer_sr(t)
        freq, pxx = _spectral.welch_psd(
            y,
            rate,
            window_length=window_length,
            overlap=overlap,
            window_type=window_type,
            summarize=summarize,
            fatigue_exponent=fatigue_exponent,
            detrend=detrend,
        )
        cid = pdf["channel_id"].iloc[0]
        if summarize == "all":
            if window_length is not None:
                n_seg, n_bin = pxx.shape
                return pd.DataFrame(
                    {
                        "channel_id": cid,
                        "seg": np.repeat(np.arange(n_seg), n_bin),
                        "freq": np.tile(freq, n_seg),
                        "power": pxx.ravel(),
                    }
                )
            # 'all' with the default window_length: the whole signal is
            # ONE segment — emit it as seg 0 (a review finding: the
            # fallthrough returned 3 columns against the 4-column
            # schema and crashed with RESULT_COLUMN_NAMES_MISMATCH)
            return pd.DataFrame(
                {
                    "channel_id": cid,
                    "seg": np.zeros(len(freq), dtype=np.int64),
                    "freq": freq,
                    "power": pxx,
                }
            )
        return pd.DataFrame({"channel_id": cid, "freq": freq, "power": pxx})

    return (
        df.select("channel_id", "t", "value")
        .groupBy("channel_id")
        .applyInPandas(kernel, out_schema)
    )


def _bucketed_psd(
    df,
    window_length,
    overlap,
    window_type,
    summarize,
    fatigue_exponent,
    detrend,
    sr,
    n_buckets,
):
    """Many-small-channels path: hash channels into buckets; inside each
    task, stack every channel's Welch segments into ONE batched FFT call,
    then reduce per channel.  Identical numerics to the per-channel path
    (asserted in tests); ~bucket-size fewer Arrow groups and FFT setups.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["channel_id", "t"])
        pieces = []
        chans = []
        for cid, grp in pdf.groupby("channel_id", sort=False):
            t = grp["t"].to_numpy(dtype=np.float64)
            y = grp["value"].to_numpy(dtype=np.float64)
            rate = sr if sr is not None else _infer_sr(t)
            chans.append((cid, y, rate))
        # One group per samplerate: Welch segments are all n_window long
        # regardless of the channel's own length, so EVERY member's
        # segments stack into a single batched FFT (per-row numerics are
        # unchanged — rfft rows are independent).  Grouping by
        # (rate, length) — round 3's scheme — fragmented buckets into one
        # FFT call per distinct channel length.
        groups: dict = {}
        for cid, y, rate in chans:
            groups.setdefault(round(rate, 9), []).append((cid, y))
        for rate, members in groups.items():
            if window_length is None:
                # Whole-channel periodograms need equal lengths per call.
                by_len: dict = {}
                for cid, y in members:
                    by_len.setdefault(len(y), []).append((cid, y))
                for _n, mem in by_len.items():
                    X = np.stack([y for _, y in mem])
                    freq, pxx = _spectral.periodogram(X, rate, "boxcar", "constant")
                    keep = freq > 0
                    for row, (cid, _y) in enumerate(mem):
                        pieces.append(
                            pd.DataFrame(
                                {"channel_id": cid, "freq": freq[keep],
                                 "power": pxx[row][keep]}
                            )
                        )
                continue
            n_window = int(rate * window_length)
            n_overlap = int(round(n_window * overlap))
            seg_rows = []
            seg_counts = []
            for _cid, y in members:
                starts = _spectral.welch_segment_bounds(len(y), n_window, n_overlap)
                if not starts:
                    raise ValueError("window_length longer than the signal")
                seg_rows.extend(y[s: s + n_window] for s in starts)
                seg_counts.append(len(starts))
            segs = np.stack(seg_rows)
            freq, psd_all = _spectral.periodogram(
                segs, rate, window_type, detrend, axis=1
            )
            keep = freq > 0
            pos = 0
            for (cid, _y), n_seg in zip(members, seg_counts):
                sub = psd_all[pos: pos + n_seg]
                pos += n_seg
                pxx = _spectral.summarize_psds(sub, freq, summarize, fatigue_exponent)
                pieces.append(
                    pd.DataFrame(
                        {"channel_id": cid, "freq": freq[keep], "power": pxx[keep]}
                    )
                )
        return pd.concat(pieces, ignore_index=True)

    src = df.select("channel_id", "t", "value").withColumn(
        "_b", _bucket_expr("channel_id", n_buckets)
    )
    return src.groupBy("_b").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns=["_b"])), _SPECTRA_SCHEMA
    )


def _segmented_psd(
    df,
    window_length,
    overlap,
    window_type,
    summarize,
    fatigue_exponent,
    detrend,
    sr,
    tiebreak_col,
):
    """Scale path: explode samples into their overlapping segments, FFT per
    (channel, segment) group, reduce natively."""
    if sr is None:
        raise ValueError("segmented PSD requires an explicit samplerate")
    n_window = int(sr * window_length)
    n_overlap = int(round(n_window * overlap))
    n_step = n_window - n_overlap
    if n_step <= 0:
        raise ValueError("overlap must leave a positive step")
    max_copies = -(-n_window // n_step)  # ceil

    order = [F.col("t")] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy("channel_id").orderBy(*order)
    # Sample rn belongs to segment s iff s*step <= rn < s*step + n_window.
    s_hi = F.floor(F.col("_rn") / n_step)  # last candidate segment
    copies = F.sequence(
        F.greatest(s_hi - (max_copies - 1), F.lit(0).cast("long")), s_hi
    )
    seg_df = (
        df.select("channel_id", "t", "value")
        .withColumn("_rn", F.row_number().over(w) - 1)
        .withColumn("_seg", F.explode(copies))
        .filter(
            (F.col("_rn") >= F.col("_seg") * n_step)
            & (F.col("_rn") < F.col("_seg") * n_step + n_window)
        )
        .withColumn("_pos", F.col("_rn") - F.col("_seg") * n_step)
    )
    # Loud short-channel guard BEFORE the complete-segment filter: a
    # channel with fewer than n_window rows has NO complete segment and
    # previously just vanished from the output (a review finding —
    # every other PSD path raises 'window_length longer than the
    # signal').  The condition is arithmetic (complete segment exists
    # iff rows >= n_window), so the guard needs only the tiny
    # per-channel count table — broadcast, the segmented path exists
    # for FEW huge channels.
    geo = df.groupBy("channel_id").agg(F.count("*").alias("_cn"))
    seg_df = (
        seg_df.join(F.broadcast(geo), "channel_id")
        .withColumn(
            "_pos",
            F.when(
                F.col("_cn") < n_window,
                F.raise_error(
                    F.concat(
                        F.lit("get_psd segmented: channel "),
                        F.col("channel_id"),
                        F.lit(
                            " is shorter than one window_length — no"
                            " complete segment exists (the whole-channel"
                            " path raises for the same input)"
                        ),
                    )
                ).cast("long"),
            ).otherwise(F.col("_pos")),
        )
        .drop("_cn")
    )
    # Keep only complete segments (strided-view truncation, tools.py:67)
    # via a count window over the SAME (channel, segment) partitioning
    # the FFT groupBy needs — one pass, reusable exchange (a review
    # finding: the old self-join against a separate aggregation of
    # seg_df re-executed the row_number + explode lineage twice).
    wseg = Window.partitionBy("channel_id", "_seg")
    seg_df = seg_df.withColumn("_n", F.count("*").over(wseg)).filter(
        F.col("_n") == n_window
    )

    def fft_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos")
        y = pdf["value"].to_numpy(dtype=np.float64)
        freq, pxx = _spectral.periodogram(y, sr, window_type, detrend)
        return pd.DataFrame(
            {
                "channel_id": pdf["channel_id"].iloc[0],
                "seg": int(pdf["_seg"].iloc[0]),
                "freq": freq,
                "power": pxx,
            }
        )

    # NOTE: the positive-frequency mask is applied at the END — the
    # reference's 'max rms'/'damage' factors integrate the full spectrum
    # including the DC bin (tools.py:87-95 run before the f>0 mask at
    # extension.py:619-620).
    sub = seg_df.groupBy("channel_id", "_seg").applyInPandas(fft_kernel, _SEG_SCHEMA)

    if summarize == "all":
        return sub.filter(F.col("freq") > 0)
    if summarize in ("mean", "median", "max", "min"):
        agg = {
            "mean": F.avg("power"),
            "median": F.expr("percentile(power, 0.5)"),
            "max": F.max("power"),
            "min": F.min("power"),
        }[summarize]
        return (
            sub.groupBy("channel_id", "freq")
            .agg(agg.alias("power"))
            .filter(F.col("freq") > 0)
        )

    if summarize in ("max rms", "damage"):
        mean_psd = sub.groupBy("channel_id", "freq").agg(F.avg("power").alias("power"))
        # Per-segment RMS via trapezoid over freq, then the scalar factor.
        w_f = Window.partitionBy("channel_id", "seg").orderBy("freq")
        pairs = (
            sub.withColumn("_f2", F.lead("freq").over(w_f))
            .withColumn("_p2", F.lead("power").over(w_f))
            .filter(F.col("_f2").isNotNull())
        )
        seg_rms = pairs.groupBy("channel_id", "seg").agg(
            F.sqrt(
                F.sum((F.col("power") + F.col("_p2")) / 2.0 * (F.col("_f2") - F.col("freq")))
            ).alias("_rms")
        )
        # Reference semantics (tools.py:87, 93): mean_rms is the RMS *of the
        # mean PSD*, not the mean of per-segment RMS values.
        w_mf = Window.partitionBy("channel_id").orderBy("freq")
        mean_pairs = (
            mean_psd.withColumn("_f2", F.lead("freq").over(w_mf))
            .withColumn("_p2", F.lead("power").over(w_mf))
            .filter(F.col("_f2").isNotNull())
        )
        mean_rms = mean_pairs.groupBy("channel_id").agg(
            F.sqrt(
                F.sum((F.col("power") + F.col("_p2")) / 2.0 * (F.col("_f2") - F.col("freq")))
            ).alias("_mean_rms")
        )
        b = float(fatigue_exponent)
        factors = (
            seg_rms.join(F.broadcast(mean_rms), "channel_id")
            .groupBy("channel_id", "_mean_rms")
            .agg(
                F.max("_rms").alias("_max_rms"),
                F.avg(F.pow(F.col("_rms") / F.col("_mean_rms"), F.lit(b))).alias(
                    "_mean_pow"
                ),
            )
        )
        if summarize == "max rms":
            factor = F.pow(F.col("_max_rms") / F.col("_mean_rms"), 2.0)
        else:
            # acceleration factor = mean((rms_i/mean_rms)^b)^(1/b), squared.
            factor = F.pow(F.col("_mean_pow"), 2.0 / b)
        factors = factors.select("channel_id", factor.alias("_factor"))
        return (
            mean_psd.join(F.broadcast(factors), "channel_id")
            .select(
                "channel_id", "freq", (F.col("power") * F.col("_factor")).alias("power")
            )
            .filter(F.col("freq") > 0)
        )
    raise ValueError(f"{summarize!r} is not a valid summary type")


def _infer_sr(t: np.ndarray) -> float:
    from pandas_sigproc_spark.operators.filters import _infer_sr as f

    return f(t)
