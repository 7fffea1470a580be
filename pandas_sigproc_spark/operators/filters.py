"""Kernel-tier IIR filtering operators: ``filt_butter`` / ``filt_cfc`` /
``filt_a``.

These are the reference's grouped sequential kernels
(``extension.py:452-567``): the recursion carries state sample-to-sample,
so each channel must be processed in time order by one task.  Implementation
is ``groupBy("channel_id").applyInPandas`` — Arrow-batched, one channel per
group, running the vendored NumPy kernels (which themselves use the
O(n log n) FFT path for long channels, the chunked-filtering scale story of
SURVEY.md §7.3.1).

Filter coefficients are designed *driver-side* from the channel catalog's
samplerate (constant-folded into the UDF closure) when all channels share a
rate, or per-group from the group's own time base otherwise.

Scale note: groups are independent, so 1e6 channels fan out across
executors; the shuffle is one pass on ``channel_id``.  A channel too big
for one task is the documented limit — the overlap-save split for that
case rides on the same kernels (``kernels.iir`` impulse-response length
bounds the needed overlap).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pandas_sigproc_spark.kernels import design as _design
from pandas_sigproc_spark.kernels import iir as _iir
from pandas_sigproc_spark.kernels import iir_batch as _iirb

_OUT_SCHEMA = "channel_id string, t double, value double"


def _infer_sr(t: np.ndarray) -> float:
    dt = np.diff(t)
    if len(dt) == 0 or dt.min() <= 0:
        raise ValueError("cannot infer samplerate from <2 samples or non-increasing t")
    spread = (dt.max() - dt.min()) / dt.mean()
    if spread > 1e-4:
        raise ValueError(
            "non-uniform channel: filters require a uniform samplerate "
            "(SURVEY.md §7.3.3)"
        )
    sr = 1.0 / dt.mean()
    return float(round(sr)) if abs(sr - round(sr)) < 0.01 and sr >= 1 else sr


def _apply_filter(
    df: DataFrame, make_ba, zero_phase: bool, n_buckets: int | None = None
) -> DataFrame:
    """Shared applyInPandas driver: design (b, a) per group, run the IIR.

    ``n_buckets=None``: one Arrow group per channel (huge channels).
    ``n_buckets=K``: channels are hashed into K buckets and each task
    filters its whole bucket as a (channels x time) matrix with the
    batched kernels — same results, but per-channel Arrow/FFT overhead is
    amortized ~bucket-size times.  The right mode at 100 TB depends on
    channel length: many small channels -> bucket; few huge ones -> per
    channel (SURVEY.md §7.3.1).
    """

    def one_channel(cid, t, y) -> pd.DataFrame:
        sr = _infer_sr(t)
        b, a = make_ba(sr)
        out = _iir.filtfilt(b, a, y) if zero_phase else _iir.lfilter(b, a, y)
        return pd.DataFrame({"channel_id": cid, "t": t, "value": out})

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["channel_id", "t"])
        pieces = []
        # Batch channels of identical (length, samplerate): one matrix op.
        groups: dict = {}
        for cid, grp in pdf.groupby("channel_id", sort=False):
            t = grp["t"].to_numpy(dtype=np.float64)
            y = grp["value"].to_numpy(dtype=np.float64)
            sr = _infer_sr(t)
            groups.setdefault((len(t), round(sr, 9)), []).append((cid, t, y))
        for (_n, sr), members in groups.items():
            b, a = make_ba(sr)
            if len(members) == 1:
                cid, t, y = members[0]
                out = (
                    _iir.filtfilt(b, a, y) if zero_phase else _iir.lfilter(b, a, y)
                )
                pieces.append(
                    pd.DataFrame({"channel_id": cid, "t": t, "value": out})
                )
                continue
            X = np.stack([y for _, _, y in members])
            Y = (
                _iirb.filtfilt_batch(b, a, X)
                if zero_phase
                else _iirb.lfilter_batch(b, a, X)
            )
            for row, (cid, t, _y) in enumerate(members):
                pieces.append(
                    pd.DataFrame({"channel_id": cid, "t": t, "value": Y[row]})
                )
        return pd.concat(pieces, ignore_index=True)

    src = df.select("channel_id", "t", "value")
    if n_buckets is None:
        def single(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("t")
            return one_channel(
                pdf["channel_id"].iloc[0],
                pdf["t"].to_numpy(dtype=np.float64),
                pdf["value"].to_numpy(dtype=np.float64),
            )

        return src.groupBy("channel_id").applyInPandas(single, _OUT_SCHEMA)
    bucketed = src.withColumn(
        "_b", F.abs(F.hash("channel_id")) % int(n_buckets)
    )
    return bucketed.groupBy("_b").applyInPandas(
        lambda pdf: kernel(pdf.drop(columns=["_b"])), _OUT_SCHEMA
    )


def filt_butter(
    df: DataFrame, cutoff, order: int, btype: str, n_buckets: int | None = None
) -> DataFrame:
    """Zero-phase Butterworth filter (reference ``extension.py:452-497``).

    The order is halved before design because forward-backward filtering
    doubles it; odd orders are bumped up (``extension.py:480-483`` — the
    reference prints a warning; here the bump is silent and documented).
    Cutoff is normalized by Nyquist per group samplerate.
    """
    half = order / 2
    order_used = math.ceil(half)

    def make_ba(sr: float):
        nyq = 0.5 * sr
        wn = np.asarray(cutoff, dtype=np.float64) / nyq
        return _design.butter(order_used, wn, btype)

    return _apply_filter(df, make_ba, zero_phase=True, n_buckets=n_buckets)


def filt_cfc(df: DataFrame, cfc: float, n_buckets: int | None = None) -> DataFrame:
    """SAE J211 Channel Frequency Class filter, zero-phase
    (reference ``extension.py:499-539``)."""

    def make_ba(sr: float):
        return _design.cfc_coefficients(cfc, sr)

    return _apply_filter(df, make_ba, zero_phase=True, n_buckets=n_buckets)


def filt_a(df: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """IEC 1672 A-weighting, applied causally with ``lfilter`` — the
    deliberate phase-distorting contrast to the filtfilt ops
    (reference ``extension.py:541-567``; design ``tools.py:257-301``).
    """

    def make_ba(sr: float):
        return _design.a_weighting(sr)

    return _apply_filter(df, make_ba, zero_phase=False, n_buckets=n_buckets)
