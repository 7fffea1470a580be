"""Margin audit for the rounded production-PSD oracles (oracle_prod.py).

The PSD legs compare an rfft kernel against an O(N^2) DFT oracle; both
sides round HALF_UP at oracle_prod.PSD_ROUND digits.  That is stable iff,
on the fixed driver datasets, every output value sits much farther from a
rounding boundary than the worst FFT-vs-DFT (plus summation-order)
divergence.  This test re-measures both per dataset so a data refresh that
erodes the margin fails loudly here instead of flaking the driver gate.

The filter/SRS/spline legs need no such audit: their oracles replay the
exact kernel recursions bit-for-bit (no rounding anywhere).
"""

import os

import duckdb
import numpy as np
import pytest

import oracle_prod as OP
from pandas_sigproc_spark.kernels.spectral import (
    get_window,
    welch_psd,
    welch_segment_bounds,
)

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]
# Strict correctness on fixed data only needs margin > err (both are
# measured over the same values, so margin > err == zero rounding flips).
# The extra factor is headroom for DuckDB summation orders beyond the two
# this test enumerates (order-variation scales with the same eps*|p| as
# the measured divergence, so ~30x headroom covers any reordering).
MIN_SAFETY = 30.0


def _uniform_channels(sf_dir: str):
    """Replicate the _uniform prep (dedup + hourly linear resample) in
    numpy — same expressions as the operator and the oracle CTEs."""
    con = duckdb.connect()
    df = con.sql(f"""
        WITH sig AS (
          SELECT CAST(user_id AS VARCHAR) AS channel_id, epoch(ts) AS t,
                 CAST(value AS DOUBLE) AS val
          FROM '{sf_dir}/events.parquet')
        SELECT channel_id, t, AVG(val) AS v
        FROM sig GROUP BY channel_id, t ORDER BY channel_id, t
    """).df()
    out = {}
    for cid, g in df.groupby("channel_id"):
        t = g["t"].to_numpy()
        v = g["v"].to_numpy()
        t0, t1 = t.min(), t.max()
        if not t1 > t0:
            continue
        n = int(np.ceil((t1 - t0) / 3600.0))
        tg = t0 + np.arange(n) * 3600.0
        idx = np.searchsorted(t, tg, side="right") - 1
        y = np.empty(n)
        for j, (x_, i_) in enumerate(zip(tg, idx)):
            if x_ == t[i_]:
                y[j] = v[i_]
            else:
                x0, x1 = t[i_], t[i_ + 1]
                y[j] = v[i_] + (v[i_ + 1] - v[i_]) * (x_ - x0) / (x1 - x0)
        out[cid] = y
    return out


def _dft_psd_estimates(y, n_window, n_ov, fs):
    """Per-segment one-sided-density periodograms via a naive DFT, in two
    different summation orders — a proxy bound for the oracle's
    (order-unspecified) SQL SUM."""
    win = get_window("hann", n_window)
    scale = 1.0 / (fs * float(np.dot(win, win)))
    starts = welch_segment_bounds(len(y), n_window, n_ov)
    m = np.arange(n_window)
    ks = np.arange(n_window // 2 + 1)
    ang = (2.0 * np.pi / n_window) * ((m[:, None] * ks[None, :]) % n_window)
    C, S = np.cos(ang), np.sin(ang)
    outs = []
    for rev in (False, True):
        psegs = []
        for s in starts:
            seg = y[s: s + n_window]
            xw = (seg - np.mean(seg)) * win
            if rev:
                re = (xw[::-1, None] * C[::-1]).sum(axis=0)
                im = (xw[::-1, None] * S[::-1]).sum(axis=0)
            else:
                re = (xw[:, None] * C).sum(axis=0)
                im = (xw[:, None] * S).sum(axis=0)
            p = (re * re + im * im) * scale
            if n_window % 2 == 0:
                p[1:-1] *= 2.0
            else:
                p[1:] *= 2.0
            psegs.append(p)
        outs.append(np.stack(psegs))
    return outs


def _margin(vals, digits):
    sc = 10.0 ** digits
    return float(np.min(np.abs((np.asarray(vals) * sc) % 1.0 - 0.5)) / sc)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("n_window", [64, 128])
def test_psd_round_margin(sf_dir, n_window):
    chans = _uniform_channels(sf_dir)
    if sf_dir.endswith("0.1"):
        # sf0.1 has 1500 channels; a 150-channel sample bounds the same
        # error/margin statistics at 10% of the runtime.
        chans = dict(list(chans.items())[:150])
    n_ov = n_window // 2
    maxerr = 0.0
    outs_mean = []
    for fs in (round(OP.HOURLY, 9), OP.HOURLY):
        for y in chans.values():
            if len(y) < n_window:
                continue
            _, kernel_mean = welch_psd(
                y, fs, window_length=n_window / fs, overlap=0.5,
                window_type="hann", summarize="mean", detrend="constant",
            )
            ests = _dft_psd_estimates(y, n_window, n_ov, fs)
            for e in ests:
                err = np.max(np.abs(e.mean(axis=0)[1:] - kernel_mean))
                maxerr = max(maxerr, float(err))
            outs_mean.append(kernel_mean)
    vals = np.concatenate(outs_mean)
    margin = _margin(vals, OP.PSD_ROUND)
    assert margin > MIN_SAFETY * maxerr, (
        f"PSD rounding margin {margin:.3e} no longer dominates DFT/FFT "
        f"divergence {maxerr:.3e} at {sf_dir} n={n_window}; re-pick "
        "oracle_prod.PSD_ROUND"
    )


def _idx_channels(sf_dir: str):
    """Replicate the 48 kHz index time base (q_filt_a / q_accessor_chain):
    dedup'd raw values per channel, t = (i-1)/48000."""
    con = duckdb.connect()
    df = con.sql(f"""
        WITH sig AS (
          SELECT CAST(user_id AS VARCHAR) AS channel_id, epoch(ts) AS t,
                 CAST(value AS DOUBLE) AS val
          FROM '{sf_dir}/events.parquet')
        SELECT channel_id, t, AVG(val) AS v
        FROM sig GROUP BY channel_id, t ORDER BY channel_id, t
    """).df()
    out = {}
    for cid, g in df.groupby("channel_id"):
        v = g["v"].to_numpy()
        out[cid] = (np.arange(len(v), dtype=np.float64) / 48000.0, v)
    return out


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_accessor_chain_round_margin(sf_dir):
    """q_accessor_chain rounds its VALUE to 6 digits against a chain
    replay whose detrend means / rolling mean-of-squares differ from the
    kernel's (numpy pairwise & longdouble) summation order.  Re-measure
    that the rounding margin dominates a summation-order perturbation
    proxy (sequential-mean detrend variant) on each dataset."""
    from pandas_sigproc_spark.kernels.design import a_weighting, butter
    from pandas_sigproc_spark.kernels.iir import filtfilt, lfilter

    b1, a1 = butter(2, 8000.0 / 24000.0, "lowpass")
    b2, a2 = a_weighting(48000.0)
    chans = _idx_channels(sf_dir)
    if sf_dir.endswith("0.1"):
        chans = dict(list(chans.items())[:150])
    vals, errs = [], []
    for t, v in chans.values():
        if len(v) <= 21:
            continue
        xb = filtfilt(b1, a1, v)

        def detrend(ys, seq):
            mt = (np.sum(t) / len(t)) if seq else t.mean()
            my = (np.sum(ys) / len(ys)) if seq else ys.mean()
            tc, yc = t - mt, ys - my
            den = (np.sum(tc * tc) / len(t)) if seq else np.mean(tc * tc)
            cov = (np.sum(tc * yc) / len(t)) if seq else np.mean(tc * yc)
            return yc - (cov / den if den > 0 else 0.0) * tc

        outs = []
        for seq in (False, True):
            ya = lfilter(b2, a2, detrend(xb, seq))
            sq = ya * ya
            cs = np.concatenate([[0.0], np.cumsum(sq if seq else sq.astype(np.longdouble))])
            means = ((cs[24:] - cs[:-24]) / 24).astype(np.float64)
            outs.append(np.sqrt(np.maximum(means, 0.0))[:-1])
        vals.append(outs[0])
        errs.append(np.max(np.abs(outs[0] - outs[1])))
    allv = np.concatenate(vals)
    maxerr = max(errs)
    margin = _margin(allv, 6)
    assert margin > MIN_SAFETY * maxerr, (
        f"accessor_chain margin {margin:.3e} vs divergence {maxerr:.3e} "
        f"at {sf_dir}"
    )
