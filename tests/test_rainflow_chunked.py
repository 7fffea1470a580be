"""Segmented rainflow (4-point fulls + residue merge) == whole-channel
E1049 counting, for every binning mode (SURVEY.md §7.3.1 hard part 2)."""

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.operators import rainflow, rainflow_chunked
from tests.conftest import make_signals


@pytest.fixture(scope="module")
def fatigue(spark):
    rng = np.random.default_rng(21)
    chans = {}
    for cid, n in [("x", 20_000), ("y", 7_777), ("tiny", 3)]:
        t = np.arange(n, dtype=np.float64)
        chans[cid] = (t, rng.standard_normal(n).round(2))
    return make_signals(spark, chans)


def _counts(df):
    pdf = df.toPandas().sort_values(["channel_id", "bin"]).reset_index(drop=True)
    return [
        (r["channel_id"], round(r["bin"], 9), round(r["cycles"], 9))
        for _, r in pdf.iterrows()
    ]


@pytest.mark.parametrize(
    "kwargs",
    [dict(ndigits=2), dict(nbins=10), dict(binsize=0.7), dict()],
    ids=["ndigits", "nbins", "binsize", "raw"],
)
def test_chunked_equals_whole(spark, fatigue, kwargs):
    whole = _counts(rainflow(fatigue, **kwargs))
    seg = _counts(rainflow_chunked(fatigue, chunk_rows=1024, **kwargs))
    assert seg == whole


def test_chunk_size_invariance(spark, fatigue):
    a = _counts(rainflow_chunked(fatigue, chunk_rows=100, ndigits=2))
    b = _counts(rainflow_chunked(fatigue, chunk_rows=50_000, ndigits=2))
    assert a == b


def test_mutually_exclusive_kwargs(spark, fatigue):
    with pytest.raises(ValueError, match="at most one"):
        rainflow_chunked(fatigue, chunk_rows=1024, ndigits=2, nbins=5)
