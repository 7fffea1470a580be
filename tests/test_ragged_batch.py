"""Ragged batch IIR kernels (kernels/iir_batch): property-level pin that
batching unequal-length channels NEVER changes any channel's bits on the
loop path, and stays within FFT tolerance on the long path — the contract
the bucketed operators and the production DuckDB oracles stand on."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pandas_sigproc_spark.kernels.design import a_weighting, butter
from pandas_sigproc_spark.kernels.iir import filtfilt, lfilter
from pandas_sigproc_spark.kernels.iir_batch import (
    filtfilt_batch_ragged,
    lfilter_batch_ragged,
)


def _arrays(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.standard_normal(n) for n in lengths]


@settings(max_examples=25, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=30, max_value=900), min_size=1,
                     max_size=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ragged_filtfilt_bit_equals_solo_short(lengths, seed):
    b, a = butter(2, 0.25, "lowpass")
    arrays = _arrays(lengths, seed)
    outs = filtfilt_batch_ragged(b, a, arrays)
    for x, got in zip(arrays, outs):
        exp = filtfilt(b, a, x)
        assert got.shape == exp.shape
        assert (got == exp).all(), "ragged batching changed a row's bits"


@settings(max_examples=25, deadline=None)
@given(
    lengths=st.lists(st.integers(min_value=10, max_value=1500), min_size=1,
                     max_size=12),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_ragged_lfilter_bit_equals_solo_short(lengths, seed):
    b, a = a_weighting(48000.0)  # order 6
    arrays = _arrays(lengths, seed)
    outs = lfilter_batch_ragged(b, a, arrays)
    for x, got in zip(arrays, outs):
        assert (got == lfilter(b, a, x)).all()


def test_ragged_mixes_loop_and_fft_paths():
    # Short rows take the bit-exact loop; long rows (> _LOOP_CUTOVER) take
    # the FFT path grouped by exact length — same rule as the 1-D kernel.
    b, a = butter(2, 0.2, "lowpass")
    arrays = _arrays([100, 5000, 5000, 333, 4096])
    outs = filtfilt_batch_ragged(b, a, arrays)
    for x, got in zip(arrays, outs):
        exp = filtfilt(b, a, x)
        if len(x) + 18 <= 2048:
            assert (got == exp).all()
        else:
            assert np.allclose(got, exp, rtol=1e-9, atol=1e-12)


def test_ragged_filtfilt_rejects_too_short():
    b, a = butter(2, 0.2, "lowpass")
    with pytest.raises(ValueError, match="padlen"):
        filtfilt_batch_ragged(b, a, [np.zeros(5)])
