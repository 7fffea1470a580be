"""Margin audit for the FFT-convolution hash anchor (filt_iir_fft_exact).

The anchor rounds both engines' outputs HALF_UP to _FFT_ANCHOR_DIGITS and
relies on two *measured* facts about the fixed driver datasets:

1. the FFT-convolution path diverges from the exact DF2T recursion by far
   less than the rounding quantum, and
2. no exact-recursion output sits near a rounding boundary, so the
   divergence can never flip a rounded digit.

This test re-measures both on every dataset present, so a data refresh
that erodes the margin fails loudly here instead of flaking the driver
hash gate.  (Design rationale in __spark_entry__.q_filt_iir_fft_exact.)
"""

import os

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow.parquet")

import __spark_entry__ as E
from pandas_sigproc_spark.kernels.iir import _lfilter_loop, _normalize_ba, lfilter

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                       "/root/testdata/sf0.1") if os.path.isdir(d)]

# The anchor is safe when the boundary margin exceeds the path divergence
# by at least this factor (measured ~1280x at sf0.1, ~16000x at sf0.01).
MIN_SAFETY = 100.0


def _anchor_input(sf_dir: str) -> np.ndarray:
    t = pa.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    df = t.to_pandas().sort_values("event_id")
    x = df["value"].to_numpy("float64") / 100.0
    return x[: E._FFT_ANCHOR_N]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rounding_margin_dominates_path_divergence(sf_dir):
    x = _anchor_input(sf_dir)
    b, a = _normalize_ba(E._IIR_B, E._IIR_A)
    y_loop = _lfilter_loop(b, a, x)
    y_fft = lfilter(E._IIR_B, E._IIR_A, x)
    err = np.max(np.abs(y_fft - y_loop))
    scale = 10.0 ** E._FFT_ANCHOR_DIGITS
    margin = np.min(np.abs((y_loop * scale) % 1.0 - 0.5)) / scale
    if len(x) <= 2048:
        # Loop path on both sides: bit-exact, no margin needed.
        assert err == 0.0
        return
    assert err > 0.0, "FFT path not exercised (lengths drifted?)"
    assert margin > MIN_SAFETY * err, (
        f"rounding margin {margin:.3e} no longer dominates FFT-path "
        f"divergence {err:.3e} at {sf_dir}; re-pick _FFT_ANCHOR_DIGITS"
    )
