"""Pure-NumPy DSP kernel layer.

These are the vectorized inner loops that run inside Arrow-batched pandas
UDFs on executors (SURVEY.md §2.8).  SciPy is deliberately not a dependency:
every kernel the reference delegates to SciPy (``butter``/``filtfilt``/
``lfilter``/``periodogram``/``bilinear``/``interp1d``) is re-implemented
here from the standard public formulas, validated against analytic anchors
in the test suite (FIXTURES.md).
"""

from pandas_sigproc_spark.kernels.design import (
    butter,
    cfc_coefficients,
    a_weighting,
    bilinear_tf,
)
from pandas_sigproc_spark.kernels.iir import lfilter, lfilter_zi, filtfilt
from pandas_sigproc_spark.kernels.spectral import (
    get_window,
    detrend_array,
    periodogram,
    welch_psd,
)
from pandas_sigproc_spark.kernels.srs import srs, build_freq_array
from pandas_sigproc_spark.kernels.rainflow import (
    extract_cycles,
    count_cycles,
)
from pandas_sigproc_spark.kernels.interp import interp1d, interp1d_loglog

__all__ = [
    "butter",
    "cfc_coefficients",
    "a_weighting",
    "bilinear_tf",
    "lfilter",
    "lfilter_zi",
    "filtfilt",
    "get_window",
    "detrend_array",
    "periodogram",
    "welch_psd",
    "srs",
    "build_freq_array",
    "extract_cycles",
    "count_cycles",
    "interp1d",
    "interp1d_loglog",
]
