"""Spline / nearest-family interpolation operator (kernel tier).

Linear interpolation is native (operators/joins.py); the spline kinds
(``cubic``, ``zero``) and the nearest/previous/next family genuinely need
whole-channel context in the worst case (a cubic spline's coefficients
are global), so they run as a grouped-map UDF over the vendored
``kernels.interp`` (reference surface: ``extension.py:819-851`` via
``scipy.interpolate.interp1d``).

The target grid is cogrouped with the source channel so both sides arrive
in one task without a driver round-trip.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from pandas_sigproc_spark.kernels import interp as _interp

_OUT_SCHEMA = "channel_id string, t double, value double"


def interp1d_spline(
    df: DataFrame, grid: DataFrame, kind: str = "cubic", axis: str = "t"
) -> DataFrame:
    """Interpolate each channel onto its grid rows with the given kind."""

    def kernel(src: pd.DataFrame, tgt: pd.DataFrame) -> pd.DataFrame:
        if src.empty or tgt.empty:
            return pd.DataFrame(columns=["channel_id", "t", "value"])
        src = src.sort_values(axis)
        x = src[axis].to_numpy(dtype=np.float64)
        y = src["value"].to_numpy(dtype=np.float64)
        x2 = np.sort(tgt[axis].to_numpy(dtype=np.float64))
        y2 = _interp.interp1d(x, y, x2, kind=kind)
        return pd.DataFrame(
            {"channel_id": src["channel_id"].iloc[0], "t": x2, "value": y2}
        )

    return (
        df.select("channel_id", axis, "value")
        .groupBy("channel_id")
        .cogroup(grid.select("channel_id", axis).groupBy("channel_id"))
        .applyInPandas(kernel, _OUT_SCHEMA)
    )
