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

from pandas_sigproc_spark.kernels import rainflow as _rf

_OUT_SCHEMA = "channel_id string, bin double, cycles double"


def rainflow(
    df: DataFrame,
    ndigits: int | None = None,
    nbins: int | None = None,
    binsize: float | None = None,
) -> DataFrame:
    """Per-channel (bin, cycles) pairs, kwargs forwarded like the
    reference (``extension.py:961``)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t")
        y = pdf["value"].to_numpy(dtype=np.float64)
        pairs = _rf.count_cycles(y, ndigits=ndigits, nbins=nbins, binsize=binsize)
        if not pairs:
            return pd.DataFrame(columns=["channel_id", "bin", "cycles"])
        bins, cycles = zip(*pairs)
        return pd.DataFrame(
            {
                "channel_id": pdf["channel_id"].iloc[0],
                "bin": np.asarray(bins, dtype=np.float64),
                "cycles": np.asarray(cycles, dtype=np.float64),
            }
        )

    return (
        df.select("channel_id", "t", "value")
        .groupBy("channel_id")
        .applyInPandas(kernel, _OUT_SCHEMA)
    )
