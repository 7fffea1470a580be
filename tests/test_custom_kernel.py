"""apply_channel_kernel (operators/custom.py) — the §2.10 user-extension
point: custom grouped-map kernels with the engine's ordering/bucketing
conventions."""

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.operators import apply_channel_kernel
from tests.conftest import make_signals


def _sig(spark):
    rng = np.random.default_rng(9)
    t = np.arange(0, 2.0, 1 / 200.0)
    return make_signals(
        spark, {f"c{i}": (t, rng.standard_normal(len(t))) for i in range(4)}
    )


def test_custom_kernel_matches_native(spark):
    # user kernel: running max of |value| per channel == native window op
    from pyspark.sql import Window, functions as F

    sig = _sig(spark)

    def kern(cid, pdf):
        return pd.DataFrame(
            {
                "channel_id": cid,
                "t": pdf["t"],
                "runmax": np.maximum.accumulate(np.abs(pdf["value"].to_numpy())),
            }
        )

    got = (
        apply_channel_kernel(sig, kern, "channel_id string, t double, runmax double")
        .toPandas()
        .sort_values(["channel_id", "t"], ignore_index=True)
    )
    w = (
        Window.partitionBy("channel_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = (
        sig.select(
            "channel_id", "t", F.max(F.abs("value")).over(w).alias("runmax")
        )
        .toPandas()
        .sort_values(["channel_id", "t"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bucketed_equals_per_channel(spark):
    sig = _sig(spark)

    def kern(cid, pdf):
        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {"channel_id": [cid], "n": [len(v)], "s": [float(np.sum(v * v))]}
        )

    schema = "channel_id string, n long, s double"
    a = apply_channel_kernel(sig, kern, schema).toPandas()
    b = apply_channel_kernel(sig, kern, schema, n_buckets=2).toPandas()
    a = a.sort_values("channel_id", ignore_index=True)
    b = b.sort_values("channel_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_empty_result_keeps_schema(spark):
    sig = _sig(spark)
    out = apply_channel_kernel(
        sig, lambda cid, pdf: None, "channel_id string, x double"
    )
    pdf = out.toPandas()
    assert list(pdf.columns) == ["channel_id", "x"] and len(pdf) == 0
