"""Range-chunked as-of interpolation == whole-channel plan, bit-exact.

The chunked plan (joins._chunk_assign) bounds task size for huge
channels WITHOUT a uniform-grid requirement: non-uniform sources, dense
target grids, empty-source chunks, and out-of-range targets must all
bracket identically to the global windows.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark import planner
from pandas_sigproc_spark.operators import interp1d_native
from tests.conftest import make_signals


@pytest.fixture(scope="module")
def setup(spark):
    rng = np.random.default_rng(21)
    # non-uniform source times (sorted, irregular gaps), two channels
    t_a = np.unique(np.cumsum(rng.uniform(0.01, 1.5, 4000)))
    t_b = np.unique(np.cumsum(rng.uniform(0.1, 3.0, 1500)))
    src = make_signals(
        spark,
        {"a": (t_a, rng.standard_normal(len(t_a))),
         "b": (np.asarray(t_b), np.cos(t_b))},
    ).select("channel_id", "t", "value")
    # targets: dense in the middle, sparse at edges, some OUTSIDE range
    g_a = np.concatenate([[-5.0], rng.uniform(0, t_a[-1], 3000), [t_a[-1] + 9]])
    g_b = np.concatenate([rng.uniform(-2, t_b[-1] + 4, 800), t_b[:50]])  # exact hits
    gpdf = pd.concat(
        [
            pd.DataFrame({"channel_id": "a", "t": np.sort(g_a)}),
            pd.DataFrame({"channel_id": "b", "t": np.sort(g_b)}),
        ]
    )
    grid = spark.createDataFrame(gpdf)
    return src, grid


def _vals(df):
    return (
        df.toPandas()
        .sort_values(["channel_id", "t"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("kind", ["linear", "nearest", "nearest-up", "previous", "next"])
def test_chunked_equals_global(setup, kind):
    src, grid = setup
    for bounds_null in (False, True):
        g = _vals(interp1d_native(src, grid, kind=kind, bounds_null=bounds_null,
                                  chunk_rows=None))
        c = _vals(interp1d_native(src, grid, kind=kind, bounds_null=bounds_null,
                                  chunk_rows=333))
        assert len(g) == len(c) > 0
        assert np.array_equal(g["t"].to_numpy(), c["t"].to_numpy())
        gv, cv = g["value"].to_numpy(), c["value"].to_numpy()
        assert np.array_equal(np.isnan(gv.astype(float)), np.isnan(cv.astype(float)))
        mask = ~pd.isna(gv)
        assert np.array_equal(gv[mask].astype(float), cv[mask].astype(float))


def test_chunked_tiny_chunks_and_single_source(spark):
    # chunks far smaller than gaps -> many empty-source chunks; plus a
    # channel with ONE source sample (degenerate geometry)
    src = make_signals(
        spark,
        {"s": (np.asarray([0.0, 10.0, 10.5, 40.0]), np.asarray([1.0, 2.0, 3.0, 4.0])),
         "one": (np.asarray([5.0]), np.asarray([7.0]))},
    ).select("channel_id", "t", "value")
    gpdf = pd.DataFrame(
        {"channel_id": ["s"] * 5 + ["one"] * 2,
         "t": [0.0, 9.9, 10.2, 39.0, 40.0, 5.0, 6.0]}
    )
    grid = src.sparkSession.createDataFrame(gpdf)
    g = _vals(interp1d_native(src, grid, kind="linear", chunk_rows=None))
    c = _vals(interp1d_native(src, grid, kind="linear", chunk_rows=2))
    assert np.array_equal(g["t"].to_numpy(), c["t"].to_numpy())
    assert np.array_equal(g["value"].to_numpy(), c["value"].to_numpy())


def test_auto_uses_chunked_for_huge(setup):
    src, grid = setup
    planner.register_stats(
        src,
        planner.ChannelStats(
            n_channels=2,
            max_rows=planner.HUGE_CHANNEL_ROWS + 1,
            total_rows=planner.HUGE_CHANNEL_ROWS + 1,
        ),
    )
    try:
        out = interp1d_native(src, grid, kind="linear")
        g = _vals(interp1d_native(src, grid, kind="linear", chunk_rows=None))
        a = _vals(out)
        assert np.array_equal(g["value"].to_numpy(), a["value"].to_numpy())
    finally:
        planner.invalidate_stats(src)


@pytest.mark.parametrize("rate,kind", [(10.0, "linear"), (0.37, "nearest"), (3.0, "previous")])
def test_resample_chunked_equals_global(spark, rate, kind):
    from pandas_sigproc_spark.operators import resample

    rng = np.random.default_rng(33)
    # skewed density: dense burst then sparse tail -> some chunks hold
    # many sources, some few (range chunks are uneven by design)
    t = np.unique(np.concatenate([
        np.cumsum(rng.uniform(0.001, 0.02, 3000)),
        60 + np.cumsum(rng.uniform(0.5, 3.0, 200)),
    ]))
    src = make_signals(
        spark, {"d": (t, rng.standard_normal(len(t)))}
    ).select("channel_id", "t", "value")
    g = _vals(resample(src, rate, kind=kind, chunk_rows=None))
    c = _vals(resample(src, rate, kind=kind, chunk_rows=257))
    assert len(g) == len(c) > 0
    assert np.array_equal(g["t"].to_numpy(), c["t"].to_numpy())
    assert np.array_equal(g["value"].to_numpy(), c["value"].to_numpy())


@pytest.mark.parametrize("kind", ["cubic", "quadratic"])
def test_spline_chunked_matches_global(spark, kind):
    from pandas_sigproc_spark.operators import interp1d_spline

    rng = np.random.default_rng(9)
    t = np.arange(4000) / 200.0
    src = make_signals(
        spark, {"u": (t, np.sin(t * 2.0) + 0.1 * rng.standard_normal(4000))}
    ).select("channel_id", "t", "value")
    gt = np.sort(rng.uniform(0.0, t[-1], 1500))  # in-span (kernel raises
    # on out-of-range targets in BOTH plans — SciPy parity)
    grid = spark.createDataFrame(
        pd.DataFrame({"channel_id": "u", "t": gt})
    )
    g = _vals(interp1d_spline(src, grid, kind=kind, chunk_rows=None))
    c = _vals(interp1d_spline(src, grid, kind=kind, chunk_rows=256,
                              overlap_knots=48))
    assert len(g) == len(c) == 1500
    assert np.array_equal(g["t"].to_numpy(), c["t"].to_numpy())
    np.testing.assert_allclose(
        g["value"].to_numpy(), c["value"].to_numpy(), rtol=1e-10, atol=1e-12
    )


def test_spline_chunked_rejects_non_uniform(spark):
    from pandas_sigproc_spark.operators import interp1d_spline

    rng = np.random.default_rng(4)
    t = np.sort(rng.uniform(0, 50, 900))
    src = make_signals(spark, {"nu": (t, np.sin(t))}).select(
        "channel_id", "t", "value"
    )
    grid = spark.createDataFrame(
        pd.DataFrame({"channel_id": "nu", "t": np.linspace(1, 49, 100)})
    )
    with pytest.raises(Exception, match="non-consecutive sample index"):
        interp1d_spline(src, grid, kind="cubic", chunk_rows=128).collect()


def test_chunked_grid_only_channel_matches_global(spark):
    # a grid channel with NO source samples: global plan yields NULLs
    # under bounds_null=True (and drops them otherwise); chunked must
    # not silently lose the channel in the geo join.
    src = make_signals(
        spark, {"has": (np.asarray([0.0, 1.0, 2.0]), np.asarray([1.0, 2.0, 3.0]))}
    ).select("channel_id", "t", "value")
    grid = spark.createDataFrame(
        pd.DataFrame({"channel_id": ["has", "ghost", "ghost"], "t": [0.5, 1.0, 2.0]})
    )
    for bounds_null in (True, False):
        g = _vals(interp1d_native(src, grid, kind="linear",
                                  bounds_null=bounds_null, chunk_rows=None))
        c = _vals(interp1d_native(src, grid, kind="linear",
                                  bounds_null=bounds_null, chunk_rows=2))
        assert list(g["channel_id"]) == list(c["channel_id"])
        assert np.array_equal(g["t"].to_numpy(), c["t"].to_numpy())
        gv = g["value"].to_numpy(dtype=float)
        cv = c["value"].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(gv), np.isnan(cv))
        assert np.array_equal(gv[~np.isnan(gv)], cv[~np.isnan(cv)])
