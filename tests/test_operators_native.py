"""Native-tier operator tests against NumPy goldens and analytic anchors."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import (
    between,
    deduplicate,
    derivative,
    detrend,
    integral,
    interp1d_linear,
    interp1d_log,
    mov_rms,
    resample,
    rms,
    rms_lin,
    rms_log,
    rss,
    samplerate,
    segment_stats,
    spl,
    timeshift,
)
from tests.conftest import make_signals


def one_channel(df, cid):
    pdf = df.filter(F.col("channel_id") == cid).orderBy("t").toPandas()
    return pdf["t"].to_numpy(), pdf["value"].to_numpy()


class TestRelational:
    def test_between_inclusive(self, spark):
        t = np.arange(0, 10.0, 0.5)
        df = make_signals(spark, {"c": (t, t * 2)})
        out = between(df, 1.0, 3.0).orderBy("t").toPandas()
        np.testing.assert_allclose(out["t"], [1.0, 1.5, 2.0, 2.5, 3.0])

    def test_timeshift(self, spark):
        t = np.arange(0, 5.0)
        df = make_signals(spark, {"c": (t, t)})
        out = timeshift(df, 2.5).orderBy("t").toPandas()
        np.testing.assert_allclose(out["t"], t + 2.5)
        np.testing.assert_allclose(out["value"], t)

    def test_deduplicate_keeps_t(self, spark):
        # dup_times fixture: every t duplicated with v and v+1 -> mean v+0.5.
        t = np.repeat(np.arange(0, 1.0, 0.02), 2)
        v = np.tile([0.0, 1.0], 50) + np.repeat(np.arange(50.0), 2) * 0
        v = v + np.repeat(np.arange(0, 1.0, 0.02), 2) * 10
        df = make_signals(spark, {"c": (t, v)})
        out = deduplicate(df).orderBy("t").toPandas()
        assert len(out) == 50
        np.testing.assert_allclose(
            out["value"], np.arange(0, 1.0, 0.02) * 10 + 0.5, atol=1e-12
        )

    def test_samplerate_uniform_snap(self, spark):
        t = np.arange(0, 1.0, 1 / 1000)
        df = make_signals(spark, {"c": (t, np.zeros_like(t))})
        out = samplerate(df).toPandas()
        assert out["samplerate"][0] == pytest.approx(1000.0)

    def test_samplerate_nonuniform_null(self, spark):
        # FIXTURES.md 'nonuniform': every 7th sample jittered +2ms.
        t = np.arange(0, 1.0, 0.01).copy()
        t[::7] += 0.002
        t = np.sort(t)
        df = make_signals(spark, {"c": (t, np.zeros_like(t))})
        out = samplerate(df).toPandas()
        assert out["samplerate"][0] is None or np.isnan(out["samplerate"][0])


class TestAggregates:
    def test_rms_unit_sine(self, spark, fixture_channels):
        df = make_signals(spark, {"sine_1k": fixture_channels["sine_1k"]})
        out = rms(df).toPandas()
        assert out["rms"][0] == pytest.approx(1 / np.sqrt(2), rel=1e-9)

    def test_spl_of_1pa_rms_tone(self, spark):
        # 1 Pa RMS sine -> 20*log10(1/20e-6) = 93.9794 dB.
        t = np.arange(0, 1.0, 1 / 8000)
        df = make_signals(spark, {"c": (t, np.sqrt(2) * np.sin(2 * np.pi * 100 * t))})
        out = spl(df).toPandas()
        assert out["spl"][0] == pytest.approx(20 * np.log10(1 / 20e-6), rel=1e-6)

    def test_rms_lin_trapz_golden(self, spark):
        freq = np.linspace(1.0, 100.0, 200)
        power = 0.01 + 0.001 * freq
        df = make_signals(spark, {"s": (freq, power)}).select(
            "channel_id", F.col("t").alias("freq"), F.col("value").alias("power")
        )
        out = rms_lin(df).toPandas()
        assert out["rms_lin"][0] == pytest.approx(
            np.sqrt(np.trapz(power, freq)), rel=1e-12
        )

    def test_rms_log_powerlaw_golden(self, spark):
        # FIXTURES.md sparse_psd_spec: 4-point log-log spec.
        freq = np.array([20.0, 80.0, 350.0, 2000.0])
        power = np.array([0.01, 0.04, 0.04, 0.007])
        # NumPy golden implementing the vibrationdata piecewise power law.
        ms = 0.0
        for i in range(3):
            n = np.log10(power[i + 1] / power[i]) / np.log10(freq[i + 1] / freq[i])
            if abs(n + 1) < 1e-10:
                ms += power[i] * freq[i] * np.log(freq[i + 1] / freq[i])
            else:
                ms += (power[i] / freq[i] ** n) / (n + 1) * (
                    freq[i + 1] ** (n + 1) - freq[i] ** (n + 1)
                )
        golden = np.sqrt(ms)
        df = make_signals(spark, {"s": (freq, power)}).select(
            "channel_id", F.col("t").alias("freq"), F.col("value").alias("power")
        )
        out = rms_log(df).toPandas()
        assert out["rms_log"][0] == pytest.approx(golden, rel=1e-12)

    def test_segment_stats_ordering(self, spark):
        rng = np.random.default_rng(1)
        t = np.arange(0, 4.0, 1 / 1000)
        v = rng.standard_normal(len(t)) * np.linspace(0.5, 2.0, len(t))
        df = make_signals(spark, {"c": (t, v)})
        out = segment_stats(df, n_window=500).toPandas().iloc[0]
        assert out["min_rms"] <= out["median_rms"] <= out["max_rms"]
        assert out["min_rms"] <= out["mean_rms"] <= out["max_rms"]
        assert out["n_segments"] == 8
        assert out["max_rms_scale"] >= 1.0
        assert out["damage_scale"] >= 1.0
        # NumPy golden for mean segment RMS.
        segs = v[: 8 * 500].reshape(8, 500)
        seg_rms = np.sqrt((segs ** 2).mean(axis=1))
        assert out["mean_rms"] == pytest.approx(seg_rms.mean(), rel=1e-9)
        assert out["median_rms"] == pytest.approx(np.median(seg_rms), rel=1e-9)


class TestWindows:
    def test_mov_rms_matches_pandas_rolling(self, spark):
        # Reference semantics: rolling mean of squares, drop warm-up AND
        # final sample, recenter by window/2 (extension.py:690-697).
        sr = 100.0
        t = np.arange(0, 2.0, 1 / sr)
        rng = np.random.default_rng(0)
        v = rng.standard_normal(len(t))
        window = 0.25
        n = round(window * sr)
        golden = (pd.Series(v) ** 2).rolling(n).mean() ** 0.5
        golden = golden.to_numpy()[n - 1 : -1]
        t_golden = t[n - 1 : -1] - window / 2
        df = make_signals(spark, {"c": (t, v)})
        out = mov_rms(df, window, sr).orderBy("t").toPandas()
        np.testing.assert_allclose(out["t"], t_golden, atol=1e-12)
        np.testing.assert_allclose(out["value"], golden, rtol=1e-12)

    def test_integral_of_cos_is_sin_over_2pi(self, spark, fixture_channels):
        df = make_signals(spark, {"cos_int": fixture_channels["cos_int"]})
        t, v = one_channel(integral(df), "cos_int")
        np.testing.assert_allclose(
            v, np.sin(2 * np.pi * t) / (2 * np.pi), atol=2e-3
        )
        assert v[0] == 0.0

    def test_integral_matches_cumtrapz_golden(self, spark):
        rng = np.random.default_rng(3)
        t = np.sort(rng.uniform(0, 10, 500))
        v = rng.standard_normal(500)
        golden = np.concatenate(
            [[0.0], np.cumsum((v[1:] + v[:-1]) / 2 * np.diff(t))]
        )
        df = make_signals(spark, {"c": (t, v)})
        _, out = one_channel(integral(df), "c")
        np.testing.assert_allclose(out, golden, rtol=1e-10, atol=1e-12)

    def test_derivative_midpoints(self, spark, fixture_channels):
        df = make_signals(spark, {"trend_ramp": fixture_channels["trend_ramp"]})
        t, v = one_channel(derivative(df), "trend_ramp")
        expected = 0.5 + 10 * np.pi * np.cos(2 * np.pi * 5 * t)
        np.testing.assert_allclose(v, expected, atol=5e-2)
        assert len(t) == len(fixture_channels["trend_ramp"][0]) - 1

    def test_detrend_constant(self, spark):
        t = np.arange(0, 1.0, 0.01)
        df = make_signals(spark, {"c": (t, t * 0 + 5.0)})
        _, v = one_channel(detrend(df, "constant"), "c")
        np.testing.assert_allclose(v, 0.0, atol=1e-12)

    def test_detrend_linear_leaves_sine(self, spark, fixture_channels):
        df = make_signals(spark, {"trend_ramp": fixture_channels["trend_ramp"]})
        _, v = one_channel(detrend(df, "linear"), "trend_ramp")
        assert np.sqrt(np.mean(v ** 2)) == pytest.approx(1 / np.sqrt(2), rel=1e-2)
        # Golden: OLS residual computed with numpy polyfit.
        t0, v0 = fixture_channels["trend_ramp"]
        coef = np.polyfit(t0, v0, 1)
        golden = v0 - np.polyval(coef, t0)
        np.testing.assert_allclose(v, golden, atol=1e-8)

    def test_detrend_breakpoints_piecewise_ols(self, spark):
        # scipy.signal.detrend(bp=...) semantics: independent linear fit
        # per index segment (extension.py:751-781 forwards bp verbatim).
        rng = np.random.default_rng(3)
        t = np.arange(0, 4.0, 0.01)
        v = np.where(t < 2.0, 3.0 * t + 1.0, -2.0 * t + 11.0) + 0.1 * rng.standard_normal(len(t))
        df = make_signals(spark, {"c": (t, v)})
        bp = [200]
        _, out = one_channel(detrend(df, "linear", breakpoints=bp), "c")
        golden = np.empty_like(v)
        for lo, hi in [(0, 200), (200, len(t))]:
            coef = np.polyfit(t[lo:hi], v[lo:hi], 1)
            golden[lo:hi] = v[lo:hi] - np.polyval(coef, t[lo:hi])
        np.testing.assert_allclose(out, golden, atol=1e-8)

    def test_detrend_breakpoints_single_row_segment(self, spark):
        t = np.arange(0, 0.05, 0.01)  # 5 rows; bp at 4 -> 1-row tail
        v = 2.0 * t + 1.0
        df = make_signals(spark, {"c": (t, v)})
        _, out = one_channel(detrend(df, "linear", breakpoints=[4]), "c")
        np.testing.assert_allclose(out[:4], 0.0, atol=1e-12)
        np.testing.assert_allclose(out[4], 0.0, atol=1e-12)  # point - its mean


class TestJoins:
    def test_rss_pythagorean(self, spark, fixture_channels):
        df = make_signals(
            spark, {k: fixture_channels[k] for k in ("rss_x", "rss_y", "rss_z")}
        )
        out = rss(df, ["rss_x", "rss_y", "rss_z"], "rss_xyz")
        t, v = one_channel(out, "rss_xyz")
        np.testing.assert_allclose(
            v, 5.0 * np.abs(np.sin(2 * np.pi * 10 * t)), atol=1e-9
        )
        assert out.toPandas()["n_channels"].eq(3).all()

    def test_interp_linear_matches_numpy(self, spark):
        x = np.sort(np.random.default_rng(1).uniform(0, 10, 100))
        y = np.sin(x)
        x2 = np.linspace(x[0], x[-1], 301)
        df = make_signals(spark, {"c": (x, y)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": x2}), "channel_id string, t double"
        )
        out = interp1d_linear(df, grid).orderBy("t").toPandas()
        np.testing.assert_allclose(out["value"], np.interp(x2, x, y), rtol=1e-12)
        np.testing.assert_allclose(out["t"], x2)

    def test_interp_exact_hits(self, spark):
        x = np.array([0.0, 1.0, 2.0])
        y = np.array([5.0, 7.0, 9.0])
        df = make_signals(spark, {"c": (x, y)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": [0.0, 0.5, 1.0, 2.0]}),
            "channel_id string, t double",
        )
        out = interp1d_linear(df, grid).orderBy("t").toPandas()
        np.testing.assert_allclose(out["value"], [5.0, 6.0, 7.0, 9.0])

    @pytest.mark.parametrize(
        "kind", ["nearest", "nearest-up", "previous", "zero", "next"]
    )
    def test_interp_step_kinds_match_kernel(self, spark, kind):
        # Native relational step-kind interp == NumPy kernel (which pins
        # the SciPy kind semantics incl. midpoint tie rules).  Targets
        # include exact knots, exact midpoints, and both channel ends.
        from pandas_sigproc_spark.kernels.interp import interp1d as k_interp
        from pandas_sigproc_spark.operators import interp1d_native

        x = np.sort(np.random.default_rng(7).uniform(0, 10, 50))
        y = np.cos(x)
        mids = 0.5 * (x[:-1] + x[1:])
        x2 = np.unique(
            np.concatenate(
                [np.linspace(x[0], x[-1], 83), x[::5], mids[::3], [x[0], x[-1]]]
            )
        )
        df = make_signals(spark, {"c": (x, y)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": x2}), "channel_id string, t double"
        )
        out = interp1d_native(df, grid, kind=kind).orderBy("t").toPandas()
        np.testing.assert_allclose(out["value"], k_interp(x, y, x2, kind=kind), rtol=0)
        np.testing.assert_allclose(out["t"], x2)

    def test_interp_out_of_range_dropped_or_null(self, spark):
        x = np.array([0.0, 1.0])
        df = make_signals(spark, {"c": (x, x)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": [-1.0, 0.5, 2.0]}),
            "channel_id string, t double",
        )
        assert interp1d_linear(df, grid).count() == 1
        out = interp1d_linear(df, grid, bounds_null=True).orderBy("t").toPandas()
        assert len(out) == 3 and out["value"].isna().sum() == 2

    def test_interp_log_powerlaw(self, spark):
        freq = np.array([10.0, 100.0, 1000.0])
        power = freq ** -1.5
        df = make_signals(spark, {"s": (freq, power)}).select(
            "channel_id", F.col("t").alias("freq"), F.col("value").alias("power")
        )
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "s", "freq": [20.0, 300.0]}),
            "channel_id string, freq double",
        )
        out = interp1d_log(df, grid).orderBy("freq").toPandas()
        np.testing.assert_allclose(
            out["power"], np.array([20.0, 300.0]) ** -1.5, rtol=1e-9
        )

    def test_resample_roundtrip_identity(self, spark):
        # Resampling a uniform channel at its own rate ≈ identity.
        sr = 100.0
        t = np.arange(0, 1.0, 1 / sr)
        v = np.sin(2 * np.pi * 3 * t)
        df = make_signals(spark, {"c": (t, v)})
        out = resample(df, sr).orderBy("t").toPandas()
        # Reference grid is arange(t0, t_end, dt) — end-EXCLUSIVE
        # (extension.py:887): the last original sample is not a grid point.
        assert len(out) == len(t) - 1
        np.testing.assert_allclose(out["t"], t[:-1], atol=1e-9)
        np.testing.assert_allclose(out["value"], v[:-1], atol=1e-9)


class TestInterpEdges:
    def test_exact_hits_at_channel_endpoints(self, spark):
        # Targets sitting exactly on the first and last source samples must
        # survive the single-sort as-of windows (forward bracket is absent
        # at the last sample; the exact-hit branch keeps the row).
        import pandas as pd
        from pandas_sigproc_spark.operators import interp1d_linear

        x = np.array([1.0, 2.0, 4.0, 7.0])
        y = np.array([10.0, 20.0, 40.0, 70.0])
        df = make_signals(spark, {"c": (x, y)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": [1.0, 4.0, 7.0, 5.5]})
        )
        out = (
            interp1d_linear(df, grid, axis="t")
            .toPandas()
            .sort_values("t")
            .reset_index(drop=True)
        )
        assert list(out["t"]) == [1.0, 4.0, 5.5, 7.0]
        np.testing.assert_allclose(out["value"], [10.0, 40.0, 55.0, 70.0])

    def test_resample_irregular_matches_numpy(self, spark):
        # Stresses the bracket-pair grid emission on NON-uniform spacing:
        # each source pair emits its candidate grid indices via ceil()
        # arithmetic (widened ±1), and the exact float comparison decides
        # membership — every np.arange grid point must appear exactly once
        # with the np.interp value.
        from pandas_sigproc_spark.kernels.interp import interp1d as k_interp
        from pandas_sigproc_spark.operators import resample

        for seed, rate in [(0, 7.3), (1, 19.0), (2, 3.1)]:
            rng = np.random.default_rng(seed)
            t = np.cumsum(rng.uniform(0.01, 0.5, size=400))
            t -= t[0]
            v = rng.standard_normal(len(t))
            df = make_signals(spark, {"c": (t, v)})
            grid = np.arange(t[0], t[-1], 1.0 / rate)

            out = resample(df, rate).orderBy("t").toPandas()
            assert len(out) == len(grid), f"seed {seed}: row count"
            np.testing.assert_allclose(out["t"], grid, rtol=0, atol=1e-12)
            np.testing.assert_allclose(
                out["value"], np.interp(grid, t, v), rtol=1e-9
            )

            outp = resample(df, rate, kind="previous").orderBy("t").toPandas()
            np.testing.assert_allclose(
                outp["value"], k_interp(t, v, grid, kind="previous"), rtol=0
            )


class TestConnectedComponents:
    def test_chained_pairs_form_one_component(self, spark):
        # A~B, B~C, C~D chain (no A~C edge): one component labeled min id,
        # plus isolated vertices as singletons — the corpus-dedup shape.
        import pandas as pd

        from pandas_sigproc_spark.operators import connected_components

        edges = spark.createDataFrame(
            pd.DataFrame({"src": [2, 3, 4, 10], "dst": [3, 4, 5, 11]})
        )
        verts = spark.createDataFrame(pd.DataFrame({"id": list(range(1, 13))}))
        got = {
            r.id: r.component
            for r in connected_components(edges, vertices=verts).collect()
        }
        assert got == {
            1: 1, 2: 2, 3: 2, 4: 2, 5: 2, 6: 6, 7: 7, 8: 8, 9: 9,
            10: 10, 11: 10, 12: 12,
        }

    def test_merging_clusters_converges(self, spark):
        # Two stars joined by a late bridge: propagation must carry the
        # global min across the bridge, not stop at the local star center.
        import pandas as pd

        from pandas_sigproc_spark.operators import connected_components

        edges = spark.createDataFrame(
            pd.DataFrame(
                {
                    "src": [1, 1, 1, 4, 20, 20, 20, 5],
                    "dst": [2, 3, 4, 5, 21, 22, 23, 23],
                }
            )
        )
        comp = {
            r.id: r.component for r in connected_components(edges).collect()
        }
        # 4~5~23 bridges {1,2,3,4} and {20,21,22,23}: all collapse to 1,
        # which needs the min label to cross several hops of propagation.
        assert set(comp.values()) == {1}
        assert set(comp) == {1, 2, 3, 4, 5, 20, 21, 22, 23}

    def test_long_path_converges_fast(self, spark):
        # A 300-node path: plain one-hop propagation would need ~300
        # rounds (far past max_iterations); pointer jumping squares the
        # travel distance per round, so ~log2(300) rounds suffice.
        import pandas as pd

        from pandas_sigproc_spark.operators import connected_components

        n = 300
        edges = spark.createDataFrame(
            pd.DataFrame({"src": range(n - 1), "dst": range(1, n)})
        )
        comp = {
            r.id: r.component
            for r in connected_components(edges, max_iterations=15).collect()
        }
        assert set(comp.values()) == {0}
        assert len(comp) == n


class TestRoundTwelveReviewRegressions:
    """r12 high-pass review findings on the interp/detrend/rss tier."""

    def test_resample_near_end_float_grid_no_duplicate(self, spark):
        # Timestamps accumulated by repeated +0.1 make n*dt land EXACTLY
        # on the last sample (0.1*3 == 0.30000000000000004): the final
        # grid point must appear ONCE with the last sample's value — the
        # old endpoint escape clause let a NEAR-end pair emit it too,
        # with a beyond-bracket extrapolation.
        t = np.array([0.0, 0.1, 0.2, 0.1 * 3])
        v = np.array([0.0, 1.0, 2.0, 3.0])
        df = make_signals(spark, {"c": (t, v)})
        out = resample(df, 10.0).orderBy("t").toPandas()
        assert len(out) == 4  # no duplicate final grid point
        np.testing.assert_array_equal(out["t"], t)
        np.testing.assert_array_equal(out["value"], v)

    def test_detrend_linear_window_zero_t_variance(self, spark):
        # 1-row channel / all-equal timestamps: slope is 0/0 — the
        # window form must return mean removal like the agg and
        # breakpoints forms claim parity with, not NULL.
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": ["one", "dup", "dup"],
                    "t": [5.0, 7.0, 7.0],
                    "value": [3.0, 2.0, 6.0],
                }
            )
        )
        out = detrend(df, "linear", mode="window").toPandas()
        by = out.groupby("channel_id")["value"].apply(list).to_dict()
        assert by["one"] == [0.0]
        assert sorted(by["dup"]) == [-2.0, 2.0]  # mean 4 removed
        assert not out["value"].isna().any()

    def test_rss_counts_distinct_channels_not_rows(self, spark):
        # duplicate stamps inside one channel and NULL values must not
        # inflate n_channels (the full-alignment filter contract)
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": ["a", "a", "b", "c"],
                    "t": [1.0, 1.0, 1.0, 1.0],
                    "value": [3.0, 4.0, 5.0, None],
                }
            )
        )
        row = rss(df).collect()[0]
        assert row["n_channels"] == 2  # a, b; duplicate row and NULL don't count
        np.testing.assert_allclose(row["value"], np.sqrt(9 + 16 + 25))

    def test_interp_auto_chunks_on_huge_grid(self, spark):
        # the auto decision must see the TARGET grid too: register huge
        # fake stats for the grid plan and check the chunked path both
        # engages and matches the global plan on real (small) data
        from pandas_sigproc_spark import planner

        x = np.array([0.0, 1.0, 2.0, 5.0, 9.0])
        y = np.array([0.0, 10.0, 20.0, 50.0, 90.0])
        df = make_signals(spark, {"c": (x, y)})
        grid = spark.createDataFrame(
            pd.DataFrame({"channel_id": "c", "t": np.linspace(0.0, 9.0, 37)})
        )
        expected = (
            interp1d_linear(df, grid, chunk_rows=None)
            .orderBy("t")
            .toPandas()
        )
        planner.register_stats(
            grid,
            planner.ChannelStats(
                n_channels=1,
                max_rows=planner.HUGE_CHANNEL_ROWS + 1,
                total_rows=planner.HUGE_CHANNEL_ROWS + 1,
            ),
        )
        try:
            # grid stats say "huge" -> auto must chunk even though the
            # source is tiny
            out_df = interp1d_linear(df, grid, chunk_rows="auto")
            # the chunked plan is the one carrying the _seg column
            assert "_seg" in out_df._jdf.queryExecution().analyzed().toString()
            got = out_df.orderBy("t").toPandas()
        finally:
            planner.invalidate_stats()
        np.testing.assert_array_equal(got["t"], expected["t"])
        np.testing.assert_allclose(got["value"], expected["value"])


class TestRoundTwelveApiTierRegressions:
    """r12 review findings on the api/lineage/relational/aggregates tier."""

    def test_samplerate_one_row_channel_gets_null_row(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": ["solo", "pair", "pair"],
                    "t": [0.0, 0.0, 0.5],
                    "value": [1.0, 1.0, 2.0],
                }
            )
        )
        rows = {r["channel_id"]: r["samplerate"] for r in samplerate(df).collect()}
        assert set(rows) == {"solo", "pair"}  # solo no longer vanishes
        assert rows["solo"] is None
        assert rows["pair"] == 2.0

    def test_rms_log_zero_and_duplicate_bins_fall_back(self, spark):
        # zero power, DC bin, duplicate freqs: ANSI-mode division by
        # zero previously crashed; each segment must take the trapezoid
        from pandas_sigproc_spark.operators import rms_log as op_rms_log

        spec = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": "c",
                    "freq": [0.0, 1.0, 1.0, 2.0],
                    "power": [4.0, 0.0, 2.0, 2.0],
                }
            )
        )
        (row,) = op_rms_log(spec, "freq", "power").collect()
        # all three segments are degenerate -> pure trapezoid sum:
        # (4+0)/2*1 + (0+2)/2*0 + (2+2)/2*1 = 4
        np.testing.assert_allclose(row["rms_log"], 2.0)

    def test_after_rss_deterministic_and_accepts_none(self, spark):
        from pandas_sigproc_spark.lineage import after_rss

        cat = spark.createDataFrame(
            pd.DataFrame(
                {
                    "channel_id": ["ay", "ax"],
                    "name": ["Y", "X"],
                    "unit": ["g", "g"],
                    "start_time": [None, None],
                    "samplerate": [100.0, 100.0],
                }
            )
        ).repartition(8)
        for _ in range(3):
            row = after_rss(cat, None).filter("channel_id = 'rss'").collect()[0]
            assert row["name"] == "rss(X,Y)"  # channel-id order, every run

    def test_accessor_mov_rms_standalone_infers_rate(self, spark):
        from pandas_sigproc_spark.api import sigproc

        sr = 10.0
        t = np.arange(40) / sr
        df = make_signals(spark, {"c": (t, np.ones_like(t))})
        out = sigproc(df).mov_rms(0.5).df.toPandas()  # no samplerate: must not crash
        assert len(out) > 0
        np.testing.assert_allclose(out["value"], 1.0)
