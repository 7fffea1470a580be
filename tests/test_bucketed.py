"""Bucketed (many-channels-per-task) execution must be numerically
identical to per-channel execution — same kernels, different batching.
This is the shuffle-invariance scale test of SURVEY.md §5.2.5."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark import kernels as K
from pandas_sigproc_spark.kernels.iir_batch import filtfilt_batch, lfilter_batch
from pandas_sigproc_spark.operators import filt_a, filt_butter, get_psd, get_srs
from tests.conftest import make_signals


@pytest.fixture(scope="module")
def many_channels(spark):
    rng = np.random.default_rng(42)
    fs = 500.0
    t = np.arange(0, 2.0, 1 / fs)
    chans = {f"ch{i:02d}": (t, rng.standard_normal(len(t))) for i in range(12)}
    # One odd-length channel to exercise the leftover (non-batchable) path.
    t_odd = np.arange(0, 1.5, 1 / fs)
    chans["odd"] = (t_odd, rng.standard_normal(len(t_odd)))
    return make_signals(spark, chans), fs


class TestBatchKernels:
    def test_lfilter_batch_matches_rows(self):
        rng = np.random.default_rng(0)
        X = rng.standard_normal((5, 4000))
        b, a = K.butter(3, 0.2, "lowpass")
        Y = lfilter_batch(b, a, X)
        for i in range(5):
            np.testing.assert_allclose(Y[i], K.lfilter(b, a, X[i]), rtol=1e-9, atol=1e-12)

    def test_filtfilt_batch_matches_rows(self):
        rng = np.random.default_rng(1)
        X = rng.standard_normal((7, 3000))
        b, a = K.butter(2, 0.1, "lowpass")
        Y = filtfilt_batch(b, a, X)
        for i in range(7):
            np.testing.assert_allclose(Y[i], K.filtfilt(b, a, X[i]), rtol=1e-9, atol=1e-11)

    def test_srs_multi_matches_single(self):
        rng = np.random.default_rng(2)
        fs = 1000.0
        t = np.arange(0, 1.0, 1 / fs)
        X = rng.standard_normal((4, len(t)))
        fn = K.build_freq_array(10, 100)
        from pandas_sigproc_spark.kernels.srs import srs_multi

        pos_m, neg_m = srs_multi(X, 1 / fs, fn)
        for i in range(4):
            pos, neg = K.srs(t, X[i], fn)
            np.testing.assert_allclose(pos_m[i], pos, rtol=1e-10)
            np.testing.assert_allclose(neg_m[i], neg, rtol=1e-10)


class TestBucketedOperators:
    def _cmp(self, a_df, b_df, keys, atol=1e-11):
        a = a_df.orderBy(*keys).toPandas()
        b = b_df.orderBy(*keys).toPandas()
        assert len(a) == len(b)
        np.testing.assert_allclose(
            a.iloc[:, -1].to_numpy(), b.iloc[:, -1].to_numpy(), rtol=1e-9, atol=atol
        )

    def test_filt_butter_bucketed(self, spark, many_channels):
        df, fs = many_channels
        self._cmp(
            filt_butter(df, 50.0, 2, "lowpass"),
            filt_butter(df, 50.0, 2, "lowpass", n_buckets=3),
            ["channel_id", "t"],
        )

    def test_filt_a_bucketed(self, spark, many_channels):
        df, fs = many_channels
        # A-weighting needs audio-ish rates; rescale time to pretend 48k.
        fast = df.select("channel_id", (F.col("t") / 96.0).alias("t"), "value")
        # A-weighting has near-unit-circle poles (20.6 Hz @ 48 kHz): the
        # batch FFT path agrees with the exact recursion to ~1e-8 abs,
        # not 1e-11 — fine for a dB-scale acoustics filter.
        self._cmp(
            filt_a(fast), filt_a(fast, n_buckets=3), ["channel_id", "t"], atol=1e-7
        )

    def test_psd_bucketed(self, spark, many_channels):
        df, fs = many_channels
        self._cmp(
            get_psd(df, window_length=0.5, samplerate=fs),
            get_psd(df, window_length=0.5, samplerate=fs, n_buckets=3),
            ["channel_id", "freq"],
        )

    @pytest.mark.parametrize("mode", ["median", "max rms", "damage"])
    def test_psd_bucketed_summarize(self, spark, many_channels, mode):
        df, fs = many_channels
        self._cmp(
            get_psd(df, window_length=0.5, summarize=mode, samplerate=fs),
            get_psd(df, window_length=0.5, summarize=mode, samplerate=fs, n_buckets=4),
            ["channel_id", "freq"],
        )

    def test_srs_bucketed(self, spark, many_channels):
        df, fs = many_channels
        fn = [20.0, 50.0, 100.0]
        self._cmp(
            get_srs(df, freq=fn),
            get_srs(df, freq=fn, n_buckets=3),
            ["channel_id", "freq"],
        )


class TestBucketedTable:
    def test_bucketed_table_removes_exchange(self, spark, tmp_path):
        # SURVEY §4.2 mitigation (a): a signals table persisted with
        # bucketBy(channel_id) must let per-channel aggregations and
        # grouped kernels run with NO shuffle at all.
        from pandas_sigproc_spark.sources.bucketed import (
            read_signals_bucketed,
            write_signals_bucketed,
        )

        rng = np.random.default_rng(3)
        t = np.arange(0, 1.0, 1 / 200.0)
        chans = {f"b{i}": (t, rng.standard_normal(len(t))) for i in range(6)}
        df = make_signals(spark, chans).drop("ts")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}'")
        try:
            write_signals_bucketed(df, "bucketdb.signals_b", n_buckets=4)
            tbl = read_signals_bucketed(spark, "bucketdb.signals_b")

            agg = tbl.groupBy("channel_id").agg(
                F.sqrt(F.avg(F.col("value") * F.col("value"))).alias("rms")
            )
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan

            # The unbucketed equivalent DOES shuffle — the contrast that
            # proves the bucket metadata (not the data size) removed it.
            plain = df.groupBy("channel_id").agg(
                F.sqrt(F.avg(F.col("value") * F.col("value"))).alias("rms")
            )
            assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()

            got = {r.channel_id: r.rms for r in agg.collect()}
            want = {
                cid: float(np.sqrt(np.mean(v**2))) for cid, (_t, v) in chans.items()
            }
            for cid in want:
                assert abs(got[cid] - want[cid]) < 1e-9
        finally:
            spark.sql("DROP TABLE IF EXISTS bucketdb.signals_b")
            spark.sql("DROP DATABASE IF EXISTS bucketdb")
