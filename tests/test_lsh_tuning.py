"""lsh_band_tuning: the (threshold, n_perms) -> (bands, rows) chooser
behind the banded-MinHash configs — property sweeps mirroring
tests/test_bloom_sizing.py's contract for the Bloom calculator."""

import pytest

from pandas_sigproc_spark.operators import lsh_band_tuning


def test_reproduces_shipped_incremental_dedup_banding():
    t = lsh_band_tuning(0.5, 8)
    assert (t.bands, t.rows) == (4, 2)
    assert t.n_perms_used == 8
    assert abs(t.s50 - 0.5) < 1e-9  # (1/4)^(1/2)


def test_s50_tracks_threshold_with_budget():
    # with a real permutation budget the curve midpoint lands near the
    # target threshold (the whole point of the chooser)
    for thr in (0.3, 0.5, 0.7, 0.8):
        t = lsh_band_tuning(thr, 128)
        assert abs(t.s50 - thr) < 0.15, (thr, t)


def test_more_perms_sharper_curve():
    # total error mass shrinks as the budget grows
    errs = [
        lsh_band_tuning(0.5, n).fp_mass + lsh_band_tuning(0.5, n).fn_mass
        for n in (4, 16, 64, 256)
    ]
    assert errs == sorted(errs, reverse=True)
    # the chooser minimizes fp + 2*fn, not the raw sum, so the sum
    # shrinks slower than the weighted cost — pin the direction plus a
    # measured margin (0.19 -> 0.10 over this budget range)
    assert errs[-1] < errs[0] * 0.6


def test_fn_weight_buys_recall():
    lo = lsh_band_tuning(0.8, 64, fn_weight=1.0)
    hi = lsh_band_tuning(0.8, 64, fn_weight=10.0)
    assert hi.p_at_threshold >= lo.p_at_threshold
    assert hi.fn_mass <= lo.fn_mass
    assert hi.fp_mass >= lo.fp_mass  # the trade is explicit


def test_min_rows_blocks_degenerate_bands():
    t = lsh_band_tuning(0.5, 8, fn_weight=50.0)
    assert t.rows >= 2  # default min_rows
    t1 = lsh_band_tuning(0.5, 8, fn_weight=50.0, min_rows=1)
    assert t1.rows == 1  # explicit opt-in reaches the degenerate split


def test_probability_formula_consistency():
    # p_at_threshold must be exactly 1 - (1 - t^r)^b for the chosen split
    t = lsh_band_tuning(0.6, 32)
    expect = 1.0 - (1.0 - 0.6**t.rows) ** t.bands
    assert abs(t.p_at_threshold - expect) < 1e-12
    assert 0 < t.fp_mass < 1 and 0 <= t.fn_mass < 1
    assert t.n_perms_used <= 32


def test_validation():
    with pytest.raises(ValueError):
        lsh_band_tuning(0.0, 8)
    with pytest.raises(ValueError):
        lsh_band_tuning(1.0, 8)
    with pytest.raises(ValueError):
        lsh_band_tuning(0.5, 1)
    with pytest.raises(ValueError):
        lsh_band_tuning(0.5, 8, min_rows=9)
    with pytest.raises(ValueError):
        lsh_band_tuning(0.5, 8, min_rows=0)
