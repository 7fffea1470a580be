"""Lineage-name / unit propagation matches the reference's rewrite strings
(extension.py:494, 536, 624, 657, 693, 719-749, 778, 800-809)."""

import pandas as pd
import pytest

from pandas_sigproc_spark import lineage as L
from pandas_sigproc_spark.schemas import CHANNELS_SCHEMA


@pytest.fixture()
def cat(spark):
    return spark.createDataFrame(
        [
            ("ax", "accel_x", "g", None, 48000.0),
            ("ay", "accel_y", "g", None, 48000.0),
        ],
        schema=CHANNELS_SCHEMA,
    )


def _one(cat, cid="ax"):
    r = {r["channel_id"]: r for r in cat.collect()}[cid]
    return r["name"], r["unit"]


def test_filter_chain_names(cat):
    c = L.after_filt_butter(cat)
    assert _one(c)[0] == "filt(accel_x)"
    c = L.after_filt_cfc(cat, 1000)
    assert _one(c)[0] == "CFC1000(accel_x)"  # extension.py:536
    c = L.after_filt_a(cat)
    assert _one(c)[0] == "filt_a(accel_x)"


def test_psd_unit_algebra(cat):
    name, unit = _one(L.after_get_psd(cat))
    assert name == "psd(accel_x)" and unit == "g^2/Hz"  # extension.py:624


def test_srs_keeps_unit(cat):
    name, unit = _one(L.after_get_srs(cat, 50.0))
    assert name == "srs(accel_x,Q=50.0)" and unit == "g"  # extension.py:657,661


def test_calculus_resets_unit(cat):
    assert _one(L.after_integral(cat)) == ("int(accel_x)", "none")
    assert _one(L.after_derivative(cat)) == ("diff(accel_x)", "none")


def test_mov_rms_and_detrend(cat):
    assert _one(L.after_mov_rms(cat, 0.1))[0] == "mov_rms(accel_x,0.1)"
    assert _one(L.after_detrend(cat))[0] == "detrend(accel_x)"
    assert _one(L.after_interp1d(cat))[0] == "interp(accel_x)"


def test_rss_concatenates_member_names(cat):
    c = L.after_rss(cat, ["ax", "ay"], out_channel="rss_xy")
    name, unit = _one(c, "rss_xy")
    assert name == "rss(accel_x,accel_y)" and unit == "g"  # extension.py:800-809
    assert c.count() == 3  # members stay


def test_chain_composes(cat):
    c = L.after_get_psd(L.after_filt_butter(cat))
    name, unit = _one(c)
    assert name == "psd(filt(accel_x))" and unit == "g^2/Hz"
