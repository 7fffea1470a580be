"""Driver-side plot exits: SVG renderer smoke + matplotlib gate.

The reference's most-used endpoint is .plot() (examples/test_endaq.py:
40-43); matplotlib is absent here, so the SVG backend is the path that
must actually render.
"""

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from pandas_sigproc_spark import viz
from tests.conftest import make_signals


def _parse(path):
    return ET.parse(path).getroot()


def test_svg_time_domain_two_series(spark, tmp_path):
    t = np.arange(0, 1.0, 0.01)
    df = make_signals(
        spark, {"a": (t, np.sin(2 * np.pi * t)), "b": (t, np.cos(2 * np.pi * t))}
    )
    out = tmp_path / "time.svg"
    viz.save_plot_svg(df, str(out), title="two channels", x_label="time", y_label="g")
    root = _parse(out)
    ns = "{http://www.w3.org/2000/svg}"
    lines = root.findall(f"{ns}polyline")
    assert len(lines) == 2
    # fixed-order palette, assigned by sorted series order
    assert lines[0].get("stroke") == viz.PALETTE[0]
    assert lines[1].get("stroke") == viz.PALETTE[1]
    assert lines[0].get("stroke-width") == "2"
    # legend present for >= 2 series, labels in neutral ink
    texts = [t.text for t in root.findall(f"{ns}text")]
    assert "a" in texts and "b" in texts and "two channels" in texts
    # every point inside the viewBox
    for ln in lines:
        for pair in ln.get("points").split():
            x, y = map(float, pair.split(","))
            assert 0 <= x <= 960 and 0 <= y <= 540


def test_svg_loglog_spectrum_single_series(spark, tmp_path):
    freq = np.logspace(0, 3, 200)
    power = 1.0 / freq**2
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"channel_id": "psd", "freq": freq, "power": power})
    )
    out = tmp_path / "psd.svg"
    viz.save_plot_svg(
        df, str(out), x_col="freq", y_col="power", loglog=True, title="psd"
    )
    root = _parse(out)
    ns = "{http://www.w3.org/2000/svg}"
    assert len(root.findall(f"{ns}polyline")) == 1
    # single series: no legend swatches (only the frame + title + grid)
    rects = root.findall(f"{ns}rect")
    assert all(r.get("rx") is None for r in rects)
    # decade tick labels rendered
    texts = {t.text for t in root.findall(f"{ns}text")}
    assert "1" in texts and "1000" in texts


def test_svg_loglog_drops_nonpositive(spark, tmp_path):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {"channel_id": "c", "freq": [0.0, 1.0, 10.0], "power": [5.0, 1.0, 0.1]}
        )
    )
    out = tmp_path / "p.svg"
    viz.save_plot_svg(df, str(out), x_col="freq", y_col="power", loglog=True)
    ns = "{http://www.w3.org/2000/svg}"
    pts = _parse(out).find(f"{ns}polyline").get("points").split()
    assert len(pts) == 2  # freq=0 row dropped


def test_too_many_series_is_an_error(spark, tmp_path):
    t = np.arange(3, dtype=float)
    df = make_signals(spark, {f"c{i}": (t, t) for i in range(9)})
    with pytest.raises(ValueError, match="split"):
        viz.save_plot_svg(df, str(tmp_path / "x.svg"))


def test_matplotlib_backend_is_import_gated(spark):
    if viz.plt is not None:
        pytest.skip("matplotlib installed; gate not reachable")
    t = np.arange(3, dtype=float)
    df = make_signals(spark, {"c": (t, t)})
    with pytest.raises(ImportError, match="matplotlib"):
        viz.plot_channel(df, "c")
