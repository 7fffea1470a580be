"""spark.read.format("ide") — the Spark 4 Python Data Source over EBML
recordings (one input partition per file, Arrow-batched rows)."""

import numpy as np
import pytest

from pandas_sigproc_spark.sources import mide
from pandas_sigproc_spark.sources.ide_datasource import register_ide_source


def _channels(tag):
    t0 = 1_700_000_000_000_000  # epoch us
    return [
        {
            "ch_id": 1,
            "name": f"accel{tag}",
            "unit": "g",
            "rate": 100.0,
            "start_us": t0,
            "scale": 0.01,
            "blocks": [(0.0, np.arange(50, dtype=np.int16)),
                       (0.5, np.arange(50, 90, dtype=np.int16))],
        },
        {
            "ch_id": 2,
            "name": f"press{tag}",
            "unit": "Pa",
            "rate": 10.0,
            "start_us": t0,
            "scale": 2.0,
            "blocks": [(0.0, np.asarray([3, -4, 5], dtype=np.int16))],
        },
    ]


@pytest.fixture(scope="module")
def ide_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ide_ds")
    for i in range(3):
        with open(d / f"log{i}.ide", "wb") as fh:
            fh.write(mide.encode_recording(_channels(i)))
    register_ide_source(spark)
    return str(d)


def test_read_directory_all_channels(spark, ide_dir):
    df = spark.read.format("ide").load(ide_dir)
    assert df.columns == ["channel_id", "t", "value"]
    assert df.count() == 3 * (90 + 3)
    # one scan partition per file
    assert df.rdd.getNumPartitions() == 3
    # value fidelity: int16 * scale through the whole source
    vals = sorted(
        r.value for r in df.filter(df.channel_id.endswith("press1")).collect()
    )
    assert vals == [-8.0, 6.0, 10.0]


def test_channel_option_and_glob(spark, ide_dir):
    df = (
        spark.read.format("ide")
        .option("channel", "accel2")
        .load(ide_dir + "/log2.ide")
    )
    rows = df.orderBy("t").collect()
    assert len(rows) == 90
    assert rows[0].t == 0.0 and abs(rows[-1].t - (0.5 + 39 / 100.0)) < 1e-12
    assert rows[-1].value == pytest.approx(89 * 0.01)


def test_missing_path_is_loud(spark, ide_dir):
    with pytest.raises(Exception, match="no files match"):
        spark.read.format("ide").load(ide_dir + "/nope*.ide").count()


def test_composes_with_operators(spark, ide_dir):
    from pandas_sigproc_spark.operators import rms

    df = spark.read.format("ide").load(ide_dir)
    out = {r.channel_id.split(":")[-1]: r for r in rms(df).collect()}
    exp = np.sqrt(np.mean((np.asarray([3, -4, 5]) * 2.0) ** 2))
    for tag in range(3):
        assert out[f"press{tag}"].rms == pytest.approx(exp)


def test_empty_dir_raises(tmp_path):
    from pandas_sigproc_spark.sources.ide_datasource import _expand

    d = tmp_path / "empty"
    d.mkdir()
    (d / "notes.txt").write_text("not a recording")
    with pytest.raises(FileNotFoundError, match="no .ide files"):
        _expand(str(d))


def test_channel_option_is_filter_across_files(spark, tmp_path):
    # r13 review finding: a file lacking the named channel killed the
    # whole multi-file read with KeyError; filter semantics now.
    from pandas_sigproc_spark.sources import mide
    from pandas_sigproc_spark.sources.ide_datasource import (
        register_ide_source,
    )

    def rec(ch_name):
        return mide.encode_mide(
            [{
                "ch_id": 1, "name": ch_name, "fmt": "<h",
                "subchannels": [
                    {"sub_id": 0, "name": "s", "units": "", "cal_id": 1}
                ],
                "blocks": [(0, 2048, __import__("numpy").array([[1], [2]], "<i2"))],
            }],
            {1: (0.0, [1.0, 0.0])},
        )

    (tmp_path / "a.ide").write_bytes(rec("Accel"))
    (tmp_path / "b.ide").write_bytes(rec("Temp"))
    register_ide_source(spark)
    df = (
        spark.read.format("ide")
        .option("channel", "Accel:s")
        .load(str(tmp_path))
    )
    rows = df.collect()
    assert len(rows) == 2  # only a.ide contributes; b.ide yields no rows
    assert all("Accel" in r["channel_id"] for r in rows)
