"""CSV ingest round-trips through the canonical layout, both time variants."""

import numpy as np
import pandas as pd

from pandas_sigproc_spark.operators import rms
from pandas_sigproc_spark.sources.csv import csv_to_signals, signals_to_csv


def test_csv_seconds_roundtrip(spark, tmp_path):
    t = np.arange(0, 1.0, 1 / 100.0)
    pdf = pd.DataFrame(
        {"channel_id": "c0", "t": t, "value": np.sin(2 * np.pi * 5 * t)}
    )
    src = tmp_path / "in.csv"
    pdf.to_csv(src, index=False)
    sig = csv_to_signals(spark, str(src))
    assert sig.columns == ["channel_id", "t", "value"]
    r = rms(sig).collect()[0].rms
    assert abs(r - 1 / np.sqrt(2)) < 1e-6

    out_dir = tmp_path / "out"
    signals_to_csv(sig, str(out_dir), n_files=1)
    back = csv_to_signals(spark, str(out_dir))
    a = sorted((r.channel_id, round(r.t, 9), round(r.value, 9)) for r in sig.collect())
    b = sorted((r.channel_id, round(r.t, 9), round(r.value, 9)) for r in back.collect())
    assert a == b


def test_csv_timestamp_variant(spark, tmp_path):
    ts = pd.date_range("2024-01-01", periods=50, freq="s", tz="UTC")
    pdf = pd.DataFrame(
        {"channel_id": "c1", "ts": ts.tz_localize(None), "value": 1.0}
    )
    src = tmp_path / "ts.csv"
    pdf.to_csv(src, index=False)
    sig = csv_to_signals(spark, str(src), time_format="timestamp")
    rows = sig.orderBy("t").collect()
    assert len(rows) == 50
    # t is epoch seconds and uniformly 1 s apart (the normalize-once rule).
    deltas = {round(b.t - a.t, 9) for a, b in zip(rows, rows[1:])}
    assert deltas == {1.0}
    assert "ts" in sig.columns


def test_json_roundtrip(spark, tmp_path):
    from pandas_sigproc_spark.sources.json import json_to_signals, signals_to_json

    t = np.arange(0, 1.0, 1 / 100.0)
    pdf = pd.DataFrame(
        {"channel_id": "j0", "t": t, "value": np.sin(2 * np.pi * 5 * t)}
    )
    src = tmp_path / "in.jsonl"
    pdf.to_json(src, orient="records", lines=True)
    sig = json_to_signals(spark, str(src))
    assert sig.columns == ["channel_id", "t", "value"]
    r = rms(sig).collect()[0].rms
    assert abs(r - 1 / np.sqrt(2)) < 1e-6

    out_dir = tmp_path / "out_json"
    signals_to_json(sig, str(out_dir), n_files=1)
    back = json_to_signals(spark, str(out_dir))
    a = sorted((x.channel_id, round(x.t, 9), round(x.value, 9)) for x in sig.collect())
    b = sorted((x.channel_id, round(x.t, 9), round(x.value, 9)) for x in back.collect())
    assert a == b


def test_csv_keep_corrupt_quarantines_malformed(spark, tmp_path):
    # r14 review finding: under plain PERMISSIVE Spark only captures a
    # malformed row verbatim when a corrupt-record column is DECLARED in
    # the schema — the old module comment promised _corrupt_record
    # without declaring it, so broken lines silently became all-NULL
    # rows.  keep_corrupt=True declares it for quarantine.
    from pandas_sigproc_spark.sources.csv import csv_to_signals

    p = tmp_path / "sig.csv"
    p.write_text(
        "channel_id,t,value\n"
        "a,0.5,1.0\n"
        "not-a-row,xx\n"
        "b,1.5,2.0\n"
    )
    out = csv_to_signals(spark, str(p), keep_corrupt=True)
    rows = {r["channel_id"]: r for r in out.collect()}
    assert rows["a"]["_corrupt_record"] is None
    assert rows["b"]["value"] == 2.0
    bad = [r for r in rows.values() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("not-a-row")
    # default shape unchanged: canonical 3 columns
    assert csv_to_signals(spark, str(p)).columns == ["channel_id", "t", "value"]


def test_json_keep_corrupt_quarantines_malformed(spark, tmp_path):
    from pandas_sigproc_spark.sources.json import json_to_signals

    p = tmp_path / "sig.jsonl"
    p.write_text(
        '{"channel_id":"a","t":0.5,"value":1.0}\n'
        "{broken json\n"
        '{"channel_id":"b","t":1.5,"value":2.0}\n'
    )
    out = json_to_signals(spark, str(p), keep_corrupt=True)
    bad = [r for r in out.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("{broken")
    assert json_to_signals(spark, str(p)).columns == ["channel_id", "t", "value"]
