"""Generic in-memory channel source (reference ``Channel``, ``io.py:85-158``).

``Channel(start_time, time, data, name, unit)`` constructor-injects arrays;
``channels_to_signals`` lands a batch of them in the canonical signals
layout plus catalog rows — the Spark analogue of
``BaseChannel.to_pandas()`` (``io.py:68-82``).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from pandas_sigproc_spark.schemas import CHANNELS_SCHEMA, SIGNALS_SCHEMA


@dataclass
class Channel:
    """One measurement channel: seconds + values + display metadata."""

    channel_id: str
    time: np.ndarray
    data: np.ndarray
    name: str = ""
    unit: str = "none"
    start_time: datetime | None = None


def channels_to_signals(spark: SparkSession, channels: list[Channel]):
    """Build (signals_df, channels_df) from in-memory channels.

    Mirrors ``to_pandas``'s absolute-time construction (``io.py:79-81``):
    when a channel has a ``start_time`` origin, ``ts = origin + t`` is
    materialized alongside the relative seconds column.

    An empty channel list yields EMPTY frames with the canonical
    schemas (a review finding: ``pd.concat([])`` raised an opaque 'No
    objects to concatenate' — e.g. via ``ingest_ide`` on a recorder
    file with zero channels).
    """
    if not channels:
        return (
            spark.createDataFrame([], schema=SIGNALS_SCHEMA),
            spark.createDataFrame([], schema=CHANNELS_SCHEMA),
        )
    sig_frames = []
    cat_rows = []
    for ch in channels:
        t = np.asarray(ch.time, dtype=np.float64)
        v = np.asarray(ch.data, dtype=np.float64)
        if len(t) != len(v):
            raise ValueError(f"channel {ch.channel_id}: time/data length mismatch")
        pdf = pd.DataFrame(
            {
                "channel_id": ch.channel_id,
                "t": t,
                "value": v,
                "ts": (
                    pd.to_datetime(t, unit="s", origin=pd.Timestamp(ch.start_time))
                    if ch.start_time is not None
                    else pd.NaT
                ),
            }
        )
        sig_frames.append(pdf)
        dt = np.diff(t)
        sr = None
        if len(dt) > 0 and dt.min() > 0:
            spread = (dt.max() - dt.min()) / dt.mean()
            if spread <= 1e-4:
                sr = 1.0 / dt.mean()
                if abs(sr - round(sr)) < 0.01 and sr >= 1:
                    sr = float(round(sr))
        st = ch.start_time
        # pd.Timestamp (what datetime-indexed readers naturally produce)
        # fails Spark's TimestampType verifier; plain datetime doesn't.
        if st is not None and hasattr(st, "to_pydatetime"):
            st = st.to_pydatetime()
        cat_rows.append(
            (ch.channel_id, ch.name or ch.channel_id, ch.unit, st, sr)
        )

    signals = spark.createDataFrame(pd.concat(sig_frames, ignore_index=True), schema=SIGNALS_SCHEMA)
    catalog = spark.createDataFrame(cat_rows, schema=CHANNELS_SCHEMA)
    return signals, catalog


def collect_channel(
    signals: DataFrame,
    channel_id: str,
    catalog: DataFrame | None = None,
) -> pd.Series:
    """Materialize ONE channel as the reference's pandas shape.

    The reverse bridge of ``BaseChannel.to_pandas()`` (``io.py:68-82``):
    a driver-side exit point so a user of the reference can finish in the
    exact object their plotting/`timedomain` tooling expects — a Series
    whose index is absolute datetimes when the catalog carries a
    ``start_time`` origin (``io.py:79-81``) or relative float seconds
    otherwise, with the unit attached via ``Series.attrs['unit']``
    (pandas-native metadata; the reference's accessor-instance ``unit``
    attribute is its fragile equivalent, SURVEY.md §1.3).

    Deliberately single-channel and driver-side: collecting one channel
    is a pruned scan + filter (partition/row-group pruning on
    ``channel_id``), never a whole-table collect.
    """
    rows = (
        signals.filter(F.col("channel_id") == channel_id)
        .select("t", "value")
        .orderBy("t")
        .toPandas()
    )
    name = channel_id
    unit = "none"
    start_time = None
    if catalog is not None:
        cat = (
            catalog.filter(F.col("channel_id") == channel_id)
            .select("name", "unit", "start_time")
            .collect()
        )
        if cat:
            name = cat[0]["name"] or channel_id
            unit = cat[0]["unit"] or "none"
            start_time = cat[0]["start_time"]
    if start_time is not None:
        idx = pd.to_datetime(
            rows["t"].to_numpy(), unit="s", origin=pd.Timestamp(start_time)
        )
    else:
        idx = pd.Index(rows["t"].to_numpy(), name="time")
    series = pd.Series(rows["value"].to_numpy(), index=idx, name=name)
    series.attrs["unit"] = unit
    return series
