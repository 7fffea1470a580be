"""Shared scaffolding for the text-interchange signal adapters
(``sources/csv.py`` / ``sources/json.py``) — ONE home for the canonical
schemas, the time-variant dispatch, and the corrupt-record quarantine
contract (the hash60_sql single-homing rule: two hand-kept copies of
the ``keep_corrupt`` plumbing would silently drift)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_FLOAT_SCHEMA = "channel_id STRING, t DOUBLE, value DOUBLE"
_TS_SCHEMA = "channel_id STRING, ts TIMESTAMP, value DOUBLE"
_CORRUPT = ", _corrupt_record STRING"


def read_signals_text(
    spark: SparkSession,
    path: str,
    fmt: str,
    time_format: str,
    keep_corrupt: bool,
    **reader_options,
) -> DataFrame:
    """Read a ``csv``/``json`` signals file into the canonical shape.

    ``time_format="seconds"`` -> ``(channel_id, t, value)``;
    ``"timestamp"`` -> ``(channel_id, t, value, ts)`` with ``t`` = epoch
    seconds.  ``keep_corrupt=True`` DECLARES ``_corrupt_record`` in the
    scan schema and keeps it — under plain PERMISSIVE mode Spark only
    captures a malformed row verbatim when that column exists in the
    schema; without it broken lines silently become all-NULL rows (a
    review finding in csv.py, where the old comment promised the
    column without declaring it)."""
    if time_format == "seconds":
        base_schema, cols = _FLOAT_SCHEMA, ["channel_id", "t", "value"]
    elif time_format == "timestamp":
        base_schema, cols = _TS_SCHEMA, None
    else:
        raise ValueError(
            f"time_format must be 'seconds' or 'timestamp', got {time_format!r}"
        )
    schema = base_schema + (_CORRUPT if keep_corrupt else "")
    df = getattr(spark.read, fmt)(path, schema=schema, **reader_options)
    if cols is None:
        cols = [
            "channel_id",
            F.col("ts").cast("double").alias("t"),
            "value",
            "ts",
        ]
    if keep_corrupt:
        cols = cols + ["_corrupt_record"]
    return df.select(*cols)


__all__ = ["read_signals_text"]
