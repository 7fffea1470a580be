"""Adapter: the driver's ``events`` table -> canonical ``signals``.

``events(event_id, ts TIMESTAMP, user_id, event_type, value, props)`` maps
onto the signals model with one channel per user: ``channel_id =
user_id``, ``t = epoch seconds of ts`` (the datetime64 -> seconds
normalization the reference does per-operation at ``extension.py:318-319``,
done once here at ingest).  Ties on ``t`` are broken by ``event_id`` so
every windowed operator downstream is deterministic (SURVEY.md §7.3.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_seconds(ev: DataFrame, ts_col: str = "ts") -> Column:
    """Epoch-seconds expression for the events ``ts`` field.

    ``ts_col`` names the (possibly aliased/renamed) timestamp column;
    dtype dispatch and the expression both use it, so upstream renames
    can't silently break the adapter.

    Bit-exact with DuckDB's ``epoch(ts)`` across the ways Spark can read
    the parquet TIMESTAMP(NANOS) column: with the legacy ``nanosAsLong``
    conf it arrives as bigint nanos (truncate to µs with integer division
    — a double divide at 1e18 magnitude would lose bits); Spark 4.1+
    ignores that conf and reads TIMESTAMP_NTZ already truncated to µs
    (matching DuckDB's ns -> µs truncation), where a direct cast to
    double is forbidden — go through ``unix_micros`` instead (session
    timezone is pinned to UTC in ``session.get_spark``, so the
    ntz -> ltz cast is wall-clock identity).
    """
    dt = dict(ev.dtypes).get(ts_col)
    if dt == "bigint":
        # backtick-quoted so arbitrary column names survive; integer `div`
        # (not a double divide: epoch nanos ~1.7e18 exceed 2^53)
        return F.expr(f"`{ts_col}` div 1000") / F.lit(1e6)
    if dt == "timestamp_ntz":
        return F.unix_micros(F.col(ts_col).cast("timestamp_ltz")) / F.lit(1e6)
    return F.col(ts_col).cast("double")


def events_to_signals(
    spark: SparkSession, sf_dir: str, relative_time: bool = False
) -> DataFrame:
    """Long-format signals view of the events table.

    ``relative_time=True`` rebases ``t`` to seconds since each channel's
    first sample (the reference's float-seconds index variant).
    """
    ev = load_table(spark, sf_dir, "events")
    sig = ev.select(
        F.col("user_id").cast("string").alias("channel_id"),
        ts_seconds(ev).alias("t"),
        F.col("value").cast("double").alias("value"),
        F.col("ts").alias("ts"),
        F.col("event_id").alias("seq"),
    )
    if relative_time:
        sig = sig.withColumn(
            "t", F.col("t") - F.min("t").over(Window.partitionBy("channel_id"))
        )
    return sig
