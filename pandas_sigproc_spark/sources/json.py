"""JSON-lines ingest: telemetry/export interchange -> canonical ``signals``.

Completes the free-scan row of SURVEY.md §2.1 (Parquet is the native
layout, CSV in ``sources/csv.py``): one JSON object per line with
``channel_id`` / time / ``value`` fields, schema enforced at the scan
(no inference pass), both reference time variants normalized once at
ingest like every other source adapter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandas_sigproc_spark.sources.textio import read_signals_text


def json_to_signals(
    spark: SparkSession,
    path: str,
    time_format: str = "seconds",
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read JSON-lines ``{channel_id, t|ts, value}`` into canonical signals.

    ``time_format="seconds"``: ``t`` is float seconds.
    ``time_format="timestamp"``: ``ts`` is an absolute timestamp, emitted
    as both ``t`` (epoch seconds) and ``ts``.
    ``keep_corrupt=True`` appends ``_corrupt_record`` (the raw line for
    unparseable rows, NULL elsewhere) — under plain PERMISSIVE a broken
    line otherwise surfaces as NULL fields.  Shared scaffolding lives in
    ``sources/textio.py`` (one home with the CSV adapter).
    """
    return read_signals_text(
        spark, path, "json", time_format, keep_corrupt, mode=mode
    )


def signals_to_json(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write signals as JSON lines (``n_files`` coalesces small exports)."""
    out = df.select("channel_id", "t", "value")
    if n_files is not None:
        out = out.coalesce(int(n_files))
    out.write.mode("overwrite").json(path)
