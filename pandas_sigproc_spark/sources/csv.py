"""CSV ingest: DAQ-export interchange files -> canonical ``signals``.

The reference ingests only enDAQ ``.ide`` and in-memory arrays
(``io.py:85-301``); real DAQ workflows also hand around CSV exports, and
Spark reads them distributed for free.  This adapter enforces the
canonical schema (SURVEY.md §1.5) at the scan — explicit schema, no
inference pass — and normalizes either time variant the reference
accepts (float seconds, or absolute timestamps converted to seconds,
``extension.py:318-321``).

Scale notes: an explicit schema skips Spark's whole-file inference read;
one CSV file splits across tasks by byte range.  Malformed-row policy:
under PERMISSIVE mode Spark surfaces an unparseable row as NULL fields —
it is only captured verbatim when a corrupt-record column is DECLARED in
the schema (a review finding: the old comment promised ``_corrupt_record``
without declaring it, which silently yielded all-NULL rows instead).
Pass ``keep_corrupt=True`` to declare it and keep the raw line for
quarantine, or ``mode="FAILFAST"`` to refuse the file outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pandas_sigproc_spark.sources.textio import read_signals_text


def csv_to_signals(
    spark: SparkSession,
    path: str,
    time_format: str = "seconds",
    header: bool = True,
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read ``(channel_id, t|ts, value)`` CSV into canonical signals.

    ``time_format="seconds"``: column 2 is float seconds (relative time).
    ``time_format="timestamp"``: column 2 is an absolute timestamp;
    emitted as both ``t`` (epoch seconds, the math column) and ``ts``,
    the same normalize-once-at-ingest treatment as events_to_signals.
    ``keep_corrupt=True`` appends ``_corrupt_record`` (the raw line for
    rows that failed to parse, NULL elsewhere) so callers can quarantine
    instead of silently ingesting NULL-field rows.  Shared scaffolding
    lives in ``sources/textio.py`` (one home with the JSON adapter).
    """
    return read_signals_text(
        spark, path, "csv", time_format, keep_corrupt, header=header, mode=mode
    )


def signals_to_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write signals out as CSV (one directory of part files; ``n_files``
    coalesces for small exports)."""
    out = df.select("channel_id", "t", "value")
    if n_files is not None:
        out = out.coalesce(int(n_files))
    out.write.mode("overwrite").option("header", True).csv(path)
