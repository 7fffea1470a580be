"""Bucketed storage for the canonical ``signals`` table.

SURVEY.md §4.2 mitigation (a) for the chained-kernel shuffle gap, and
§7.0's layout commitment: persist ``signals`` hash-bucketed (and
time-sorted) by ``channel_id``, so every per-channel operator —
``groupBy("channel_id")`` aggregations, ``applyInPandas`` kernels —
starts from a scan whose partitioning already satisfies the clustered
distribution and needs NO exchange at all.  At 100 TB this removes the
one shuffle that every kernel query would otherwise pay, turning the
whole kernel tier into scan → kernel → write.

Spark-native bucketing requires the table path (``saveAsTable`` +
``spark.table``): plain ``parquet(path)`` round-trips lose the bucket
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_signals_bucketed(
    df: DataFrame, table: str, n_buckets: int = 32, sort: bool = True
) -> None:
    """Persist ``df`` bucketed by ``channel_id`` into ``table``.

    ``sort=True`` additionally sorts files by ``(channel_id, t)`` so
    parquet row-group min/max stats on ``t`` stay tight per channel
    (range predicates prune I/O — the §2.2 `between` path).
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(int(n_buckets), "channel_id")
    )
    if sort:
        w = w.sortBy("channel_id", "t")
    w.saveAsTable(table)


def read_signals_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed signals table with its bucket spec intact."""
    return spark.table(table)
