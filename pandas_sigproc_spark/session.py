"""SparkSession factory tuned for this engine.

Local-mode defaults mirror the driver environment (local[32], 128 GiB);
on a real cluster every setting here except master/driver-memory carries
over unchanged.  AQE stays on so skewed channel groups and small shuffle
partitions get re-planned at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pandas_sigproc_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's byte-based partition coalescing misprices compute-bound
        # stages: the default 1 MB minPartitionSize merges a 3 MB
        # exchange feeding an applyInPandas kernel down to ~3 tasks, and
        # the Python kernel (30-300x the per-byte cost of a JVM scan)
        # then runs nearly serial (measured: rainflow 4.6s -> 1.6s,
        # filt_chain 1.0s -> 0.6s at sf0.1 with a 4k floor).  The floor
        # only governs the small-intermediate regime — any exchange
        # whose partitions exceed advisoryPartitionSizeInBytes is
        # untouched, so at production scale (partitions >= 64 MB) the
        # setting is inert; parallelismFirst (default true) still caps
        # the width at the cluster's parallelism.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "4k"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
