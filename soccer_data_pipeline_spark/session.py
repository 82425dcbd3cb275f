"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[N]``; the conf below is chosen so the same
code is correct on a 1000-executor cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting)
  covers the skewed-key risk flagged in SURVEY.md §4.
- ``spark.sql.session.timeZone=UTC`` pins timestamp semantics so
  results are engine-comparable (DuckDB oracle) and cluster-portable.
- Arrow execution on for the (rare) pandas-UDF paths.
- Shuffle partitions default to the local core count; on a real
  cluster AQE coalesces from a deliberately-high initial number, so we
  leave ``spark.sql.adaptive.coalescePartitions.enabled`` true.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "soccer-data-pipeline-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # ContextCleaner only reclaims dropped checkpoint/cache blocks
        # after a JVM GC notices the dead references; the default 30min
        # periodic GC lets a busy session accumulate blocks far longer
        # than any query runs. 1min bounds that drift for callers who
        # don't release explicitly (operators/cache.py has the hook).
        .config("spark.cleaner.periodicGC.interval", "1min")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
