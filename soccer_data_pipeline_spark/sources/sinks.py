"""Sinks (S6-S9 in SURVEY.md §2.1).

- Staging: partitioned parquet mirroring the reference layout
  ``staging/<date>/<league>/<season>.parquet`` (README.md:49,124-127).
  ``partitionBy`` gives partition pruning on ingest_date/league for
  every downstream read; ``sortWithinPartitions`` on the reference's
  clustering keys (README.md:87) maximizes parquet min/max data
  skipping — the Spark analog of BigQuery clustering.
- Warehouse: append (load job, README.md:111) and CTAS (README.md:253)
  via ``saveAsTable`` on the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_staging(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: partitioned staging sink. Adds ingest_date from the lineage
    timestamp so re-runs land in dated partitions (README.md:49)."""
    (
        df.withColumn("ingest_date", F.to_date("ingestion_ts"))
        .repartition("ingest_date", "league")
        .sortWithinPartitions("league", "team_home", "team_away")
        .write.mode(mode)
        .partitionBy("ingest_date", "league")
        .parquet(path)
    )


def append_warehouse(df: DataFrame, table: str) -> None:
    """S8: warehouse append load (README.md:48,111)."""
    df.write.mode("append").format("parquet").saveAsTable(table)


def create_table_as(spark: SparkSession, table: str, df: DataFrame) -> None:
    """S9: CREATE OR REPLACE TABLE ... AS SELECT (README.md:253)."""
    df.write.mode("overwrite").format("parquet").saveAsTable(table)


def with_run_metrics(df: DataFrame, name: str = "etl") -> DataFrame:
    """S11: metrics emission (README.md:112) via ``observe`` — counts
    are collected by a QueryExecutionListener without a second action.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("is_valid") == False, 1).otherwise(0)).alias(  # noqa: E712
            "invalid_rows"
        ),
    )


class ScanBudgetExceeded(RuntimeError):
    """Raised by enforce_scan_budget when a plan would scan more input
    bytes than the configured budget allows."""


def preflight_scan_bytes(df: DataFrame) -> int:
    """Plan-time estimate of the bytes this query will READ: for every
    file-scan leaf of the physical plan, the total size of its
    post-partition-pruning file listing — the same pre-execution
    accounting BigQuery's dry-run uses. A query filtering on a
    partition column is charged only the partitions it keeps. No job
    runs; only the driver-side file listing is materialized. Non-file
    leaves (in-memory relations, ranges) fall back to Catalyst's
    logical size estimate.

    Leaves are collected from ``sparkPlan()`` — the physical plan
    BEFORE adaptive execution wraps it: under AQE (on by default in
    session.py) ``executedPlan()``'s root is an ``AdaptiveSparkPlanExec``,
    itself a leaf node, so collecting leaves there would never reach the
    file scans of any plan with an exchange (joins/aggregates — exactly
    the plans a budget guard exists for) and would mischarge the whole
    plan's logical estimate instead (ADVICE r2, medium).
    """
    leaves = df._jdf.queryExecution().sparkPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        node = leaves.apply(i)
        try:  # FileSourceScanLike: exact pruned listing
            total += int(node.selectedPartitions().totalFileSize())
        except Exception:
            try:  # anything else: the linked logical node's estimate
                total += int(node.logicalLink().get().stats().sizeInBytes())
            except Exception:
                pass
    return total


def enforce_scan_budget(df: DataFrame, max_bytes: int) -> DataFrame:
    """Cost guard (reference README.md:167 ``--maximum_bytes_billed``):
    refuse to run plans whose estimated input exceeds ``max_bytes``.

    Purely plan-time — no job is started; pair with ``with_run_metrics``
    (the ``observe`` half) for post-hoc actuals. Returns ``df`` unchanged
    when within budget so it composes as a pass-through.
    """
    est = preflight_scan_bytes(df)
    if est > max_bytes:
        raise ScanBudgetExceeded(
            f"plan would scan ~{est:,} bytes, over the {max_bytes:,}-byte budget; "
            "narrow the scan (partition filter / column prune) or raise the budget"
        )
    return df


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dir into ~target_bytes
    files (the raw/staging zones accumulate small files from
    incremental runs; scans pay per-file overhead at 100 TB).

    Returns the post-compaction file count. Uses a size-based
    repartition — never ``coalesce(1)``, which would serialize the
    write through one task.

    LOCAL-FS, OFFLINE-ONLY utility (glob/os.rename): run it on a
    quiesced dataset. The swap renames the old dir ASIDE first, then
    the new one into place — so the canonical path is never the only
    copy mid-swap, and a failed swap leaves the original recoverable
    at ``<path>__old``. (On object stores, compaction belongs to a
    table format — Delta/Iceberg rewrite — not this utility.)

    Crash recovery: if a previous run died between the two renames, the
    data lives at ``<path>__old`` and the canonical path is missing —
    recover with ``mv <path>__old <path>``. A stale ``<path>__old`` from
    any crashed run fails this function fast (below) instead of failing
    half-way through the swap.
    """
    import glob
    import os
    import shutil

    old = path.rstrip("/") + "__old"
    if os.path.exists(old):
        raise RuntimeError(
            f"stale {old} exists (a previous compaction crashed mid-swap); "
            f"recover first: inspect it and either `mv {old} {path}` (if the "
            f"canonical path is missing) or delete it, then re-run"
        )

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, int(total / target_bytes) + 1)
    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: restore the original dataset
        raise
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def write_bucketed_table(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 16
) -> None:
    """Bucketed warehouse table: later equi-joins/aggs on bucket_col
    skip their shuffle entirely (SURVEY §4; pyspark_guide bucketing).
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def write_zorder_layout(
    df: DataFrame, path: str, cols: list[str], bits: int = 16, n_files: int = 8
) -> None:
    """Z-ordered parquet layout: range-partition + sort on the Morton
    interleave of ``cols`` so every written file covers a narrow
    min/max band in EVERY listed dimension — multi-dimensional parquet
    skipping (the ``OPTIMIZE ZORDER BY`` layout, functions/zorder.py).
    One range shuffle; the interleave itself is narrow bit arithmetic
    over min-max-scaled dimensions (``functions/zorder.with_zvalue`` —
    unscaled dims of unequal magnitude would degenerate to a 1-dim
    sort on the widest one).
    """
    from ..functions.zorder import with_zvalue

    (
        with_zvalue(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
