"""Columnar (parquet) sources for the driver star schema.

Scans stay fully declarative so Catalyst gets predicate pushdown and
column pruning for free — verify with ``df.explain("formatted")``:
filters appear as ``PushedFilters`` and the projection as ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import STAR_TABLES


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every TIMESTAMP_NTZ column to session-TZ TIMESTAMP.

    The driver's parquet files have shipped with three different time
    encodings across rounds: TIMESTAMP(NANOS) (read as bigint under the
    legacy conf), naive ``timestamp[us]`` (→ Spark TIMESTAMP_NTZ), and
    tz-aware micros (→ TIMESTAMP). Downstream operators uniformly expect
    TIMESTAMP (``unix_micros``, ``withWatermark``, ``window`` all reject
    NTZ), so the loader — not each operator — owns the conversion. The
    session TZ is pinned UTC, so NTZ → TIMESTAMP is value-identical to
    what the DuckDB oracle sees reading the same file.
    """
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``sf_dir``.

    Timestamp semantics are pinned to UTC on the session so results are
    identical across engines (DuckDB oracle) and cluster timezones.

    ``events.ts`` has been written as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; we read it as raw nanos (legacy
    conf) and floor-truncate to microseconds — exactly what DuckDB does
    when it reads the same file, so both engines see identical values.
    Every remaining naive timestamp column (TIMESTAMP_NTZ) is cast to
    session-UTC TIMESTAMP via :func:`normalize_timestamps`.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return normalize_timestamps(df)
    return normalize_timestamps(spark.read.parquet(path))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star table as a temp view for the SQL surface."""
    for t in STAR_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
