"""Warehouse-side readers over the staging zone.

``read_staging_latest`` resolves cross-run supersedence: incremental
runs append per-ingest-date partitions, so a league-season re-ingested
later exists twice; downstream consumers want only the newest ingest
of each (league, season, file lineage). The resolution is the same W1
top-1 window the in-batch version dedup uses — applied over the
partition column, which parquet partition pruning keeps cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def read_staging(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_staging_latest(spark: SparkSession, path: str) -> DataFrame:
    """Latest ingest per (league, season, round, team_home, team_away).

    Newer ingest_date wins; ties broken by ingestion_ts then file_path
    for determinism.
    """
    df = read_staging(spark, path)
    w = Window.partitionBy(
        "league", "season", "round", "team_home", "team_away"
    ).orderBy(
        F.desc("ingest_date"), F.desc("ingestion_ts"), F.desc("file_path")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
