"""Incremental (event-triggered) batch runs — SURVEY.md §2.9.

The reference is batch-only; its incrementality is *re-run on new
files* (Cloud Function on GCS upload / scheduled re-runs,
README.md:104) with idempotence via lineage-key dedup (README.md:96,
114) and rsync-style uploads (main.yml:161).

Spark's exact analog is a Structured Streaming **file source** run
with ``Trigger.AvailableNow``: each invocation processes only files
the checkpoint hasn't seen, writes exactly-once to the sink, then
stops. No always-on cluster, no watermarks needed — the same
"process what's new, then exit" contract, with the file ledger kept
in the checkpoint instead of bash bookkeeping.

At 100 TB: ``maxFilesPerTrigger`` bounds per-run memory; the
checkpoint file ledger scales with file count, so raw zones should be
compacted (the staging sink already writes league-partitioned files).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schemas import MATCHES_RAW
from ..operators import (
    dedup_matches,
    explode_matches,
    join_league_names,
    normalize_matches,
)


def run_incremental_etl(
    spark: SparkSession,
    raw_path: str,
    leagues,
    staging_path: str,
    checkpoint_path: str,
    source_commit: str = "unknown",
    max_files_per_trigger: int | None = None,
) -> int:
    """One incremental run: new raw files → normalized staging parquet.

    Returns the number of micro-batches processed (0 = nothing new).
    Safe to call repeatedly — the checkpoint makes it idempotent at
    the file level, and the in-plan dedup (U2) makes the *output*
    idempotent even if upstream rewrites a file with identical rows.
    """
    reader = (
        spark.readStream.schema(MATCHES_RAW)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(raw_path)

    file_path = F.input_file_name()
    file_name = F.regexp_extract(file_path, r"([^/]+)$", 1)
    season_dir = F.regexp_extract(file_path, r"([^/]+)/[^/]+$", 1)
    raw = raw.select(
        "*",
        file_path.alias("file_path"),
        file_name.alias("file_name"),
        F.regexp_extract(file_name, r"^([A-Za-z]+)", 1).alias("league_prefix"),
        F.regexp_extract(season_dir, r"^([0-9]{4})", 1).alias("season_dir"),
    )
    valid = raw.where(
        F.col("_corrupt_record").isNull()
        & F.col("name").isNotNull()
        & (F.col("matches").isNotNull() | F.col("rounds").isNotNull())
    )

    batches = {"n": 0}

    def process(batch_df, batch_id: int) -> None:
        # Per-batch the plan is ordinary batch DataFrame code — the
        # version window (needs global state) runs against the batch;
        # cross-run supersedence is resolved by downstream readers
        # taking the latest ingest_date partition.
        out = dedup_matches(
            join_league_names(
                normalize_matches(explode_matches(batch_df), source_commit),
                leagues,
            )
        )
        (
            out.withColumn("ingest_date", F.to_date("ingestion_ts"))
            .write.mode("append")
            .partitionBy("ingest_date", "league")
            .parquet(staging_path)
        )
        batches["n"] += 1

    q = (
        valid.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
