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

from pyspark.sql import DataFrame, SparkSession, Window
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


def merge_upsert_batch(
    target: DataFrame, source: DataFrame, key: str, seq_col: str | None = None
) -> DataFrame:
    """MERGE INTO semantics for one batch: WHEN MATCHED take source
    values, WHEN NOT MATCHED insert — one co-partitioned full-outer
    join, the same single-shuffle plan as the registered
    ``merge_upsert_orders`` query (plans/warehouse_queries.py).

    ``seq_col`` makes the MERGE order-independent at two levels: (1)
    within-batch supersedence — when a key appears multiple times in
    ``source`` only the max-``seq_col`` row survives, so a full replay
    of all files in one batch converges; (2) cross-batch — a matched
    target row is overwritten only when the source row's ``seq_col`` is
    >= the target's, so a stale batch replayed out of order (late
    files, backfills) cannot clobber newer state. Without ``seq_col``
    the MERGE is plain last-writer-wins.
    """
    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
        source = (
            source.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    t, s = target.alias("t"), source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    if seq_col is None:
        # no ordering column: matched rows always take source values
        take_source = F.col(f"s.{key}").isNotNull()
    else:
        take_source = F.col(f"s.{key}").isNotNull() & (
            F.col(f"t.{key}").isNull()
            | (F.col(f"s.{seq_col}") >= F.col(f"t.{seq_col}"))
        )
    return joined.select(
        *[
            F.when(take_source, F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in target.columns
        ]
    )


def run_incremental_merge(
    spark: SparkSession,
    source_path: str,
    schema,
    warehouse_path: str,
    checkpoint_path: str,
    key: str,
    seq_col: str | None = None,
    post_write_hook=None,
) -> int:
    """Streaming → warehouse with exactly-once MERGE semantics: an
    AvailableNow file source whose ``foreachBatch`` upserts each
    micro-batch into a versioned parquet snapshot.

    ``post_write_hook(batch_id)`` is a failure-injection seam for
    tests: it runs after the snapshot write and before foreachBatch
    returns (i.e. before the checkpoint commit), so raising from it
    simulates the executor dying in exactly the window the
    exactly-once recipe exists for — snapshot written, commit absent.

    foreachBatch is at-least-once by itself: the checkpoint's commit
    log means a COMMITTED batch is never redelivered, but a batch that
    fails after writing and before the commit IS replayed on restart.
    Exactly-once therefore comes from making the write idempotent, the
    standard recipe:

    - snapshot version = the batch's epoch id (deterministic, stored
      in the checkpoint WAL) → a replayed batch OVERWRITES its own
      ``v=<id>`` directory instead of appending a duplicate;
    - the MERGE takes absolute source values (not increments), so
      re-merging rows already applied is a no-op on the result;
    - within-batch supersedence via ``seq_col`` makes a from-scratch
      replay (all files in one batch) converge to the same final state.

    Readers resolve the current snapshot as max(v=N) — the same
    pointer-free convention as the staging reader's latest-ingest-date
    rule. Returns the number of micro-batches processed.

    At 100 TB the per-batch cost is one co-partitioned full-outer join
    (source batch ≪ target); stale ``v=`` directories are pruned by
    retention jobs, exactly like Delta/Iceberg snapshot expiry.
    """
    batches = {"n": 0}

    def process(batch_df, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        current = _read_latest_snapshot(bspark, warehouse_path, schema)
        merged = (
            merge_upsert_batch(current, batch_df, key, seq_col=seq_col)
            if current is not None
            else merge_upsert_batch(
                batch_df.limit(0), batch_df, key, seq_col=seq_col
            )
        )
        merged.write.mode("overwrite").parquet(f"{warehouse_path}/v={batch_id}")
        if post_write_hook is not None:
            post_write_hook(batch_id)
        batches["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def _read_latest_snapshot(spark: SparkSession, warehouse_path: str, schema):
    """Highest ``v=N`` snapshot under ``warehouse_path``, or None.

    Listed through the Hadoop FileSystem API so the convention works on
    any cluster filesystem (HDFS, S3A, GCS, local), not just the local
    FS; a table catalog (Delta/Iceberg) keeps this same pointer in its
    log — the convention is identical."""
    import re

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(warehouse_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    versions = [
        int(m.group(1))
        for status in fs.listStatus(jpath)
        if (m := re.fullmatch(r"v=(\d+)", status.getPath().getName()))
    ]
    if not versions:
        return None
    return spark.read.schema(schema).parquet(
        f"{warehouse_path}/v={max(versions)}"
    )


def _sketch_store_schema(source_schema, key: str):
    from pyspark.sql import types as T

    key_field = next(f for f in source_schema.fields if f.name == key)
    return T.StructType([key_field, T.StructField("sk", T.BinaryType())])


def run_incremental_sketch_store(
    spark: SparkSession,
    source_path: str,
    schema,
    store_path: str,
    checkpoint_path: str,
    key: str,
    value_col: str,
) -> int:
    """Streaming → mergeable-sketch store: each AvailableNow micro-batch
    folds its rows into per-key HLL sketches and UNIONs them into a
    versioned snapshot — distinct-counting over an unbounded stream
    with O(keys) state and no history re-scan (the streaming twin of
    the ``sketch_merge_distinct`` gate query).

    Exactly-once comes cheaper than the MERGE sink's recipe: HLL
    register-merge is max-based, so sketch union is IDEMPOTENT as well
    as commutative/associative — re-unioning a replayed batch's sketch
    is a value-level no-op — and the epoch-id snapshot overwrite
    (v=<batch_id>) de-duplicates the file level exactly as in
    ``run_incremental_merge``. At 100 TB each batch ships one sketch
    row per touched key (~1.5 KB at lgConfigK=12), never raw history.
    """
    store_schema = _sketch_store_schema(schema, key)
    batches = {"n": 0}

    def process(batch_df, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        batch_sk = batch_df.groupBy(key).agg(
            F.hll_sketch_agg(value_col).alias("sk")
        )
        current = _read_latest_snapshot(bspark, store_path, store_schema)
        if current is None:
            merged = batch_sk
        else:
            t, s = current.alias("t"), batch_sk.alias("s")
            joined = t.join(
                s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer"
            )
            both = F.col("t.sk").isNotNull() & F.col("s.sk").isNotNull()
            merged = joined.select(
                F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key),
                F.when(both, F.hll_union(F.col("t.sk"), F.col("s.sk")))
                .otherwise(F.coalesce(F.col("s.sk"), F.col("t.sk")))
                .alias("sk"),
            )
        merged.write.mode("overwrite").parquet(f"{store_path}/v={batch_id}")
        batches["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .parquet(source_path)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def read_sketch_estimates(
    spark: SparkSession, store_path: str, schema, key: str
) -> DataFrame | None:
    """Current distinct-count estimates from the sketch store's latest
    snapshot: (key, n_estimate). None if no snapshot exists yet."""
    current = _read_latest_snapshot(
        spark, store_path, _sketch_store_schema(schema, key)
    )
    if current is None:
        return None
    return current.select(
        key, F.hll_sketch_estimate("sk").cast("long").alias("n_estimate")
    )
