"""Streaming: AvailableNow incremental ETL (checkpointed, idempotent)
and watermarked event-time windows driven to completion in-process."""

from __future__ import annotations

import json
import os

from soccer_data_pipeline_spark.sources.lookup import leagues_from_pairs
from soccer_data_pipeline_spark.streaming import (
    run_incremental_etl,
    streaming_session_agg,
    streaming_tumbling_agg,
)

from .fixtures_soccer import FLAT_DOC, LEAGUES, ROUNDS_DOC


def test_incremental_etl_processes_only_new_files(spark, tmp_path):
    raw = tmp_path / "raw" / "2015-16"
    raw.mkdir(parents=True)
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    leagues = leagues_from_pairs(spark, LEAGUES)

    with open(raw / "en.1.json", "w") as fh:
        json.dump(FLAT_DOC, fh)

    n1 = run_incremental_etl(spark, str(tmp_path / "raw"), leagues, staging, ckpt)
    assert n1 == 1
    first = spark.read.parquet(staging)
    assert first.count() == 5  # 5 matches in FLAT_DOC

    # run again with NO new files → no new batch, output unchanged
    n2 = run_incremental_etl(spark, str(tmp_path / "raw"), leagues, staging, ckpt)
    assert spark.read.parquet(staging).count() == 5

    # drop a new file → exactly the new rows are appended
    with open(raw / "de.1.json", "w") as fh:
        json.dump(ROUNDS_DOC, fh)
    n3 = run_incremental_etl(spark, str(tmp_path / "raw"), leagues, staging, ckpt)
    assert n3 == 1
    after = spark.read.parquet(staging)
    assert after.count() == 9
    assert after.where("league = 'Deutsche Bundesliga'").count() == 4


def _stream_events(spark, sf_dir: str):
    # re-write a slice of events as µs timestamps so readStream accepts it
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return src


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    from soccer_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    batch_events = load_table(spark, sf, "events")
    stream_dir = str(tmp_path / "events_us")
    batch_events.write.parquet(stream_dir)

    stream = spark.readStream.schema(
        spark.read.parquet(stream_dir).schema
    ).parquet(stream_dir)
    agg = streaming_tumbling_agg(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("tumbling_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT window_start, event_type, n_events, sum_value FROM tumbling_out"
    )
    # batch ground truth over the same data
    import pyspark.sql.functions as F

    want = (
        batch_events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0)).alias(
                "sum_value"
            ),
        )
    )
    got_set = {tuple(r) for r in got.collect()}
    want_set = {tuple(r) for r in want.collect()}
    # append-mode emits only watermark-closed windows; every emitted
    # window must agree exactly with the batch computation
    assert got_set <= want_set
    assert len(got_set) >= 0.8 * len(want_set)


def test_streaming_sessions_emit(spark, tmp_path):
    from soccer_data_pipeline_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").where("user_id < 20")
    stream_dir = str(tmp_path / "events_sess")
    events.write.parquet(stream_dir)
    stream = spark.readStream.schema(
        spark.read.parquet(stream_dir).schema
    ).parquet(stream_dir)
    q = (
        streaming_session_agg(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_stateful_running_stats(spark, tmp_path):
    """applyInPandasWithState custom operator: state accumulates across
    micro-batches and agrees with the batch ground truth."""
    from soccer_data_pipeline_spark.sources import load_table
    from soccer_data_pipeline_spark.streaming.stateful import user_running_stats

    sf = "/root/testdata/sf0.001"
    ev_all = load_table(spark, sf, "events").where("user_id < 10")
    events = ev_all.select("user_id", "ts", "value")
    stream_dir = str(tmp_path / "events_state")
    # two files → at least one micro-batch boundary crossed
    ev_all.where("event_id % 2 = 0").select("user_id", "ts", "value").write.parquet(stream_dir)
    ev_all.where("event_id % 2 = 1").select("user_id", "ts", "value").write.mode("append").parquet(stream_dir)

    stream = (
        spark.readStream.schema(spark.read.parquet(stream_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    q = (
        user_running_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emission per user = final running stats
    final = {
        r.user_id: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM state_out) WHERE rn = 1"""
        ).collect()
    }
    import pyspark.sql.functions as F

    truth = {
        r.user_id: r
        for r in events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("tot"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    for uid, t in truth.items():
        assert final[uid].n_events == t.n
        assert abs(final[uid].total_value - t.tot) < 1e-9


def test_staging_latest_resolves_cross_run_supersedence(spark, tmp_path):
    """Re-ingesting a corrected file on a later date supersedes the
    earlier ingest for downstream readers."""
    import json

    from soccer_data_pipeline_spark.sources.lookup import leagues_from_pairs
    from soccer_data_pipeline_spark.sources.staging_reader import read_staging_latest
    from soccer_data_pipeline_spark.streaming import run_incremental_etl
    from .fixtures_soccer import FLAT_DOC, LEAGUES

    raw = tmp_path / "raw" / "2015-16"
    raw.mkdir(parents=True)
    staging = str(tmp_path / "staging")
    leagues = leagues_from_pairs(spark, LEAGUES)

    with open(raw / "en.1.json", "w") as fh:
        json.dump(FLAT_DOC, fh)
    run_incremental_etl(spark, str(tmp_path / "raw"), leagues, staging, str(tmp_path / "c1"))

    # corrected re-ingest: same identity keys, different score
    fixed = json.loads(json.dumps(FLAT_DOC))
    fixed["matches"][0]["score"]["ft"] = [5, 5]
    with open(raw / "en.1.json", "w") as fh:
        json.dump(fixed, fh)
    # fresh checkpoint = "new upload event" (file content changed in place)
    run_incremental_etl(spark, str(tmp_path / "raw"), leagues, staging, str(tmp_path / "c2"))

    raw_read = spark.read.parquet(staging)
    assert raw_read.count() == 10  # both ingests present in the zone
    latest = read_staging_latest(spark, staging)
    assert latest.count() == 5  # one row per match after resolution
    m1 = latest.where("round = 'Matchday 1' AND team_home = 'Arsenal'").first()
    assert (m1.ft_home, m1.ft_away) == (5, 5)  # corrected ingest won


def test_observation_metrics(spark):
    """Batch metrics via Observation: counts captured without a second
    pass (S11, reference README.md:112)."""
    from pyspark.sql import Observation
    import pyspark.sql.functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    obs = Observation("etl")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("big_qty"),
    )
    n = observed.count()
    assert obs.get["rows"] == n
    assert 0 < obs.get["big_qty"] < n


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving across
    micro-batches inside the watermark horizon are dropped; state is
    bounded by the watermark, not stream history."""
    from soccer_data_pipeline_spark.sources import load_table
    from soccer_data_pipeline_spark.streaming import streaming_dedup

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").where("user_id < 10").select(
        "event_id", "user_id", "ts", "value"
    )
    stream_dir = str(tmp_path / "events_dup")
    # write the SAME slice twice -> every event_id duplicated across files
    events.write.parquet(stream_dir)
    events.write.mode("append").parquet(stream_dir)
    assert spark.read.parquet(stream_dir).count() == 2 * events.count()

    stream = spark.readStream.schema(
        spark.read.parquet(stream_dir).schema
    ).parquet(stream_dir)
    q = (
        streaming_dedup(stream, keys=["event_id"], watermark="10 days")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM dedup_out")
    assert got.count() == events.count()
    assert got.distinct().count() == events.count()


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream watermarked interval join (view->click within 10
    min per user) must emit exactly the batch inner-join result when
    driven to completion with AvailableNow."""
    from soccer_data_pipeline_spark.sources import load_table
    from soccer_data_pipeline_spark.streaming import streaming_interval_join
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    views = events.where(F.col("event_type") == "view")
    clicks = events.where(F.col("event_type") == "click")
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.parquet(vdir)
    clicks.write.parquet(cdir)

    schema = spark.read.parquet(vdir).schema
    sv = spark.readStream.schema(schema).parquet(vdir)
    sc = spark.readStream.schema(schema).parquet(cdir)
    q = (
        streaming_interval_join(sv, sc)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj_out").collect()}

    v = views.select(
        F.col("user_id"), F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id")
    )
    c = clicks.select(
        F.col("user_id"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_event_id")
    )
    want = {
        tuple(r)
        for r in v.join(c, "user_id")
        .where(
            (F.col("r_ts") > F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 minutes"))
        )
        .select("user_id", "l_event_id", "r_event_id", "l_ts", "r_ts")
        .collect()
    }
    assert want, "batch ground truth unexpectedly empty"
    assert got == want


def test_foreach_batch_merge_exactly_once(spark, tmp_path):
    """Exactly-once MERGE sink (VERDICT r5 #6): foreachBatch upserts
    each micro-batch into a batch-id-versioned snapshot, so (a) new
    batches apply updates+inserts, (b) a no-new-files re-run is a
    no-op, and (c) a full from-scratch replay of every file in one
    batch — the redelivery worst case — converges to the identical
    warehouse state instead of double-applying."""
    import shutil

    from pyspark.sql import types as T

    from soccer_data_pipeline_spark.streaming import run_incremental_merge

    schema = T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("price_cents", T.LongType()),
            T.StructField("updated_at", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")

    def snapshot(version=None):
        import os
        import re

        if version is None:
            version = max(
                int(m.group(1))
                for d in os.listdir(wh)
                if (m := re.fullmatch(r"v=(\d+)", d))
            )
        rows = spark.read.schema(schema).parquet(f"{wh}/v={version}").collect()
        return {r.order_id: r.price_cents for r in rows}

    spark.createDataFrame([(1, 100, 1), (2, 200, 1)], schema).coalesce(1).write.parquet(
        f"{src}/f1"
    )
    n1 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n1 == 1 and snapshot() == {1: 100, 2: 200}

    # update key 2, insert key 3
    spark.createDataFrame([(2, 250, 2), (3, 300, 2)], schema).coalesce(1).write.parquet(
        f"{src}/f2"
    )
    n2 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n2 == 1 and snapshot() == {1: 100, 2: 250, 3: 300}

    # committed batches are never redelivered: no new files → no batch
    n3 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n3 == 0 and snapshot() == {1: 100, 2: 250, 3: 300}

    # redelivery worst case: checkpoint lost, every file replays in one
    # batch against the already-applied warehouse. Within-batch
    # supersedence (updated_at) picks the correction for key 2, and the
    # absolute-value MERGE is a no-op on applied rows — the replayed
    # batch 0 snapshot equals the pre-replay final state.
    shutil.rmtree(ckpt)
    n4 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n4 == 1
    assert snapshot(version=0) == {1: 100, 2: 250, 3: 300}
    assert snapshot() == {1: 100, 2: 250, 3: 300}


def test_foreach_batch_merge_multi_batch_versions(spark, tmp_path):
    """maxFilesPerTrigger=1 forces one version per file in a single
    AvailableNow run: v=0 then v=1, each snapshot building on the
    previous one."""
    import os
    import re

    from pyspark.sql import types as T

    from soccer_data_pipeline_spark.streaming.incremental import (
        merge_upsert_batch,
        run_incremental_merge,
    )

    schema = T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("price_cents", T.LongType()),
            T.StructField("updated_at", T.LongType()),
        ]
    )
    src, wh, ckpt = (str(tmp_path / d) for d in ("src", "wh", "ckpt"))
    spark.createDataFrame([(1, 100, 1)], schema).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame([(1, 150, 2), (2, 200, 2)], schema).coalesce(1).write.parquet(
        f"{src}/f2"
    )

    # reuse the runner's plumbing but bound each micro-batch to 1 file
    batches = {"n": 0}

    def process(batch_df, batch_id):
        from soccer_data_pipeline_spark.streaming.incremental import (
            _read_latest_snapshot,
        )

        cur = _read_latest_snapshot(batch_df.sparkSession, wh, schema)
        tgt = cur if cur is not None else batch_df.limit(0)
        merge_upsert_batch(tgt, batch_df, "order_id", seq_col="updated_at").write.mode(
            "overwrite"
        ).parquet(f"{wh}/v={batch_id}")
        batches["n"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert batches["n"] == 2
    versions = sorted(
        int(m.group(1)) for d in os.listdir(wh) if (m := re.fullmatch(r"v=(\d+)", d))
    )
    assert versions == [0, 1]
    final = {
        r.order_id: r.price_cents
        for r in spark.read.schema(schema).parquet(f"{wh}/v=1").collect()
    }
    # file order within one AvailableNow run isn't guaranteed, but the
    # absolute-value MERGE with per-key max-seq supersedence converges
    # to the same final snapshot either way
    assert final == {1: 150, 2: 200}


def test_merge_upsert_batch_ignores_stale_batches(spark):
    """Cross-batch supersedence: replaying an OLD batch over a newer
    snapshot is a no-op for keys the newer state already superseded —
    the out-of-order/backfill safety of the seq-aware MERGE."""
    from soccer_data_pipeline_spark.streaming.incremental import merge_upsert_batch

    schema = "order_id long, price_cents long, updated_at long"
    snap = spark.createDataFrame([(1, 150, 2), (2, 200, 2)], schema)
    stale = spark.createDataFrame([(1, 100, 1), (3, 300, 1)], schema)
    out = {
        r.order_id: (r.price_cents, r.updated_at)
        for r in merge_upsert_batch(snap, stale, "order_id", seq_col="updated_at").collect()
    }
    # key 1 keeps the newer value; key 3 (genuinely new) inserts
    assert out == {1: (150, 2), 2: (200, 2), 3: (300, 1)}


def test_incremental_sketch_store(spark, tmp_path):
    """HLL sketch store: per-batch sketches union into a versioned
    snapshot; estimates equal exact distincts at this cardinality, and
    a full checkpoint-lost replay converges to the identical estimates
    (sketch union is idempotent — the redelivery worst case is a
    value-level no-op)."""
    import shutil

    from pyspark.sql import types as T

    from soccer_data_pipeline_spark.streaming import (
        read_sketch_estimates,
        run_incremental_sketch_store,
    )

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def estimates():
        df = read_sketch_estimates(spark, store, schema, key="event_type")
        return {r.event_type: r.n_estimate for r in df.collect()}

    spark.createDataFrame(
        [("view", u) for u in range(50)] + [("click", u) for u in range(10)],
        schema,
    ).coalesce(1).write.parquet(f"{src}/f1")
    n1 = run_incremental_sketch_store(
        spark, f"{src}/*", schema, store, ckpt, key="event_type", value_col="user_id"
    )
    assert n1 == 1 and estimates() == {"view": 50, "click": 10}

    # second batch: 25 repeat viewers + 25 new, clicks unchanged
    spark.createDataFrame(
        [("view", u) for u in range(25, 100)], schema
    ).coalesce(1).write.parquet(f"{src}/f2")
    n2 = run_incremental_sketch_store(
        spark, f"{src}/*", schema, store, ckpt, key="event_type", value_col="user_id"
    )
    assert n2 == 1 and estimates() == {"view": 100, "click": 10}

    # no new files → no batch, store untouched
    n3 = run_incremental_sketch_store(
        spark, f"{src}/*", schema, store, ckpt, key="event_type", value_col="user_id"
    )
    assert n3 == 0 and estimates() == {"view": 100, "click": 10}

    # redelivery worst case: checkpoint lost, every file replays in one
    # batch against the already-populated store — union idempotence
    # leaves the estimates unchanged
    shutil.rmtree(ckpt)
    n4 = run_incremental_sketch_store(
        spark, f"{src}/*", schema, store, ckpt, key="event_type", value_col="user_id"
    )
    assert n4 == 1 and estimates() == {"view": 100, "click": 10}


def test_stream_static_enrich_matches_batch_and_is_stateless(spark, tmp_path):
    """Stream-static broadcast enrichment must emit exactly the batch
    left-join result under AvailableNow, with ZERO streaming state
    (stateful operators would show up in lastProgress.stateOperators)."""
    from soccer_data_pipeline_spark.sources import load_table
    from soccer_data_pipeline_spark.streaming import stream_static_enrich
    import pyspark.sql.functions as F

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    edir = str(tmp_path / "events")
    events.write.parquet(edir)
    # static dim: per-user segment label derived once, batch-side
    dim = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_ev"))
        .select("user_id", (F.col("n_ev") >= 10).alias("power_user"))
    )

    schema = spark.read.parquet(edir).schema
    se = spark.readStream.schema(schema).parquet(edir)
    q = (
        stream_static_enrich(se.select("event_id", "user_id"), dim)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sse_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress
    assert not (progress.get("stateOperators") or []), "stream-static join must be stateless"

    got = {tuple(r) for r in spark.sql("SELECT * FROM sse_out").collect()}
    want = {
        tuple(r)
        for r in events.select("event_id", "user_id")
        .join(dim, "user_id", "left")
        .select("user_id", "event_id", "power_user")
        .collect()
    }
    assert want and got == want


def test_sharded_heavy_hitters_misra_gries(spark, tmp_path):
    """The streaming MG summary must (a) surface every token whose true
    count exceeds the n/(k+1) bound, (b) never overcount, and (c) keep
    per-shard state within capacity."""
    import pyspark.sql.functions as F
    from soccer_data_pipeline_spark.streaming.stateful import sharded_heavy_hitters

    # synthetic skewed stream: 'hot' x 60, 'warm' x 20, 30 singletons
    rows = [("hot",)] * 60 + [("warm",)] * 20 + [(f"t{i}",) for i in range(30)]
    src = str(tmp_path / "tok")
    spark.createDataFrame(rows, "token string").repartition(4).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .select("token", F.pmod(F.xxhash64("token"), F.lit(4)).alias("shard"))
    )
    capacity = 8
    q = (
        sharded_heavy_hitters(stream, capacity=capacity)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hh_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per (shard, token) = final summary state
    out = spark.sql(
        """SELECT shard, token, est_count, n_seen FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY shard, token
                                          ORDER BY n_seen DESC) AS rk
             FROM hh_out) WHERE rk = 1"""
    ).collect()
    est = {r.token: r.est_count for r in out}
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    # (c) capacity bound per shard
    assert all(len(v) <= capacity for v in by_shard.values())
    # (a) the hot token MUST survive: its shard saw at most all 110 rows,
    # and 60 > 110/(8+1) ≈ 12.2
    assert "hot" in est
    # (b) MG never overcounts, and undercounts by at most n_seen/(k+1)
    n_hot_shard = next(r.n_seen for r in out if r.token == "hot")
    assert est["hot"] <= 60
    assert est["hot"] >= 60 - n_hot_shard / (capacity + 1)
    if "warm" in est:
        assert est["warm"] <= 20


def test_foreach_batch_merge_crash_after_write_before_commit(spark, tmp_path):
    """Failure injection for the exactly-once MERGE sink (VERDICT r7
    #8): the batch dies AFTER its v=<id> snapshot write but BEFORE the
    checkpoint commit — the at-least-once redelivery window. Restart
    must replay the batch under the SAME epoch id (offsets WAL, not the
    commit log, names the batch), overwrite its own orphaned snapshot
    instead of minting a new version, and converge value-identically to
    a crash-free run."""
    import os
    import re

    import pytest
    from pyspark.sql import types as T

    from soccer_data_pipeline_spark.streaming import run_incremental_merge

    schema = T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("price_cents", T.LongType()),
            T.StructField("updated_at", T.LongType()),
        ]
    )
    src, wh, ckpt = (str(tmp_path / d) for d in ("src", "wh", "ckpt"))

    def versions():
        return sorted(
            int(m.group(1))
            for d in os.listdir(wh)
            if (m := re.fullmatch(r"v=(\d+)", d))
        )

    def snapshot(version):
        rows = spark.read.schema(schema).parquet(f"{wh}/v={version}").collect()
        return {r.order_id: r.price_cents for r in rows}

    # batch 0 commits cleanly
    spark.createDataFrame([(1, 100, 1), (2, 200, 1)], schema).coalesce(1).write.parquet(
        f"{src}/f1"
    )
    n1 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n1 == 1 and snapshot(0) == {1: 100, 2: 200}

    # batch 1 writes its snapshot, then the process dies pre-commit
    spark.createDataFrame([(2, 250, 2), (3, 300, 2)], schema).coalesce(1).write.parquet(
        f"{src}/f2"
    )
    armed = {"on": True}

    def crash(batch_id):
        if armed["on"]:
            armed["on"] = False
            raise RuntimeError(f"injected crash after v={batch_id} write")

    with pytest.raises(Exception, match="injected crash"):
        run_incremental_merge(
            spark,
            f"{src}/*",
            schema,
            wh,
            ckpt,
            key="order_id",
            seq_col="updated_at",
            post_write_hook=crash,
        )
    # the write happened, the commit did not: v=1 is an orphan
    assert versions() == [0, 1]
    commits = {
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    }
    assert commits == {"0"}, commits

    # restart: batch 1 replays under the SAME id — no v=2, no dupes,
    # final state identical to a crash-free run
    n2 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n2 == 1
    assert versions() == [0, 1]
    assert snapshot(1) == {1: 100, 2: 250, 3: 300}
    assert "1" in {
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    }

    # and the replayed state is stable: nothing new → no batch, no drift
    n3 = run_incremental_merge(
        spark, f"{src}/*", schema, wh, ckpt, key="order_id", seq_col="updated_at"
    )
    assert n3 == 0 and snapshot(1) == {1: 100, 2: 250, 3: 300}
