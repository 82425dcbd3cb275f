"""RocksDB state store provider — the production state backend for
large stateful streaming (the default HDFSBackedStateStore keeps every
key in executor heap; RocksDB spills to local disk, which is what lets
watermarked aggs/dedup hold 100 TB-scale state). This proves the
engine's streaming tier runs unchanged on it and produces identical
results, and that the provider actually engaged (state-operator
progress reports the RocksDB custom metrics)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_stateful_agg_identical_on_rocksdb_provider(spark, tmp_path):
    from soccer_data_pipeline_spark.sources import load_table
    from soccer_data_pipeline_spark.streaming import streaming_tumbling_agg

    sf = "/root/testdata/sf0.001"
    stream_dir = str(tmp_path / "events_src")
    load_table(spark, sf, "events").write.parquet(stream_dir)
    schema = spark.read.parquet(stream_dir).schema

    def run(name: str, provider: str | None):
        old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        if provider:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        try:
            stream = spark.readStream.schema(schema).parquet(stream_dir)
            q = (
                streaming_tumbling_agg(stream)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progress = q.recentProgress
            rows = {
                tuple(r)
                for r in spark.sql(
                    f"SELECT window_start, event_type, n_events, sum_value FROM {name}"
                ).collect()
            }
            return rows, progress
        finally:
            if provider:
                if old is None:
                    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
                else:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass", old
                    )

    base_rows, _ = run("tumb_default", None)
    rocks_rows, rocks_progress = run("tumb_rocksdb", ROCKSDB)

    # identical emitted results on both providers
    assert rocks_rows == base_rows and len(rocks_rows) > 0

    # and RocksDB really engaged: its custom metrics appear in the
    # state-operator progress of at least one micro-batch
    metrics = []
    for p in rocks_progress:
        for op in json.loads(p.json).get("stateOperators", []):
            metrics.extend(op.get("customMetrics", {}).keys())
    assert any("rocksdb" in m.lower() for m in metrics), metrics
