"""Equivalence + plan-shape tests for the two-phase pack_sequences.

The registered query's DuckDB oracle is the naive single-window form, so
the driver already checks end-to-end equality; these tests additionally
force the multi-shard path (shard_size smaller than the corpus) and pin
the scale property — no corpus-sized single-partition window in the plan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from soccer_data_pipeline_spark.plans.llm_queries import (
    _PACK_WINDOW,
    pack_sequences,
    pack_sequences_plan,
)
from soccer_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _naive(docs):
    """Reference single-window form (the oracle's shape)."""
    n_tokens = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select("doc_id", "lang", n_tokens.cast("long").alias("n_tokens"))
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    return c.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(start / _PACK_WINDOW).cast("long").alias("pack_id"),
        (start % _PACK_WINDOW).cast("long").alias("pack_offset"),
    )


def test_multi_shard_matches_naive_single_window(spark):
    docs = load_table(spark, SF_DIR, "documents")
    # shard_size far below the corpus size → many shards per lang
    sharded = pack_sequences_plan(docs, shard_size=32)
    naive = _naive(docs)
    assert sharded.columns == naive.columns
    srows = sorted(map(tuple, sharded.collect()))
    nrows = sorted(map(tuple, naive.collect()))
    assert srows == nrows
    # sanity: the multi-shard path was actually exercised
    n_shards = (
        docs.select(F.floor(F.col("doc_id") / 32).alias("s")).distinct().count()
    )
    assert n_shards > 1


def test_registered_plan_has_no_lang_only_window(spark):
    plan = pack_sequences(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            # every window spec must partition by more than the bare lang key
            assert "shard" in line, f"corpus-sized window partition found: {line}"
