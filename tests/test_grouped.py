"""applyInPandas grouped-map semantics pinned against the JVM window twin."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from soccer_data_pipeline_spark.operators.grouped import per_group_zscore


def test_zscore_matches_window_twin(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "lang", "doc_id", F.col("n_chars").cast("double").alias("n_chars")
    )
    got = {
        (r.lang, r.doc_id): r.zscore
        for r in per_group_zscore(docs, "lang", "n_chars", "doc_id").collect()
    }
    w = Window.partitionBy("lang")
    want_df = docs.select(
        "lang",
        "doc_id",
        (
            (F.col("n_chars") - F.avg("n_chars").over(w))
            / F.stddev_pop("n_chars").over(w)
        ).alias("z"),
    )
    want = {(r.lang, r.doc_id): r.z for r in want_df.collect()}
    assert set(got) == set(want)
    for k, z in want.items():
        assert abs(got[k] - z) < 1e-9
