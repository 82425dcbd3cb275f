#!/usr/bin/env python3
"""Measure the banded sign-LSH config frontier for
embedding_near_dup_banded (VERDICT r9 #7).

The r9 sf1 rehearsal left the query the suite's worst scaler (6.18x
for 10x data): the production path pins (n_planes=36, band_width=3) —
12 bands of 8 codes — so per-(label, band, code) buckets grow linearly
with the corpus and the bucket-local pair join grows quadratically.
The fix is the bitext ladder pattern: widen the band code space as the
corpus grows, keeping the in-plan recall gate green.

For each candidate (n_planes, band_width) on each sf dir, measures:
  - recall: fraction of the query's own exact audit pairs (label % 4
    blocks, vec_id stride to the 2000-row budget, cosine >= 0.35)
    found in the full-corpus banded candidate set (ids-only
    intersection — identical to the query's gate metric);
  - banded_sec: wall time of the banded candidate path over the FULL
    corpus, fully executed (noop sink).

Usage: python3 tools/tune_banded.py [sf_dir ...]
Prints one JSON line per (sf_dir, config).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

AUDIT_MOD = 4
AUDIT_ROW_BUDGET = 2000
COSINE_FLOOR = 0.35

CONFIGS = [(36, 3), (36, 4), (40, 4), (44, 4), (40, 5), (45, 5)]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def exact_audit_pairs(emb, n_rows):
    stride = max(1, -(-n_rows // AUDIT_ROW_BUDGET))
    sampled = (
        emb.where(
            (F.col("label") % AUDIT_MOD == 0) & (F.col("vec_id") % stride == 0)
        )
        .select(
            "vec_id",
            "label",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    )
    a, b = sampled.alias("a"), sampled.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n")), 6
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= COSINE_FLOOR)
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from soccer_data_pipeline_spark.operators.similarity import (
        banded_candidate_pairs,
    )
    from soccer_data_pipeline_spark.sources.parquet_source import load_table

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_sf1"]
    for sf_dir in sf_dirs:
        emb = load_table(spark, sf_dir, "embeddings").localCheckpoint()
        n_rows = emb.count()
        exact = {
            (r["vec_a"], r["vec_b"])
            for r in exact_audit_pairs(emb, n_rows).collect()
        }
        print(
            json.dumps(
                {"sf_dir": sf_dir, "n_rows": n_rows, "audit_pairs": len(exact)}
            ),
            flush=True,
        )
        for n_planes, band_width in CONFIGS:
            cand = banded_candidate_pairs(
                emb, n_planes=n_planes, band_width=band_width
            ).select("vec_a", "vec_b")
            t0 = time.time()
            cand.write.format("noop").mode("overwrite").save()
            banded_sec = time.time() - t0
            hits = {
                (r["vec_a"], r["vec_b"])
                for r in cand.join(
                    spark.createDataFrame(
                        [(a, b) for a, b in exact], "vec_a long, vec_b long"
                    ),
                    ["vec_a", "vec_b"],
                    "left_semi",
                ).collect()
            }
            rec = len(hits) / len(exact) if exact else None
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "cfg": f"p{n_planes}w{band_width}",
                        "n_bands": n_planes // band_width,
                        "codes_per_band": 2**band_width,
                        "recall": round(rec, 4) if rec is not None else None,
                        "banded_sec": round(banded_sec, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
