#!/usr/bin/env python3
"""Measure the bitext-mining ANN config frontier (VERDICT r8 #2).

For each candidate config, measures on a given sf dir:
  - recall: fraction of audit-slice fr docs whose EXACT best en_doc
    appears in the ANN top-2 (the bitext_mining_ann gate metric);
  - ann_sec: wall time of the full ANN side (ALL fr docs x en corpus),
    fully executed (noop sink — count() prunes gate subtrees);
  - exact_sec: wall time of the exact broadcast crossJoin top-2 over
    ALL fr docs, the brute-force baseline the ANN path must beat.

Usage: python3 tools/tune_bitext_ann.py [sf_dir ...]
Prints one JSON line per (sf_dir, config).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def load_sides(spark, sf_dir):
    from soccer_data_pipeline_spark.sources.parquet_source import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    side = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        "doc_id", "lang", v.alias("v")
    )
    q_full = side.where(F.col("lang") == "fr").select("doc_id", "v")
    t_full = side.where(F.col("lang") == "en").select("doc_id", "v")
    n_docs = docs.count()
    stride = 4 * max(1, -(-n_docs // 5000))
    return q_full.localCheckpoint(), t_full.localCheckpoint(), stride


def exact_top2(q, t):
    qs = q.select(F.col("doc_id").alias("fr_doc"), F.col("v").alias("qv")).withColumn(
        "qn", F.sqrt(_dot(F.col("qv"), F.col("qv")))
    )
    tt = t.select(F.col("doc_id").alias("en_doc"), F.col("v").alias("tv")).withColumn(
        "tn", F.sqrt(_dot(F.col("tv"), F.col("tv")))
    )
    s = F.broadcast(qs).crossJoin(tt).select(
        "fr_doc",
        "en_doc",
        (_dot(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tn"))).alias("cosine"),
    )
    w = Window.partitionBy("fr_doc").orderBy(F.desc("cosine"), F.asc("en_doc"))
    return s.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 2)


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from soccer_data_pipeline_spark.operators.similarity import (
        ann_lsh_cosine,
        ivf_topk,
    )

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "testdata_sf1"]
    for sf_dir in sf_dirs:
        q, t, stride = load_sides(spark, sf_dir)
        n_fr, n_en = q.count(), t.count()

        # exact baseline: full crossJoin, timed with full execution
        t0 = time.time()
        exact_top2(q, t).write.format("noop").mode("overwrite").save()
        exact_sec = time.time() - t0
        # exact best per AUDIT fr doc (small; collected once)
        best = {
            r["fr_doc"]: r["en_doc"]
            for r in exact_top2(q.where(F.col("doc_id") % stride == 0), t)
            .where(F.col("rk") == 1)
            .collect()
        }
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_fr": n_fr,
                    "n_en": n_en,
                    "audit": len(best),
                    "exact_sec": round(exact_sec, 2),
                }
            ),
            flush=True,
        )

        def report(kind, cfg, ann_df, fit_sec=0.0):
            t0 = time.time()
            ann_df.write.format("noop").mode("overwrite").save()
            ann_sec = time.time() - t0
            hits = {
                (r["query_id"], r["candidate_id"])
                for r in ann_df.where(
                    F.col("query_id") % stride == 0
                ).collect()
            }
            rec = sum(1 for f, e in best.items() if (f, e) in hits) / len(best)
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "kind": kind,
                        "cfg": cfg,
                        "recall": round(rec, 4),
                        "ann_sec": round(ann_sec, 2),
                        "fit_sec": round(fit_sec, 2),
                        "speedup_vs_exact": round(exact_sec / ann_sec, 2),
                    }
                ),
                flush=True,
            )

        for n_planes, radius in [(6, 4), (8, 3), (10, 3), (10, 4), (11, 4), (12, 4)]:
            ann = ann_lsh_cosine(
                q, t, k=2, n_planes=n_planes, dim=64, id_col="doc_id",
                vec_col="v", multiprobe=radius,
            )
            report("lsh", f"p{n_planes}r{radius}", ann)

        for n_cent, n_probe in [(16, 4), (32, 4), (64, 8), (128, 16), (256, 16), (256, 32)]:
            t0 = time.time()
            _, model = ivf_topk(
                q.limit(1), t, k=1, n_centroids=n_cent, n_probe=1,
                id_col="doc_id", vec_col="v",
            )
            fit_sec = time.time() - t0
            ann, _ = ivf_topk(
                q, t, k=2, n_centroids=n_cent, n_probe=n_probe,
                id_col="doc_id", vec_col="v", model=model,
            )
            report("ivf", f"c{n_cent}p{n_probe}", ann, fit_sec)


if __name__ == "__main__":
    main()
