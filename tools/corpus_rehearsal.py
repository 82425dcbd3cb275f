#!/usr/bin/env python3
"""End-to-end corpus-build rehearsal (r14, VERDICT r13 #7): ONE
``run_corpus_build`` with ALL stages enabled — quality + exact +
near-dup + winnowing cleaning, SemDeDup (embeddings), split-leakage
repair (8-gram), benchmark decontamination (5-gram), budgeted
selection (half the raw token mass, quality-ranked), deterministic
shuffle order — followed by the packing stage over the kept corpus,
timed as ONE composed pipeline per sf. The per-query rehearsal
(tools/bench_sf1.py) covers the pieces; this measures the
composition's checkpoint/cache interactions and the sf0.1 → sf1
scaling of the whole build.

Usage: python3 tools/corpus_rehearsal.py OUT.json SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_sf1 import io_probe_mbps  # noqa: E402 — the shared probe
from soccer_data_pipeline_spark.corpus_pipeline import run_corpus_build  # noqa: E402
from soccer_data_pipeline_spark.operators.corpus import quality_pm  # noqa: E402
from soccer_data_pipeline_spark.plans.llm_queries import (  # noqa: E402
    pack_sequences_plan,
)
from soccer_data_pipeline_spark.sources import load_table  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {
        "io_probe_mbps": round(io_probe_mbps(), 1),
        "provenance": os.environ.get(
            "SPARK_GRAFT_BENCH_PROVENANCE", "rehearsal"
        ),
        "runs": [],
    }
    for sf_dir in sf_dirs:
        docs = load_table(spark, sf_dir, "documents")
        emb = load_table(spark, sf_dir, "embeddings")
        benchmark = docs.where(F.col("doc_id") < 20).select("text")
        corpus_docs = docs.where(F.col("doc_id") >= 20)
        n_docs = corpus_docs.count()
        # budget is an INPUT (derived pre-timer): half the raw corpus
        # token mass, so the selection stage genuinely cuts
        budget = int(
            quality_pm(corpus_docs.select("doc_id", "text"))
            .agg(F.sum("n_tok"))
            .first()[0]
            // 2
        )

        t0 = time.time()
        out = run_corpus_build(
            corpus_docs,
            n_shards=16,
            order_seed="42",
            token_budget=budget,
            leakage_ngram=8,
            benchmark=benchmark,
            embeddings=emb,
        )
        # materialize through the caller-writes contract: the corpus
        # lands partitioned by split (each shard one task's write), the
        # decision ledger folds to per-reason counts, the manifest and
        # the packing stage over the kept corpus both execute fully
        with tempfile.TemporaryDirectory(prefix="corpus_rehearsal_") as tmp:
            out.corpus.repartition("shard_id").write.partitionBy(
                "split"
            ).parquet(os.path.join(tmp, "corpus"))
            decisions = {
                r["decision"]: r["n"]
                for r in out.decisions.groupBy("decision")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            manifest_rows = out.manifest.count()
            packed = pack_sequences_plan(
                out.corpus.select("doc_id", "lang", "text")
            )
            n_packed_bins = packed.agg(
                F.countDistinct("lang", "pack_id")
            ).first()[0]
        wall = time.time() - t0
        rec = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "token_budget": budget,
            "wall_sec": round(wall, 2),
            "decisions": decisions,
            "manifest_rows": manifest_rows,
            "n_packed_bins": int(n_packed_bins),
        }
        result["runs"].append(rec)
        print(json.dumps(rec))

    if len(result["runs"]) >= 2:
        a, b = result["runs"][-2], result["runs"][-1]
        result["scale_ratio"] = {
            "docs": round(b["n_docs"] / max(a["n_docs"], 1), 2),
            "wall": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
        }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
