#!/usr/bin/env python3
"""Measure the production-depth BPE apply (VERDICT r12 #5): learn R
merges driver-side from the bounded md5 sample, then time ONE Arrow
``apply_merges_totals`` pass over the FULL corpus at each requested
depth. The point on record: apply cost is ~flat in R (the scan count
is R-independent; per-token work memoizes on the vocabulary), where
the chained-expression form stops being buildable past expression-
depth limits and the documented scan-chain fallback pays ~R/64 corpus
rewrites.

Usage: python3 tools/bpe_depth_measure.py OUT.json SF_DIR [SF_DIR ...]
Depths: 4 (the registered differential's shape) and 256 (the
production rehearsal) — override with BPE_DEPTHS=4,256,1024.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soccer_data_pipeline_spark.operators.bpe import (  # noqa: E402
    apply_merges_totals,
    learn_merges_local,
)
from soccer_data_pipeline_spark.plans.analytics_queries import (  # noqa: E402
    _BPE_SAMPLE_ROWS,
)
from soccer_data_pipeline_spark.sources import load_table  # noqa: E402


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]
    depths = [int(x) for x in os.environ.get("BPE_DEPTHS", "4,256").split(",")]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    reps = int(os.environ.get("BPE_REPS", "3"))
    result: dict = {"depths": depths, "reps": reps, "runs": []}
    for sf_dir in sf_dirs:
        docs = load_table(spark, sf_dir, "documents")
        n_docs = docs.count()
        sample = (
            docs.orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
            .limit(_BPE_SAMPLE_ROWS)
            .select("text")
            .collect()
        )
        texts = [r["text"] for r in sample]
        per_depth: dict = {}
        for depth in depths:
            t0 = time.time()
            merges = [
                (a, b) for _, a, b, _ in learn_merges_local(texts, depth)
            ]
            learn_sec = time.time() - t0
            # the synthetic corpus's sample pair space can exhaust
            # before production depth (every word fully merged) — pad
            # with COLD merges that can never fire ('\x00' never
            # appears in a symbol): a non-firing merge still pays its
            # two replace scans per unique token, which is exactly the
            # per-merge apply overhead being measured. Recorded
            # honestly as n_learned vs n_padded.
            n_learned = len(merges)
            merges += [
                (f"\x00pad{i}", f"\x00pad{i}")
                for i in range(depth - n_learned)
            ]
            per_depth[depth] = {
                "merges": merges,
                "n_learned": n_learned,
                "learn_sec": learn_sec,
                "apply_secs": [],
                "row": None,
            }

        def apply_once(depth):
            merges = per_depth[depth]["merges"]
            t0 = time.time()
            row = (
                apply_merges_totals(docs, merges, track_prefixes=False)
                .agg(
                    F.sum("t0").alias("t0"),
                    F.sum(f"t{len(merges)}").alias("tR"),
                )
                .collect()[0]
            )
            per_depth[depth]["row"] = row
            return time.time() - t0

        # warm-up (r14, VERDICT r13 #6): the FIRST apply of a session
        # pays scan/codegen warmup — at sf0.1 the r13 artifact read
        # 3.0 s for whichever depth ran first vs 0.411 s for the
        # second, so apply_depth_ratio measured ordering, not depth.
        # One untimed pass absorbs it; the timed reps then interleave
        # A/B with the order SWAPPED each rep, and the per-depth
        # median is what the flatness ratio compares.
        apply_once(depths[0])
        for rep in range(reps):
            order = depths if rep % 2 == 0 else list(reversed(depths))
            for depth in order:
                per_depth[depth]["apply_secs"].append(
                    round(apply_once(depth), 3)
                )

        for depth in depths:
            d = per_depth[depth]
            secs = sorted(d["apply_secs"])
            median = secs[len(secs) // 2]
            result["runs"].append(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "rounds": len(d["merges"]),
                    "n_learned": d["n_learned"],
                    "n_padded_cold": len(d["merges"]) - d["n_learned"],
                    "learn_sec": round(d["learn_sec"], 3),
                    "apply_sec": median,
                    "apply_secs": d["apply_secs"],
                    "symbols_before": int(d["row"]["t0"]),
                    "symbols_after": int(d["row"]["tR"]),
                }
            )
            print(json.dumps(result["runs"][-1]))

    # apply-cost flatness per sf: max/min MEDIAN apply_sec across
    # depths (order-robust: every depth's reps ran in both positions)
    by_sf: dict = {}
    for r in result["runs"]:
        by_sf.setdefault(r["sf_dir"], []).append(r["apply_sec"])
    result["apply_depth_ratio"] = {
        sf: round(max(v) / min(v), 3) for sf, v in by_sf.items()
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
