#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collect-to-count via ``df.count()`` after
a no-op cache-free run) so timings include scan→shuffle→agg, not just
plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    # star-schema / TPC-H shapes
    "pricing_summary",
    "flagship_top_customers",
    "broadcast_lookup_join",
    "topk_orders_per_customer",
    "tpch_q5_shape",
    "tpch_q10_shape",
    "sql_tpch_q3_shape",
    "sql_agg_orders",
    "sql_cte_topn",
    "scalar_functions_combined",
    "agg_functions_combined",
    # window / temporal
    "rolling_avg_events",
    "cumulative_customer_spend",
    "window_function_zoo",
    "sessionize_events",
    "event_tumbling_hourly",
    "event_sliding_windows",
    "pivot_event_counts",
    "asof_join_latest_order",
    "range_join_close_events",
    # dedup / text / similarity (LLM-pipeline tier)
    "dedup_exact_documents",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_groups",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "embedding_topk_cosine",
    "similarity_ann_recall",
    "similarity_ivf_recall",
    "text_stats",
    "quality_score",
    "lang_id_heuristic",
    "tfidf_tokens",
    "token_count_bpe",
    "rolling_hash_fingerprint",
    "doc_fingerprint",
    "multimodal_binary_stats",
    # training-data assembly tier
    "dedup_connected_clusters",
    "train_val_test_split",
    "stratified_sample_docs",
    "benchmark_contamination",
    "pack_sequences",
    "pii_scrub",
    "approx_distinct_gate",
    "approx_quantile_gate",
    "staging_supersedence",
    "quarantine_routing",
    "repetition_filter",
    "passage_dedup_stats",
    "snapshot_diff",
    "scd2_history",
    "domain_mix_weights",
    "merge_upsert_orders",
    "fuzzy_levenshtein_pairs",
    "zorder_layout_keys",
    "event_funnel",
    "cohort_retention",
    "corpus_clean_decisions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from soccer_data_pipeline_spark.plans import QUERIES
    from soccer_data_pipeline_spark.session import get_spark

    # The sf* tables are single ~MB-scale parquet files; the cluster
    # default 128m split puts a whole table in one task. Small splits
    # spread row groups across local cores (on a real cluster with
    # ~128MB files the session default applies).
    spark = get_spark(
        app_name="bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    # Warm the JVM + parquet footers once so timings measure the engine,
    # not first-touch overheads.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # No clearCache() between queries: operators own their caches now
    # (operators/cache.py) — internal persists are released before each
    # operator returns, so a long-lived session accumulates nothing and
    # the suite runs the way a library caller would experience it.
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name in HEADLINE:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        try:
            # warmup run: JIT/codegen compile and footer caches are
            # session-lifetime costs, not per-query engine throughput
            spec.fn(spark, sf_dir).count()
            samples = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                n = spec.fn(spark, sf_dir).count()
                samples.append(time.perf_counter() - t0)
        except Exception as exc:  # a failing query must not kill the suite
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        # median of n_runs: sub-second deltas between rounds are only
        # interpretable against the recorded run-to-run spread
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)
        spread[name] = round(samples[-1] - samples[0], 4)
        print(
            f"# {name}: median {timings[name]:.3f}s "
            f"(spread {spread[name]:.3f}s over {n_runs} runs, {n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": n_runs,
                "spread_sec": spread,
                "variance_note": (
                    "per-query values are medians of runs_per_query timed runs "
                    "after one warmup; spread_sec is max-min per query — deltas "
                    "within spread are noise, not regressions"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
