#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is FULLY executed: every output column is computed and fed
to the `noop` sink (``df.write.format("noop")``), so timings include
scan→shuffle→agg→project of the whole declared result. Rounds 1-8
timed ``df.count()`` instead — discovered in r9 to be dishonest:
count() lets Catalyst prune every subtree not needed for the row
count, including unused aggregate expressions, projection columns,
and gate-column LEFT JOINs (the entire ANN production side of the
recall-gated similarity family dropped out of the count plan — 4 of 8
joins). SPARK_GRAFT_BENCH_EVAL=count restores the legacy mode for
apples-to-apples drift checks against pre-r9 baselines; per-query
regression gating auto-disables when the baseline was recorded under
a different eval mode.
"""

from __future__ import annotations

import glob
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
    "salted_agg_returnflag",
    "salted_broadcast_join_supplier",
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
    "dedup_incremental_pairs",
    "dedup_simhash_groups",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "embedding_near_dup_banded",
    "embedding_incremental_near_dup",
    "embedding_topk_cosine",
    "similarity_ann_recall",
    "similarity_ivf_recall",
    "similarity_pq_recall",
    "text_stats",
    "quality_score",
    "lang_id_heuristic",
    "tfidf_tokens",
    "bm25_scores",
    "token_count_bpe",
    "rolling_hash_fingerprint",
    "doc_fingerprint",
    "multimodal_binary_stats",
    # training-data assembly tier
    "dedup_connected_clusters",
    "train_val_test_split",
    "split_ngram_leakage",
    "stratified_sample_docs",
    "shard_manifest",
    "benchmark_contamination",
    "pack_sequences",
    "pii_scrub",
    "approx_distinct_gate",
    "approx_quantile_gate",
    "staging_supersedence",
    "quarantine_routing",
    "repetition_filter",
    "passage_dedup_stats",
    "chunk_documents",
    "snapshot_diff",
    "scd2_history",
    "domain_mix_weights",
    "domain_quota_sample",
    "merge_upsert_orders",
    "fuzzy_levenshtein_pairs",
    "zorder_layout_keys",
    "event_funnel",
    "cohort_retention",
    "corpus_clean_decisions",
    "corpus_shuffle_order",
    "embedding_dedup_clusters",
    "split_drift_tvd",
    "sketch_merge_distinct",
    "weighted_sample_docs",
    "vocab_growth",
    # distribution / sequence / graph analytics (round-6b additions)
    "doc_length_histogram",
    "event_transition_matrix",
    "event_gapfill_daily",
    "char_entropy_quality",
    "heavy_hitter_tokens",
    "bpe_pair_counts",
    "triangle_count_suppliers",
    "contrastive_pairs",
    "unigram_cross_entropy",
    "conversion_attribution",
    "pagerank_suppliers",
    "mad_outlier_audit",
    "scd2_as_of",
    "ols_price_by_quantity",
    "chi_square_independence",
    "market_basket_lift",
    "revenue_concentration",
    "daily_value_percentiles",
    "inter_event_gap_stats",
    "join_key_skew_audit",
    "shingle_containment_pairs",
    "kcore_peel_suppliers",
    "lang_id_confusion",
    "referential_integrity_audit",
    "incremental_agg_maintenance",
    "gdpr_delete_audit",
    "daily_anomaly_flags",
    "daily_ewma_forecast",
    "benford_digit_audit",
    "readability_scores",
    "zipf_slope_audit",
    "order_price_reconciliation",
    "session_path_counts",
    # round-7 additions
    "equi_depth_binning",
    "pmi_top_pairs",
    "embedding_norm_audit",
    "cross_source_dup_matrix",
    "temporal_split_gap",
    "survival_retention_curve",
    "props_schema_drift",
    "bitext_mining_pairs",
    "lpa_communities",
    "community_modularity",
    "tokenizer_fertility",
    # round-7 late batch: sketches, experimentation, LM scoring, graph BFS
    "bigram_lm_score",
    "countmin_token_freq",
    "bloom_filter_fpr",
    "bfs_hops_supplier",
    "rolling_distinct_users",
    "cuped_adjustment",
    "did_estimator",
    "time_to_convert_percentiles",
    "vocab_overlap_matrix",
    "winsorized_revenue_stats",
    "tpch_q18_shape",
    "holt_linear_forecast",
    "acf_daily_events",
    "k_anonymity_audit",
    "compaction_plan_bins",
    "target_encoding_loo",
    # round-8: previously-unbenched substantive plans (VERDICT r7 #3 —
    # the bench roster now covers every registered query or names it in
    # EXCLUDED below; the assertion in main() keeps that exhaustive)
    "tpch_q16_shape",
    "tpch_q21_shape",
    "customer_value_deciles",
    "ks_two_sample_split",
    "spearman_spend_balance",
    "auc_exact_rank",
    "cube_orders",
    "rollup_lineitem",
    "sql_grouping_sets",
    "weekday_seasonal_decompose",
    "ab_test_proportions",
    "calibration_bins",
    "threshold_sweep_prf",
    "dp_noisy_counts",
    "source_diversity_index",
    "dedup_minhash_signatures",
    "bitext_mining_ann",
    "peak_concurrent_users",
    "tpch_q7_shape",
    "embedding_covariance_audit",
    "brier_decomposition",
    "duplicate_substring_audit_sliced",
    "winnowing_candidate_pairs",
    "aqp_sample_mean",
    "join_cardinality_estimate",
    "jaccard_prefix_join",
    "code_switching_audit",
    "minhash_estimation_error",
    "dsir_importance_weights",
    "quality_selection_curve",
    # round-10 additions
    "corpus_budget_select",
    "split_leakage_repair",
    "benchmark_decontaminate",
    "passage_dedup_repair",
    "hybrid_retrieval_rrf",
    "mmr_diverse_rerank",
    "retrieval_eval_ndcg",
    "kmeans_fixed_assign",
    # round-11 additions
    "hybrid_retrieval_rrf_ann",
    "similarity_ivf_incremental",
    "similarity_ivfpq_recall",
    "similarity_ivfpq_residual",
    "semantic_dedup_semdedup",
    "bpe_learn_merges",
    "pass_at_k_eval",
    "bradley_terry_rating",
    # round-12 additions
    "similarity_index_served",
    "semantic_dedup_repair",
    "winrate_trajectory",
    "bpe_learn_merges_sampled",
    "cohens_kappa_raters",
    # round-13 additions
    "ann_index_rebalance",
    "fleiss_kappa_raters",
    "bpe_apply_production",
    "semantic_dedup_incremental",
    # round-14 additions
    "ann_index_deletes",
    "semantic_dedup_served",
]

# Every registered query is either benched (HEADLINE) or named here with
# the reason it is not timed — the house "no silent caps" rule applied
# to the bench roster (VERDICT r7 #3). main() asserts
# HEADLINE ∪ EXCLUDED == registry with no overlap/stale entries, so a
# future query that lands in neither fails the bench loudly.
EXCLUDED = {
    # full-corpus exact audit: 10 s at sf0.1 — 7% of the suite for one
    # probe (VERDICT r8 #5). The identical plan is benched on the
    # declared md5 40% slice (duplicate_substring_audit_sliced); the
    # full form stays oracle-soaked at sf0.001/0.01 via the registry
    # sweep and in the sf1 artifact's watch list.
    "duplicate_substring_audit": (
        "full-corpus exact probe; benched via duplicate_substring_audit_sliced"
    ),
    # per-function zoos: correctness fixtures for individual builtins;
    # their codegen cost is benched via the combined composites
    "array_functions_zoo": "function zoo; codegen benched via scalar_functions_combined",
    "null_handling_zoo": "function zoo; codegen benched via scalar_functions_combined",
    "string_functions_zoo": "function zoo; codegen benched via scalar_functions_combined",
    "scalar_functions_dates": "function zoo; codegen benched via scalar_functions_combined",
    "scalar_functions_docs": "function zoo; codegen benched via scalar_functions_combined",
    "date_arithmetic": "function zoo; codegen benched via scalar_functions_combined",
    "json_extract_events": "single-function demo; events scan benched via sessionize_events",
    "explode_tokens": "single-operator demo; explode cost benched via tfidf_tokens",
    "posexplode_tokens": "single-operator demo; explode cost benched via tfidf_tokens",
    "string_agg_regions": "25-row region dim; timing is job-launch overhead only",
    # single-operator demos whose plan is a strict subset of a benched
    # composite on the same table
    "filter_project_lineitem": "scan+filter subset of pricing_summary",
    "global_aggregates": "no-key agg subset of pricing_summary",
    "stats_aggregates": "moment-agg subset of ols_price_by_quantity",
    "distinct_profile": "distinct-count subset of approx_distinct_gate",
    "first_per_key": "min_by subset of latest_version_per_key plan (benched topk family)",
    "champion_per_segment": "top-1-per-group subset of topk_orders_per_customer",
    "lag_prev_order": "single lag window subset of window_function_zoo",
    "latest_version_per_key": "version-sort subset of topk_orders_per_customer",
    "unpivot_stack": "stack demo; unpivot benched inside agg composites (standings path)",
    "alias_coalesce_join": "2-column coalesce demo; join benched via broadcast_lookup_join",
    # tiny-dim join/set shapes: 25-row nation/region inputs — timings
    # measure scheduler overhead, not the engine
    "full_outer_join_nations": "25-row dim join; scheduler overhead only",
    "semi_anti_join": "25-row dim semi/anti; scheduler overhead only",
    "set_ops_nations": "25-row dim set ops; scheduler overhead only",
    # SQL twins of benched DataFrame queries (same physical plan)
    "sql_lateral_topn": "SQL twin of benched topk_orders_per_customer",
    "sql_named_window": "SQL twin of benched window_function_zoo",
    "subquery_shapes": "SQL-shape correctness demo; scans/aggs benched via sql_agg_orders",
}


def _prev_round_medians(sf: float) -> tuple[str, dict[str, float], str]:
    """Latest committed per-query medians at the SAME scale factor —
    the baseline for the vs_prev regression diff; cross-sf ratios
    would be meaningless. ('', {}, 'count') if none. The third element
    is the eval mode the baseline was recorded under ('count' when the
    artifact predates the r9 `eval` field) — per-query regression
    gating is only valid when it matches the current EVAL_MODE.

    Preferred source (r7): the newest committed BENCH_DETAIL.json in
    git history whose sf matches — the driver's stdout BENCH_r*.json
    line drops its `queries` dict once the suite outgrows the tail
    buffer (BENCH_r06 carries zero), while the detail artifact always
    has every query, so baselining on it keeps the regression gate
    covering the full suite instead of the last un-slimmed round's
    subset. Fallback: committed BENCH_r*.json parsed queries.

    Committed means both tracked-ness (`git ls-files`) AND content
    (`git show <commit>:<name>`): the current round's just-written
    (untracked) artifact must not become its own baseline, and a
    locally modified tracked baseline must not silently pollute the
    diff either (ADVICE r4 + r5). Glob + worktree read is the no-git
    fallback only.
    """
    root = os.path.dirname(os.path.abspath(__file__)) or "."
    try:
        import subprocess

        commits = subprocess.run(
            ["git", "rev-list", "HEAD", "--", "BENCH_DETAIL.json"],
            cwd=root,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        for commit in commits:  # newest first
            try:
                blob = subprocess.run(
                    ["git", "show", f"{commit}:BENCH_DETAIL.json"],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout
                doc = json.loads(blob)
                q = doc.get("queries")
                if (
                    isinstance(q, dict)
                    and q
                    and abs(float(doc.get("sf", -1)) - sf) < 1e-9
                ):
                    return (
                        f"BENCH_DETAIL@{commit[:8]}",
                        q,
                        str(doc.get("eval", "count")),
                    )
            except Exception:
                continue
    except Exception:
        pass
    entries: list[tuple[str, object]] = []  # (basename, parsed-json or None)
    try:
        import subprocess

        out = subprocess.run(
            ["git", "ls-files", "BENCH_r*.json"],
            cwd=root,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        for name in sorted(out.split()):
            try:
                blob = subprocess.run(
                    ["git", "show", f"HEAD:{name}"],
                    cwd=root,
                    capture_output=True,
                    text=True,
                    check=True,
                ).stdout
                entries.append((name, json.loads(blob)))
            except Exception:
                entries.append((name, None))
    except Exception:
        for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
            try:
                entries.append((os.path.basename(path), json.load(open(path))))
            except Exception:
                entries.append((os.path.basename(path), None))
    best = ("", {}, "count")
    for name, doc in entries:
        parsed = doc.get("parsed") if isinstance(doc, dict) else None
        if (
            isinstance(parsed, dict)
            and isinstance(parsed.get("queries"), dict)
            and abs(float(parsed.get("sf", -1)) - sf) < 1e-9
        ):
            best = (name, parsed["queries"], str(parsed.get("eval", "count")))
    return best


# Fixed cheap queries timed at suite start, at every PROBE_EVERY-query
# boundary DURING the suite, and at the end, to estimate ambient session
# load. BENCH_r05 flagged 10 phantom regressions because a uniformly
# loaded driver session inflates every timing with a tight per-query
# spread, which the spread gate cannot catch (VERDICT r5 #1). r9's final
# run then exposed the converse blind spot (VERDICT r9 #6): pre/post
# phases both read ~1.0 while the suite between them ran 12 % slow —
# load that arrives after the pre phase and drains before the post phase
# is invisible to endpoint-only canaries. The INTERLEAVED probes close
# that: every query gets a load factor from its nearest enclosing probe
# pair, so a mid-suite burst normalizes the queries it actually touched
# and nothing else. Conservatism is preserved — a query's factor is
# min(nearest probe before, nearest probe after), so normalization only
# waives a flag when BOTH neighbors agree the load was sustained there.
# Calibration: tools/loadnorm_ab.py runs a deliberate background-load
# A/B through this same machinery (results in BENCH_NOTES.md).
# Chosen canaries: stable sub-second queries present since r2 whose
# plans haven't changed in two rounds.
CANARIES = ["pricing_summary", "quality_score", "text_stats"]
PROBE_EVERY = 20


EVAL_MODE = os.environ.get("SPARK_GRAFT_BENCH_EVAL", "noop")


def _exec_full(df):
    """Fully execute a query result; returns the row count (or -1).

    noop mode (default): every output column is computed and handed to
    the no-op sink — the honest cost of the declared result. count
    mode (legacy, rounds 1-8): Catalyst prunes everything the row
    count doesn't need, silently skipping unused aggregates, projected
    columns, and non-duplicating gate-column left joins (r9 found the
    recall-gated family's whole ANN side missing from count plans).
    """
    if EVAL_MODE == "count":
        return df.count()
    df.write.format("noop").mode("overwrite").save()
    return -1


def _time_query(spark, spec, sf_dir, release_session_blocks, n_runs):
    """warmup + n_runs cold timed samples; returns (sorted samples, rows).

    The warmup run carries an Observation so the row count is reported
    without a separate count() execution; timed runs are plain full
    executions (the CollectMetrics node is warmup-only, so timed plans
    are exactly the query's own)."""
    if EVAL_MODE == "count":
        n = spec.fn(spark, sf_dir).count()
    else:
        from pyspark.sql import Observation
        import pyspark.sql.functions as _F

        obs = Observation()
        spec.fn(spark, sf_dir).observe(
            obs, _F.count(_F.lit(1)).alias("rows")
        ).write.format("noop").mode("overwrite").save()
        n = obs.get["rows"]
    samples = []
    for _ in range(n_runs):
        release_session_blocks(spark)
        t0 = time.perf_counter()
        _exec_full(spec.fn(spark, sf_dir))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples, n


def _boot_stamp() -> dict:
    """Machine-state stamp for cross-boot attribution (VERDICT r10 #6):
    the kernel boot id plus a min-of-3 buffered-write I/O probe
    (256 MiB to the shuffle filesystem — the boot-level variable the
    r10 sf1 phantom regressions rode). Recorded in BENCH_DETAIL and in
    the anchor comparison, so a vs_anchor swing across a mid-round
    machine restart is attributable from the artifacts alone."""
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            boot_id = fh.read().strip()
    except OSError:
        boot_id = None
    import tempfile

    size = 256 * 1024 * 1024
    buf = b"\0" * (8 * 1024 * 1024)
    best = 0.0
    for _ in range(3):
        with tempfile.NamedTemporaryFile(dir="/tmp", suffix=".ioprobe") as fh:
            t0 = time.perf_counter()
            for _ in range(size // len(buf)):
                fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
            best = max(best, size / (time.perf_counter() - t0) / 1e6)
    return {"boot_id": boot_id, "io_probe_mbps": round(best, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from soccer_data_pipeline_spark.plans import QUERIES
    from soccer_data_pipeline_spark.session import get_spark

    # Roster ledger (VERDICT r7 #3): benched ∪ excluded must equal the
    # registry exactly — a query in neither (or both, or excluded but
    # no longer registered) fails loudly instead of silently un-benched.
    reg = set(QUERIES)
    unaccounted = sorted(reg - set(HEADLINE) - set(EXCLUDED))
    overlap = sorted(set(HEADLINE) & set(EXCLUDED))
    stale = sorted(set(EXCLUDED) - reg)
    unknown = sorted(set(HEADLINE) - reg)
    assert not unaccounted, f"queries neither benched nor in EXCLUDED: {unaccounted}"
    assert not overlap, f"queries both benched and excluded: {overlap}"
    assert not stale, f"EXCLUDED entries not in the registry: {stale}"
    assert not unknown, f"HEADLINE entries not in the registry: {unknown}"

    boot = _boot_stamp()
    print(
        f"# boot {boot['boot_id']}, io probe {boot['io_probe_mbps']} MB/s",
        file=sys.stderr,
    )

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

    # Deterministic cache lifecycle: operators release their internal
    # persists before returning (operators/cache.py), and the bench
    # releases any remaining GC-owned checkpoint blocks at every query
    # boundary — the r3 suite measured a 2× slowdown from letting those
    # accumulate across 57 queries. The post-release assertion makes a
    # future leak a loud failure, not silent drift.
    from soccer_data_pipeline_spark.operators.cache import (
        persistent_rdd_ids,
        release_session_blocks,
    )

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Sub-second queries are noise-dominated at n=3 (VERDICT r7 #2: 4 of
    # 11 r7 flags were irreproducible — e.g. doc_length_histogram flagged
    # 4.00x on a 0.5s spread, re-timed at 1.0x). Three gates, all from
    # that adjudication: 5 samples when the committed baseline is
    # sub-second, a minimum ABSOLUTE delta for sub-second baselines, and
    # a confirm-by-rerun before any REGRESSION is recorded.
    MIN_ABS_DELTA = 0.3

    # Baseline first: the canary phases and the in-loop spike retry both
    # need the committed medians.
    prev_name, prev, prev_eval = _prev_round_medians(sf)
    # Per-query ratios are only meaningful within one eval methodology:
    # count-mode baselines under-measured every prunable subtree (see
    # module docstring), so comparing noop timings against them flags
    # the measurement turning honest as a "regression". When the modes
    # differ the raw shared ratio is still recorded (marked), but
    # regression gating, spike retries, and canary load normalization
    # are disabled for the round; the next round re-baselines cleanly.
    comparable = bool(prev) and prev_eval == EVAL_MODE
    if prev and not comparable:
        print(
            f"# baseline {prev_name} recorded under eval={prev_eval}, "
            f"current eval={EVAL_MODE} — per-query regression gating "
            "disabled this run (methodology change, not a perf change)",
            file=sys.stderr,
        )

    def canary_ratios(phase: str) -> list[float]:
        """Per-canary (current median / committed median) ratios for one
        phase; the phases and interleaved probes combine below."""
        if not comparable:
            return []
        ratios = []
        for cname in CANARIES:
            cspec = QUERIES.get(cname)
            p = prev.get(cname, 0.0)
            if cspec is None or not p or p <= 0:
                continue
            try:
                csamples, _ = _time_query(
                    spark, cspec, sf_dir, release_session_blocks, n_runs
                )
            except Exception:
                continue
            release_session_blocks(spark, gc=True)
            # MIN sample, not median: the least-inflated sample filters
            # the bursty descheduling spikes sub-second canaries eat
            # under transient contention (loadnorm_ab measured probes
            # over-reading sub-saturating load 1.5x while the suite ran
            # 1.0x). Sustained load inflates EVERY sample, so min still
            # detects it; since factors only ever WAIVE flags, the
            # conservative estimator is the min.
            r = csamples[0] / p
            ratios.append(r)
            print(f"# canary[{phase}] {cname}: {r:.2f}x vs {prev_name}", file=sys.stderr)
        return ratios

    def probe_ratio(tag: str, cname: str, runs: int = 3) -> float | None:
        """One interleaved load probe: the median ratio of ONE canary
        (``runs`` cold runs) vs the committed baseline — a point
        estimate of the session load at this moment of the run. Probes
        cycle through CANARIES so no single canary's idiosyncrasy
        biases every point; cost ≈ (runs+1)·sub-second per point."""
        if not comparable:
            return None
        cspec = QUERIES.get(cname)
        p = prev.get(cname, 0.0)
        if cspec is None or not p or p <= 0:
            return None
        try:
            cs, _ = _time_query(spark, cspec, sf_dir, release_session_blocks, runs)
        except Exception:
            return None
        release_session_blocks(spark, gc=True)
        r = cs[0] / p  # min sample — see canary_ratios for why
        print(f"# probe[{tag}] {cname}: {r:.2f}x vs {prev_name}", file=sys.stderr)
        return r

    # Suite-level heavy warmup (VERDICT r6 #3/#5): the first heavy
    # query of a fresh JVM pays broadcast-join/agg codegen JIT that no
    # later query pays — r6's only flagged regression
    # (flagship_top_customers, 1.39x) was this cold-start artifact
    # (cold ~6.7 s vs warm ~1.5 s on an idle session). One DISCARDED
    # execution of the heaviest star-schema shape warms those paths
    # before anything is timed; per-query warmups inside _time_query
    # still handle query-specific compilation.
    heavy_warm = QUERIES.get("flagship_top_customers")
    if heavy_warm is not None:
        try:
            _exec_full(heavy_warm.fn(spark, sf_dir))
        except Exception:
            pass
        release_session_blocks(spark, gc=True)

    pre_ratios = canary_ratios("pre")
    # probe timeline: (position in HEADLINE, load ratio). Pre-phase
    # canaries anchor position -1, post-phase anchors len(HEADLINE), so
    # every query has an enclosing probe pair.
    probes: list[tuple[int, float]] = [(-1, r) for r in pre_ratios]
    loads: list[float] = []
    positions = {name: i for i, name in enumerate(HEADLINE)}
    timed_since_probe = 0

    for name in HEADLINE:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        try:
            loads.append(os.getloadavg()[0])
        except OSError:
            pass
        if comparable and timed_since_probe >= PROBE_EVERY:
            cname = CANARIES[(len(probes) - len(pre_ratios)) % len(CANARIES)]
            pr = probe_ratio(f"q{positions[name]}", cname)
            if pr is not None:
                probes.append((positions[name], pr))
            timed_since_probe = 0
        timed_since_probe += 1
        try:
            # warmup run inside _time_query: JIT/codegen compile and
            # footer caches are session-lifetime costs, not per-query
            # engine throughput. Harness-overhead audit (r5, addressing
            # the r4 1.3-1.9× small-query drift vs r2):
            # release_session_blocks costs ~1 ms without gc (the
            # per-sample call, outside the timed region anyway) and
            # 70-150 ms with gc (per-query boundary, also untimed), and
            # a forced GC measurably does NOT slow the following query.
            # The r4 drift was the MEASUREMENT turning honest: r2's
            # warmup-run operator caches leaked into its timed runs via
            # the CacheManager, so small queries were partly warm; the
            # per-sample release makes every timed run cold.
            p = prev.get(name, 0.0) if comparable else 0.0
            runs = 5 if (p and 0 < p < 1.0 and n_runs < 5) else n_runs
            samples, n = _time_query(spark, spec, sf_dir, release_session_blocks, runs)
            if p and p > 0 and samples[len(samples) // 2] / p > 1.5:
                # Spike retry (VERDICT r5 #1): a >1.5× raw ratio is more
                # often a transient load burst than a plan change — take
                # one extra cold sample after a GC quiesce and let the
                # median re-settle before the regression gate sees it.
                release_session_blocks(spark, gc=True)
                t0 = time.perf_counter()
                _exec_full(spec.fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                samples.sort()
        except Exception as exc:  # a failing query must not kill the suite
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            timings[name] = -1.0
            release_session_blocks(spark, gc=True)
            continue
        # per-query boundary: drop blocks AND force a GC so dead
        # broadcast blocks from this query's joins are reclaimed before
        # the next query is timed (they otherwise accumulate across the
        # suite and destabilize the heavy composites)
        released = release_session_blocks(spark, gc=True)
        leftover = persistent_rdd_ids(spark)
        assert not leftover, f"block manager not clean after {name}: {leftover}"
        # median of n_runs: sub-second deltas between rounds are only
        # interpretable against the recorded run-to-run spread
        timings[name] = round(samples[len(samples) // 2], 4)
        spread[name] = round(samples[-1] - samples[0], 4)
        print(
            f"# {name}: median {timings[name]:.3f}s "
            f"(spread {spread[name]:.3f}s over {len(samples)} runs, {n} rows, "
            f"{released} blocks released)",
            file=sys.stderr,
        )

    post_ratios = canary_ratios("post")
    probes.extend((len(HEADLINE), r) for r in post_ratios)
    probes.sort()

    total = round(sum(t for t in timings.values() if t > 0), 4)
    failed = sorted(k for k, v in timings.items() if v < 0)

    # Session-load factors. A uniformly loaded session (e.g. the driver
    # benching while pytest runs) inflates every query with tight
    # per-query spread — invisible to the spread gate but fully visible
    # to the probes, whose plans are frozen across rounds.
    #
    # Per-query factor (regression gating): min of the nearest probe
    # before and after the query, floored at 1.0 — normalization may
    # only ever WAIVE a flag, and only when BOTH enclosing probes agree
    # the load was sustained across that query (VERDICT r9 #6: the old
    # endpoint-only min(pre, post) read 1.0 through a mid-suite burst
    # that inflated the whole middle of the run).
    #
    # Suite factor (shared_ratio_norm): median over ALL probe points —
    # the representative load of the run as a whole.
    def _median(xs: list[float]) -> float:
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else 1.0

    # collapse same-position probes (the pre/post phases contribute one
    # ratio per canary at one position) to their median point estimate
    probe_pts: list[tuple[int, float]] = []
    for p in sorted({p for p, _ in probes}):
        probe_pts.append((p, _median([r for q, r in probes if q == p])))

    def local_factor(pos: int) -> float:
        before = [r for p, r in probe_pts if p <= pos]
        after = [r for p, r in probe_pts if p > pos]
        lo = before[-1] if before else 1.0
        hi = after[0] if after else 1.0
        return max(1.0, min(lo, hi))

    load_factor = max(1.0, _median([r for _, r in probe_pts]))

    # vs_prev: per-query regression diff against the last round's
    # recorded medians, so a 9× regression is a loud line at bench time
    # instead of a judge finding a round later (VERDICT r3 item 7).
    # regr values are [raw_ratio, load_normalized_ratio,
    # confirmed_ratio]; a regression is flagged only if it (a) survives
    # load normalization, (b) clears the spread AND — for sub-second
    # baselines — a MIN_ABS_DELTA absolute floor, and (c) reproduces in
    # an immediate fresh 5-run re-check (VERDICT r7 #2: without (b)/(c),
    # 4 of 11 r7 flags were session noise).
    regressions: dict[str, list[float]] = {}
    fixed: list[str] = []
    prev_total = 0.0
    shared_cur = shared_prev = 0.0
    for q, cur in timings.items():
        p = prev.get(q, 0.0)
        if p and p > 0:
            prev_total += p
            if cur > 0:
                shared_cur += cur
                shared_prev += p
                ratio = cur / p
                lf = local_factor(positions.get(q, -1))
                norm = ratio / lf if lf > 0 else ratio
                sp = spread.get(q, 0.0)
                floor = max(sp, MIN_ABS_DELTA) if p < 1.0 else sp
                if comparable and ratio > 1.3 and cur - p > floor and norm > 1.3:
                    # confirm-by-rerun: 5 fresh cold samples after a GC
                    # quiesce, PLUS a fresh load probe taken alongside
                    # them — the confirmed ratio must survive the load
                    # measured at confirmation time, not the run-level
                    # factor (VERDICT r9 #1: code_switching_audit
                    # confirmed 1.66x under sustained session load the
                    # run-level canaries never saw). The flag stands
                    # only if the confirmed median still clears every
                    # gate.
                    conf = ratio
                    spec = QUERIES.get(q)
                    if spec is not None:
                        try:
                            release_session_blocks(spark, gc=True)
                            cpr = probe_ratio(
                                f"confirm:{q}",
                                CANARIES[len(regressions) % len(CANARIES)],
                            )
                            cf = max(1.0, cpr) if cpr is not None else lf
                            csamp, _ = _time_query(
                                spark, spec, sf_dir, release_session_blocks, 5
                            )
                            cmed = csamp[len(csamp) // 2]
                            csp = csamp[-1] - csamp[0]
                            conf = cmed / p
                            cfloor = max(csp, MIN_ABS_DELTA) if p < 1.0 else csp
                            if not (
                                conf > 1.3
                                and cmed - p > cfloor
                                and conf / cf > 1.3
                            ):
                                print(
                                    f"# noise (unconfirmed) {q}: {ratio:.2f}x raw "
                                    f"re-timed at {conf:.2f}x — not flagged",
                                    file=sys.stderr,
                                )
                                release_session_blocks(spark, gc=True)
                                continue
                            release_session_blocks(spark, gc=True)
                        except Exception as e:
                            # conf stays == raw ratio (conservative), but a
                            # persistent failure in the confirmation path
                            # itself must be visible, not swallowed
                            print(
                                f"# confirm-rerun failed for {q}: "
                                f"{type(e).__name__}: {e} — recording raw "
                                f"ratio as confirmed",
                                file=sys.stderr,
                            )
                    regressions[q] = [round(ratio, 2), round(norm, 2), round(conf, 2)]
                    print(
                        f"# REGRESSION {q}: {p:.3f}s -> {cur:.3f}s "
                        f"({ratio:.2f}x raw, {norm:.2f}x load-normalized, "
                        f"{conf:.2f}x confirmed, spread {sp:.3f}s)",
                        file=sys.stderr,
                    )
            elif cur < 0:
                print(f"# BROKE {q}: ran in {prev_name}, fails now", file=sys.stderr)
        elif p is not None and p < 0 and cur > 0:
            fixed.append(q)
    shared_ratio = round(shared_cur / shared_prev, 3) if shared_prev else None
    vs_prev = {
        "ref": prev_name,
        "eval_changed": bool(prev) and not comparable,
        "shared_ratio": shared_ratio,
        "load_factor": round(load_factor, 3),
        "shared_ratio_norm": (
            round(shared_ratio / load_factor, 3)
            if shared_ratio is not None and load_factor > 0
            else None
        ),
        # the interleaved probe timeline behind load_factor: (position
        # in HEADLINE, canary-vs-baseline ratio); -1 = pre phase,
        # len(HEADLINE) = post phase (VERDICT r9 #6)
        "probes": [[p, round(r, 3)] for p, r in probe_pts],
        "regr": regressions,
        "fixed_count": len(fixed),
    }

    # Cumulative drift anchor (VERDICT r8 #6): shared-ratio against a
    # PINNED committed snapshot (BENCH_ANCHOR.json) alongside vs-prev,
    # so consecutive small per-round drifts are provably noise or
    # provably accretion — a constant creeping in under the per-query
    # noise floor shows up here as a monotonically growing ratio even
    # while every vs-prev reads ~1.0x. The anchor is only comparable at
    # the same sf AND eval mode; re-pin (copy BENCH_DETAIL.json fields)
    # whenever the methodology changes, as r9's count→noop switch did.
    vs_anchor = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BENCH_ANCHOR.json")) as fh:
            anchor = json.load(fh)
        aq = anchor.get("queries") or {}
        if (
            abs(float(anchor.get("sf", -1)) - sf) < 1e-9
            and str(anchor.get("eval", "count")) == EVAL_MODE
            and aq
        ):
            a_cur = sum(timings[q] for q in aq if timings.get(q, -1) > 0 and aq[q] > 0)
            a_prev = sum(aq[q] for q in aq if timings.get(q, -1) > 0 and aq[q] > 0)
            if a_prev > 0:
                # boot/I-O attribution (VERDICT r10 #6): carry both
                # sides' boot stamps so a cross-boot vs_anchor swing
                # (r10's 0.895-vs-1.022) is explainable from the
                # artifact alone. io_ratio > 1 = this boot's disk is
                # faster than the anchor's; None = legacy pre-stamp
                # anchor (boot conditions unrecorded).
                a_boot = anchor.get("boot") or {}
                a_io = a_boot.get("io_probe_mbps")
                vs_anchor = {
                    "ref": str(anchor.get("pinned", "BENCH_ANCHOR")),
                    "shared_ratio": round(a_cur / a_prev, 3),
                    "shared_ratio_norm": (
                        round(a_cur / a_prev / load_factor, 3)
                        if load_factor > 0
                        else None
                    ),
                    "n_shared": sum(
                        1 for q in aq if timings.get(q, -1) > 0 and aq[q] > 0
                    ),
                    "same_boot": (
                        boot["boot_id"] == a_boot.get("boot_id")
                        if boot.get("boot_id") and a_boot.get("boot_id")
                        else None
                    ),
                    "io_ratio": (
                        round(boot["io_probe_mbps"] / a_io, 3) if a_io else None
                    ),
                }
    except FileNotFoundError:
        pass
    except Exception as e:
        print(f"# anchor unreadable: {type(e).__name__}: {e}", file=sys.stderr)

    # Full-detail artifact on disk (spreads, fixed list, machine info);
    # the stdout line must stay under the driver's 2000-char tail buffer
    # or it is recorded truncated/unparseable (ADVICE r3, BENCH_r03).
    detail = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "eval": EVAL_MODE,
        # provenance (VERDICT r11 #6): BENCH_DETAIL is overwritten by
        # EVERY bench run — the driver's post-round run included — so
        # the committed canonical (an idle-machine run stamped
        # canonical-idle) and a loaded-session driver overwrite are
        # self-describing instead of a two-artifact trap. Idle runs set
        # SPARK_GRAFT_BENCH_PROVENANCE=canonical-idle before committing.
        "provenance": os.environ.get(
            "SPARK_GRAFT_BENCH_PROVENANCE", "unattributed-session"
        ),
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
        "spread_sec": spread,
        "failed": failed,
        "vs_prev": {**vs_prev, "fixed": fixed},
        "vs_anchor": vs_anchor,
        "boot": boot,
        "loadavg": (
            {
                "mean": round(sum(loads) / len(loads), 2),
                "max": round(max(loads), 2),
                "ncpus": os.cpu_count(),
            }
            if loads
            else None
        ),
        "excluded": EXCLUDED,
    }
    detail_path = os.path.join(os.path.dirname(__file__), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    line_obj = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "eval": EVAL_MODE,
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
        "vs_prev": vs_prev,
        "vs_anchor": vs_anchor,
    }
    # progressively slim to fit the tail buffer; each step is re-checked
    # (the first slimmed form is itself near the cap at ~57 query names —
    # ADVICE r4), and the final step drops `queries` entirely (the full
    # dict always survives in BENCH_DETAIL.json).
    full_line = json.dumps(line_obj, separators=(",", ":"))
    line = full_line
    if len(line) > 1990:
        line_obj["queries"] = {k: round(v, 2) for k, v in timings.items()}
        line_obj["vs_prev"] = {
            "ref": prev_name,
            "eval_changed": vs_prev["eval_changed"],
            "shared_ratio": vs_prev["shared_ratio"],
            "load_factor": vs_prev["load_factor"],
            "shared_ratio_norm": vs_prev["shared_ratio_norm"],
        }
        line = json.dumps(line_obj, separators=(",", ":"))
    if len(line) > 1990:
        line_obj.pop("queries", None)
        line = json.dumps(line_obj, separators=(",", ":"))
    # Per-query timings in the machine-readable output (VERDICT r15 #2,
    # additions-only): the FULL object — same metric/value/unit/sf plus
    # the complete `queries` map — prints FIRST as its own JSON line; the
    # slimmed headline line stays LAST and unchanged, so a last-line /
    # tail-buffer parser (the 2000-char tail keeps the END of the
    # stream) sees exactly what it saw in r15, while a full-stream
    # parser gets every per-query median. Totals and query set are
    # byte-identical between the two lines.
    if line != full_line:
        print(full_line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
