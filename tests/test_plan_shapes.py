"""Plan-shape regression tests: the physical plans the 100 TB design
depends on (pushdown, pruning, broadcast, no stray shuffles) must not
silently regress."""

from __future__ import annotations

from soccer_data_pipeline_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "filter_project_lineitem")
    assert "PushedFilters: [" in plan
    # the discount/quantity predicates must appear pushed, not post-scan only
    assert "GreaterThan(l_discount" in plan or "l_discount" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark):
    plan = _plan(spark, "scalar_functions_dates")
    scan = plan[plan.index("FileScan") :]
    # only the two needed columns are read
    assert "o_orderkey" in scan[:200] and "o_orderdate" in scan[:200]
    assert "o_totalprice" not in scan[:300]


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "flagship_top_customers")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_no_shuffle_in_pure_projection(spark):
    plan = _plan(spark, "null_handling_zoo")
    assert "Exchange" not in plan


def test_semi_anti_join_physical(spark):
    plan = _plan(spark, "semi_anti_join")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_repetition_filter_is_narrow(spark):
    # The Gopher repetition stats must stay a narrow in-row plan
    # (array sort + aggregate), never the explode+groupBy shape. The
    # only Exchange allowed is the r15 input spread — a ROUND-ROBIN
    # repartition below the compute (guide §2.5 input-skew fix for
    # narrow local scans; a no-op at scale) — never a hash/range
    # partitioning, which would mean a keyed shuffle crept in.
    plan = _plan(spark, "repetition_filter")
    for part in plan.split("Exchange")[1:]:
        spec = part.split("\n", 1)[0]
        assert "RoundRobinPartitioning" in spec, f"keyed shuffle: {spec}"
    assert "Generate" not in plan  # no explode
    assert "hashpartitioning" not in plan


def test_scd2_history_single_shuffle(spark):
    # Tie-break dedup, change-compression lag, and version/validity
    # windows all partition on custkey; filters preserve partitioning
    # and sort, so the whole SCD2 build must plan as ONE Exchange +
    # one Sort with three WindowExec passes stacked on it.
    plan = _plan(spark, "scd2_history")
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 3
    assert plan.count("Sort") == 1


def test_passage_dedup_shuffles_hashes_not_text(spark):
    # Only (doc_id, chunk_hash) may cross an exchange; document text
    # must stay inside the scan stage. Check the partitioning spec on
    # the Exchange node itself (its subtree below legitimately computes
    # hashes FROM text pre-shuffle).
    # r10: the repair stage inherits the same contract — decisions
    # shuffle as (doc_id, idx, hash) triples and come back as a per-doc
    # int array; the rebuild is narrow over the scan's text column.
    for name in ("passage_dedup_stats", "passage_dedup_repair"):
        plan = _plan(spark, name)
        exchanges = [
            part.split("\n", 1)[0] for part in plan.split("Exchange")[1:]
        ]
        assert exchanges, f"{name}: expected at least one shuffle"
        for spec in exchanges:
            assert "text#" not in spec, (
                f"{name}: document text crosses a shuffle: {spec}"
            )
    # r11 (ADVICE r10): the repair's rebuild column is the token array
    # `t`, not raw `text`, so the spec grep above can't see a regression
    # to SortMergeJoin on the final doc_id join. Assert the stronger
    # contract directly: the per-doc drop-list join is a pinned
    # BroadcastHashJoin (no SortMergeJoin anywhere in the repair plan —
    # its only other join, occ×per_hash on `h`, rides the same groupBy
    # partitioning) and no Exchange *subtree* materializes the token
    # array. Subtree check: an Exchange whose input schema carries an
    # array<string> column would print `t#N` in its output list; grep
    # the full text between each Exchange and the next operator header.
    plan = _plan(spark, "passage_dedup_repair")
    assert "BroadcastHashJoin" in plan, (
        "passage_dedup_repair: drop-list join must broadcast"
    )
    left, _, right = plan.partition("BroadcastHashJoin")
    # Everything ABOVE the broadcast join (the final select) may touch
    # `t`; everything reachable from an Exchange must not. Exchanges all
    # live below joins in this plan, so check each Exchange's own
    # operator line plus its immediate input columns.
    for part in plan.split("Exchange")[1:]:
        header = part.split("+-", 1)[0]
        assert " t#" not in header and "[t#" not in header, (
            f"passage_dedup_repair: token array in Exchange spec: {header}"
        )


def test_fuzzy_levenshtein_equi_join(spark):
    # The ±1 length-bucket blocking must compile to a shuffled/broadcast
    # HASH join via the 3-element bucket explode — never a theta join
    # (BroadcastNestedLoop / Cartesian), which would be all-pairs at scale.
    plan = _plan(spark, "fuzzy_levenshtein_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_merge_upsert_single_join(spark):
    # MERGE = ONE full-outer join on the key: no nested-loop fallback,
    # and exactly one join operator in the whole plan.
    plan = _plan(spark, "merge_upsert_orders")
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") == 1


def test_chunk_documents_is_narrow(spark):
    # Overlapping-window chunking must stay zero-shuffle: per-row
    # sequence + slice + hash, one Generate for the window explode,
    # chunk rows inherit the scan's partitioning.
    plan = _plan(spark, "chunk_documents")
    assert "Exchange" not in plan


def test_salted_broadcast_join_routes_hot_keys(spark):
    # The hot-key slice must be an explicit broadcast join; no
    # cartesian products anywhere (the tail join may be broadcast too
    # at test scale — AQE's call — but the hot branch is forced).
    plan = _plan(spark, "salted_broadcast_join_supplier")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_single_token_explode(spark):
    # BM25's tf and dl both derive from ONE token explode per scan
    # branch; df and the scalar stats ride broadcasts, so exactly the
    # two id-keyed aggregation exchanges (tf, dl→avgdl rolls into a
    # single-partition agg) plus broadcasts may appear — never a
    # corpus-sized join shuffle of text.
    plan = _plan(spark, "bm25_scores")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_zero_shuffle_topk(spark):
    """The ES weighted sampler must stay narrow: per-doc priority is an
    in-row array_min (no explode/groupBy) and the selection is
    TakeOrdered (per-partition heap), never a global sort Exchange."""
    plan = _plan(spark, "weighted_sample_docs")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_shuffle_order_no_corpus_window(spark):
    """corpus_shuffle_order's only unpartitioned window runs over the
    bucket-count table (≤256 rows), never the corpus: the corpus-side
    window must carry the bucket partition key."""
    plan = _plan(spark, "corpus_shuffle_order")
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    # at least one Window partitioned by the bucket; the unpartitioned
    # one (offsets) is fed by a HashAggregate, i.e. bucket-count-sized
    assert any("_bucket" in w for w in windows)


def test_drift_and_sketch_gates_broadcast_small_sides(spark):
    """The per-lang totals (split_drift_tvd) and exact-side join
    (sketch_merge_distinct) are tiny aggregates: they must broadcast,
    and neither gate may introduce a window or cartesian product."""
    for name in ("split_drift_tvd", "sketch_merge_distinct"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "Window" not in plan, name


def test_char_entropy_is_narrow(spark):
    """Per-doc char entropy must stay a zero-shuffle narrow plan (sorted
    char array + one fold), never the explode+groupBy-per-char shape
    (which would shuffle one row per character — corpus-size × doc-len
    rows at scale)."""
    plan = _plan(spark, "char_entropy_quality")
    # only the r15 round-robin input spread may appear (guide §2.5
    # input-skew fix, no-op at scale) — never a keyed shuffle
    for part in plan.split("Exchange")[1:]:
        spec = part.split("\n", 1)[0]
        assert "RoundRobinPartitioning" in spec, f"keyed shuffle: {spec}"
    assert "hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode


def test_gapfill_joins_are_broadcast_post_agg(spark):
    """The gap-fill grid join runs on POST-aggregation cardinalities:
    the daily-counts side is broadcast into the dense grid, and no
    corpus-sized frame reaches a nested-loop or cartesian join (the
    single-row span cross joins are broadcast by construction)."""
    plan = _plan(spark, "event_gapfill_daily")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_heavy_hitters_partial_agg_before_shuffle(spark):
    """The token-count agg must map-side combine (partial_count below
    the Exchange) so the shuffle carries the vocabulary, not the token
    stream; the global total rides a broadcast, not a driver collect."""
    plan = _plan(spark, "heavy_hitter_tokens")
    pre_shuffle = plan.split("Exchange hashpartitioning(token")[1:]
    assert pre_shuffle, "expected a token-keyed exchange"
    assert "partial_count" in pre_shuffle[0] or "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_transition_matrix_single_user_shuffle(spark):
    """The Markov lag partitions on user_id once; the normalizing
    window runs on the post-agg |event_type|^2 frame (prev_type
    partition), never on the raw event stream."""
    plan = _plan(spark, "event_transition_matrix")
    import re

    windows = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert any("user_id" in w for w in windows)
    assert any("prev_type" in w for w in windows)


def test_triangle_edges_checkpointed_and_broadcast(spark):
    """The triangle query's 3-way self-join must consume the
    CHECKPOINTED edge frame (scan->distinct->cap chain executed once,
    visible as ExistingRDD scans), with the capped-part filter joined
    broadcast upstream; no cartesian products anywhere."""
    plan = _plan(spark, "triangle_count_suppliers")
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_attribution_windows_share_one_exchange(spark):
    """first_touch and last_touch partition and sort identically, so
    the whole attribution build must plan ONE user_id Exchange (plus
    the post-agg hash-partition) — never one shuffle per window."""
    plan = _plan(spark, "conversion_attribution")
    assert plan.count("hashpartitioning(user_id") == 1


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark):
    """At the 100 TB design point a selective dim-side predicate should
    inject a runtime bloom filter into the fact scan
    (spark.sql.optimizer.runtime.bloomFilter, on by default). The
    application-side threshold is 10 GB precisely so it engages on
    real fact scans and not on toy ones — scale it to the test data to
    assert the machinery fires, then restore."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "runtime bloom filter did not inject"
        assert j.count() >= 1  # and the filtered join still returns rows
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def _unpartitioned_window_lines(plan):
    """Physical ``Window`` nodes with an EMPTY partition spec — exactly
    the nodes WindowExec logs 'No Partition Defined' for. A partitioned
    node prints three top-level bracket groups ([windowExprs],
    [partitionSpec], [orderSpec]); a global one prints two."""
    out = []
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        depth = n = 0
        for ch in line:
            if ch == "[":
                if depth == 0:
                    n += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if n == 2:
            out.append(line.strip())
    return out


def test_no_unpartitioned_windows_in_unbounded_rankers(spark):
    """The global-rank family must carry ZERO un-partitioned Window
    nodes: their rank frames (token vocabulary, session journeys,
    graph nodes, customer dim, the corpus itself) all grow with the
    data, so any 'No Partition Defined' window is the single-task
    funnel VERDICT r6 flagged. Reverting bounded_topk /
    value_bucketed_rank / the array-folded prefix offsets
    (operators/topk.py) makes this fail."""
    for name in (
        "zipf_slope_audit",
        "session_path_counts",
        "bpe_pair_counts",
        # r11: merge learning — per-round argmax is a 1-row
        # TakeOrderedAndProject, apply is a narrow double replace
        "bpe_learn_merges",
        "pagerank_suppliers",
        "revenue_concentration",
        "corpus_shuffle_order",
        "pack_sequences",
        "equi_depth_binning",
        "pmi_top_pairs",
        "countmin_token_freq",
        # r9: the leakage audit is aggregation-only (zero windows) and
        # the spearman midranks ride the bucketed prefix sum
        "split_ngram_leakage",
        "spearman_spend_balance",
        # r10: the registered budgeted-selection boundary rides the same
        # bucketed prefix sum (per-bucket windows only); the leakage
        # repair and decontamination are join/agg-only like the audits
        # they act on
        "corpus_budget_select",
        "split_leakage_repair",
        "benchmark_decontaminate",
        # r10: both RRF legs rank inside Window.partitionBy(query_id)
        # over lists already capped at 20 — bounded query set, never a
        # corpus-global window; MMR/NDCG inherit the same contract
        "hybrid_retrieval_rrf",
        "mmr_diverse_rerank",
        "retrieval_eval_ndcg",
        # r11: the production-legged RRF — ANN buckets and the prefix
        # filter rank inside partitionBy(query_id)/(vec) windows only;
        # the gate aggregates fold over <= queries x 10 rows
        "hybrid_retrieval_rrf_ann",
        # r11: incremental IVF — probe/search windows partition by
        # query_id; index build is in-row (no windows at all)
        "similarity_ivf_incremental",
        "similarity_ivfpq_recall",
        # r11: residual encoding changes the ADC numerator, not the
        # plan shape — same query_id-partitioned windows only
        "similarity_ivfpq_residual",
        # r10b: argmin is a groupBy min(struct) — zero Window nodes
        "kmeans_fixed_assign",
        # r11b: pass@k is one 32-row groupBy + in-row folds; BT rates
        # a 16-entity frame with bounded joins — zero Window nodes
        "pass_at_k_eval",
        "bradley_terry_rating",
        # r11: SemDeDup's only window is the keeper rank inside
        # partitionBy(cluster_id) — dup groups, never the corpus
        "semantic_dedup_semdedup",
        # r12: the repair shares the SemDeDup operator (same windows);
        # its audit gate is aggregation-only
        "semantic_dedup_repair",
        # r12: persisted-index serving — search windows partition by
        # query_id; the match gate folds over <= queries x k rows
        "similarity_index_served",
        # r12: trajectory windows partition by entity over the bounded
        # entity x month frame (corpus collapses at the first shuffle)
        "winrate_trajectory",
        # r12: sampled learn is the same loop over a bounded ordered
        # take; the distributed apply is one narrow chained-replace
        # projection — no windows at all
        "bpe_learn_merges_sampled",
        # r12: kappa is one map-side-combined agg to 4 confusion cells
        "cohens_kappa_raters",
        # r13: Fleiss' kappa is one map-side-combined agg to (N, T1, S)
        "fleiss_kappa_raters",
        # r13: production BPE apply — one shuffle-free Arrow pass plus
        # an R+1-column sum; no windows at all
        "bpe_apply_production",
        # r13: incremental SemDeDup — keeper window partitions by dup
        # cluster (bounded groups); Lloyd/CC windows are per-id/cluster
        "semantic_dedup_incremental",
        # r13: rebalance differential — search windows partition by
        # query_id; manifest + balance gates are aggregation-only
        "ann_index_rebalance",
        # r14: deletion differential — served search windows partition
        # by query_id; the tombstone/absence gates fold to 1-row aggs
        "ann_index_deletes",
        # r14: served incremental SemDeDup — keeper window partitions
        # by dup cluster; the identity gate folds to one broadcast row
        "semantic_dedup_served",
    ):
        bad = _unpartitioned_window_lines(_plan(spark, name))
        assert not bad, (name, bad)


def test_budget_select_no_unpartitioned_window(spark):
    """The r9 budgeted-selection cut (corpus.budget_select) must rank
    via the bucketed two-phase prefix sum — zero global-window nodes;
    reverting it to a naive ORDER BY running sum makes this fail."""
    from pyspark.sql import functions as F

    from soccer_data_pipeline_spark.operators.corpus import budget_select

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("long").alias("score"),
        F.lit(5).cast("long").alias("n_tok"),
    )
    plan = (
        budget_select(df, 100)._jdf.queryExecution().executedPlan().toString()
    )
    bad = _unpartitioned_window_lines(plan)
    assert not bad, bad


def test_audit_queries_aggregate_before_windows(spark):
    """The r6b audit tier must collapse the fact/corpus at the FIRST
    agg: any un-partitioned window must sit ABOVE an aggregate (so its
    frame is the post-agg calendar/digit-sized one, bounded by the key
    domain — never the corpus), and no cartesian products anywhere.
    The plan tree prints top-down, so 'window above an aggregate' =
    some Aggregate line BELOW the window line (a window fed straight
    by the scan has no aggregate below it and fails)."""
    for name in (
        "benford_digit_audit",
        "daily_anomaly_flags",
        "daily_ewma_forecast",
        "mad_outlier_audit",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        lines = plan.splitlines()
        agg_idx = [
            i
            for i, l in enumerate(lines)
            if "HashAggregate" in l or "SortAggregate" in l
        ]
        for i, l in enumerate(lines):
            if "Window [" in l and not _unpartitioned_window_lines(l):
                continue
            if "Window [" in l:
                assert any(j > i for j in agg_idx), (name, l.strip())


def test_readability_is_narrow(spark):
    """Three per-row counts and one fixed expression — no shuffle, no
    explode, whole plan stays in the scan stage."""
    plan = _plan(spark, "readability_scores")
    assert "Exchange" not in plan
    assert "Generate" not in plan


def test_graph_tier_plans_no_cartesian_no_global_windows(spark):
    """The whole graph family (triangles, PageRank, k-core, LPA,
    modularity) runs on the shared capped edge set: no cartesian
    products, and zero un-partitioned Window nodes anywhere — the
    per-node argmax/rank steps are integer struct-max aggregations or
    node-partitioned, never a global funnel."""
    for name in (
        "triangle_count_suppliers",
        "pagerank_suppliers",
        "kcore_peel_suppliers",
        "lpa_communities",
        "community_modularity",
    ):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        bad = _unpartitioned_window_lines(plan)
        assert not bad, (name, bad)
