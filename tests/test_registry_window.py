"""Guards on the curated driver-window ordering (plans/registry.py).

The correctness driver hash-checks the first DRIVER_WINDOW_SIZE entries
of ``queries()``. These tests pin the invariants that make that window
cover every operator family, so a later registration can't silently
push a family out of the hard-signal set.
"""

from __future__ import annotations

from soccer_data_pipeline_spark.plans.registry import (
    DRIVER_WINDOW,
    DRIVER_WINDOW_SIZE,
    QUERIES,
    oracle_map,
    query_fns,
)

# One representative per operator family that must hold a window slot.
FAMILY_REPRESENTATIVES = {
    "agg": "pricing_summary",
    "join_broadcast": "broadcast_lookup_join",
    "window": "topk_orders_per_customer",
    "scalar_functions": "scalar_functions_combined",
    "agg_functions": "agg_functions_combined",
    "sql_surface": "sql_grouping_sets",
    "asof_join": "asof_join_latest_order",
    "range_join": "range_join_close_events",
    "pivot": "pivot_event_counts",
    "session_window": "sessionize_events",
    # r6b: event_sliding_windows ceded its slot — the event-time family's
    # hard rows ride sessionize_events; sliding + tumbling stay local
    "sliding_window": "sessionize_events",
    "sequence_markov": "event_transition_matrix",
    "lang_id": "lang_id_heuristic",
    # r12: tfidf_tokens ceded its slot (registry.py ledger) — idf-
    # weighted term scoring is hash-checked by rrf_ann's lexical leg
    "tfidf": "hybrid_retrieval_rrf_ann",
    # r6b: restores the in-window text-quality rep (quality_score ceded r6a)
    "text_quality": "char_entropy_quality",
    "dedup_exact": "dedup_exact_documents",
    # r11b: dedup_minhash_lsh_pairs ceded its slot (registry.py ledger —
    # the CC query's plan AND oracle embed the identical banded pair
    # pipeline, so its hash still hard-checks shingles/signatures/
    # band-join/Jaccard) for semantic_dedup_semdedup; the families that
    # rode the pair list now ride the CC superset
    "dedup_lsh": "dedup_connected_clusters",
    "dedup_cc": "dedup_connected_clusters",
    # r9: dedup_simhash_groups ceded its slot — sign-sketch band-join
    # mechanics are superset-exercised by the minhash + banded-embedding
    # window reps; SimHash stays local-oracle + benched
    "dedup_simhash": "dedup_connected_clusters",
    # r9: guaranteed-recall prefix-filtered exact set-similarity
    # (PPJoin family) gains the freed hard-signal slot
    "dedup_prefix_filter": "jaccard_prefix_join",
    # r8: ngram_jaccard_pairs ceded its slot — shingle-Jaccard semantics
    # are superset-exercised by the minhash tier (same shingles, same
    # Jaccard, approximated); exact-Jaccard stays local-oracle + benched
    "dedup_ngram": "dedup_connected_clusters",
    # r11: fuzzy_levenshtein_pairs ceded its slot (registry.py ledger —
    # character edit-distance blocking is the same length-bucket
    # equi-join mechanics the in-window MinHash/prefix tiers exercise;
    # the theta-join guard stays enforced by
    # test_fuzzy_levenshtein_equi_join) for mmr_diverse_rerank — the
    # diversification/eval family's first hard rows
    "dedup_editdist": "dedup_connected_clusters",
    # r11b: SemDeDup (learned-cell semantic dedup on the deterministic
    # Lloyd primitive) gained the freed hard-signal slot; r13: the
    # repair/action form took the hard rows (registry.py ledger — its
    # oracle embeds the identical _SEMDEDUP_CTES chain, so assignment/
    # pairs/CC/keeper mechanics keep a hard hash via the action ledger)
    "dedup_semantic": "semantic_dedup_repair",
    "retrieval_diversification": "mmr_diverse_rerank",
    # r8: rank statistics / experimentation family (VERDICT r7 #6)
    "rank_statistics": "spearman_spend_balance",
    # r5: window form is the banded production path with a sampled
    # exact audit; the full-exact form stays local-oracle-covered
    "similarity_near_dup": "embedding_near_dup_banded",
    # r13: similarity_ann_recall ceded its slot (registry.py ledger) —
    # the PERSISTED-index serving contract takes the ANN tier's hard
    # rows; sign-LSH band-bucket mechanics keep a window hash through
    # embedding_near_dup_banded
    "similarity_ann": "similarity_index_served",
    "index_serving": "similarity_index_served",
    # r10b: the IVF rep ceded its slot (ANN-recall family keeps
    # similarity_ann_recall; IVF stays local-oracle + benched) for the
    # retrieval-fusion family — registry.py slot ledger. r12: the
    # production ANN-legged form took the hard rows (its oracle embeds
    # the exact-legged fusion as the audit side)
    "retrieval_fusion": "hybrid_retrieval_rrf_ann",
    # r12: the eval/preference-rating tier's first hard rows
    "eval_rating": "bradley_terry_rating",
    # r14: the sampled-generation benchmark estimator (VERDICT r13 #2)
    "eval_pass_at_k": "pass_at_k_eval",
    # r14: the residual IVF x PQ form joins the serving contract
    "ivfpq_residual": "similarity_ivfpq_residual",
    # r14: champion_per_segment ceded (top-1-per-group subset of the
    # in-window topk plan; A6 semantics keep golden + local oracle)
    "champion_label": "topk_orders_per_customer",
    # r14: lag_prev_order ceded (single-lag WindowExec superset-
    # exercised by the rolling frame rep; W3/J4 keep golden + oracle)
    "window_lag": "rolling_avg_events",
    "multimodal": "multimodal_binary_stats",
    "split": "train_val_test_split",
    # sampling: stratified_sample_docs ceded its slot in r3c — the
    # md5-bucket mechanism is represented in-window by the split query
    "sampling": "train_val_test_split",
    "contamination": "benchmark_contamination",
    "packing": "pack_sequences",
    "pii": "pii_scrub",
    "sketch_gate": "approx_distinct_gate",
    "supersedence": "staging_supersedence",
    "quarantine": "quarantine_routing",
    "cdc_diff": "snapshot_diff",
    "merge_upsert": "merge_upsert_orders",
    "funnel": "event_funnel",
    "corpus_clean": "corpus_clean_decisions",
    # r10: latest_version_per_key ceded — top-1-per-key hard rows ride
    # topk_orders_per_customer; token_count_bpe ceded — token counting
    # rides the explode-count path (r12: explode_tokens, after
    # tfidf_tokens ceded)
    "version_sort": "topk_orders_per_customer",
    "token_count": "explode_tokens",
    # r10: the r9 training-data families gain hard-signal slots
    "leakage_audit": "split_ngram_leakage",
    "budget_selection": "corpus_budget_select",
}


def test_window_is_exactly_driver_sized():
    assert len(DRIVER_WINDOW) == DRIVER_WINDOW_SIZE
    assert len(set(DRIVER_WINDOW)) == DRIVER_WINDOW_SIZE


def test_window_names_lead_query_fns():
    names = list(query_fns())
    assert names[:DRIVER_WINDOW_SIZE] == list(DRIVER_WINDOW)
    # every registered query still appears exactly once
    assert sorted(names) == sorted(QUERIES)


def test_every_window_query_has_an_oracle():
    oracles = oracle_map()
    missing = [n for n in DRIVER_WINDOW if n not in oracles]
    assert not missing, f"window queries without DuckDB oracle: {missing}"


def test_every_family_has_a_window_slot():
    window = set(DRIVER_WINDOW)
    missing = {
        fam: name
        for fam, name in FAMILY_REPRESENTATIVES.items()
        if name not in window
    }
    assert not missing, f"families pushed out of the driver window: {missing}"


def test_oracle_map_order_matches_query_fns():
    qnames = [n for n in query_fns() if n in oracle_map()]
    assert list(oracle_map()) == qnames


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE name must be a registered query — a typo
    here silently becomes a per-round bench failure in the driver's
    artifact (bench.py skips-and-records unknown names as failures)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(root, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not unknown, f"bench HEADLINE names not registered: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate HEADLINE names"
