"""[beyond-ref] End-to-end training-corpus build — the LLM-tier analog
of ``pipeline.run_soccer_etl``: ONE lazy composition from a raw
documents frame to the training-ready artifact frames.

    clean (quality → exact dedup → near-dup + verbatim-overlap clusters)
      → select (optional: budgeted keep set under a token budget,
                quality-score or DSIR-weight ranked)
      → split (hash-deterministic train/val/test)
      → shard (md5-bucket output sharding)
      → manifest (per split × shard audit)

Every stage is the same operator the registered queries hash-check
individually (``corpus_clean_decisions``, ``train_val_test_split``,
``shard_manifest``), so the composition inherits their oracle
coverage; the integration test additionally asserts the composed
decisions are row-identical to the registered query's.

All outputs are lazy DataFrames — the caller writes
``corpus.repartition("shard_id").write.partitionBy("split", ...)`` so
each output shard is one task's sequential write. Determinism is
end-to-end: every assignment is a pure function of doc_id/text, so a
re-run (or a backfill at 100 TB) reproduces byte-identical shards.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def md5_bucket(col, mod: int):
    """Deterministic integer bucket in [0, mod) from any key column —
    the split/sampling/shard family's hash (first 16 bits of md5 of the
    key's string form; engine-portable, seed-free, stable across
    re-executions by construction)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")
        % mod
    )


@dataclass
class CorpusBuildOutputs:
    # (doc_id, decision) — every input doc, keep/drop + reason. Under
    # token_budget the budget cut folds in as 'drop_budget' (ADVICE r9),
    # so corpus-count == decisions-keep-count holds unconditionally.
    decisions: DataFrame
    corpus: DataFrame  # kept docs + (split, shard_id) assignment columns
    manifest: DataFrame  # per (split, shard_id): n_docs, total_chars
    selection: DataFrame | None = None  # budgeted-selection ledger (token_budget runs)
    leakage: DataFrame | None = None  # split-leakage actions (leakage_ngram runs)
    contamination: DataFrame | None = None  # decontamination actions (benchmark runs)
    semantic: DataFrame | None = None  # SemDeDup actions (embeddings runs)


def run_corpus_build(
    docs: DataFrame,
    n_shards: int = 16,
    train_pct: int = 80,
    val_pct: int = 10,
    order_seed: str | None = None,
    token_budget: int | None = None,
    leakage_ngram: int | None = None,
    benchmark: DataFrame | None = None,
    contamination_ngram: int = 5,
    embeddings: DataFrame | None = None,
    semantic_tau: float = 0.35,
    selection: str = "quality",
    dsir_target_sources: tuple[str, ...] = ("src0", "src1", "src2", "src3"),
    **clean_kwargs,
) -> CorpusBuildOutputs:
    """Build the full corpus-assembly plan (lazy — caller writes).

    ``docs`` needs (doc_id, text, n_chars); ``clean_kwargs`` pass
    through to :func:`operators.corpus.clean_decisions` (minhash
    config, quality thresholds).

    ``order_seed`` (optional) adds a ``train_order`` column — the
    kept-corpus-wide deterministic shuffle position from
    :func:`operators.corpus.shuffle_order` — so a training loader
    streams each shard ORDER BY train_order and the epoch order is
    reproducible on any cluster (re-seeding re-shuffles; sharding
    stays put, so only the read order changes between experiments).

    ``token_budget`` (optional, VERDICT r8 #4) adds a SELECTION stage
    between cleaning and splitting: the post-clean docs are ranked by
    ``selection`` ("quality" = the integer per-mille score whose
    threshold↔token-budget curve ``quality_selection_curve`` publishes;
    "dsir" = the DSIR importance log-weight of
    ``dsir_importance_weights`` against ``dsir_target_sources``) and
    kept greedily best-first while the inclusive cumulative token count
    stays within the budget (doc-granular, two-phase prefix sum — see
    :func:`operators.corpus.budget_select`). Deterministic: pure
    function of (text, doc_id), so re-runs reproduce the identical
    kept set. The per-doc ledger lands in ``outputs.selection``, and
    the cut also folds into ``outputs.decisions`` as ``drop_budget``
    (precedence after the cleaning reasons — selection only ever
    rewrites 'keep' rows), so decisions remains the single
    authoritative keep/drop ledger.

    ``leakage_ngram`` (optional, VERDICT r9 #4) adds a LEAKAGE-REPAIR
    stage after split assignment: held-out (val/test) docs sharing at
    least one word ``leakage_ngram``-gram verbatim with any train doc
    are QUARANTINED (dropped from the corpus, folded into decisions as
    ``quarantine_leakage``) — the action stage for the
    ``split_ngram_leakage`` audit. One-pass-sound: the train side
    never changes, so the repaired corpus re-audits at leak_share = 0
    by construction (asserted end-to-end in tests). The per-doc action
    ledger lands in ``outputs.leakage``.

    ``benchmark`` (optional, r10) adds a DECONTAMINATION stage right
    after cleaning: corpus docs sharing at least one word
    ``contamination_ngram``-gram with any benchmark doc are dropped
    (folded into decisions as ``drop_contaminated``) — the action
    stage for the ``benchmark_contamination`` audit, placed BEFORE
    selection so contaminated docs never consume token budget. The
    per-doc action ledger lands in ``outputs.contamination``.

    ``embeddings`` (optional, r12 — VERDICT r11 #2) adds a SEMANTIC
    DEDUP stage after decontamination: SemDeDup keeper/drop decisions
    (operators/semdedup.semantic_actions — the code path the
    ``semantic_dedup_repair`` differential hash-checks) over the KEPT
    docs' embeddings, joined via the doc_id↔vec_id correspondence;
    non-keeper dup-cluster members are dropped (folded into decisions
    as ``drop_semantic``), placed BEFORE selection so semantic
    duplicates never consume token budget. The per-doc action ledger
    lands in ``outputs.semantic``. Post-action the corpus re-audits
    clean under the same learned cell assignment (asserted end-to-end
    in tests).
    """
    from .operators.corpus import (
        budget_select,
        clean_decisions,
        contamination_actions,
        dsir_log_weights,
        quality_pm,
        shuffle_order,
        split_leakage_actions,
    )

    decisions = clean_decisions(docs, **clean_kwargs)
    kept = docs.join(
        decisions.where(F.col("decision") == "keep"), "doc_id", "left_semi"
    )
    contamination_df = None
    if benchmark is not None:
        contamination_df = contamination_actions(
            kept, benchmark, n=contamination_ngram
        )
        dropped = (
            contamination_df.where(F.col("action") == "drop_contaminated")
            .select("doc_id")
            .withColumn("_ct", F.lit(True))
        )
        kept = kept.join(dropped, "doc_id", "left_anti")
        decisions = decisions.join(dropped, "doc_id", "left").select(
            "doc_id",
            F.when(F.coalesce(F.col("_ct"), F.lit(False)), "drop_contaminated")
            .otherwise(F.col("decision"))
            .alias("decision"),
        )
    semantic_df = None
    if embeddings is not None:
        from .operators.semdedup import semantic_actions

        vecs = embeddings.join(
            kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
        )
        semantic_df = semantic_actions(vecs, tau=semantic_tau).select(
            F.col("vec_id").alias("doc_id"), "action"
        )
        dropped_sem = (
            semantic_df.where(F.col("action") == "drop_semantic")
            .select("doc_id")
            .withColumn("_sd", F.lit(True))
        )
        kept = kept.join(dropped_sem, "doc_id", "left_anti")
        decisions = decisions.join(dropped_sem, "doc_id", "left").select(
            "doc_id",
            F.when(F.coalesce(F.col("_sd"), F.lit(False)), "drop_semantic")
            .otherwise(F.col("decision"))
            .alias("decision"),
        )
    selection_df = None
    if token_budget is not None:
        if selection == "quality":
            scored = quality_pm(kept)
        elif selection == "dsir":
            scored = dsir_log_weights(kept, dsir_target_sources).select(
                "doc_id",
                F.col("n_tokens").alias("n_tok"),
                F.col("w").alias("score"),
            )
        else:
            raise ValueError(f"unknown selection scorer: {selection!r}")
        selection_df = budget_select(scored, token_budget)
        kept = kept.join(
            selection_df.where(F.col("selected")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        # fold the budget cut into the decisions ledger (ADVICE r9): a
        # clean-kept doc the selection excluded reads 'drop_budget', so
        # the decisions↔corpus reconciliation invariant (corpus count ==
        # decisions keep count) holds under token_budget too. Selection
        # only scored clean-kept docs, so the left join can only rewrite
        # 'keep' rows.
        cut = (
            selection_df.where(~F.col("selected"))
            .select("doc_id")
            .withColumn("_cut", F.lit(True))
        )
        decisions = decisions.join(cut, "doc_id", "left").select(
            "doc_id",
            F.when(F.coalesce(F.col("_cut"), F.lit(False)), "drop_budget")
            .otherwise(F.col("decision"))
            .alias("decision"),
        )
    split_bucket = md5_bucket(F.col("doc_id"), 100)
    split_assign = (
        F.when(split_bucket < train_pct, "train")
        .when(split_bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    leakage_df = None
    if leakage_ngram is not None:
        # repair BEFORE shard/order assignment so the quarantined docs
        # never occupy shard slots or training-order positions; split
        # assignment is a pure doc_id hash, so computing it here and
        # again below lands every surviving doc in the same split.
        leakage_df = split_leakage_actions(
            kept.select("doc_id", "text", split_assign.alias("split")),
            n=leakage_ngram,
        )
        quarantined = (
            leakage_df.where(F.col("action") == "quarantine_leakage")
            .select("doc_id")
            .withColumn("_ql", F.lit(True))
        )
        kept = kept.join(quarantined, "doc_id", "left_anti")
        decisions = decisions.join(quarantined, "doc_id", "left").select(
            "doc_id",
            F.when(F.coalesce(F.col("_ql"), F.lit(False)), "quarantine_leakage")
            .otherwise(F.col("decision"))
            .alias("decision"),
        )
    corpus = kept.select(
        "*",
        split_assign.alias("split"),
        md5_bucket(F.col("doc_id"), n_shards).alias("shard_id"),
    )
    if order_seed is not None:
        order = shuffle_order(kept, seed=order_seed).select(
            "doc_id", F.col("global_pos").alias("train_order")
        )
        corpus = corpus.join(order, "doc_id")
    manifest = corpus.groupBy("split", "shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    return CorpusBuildOutputs(
        decisions=decisions,
        corpus=corpus,
        manifest=manifest,
        selection=selection_df,
        leakage=leakage_df,
        contamination=contamination_df,
        semantic=semantic_df,
    )
