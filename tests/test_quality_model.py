"""Distilled corpus-quality classifier (ml/quality_model.py): trains on
the audited gate-chain decisions, evaluates on a deterministic held-out
bucket — the cheap-first-pass-filter production pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from soccer_data_pipeline_spark.ml.quality_model import (
    evaluate_quality_classifier,
    quality_features,
    split_bucket,
    train_quality_classifier,
)
from soccer_data_pipeline_spark.operators.corpus import clean_decisions
from soccer_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_features_are_narrow_and_bounded(spark):
    docs = load_table(spark, SF, "documents")
    feats = quality_features(docs)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one narrow projection
    row = feats.where("n_chars > 0").first()
    for c in ("punct_ratio", "digit_ratio", "space_ratio", "upper_ratio"):
        assert 0.0 <= row[c] <= 1.0


def test_split_bucket_deterministic_and_sized(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    a = {r.doc_id: r.is_holdout for r in split_bucket(docs).collect()}
    b = {r.doc_id: r.is_holdout for r in split_bucket(docs).collect()}
    assert a == b
    share = sum(a.values()) / len(a)
    assert 0.1 < share < 0.3  # ~20% holdout


def test_distilled_gate_learns_the_decisions(spark):
    """The classifier must beat chance at reproducing the full gate
    chain's keep/drop on the held-out bucket (the decisions mix
    learnable quality gates with dedup effects, so we demand a clear
    but not perfect signal)."""
    docs = load_table(spark, SF, "documents")
    labels = clean_decisions(docs).select(
        "doc_id", (F.col("decision") == "keep").alias("keep")
    )
    model, asm, train, holdout = train_quality_classifier(docs, labels)
    metrics = evaluate_quality_classifier(model, holdout)
    assert metrics["n_holdout"] > 30
    assert metrics["auc"] >= 0.60, metrics
    # both classes must actually appear in the holdout for AUC to mean anything
    labels_present = {k[0] for k in metrics["confusion"]}
    assert labels_present == {0, 1}, metrics
