"""Tests for operators/similarity.near_dup_pairs_banded (banded sign-LSH).

The registered embedding_near_dup query gates recall in-plan and is
driver-checked; these tests pin the operator-level contracts — recall
against the exact label-blocked pairs, candidate soundness (LSH finds
only true-threshold pairs, since cosine is verified post-blocking), and
the hot-bucket cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from soccer_data_pipeline_spark.operators.similarity import (
    cosine as cosine_expr,
    near_dup_pairs_banded,
)
from soccer_data_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.35


def _exact_pairs(emb):
    e = emb.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6)
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= THRESHOLD)
    )


def test_recall_meets_documented_floor(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {(r.vec_a, r.vec_b) for r in _exact_pairs(emb).collect()}
    found = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs_banded(emb, threshold=THRESHOLD).collect()
    }
    assert exact, "fixture should contain near-dup pairs"
    # found pairs are sound: every emitted pair truly clears the threshold
    assert found <= exact
    recall = len(found & exact) / len(exact)
    # documented measurement: 0.929 @sf0.001 (floor 0.8 in the gate query)
    assert recall >= 0.8, f"recall {recall:.3f} below gate floor"


def test_hot_bucket_cap_prunes_and_stays_sound(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    uncapped = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs_banded(emb, threshold=THRESHOLD).collect()
    }
    # cap=2 drops almost every bucket (avg bucket ~12 at this sf) so the
    # pruning is observable; a pair can still survive via a sub-cap bucket
    capped = {
        (r.vec_a, r.vec_b)
        for r in near_dup_pairs_banded(
            emb, threshold=THRESHOLD, max_bucket_size=2
        ).collect()
    }
    # cap only removes candidates (bounded pair space), never invents them
    assert capped <= uncapped
    assert len(capped) < len(uncapped)
