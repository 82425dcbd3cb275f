"""ML stretch (SURVEY §7.6): champion model with temporal evaluation.

Synthetic multi-season universe: team strength persists across
seasons, so prev-season features are predictive and the temporal
protocol (train ≤ T-2, validate T-1, test T) is exercised honestly.
"""

from __future__ import annotations

import random

import pytest

pyspark_ml = pytest.importorskip("pyspark.ml")

from soccer_data_pipeline_spark.ml import (  # noqa: E402
    baseline_points_leader,
    evaluate_topk,
    temporal_split,
    train_champion_model,
)
from soccer_data_pipeline_spark.ml.champion_model import predict_champions  # noqa: E402


@pytest.fixture(scope="module")
def feature_table(spark):
    """(league, season, team) rows with persistent team strength."""
    rng = random.Random(11)
    leagues = ["L1", "L2", "L3"]
    teams = {lg: [f"{lg}_T{i}" for i in range(10)] for lg in leagues}
    strength = {t: rng.uniform(0.5, 2.0) for lg in leagues for t in teams[lg]}
    rows = []
    for year in range(2010, 2020):
        for lg in leagues:
            season_pts = {
                t: int(30 * strength[t] + rng.gauss(0, 6)) for t in teams[lg]
            }
            champ = max(season_pts, key=lambda t: (season_pts[t], t))
            for t in teams[lg]:
                rows.append(
                    {
                        "league": lg,
                        "season": str(year),
                        "team": t,
                        "points": season_pts[t],
                        "goals_for": season_pts[t] + rng.randint(0, 10),
                        "is_champion": t == champ,
                    }
                )
    df = spark.createDataFrame(rows)
    # prev-season + mid-season features (trailing only — no leakage)
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    w = Window.partitionBy("league", "team").orderBy("season")
    return (
        df.withColumn("prev_points", F.lag("points").over(w))
        .withColumn("prev_goals_for", F.lag("goals_for").over(w))
        # mid-season points proxy: half the final points + noise-free
        .withColumn("season_points_mid", (F.col("points") / 2).cast("double"))
        .where(F.col("prev_points").isNotNull())
        .cache()
    )


def test_temporal_split_boundaries(spark, feature_table):
    import pyspark.sql.functions as F

    prepped = feature_table.withColumn(
        "season_key", F.col("season").cast("long")
    )
    train, val, test = temporal_split(prepped)
    assert train.agg(F.max("season_key")).first()[0] == 2017
    assert val.select("season_key").distinct().first()[0] == 2018
    assert test.select("season_key").distinct().first()[0] == 2019
    # no leakage: splits are disjoint
    assert train.count() + val.count() + test.count() == prepped.count()


def test_model_beats_or_matches_baseline(spark, feature_table):
    import pyspark.sql.functions as F

    prepped = feature_table.withColumn(
        "season_key", F.col("season").cast("long")
    )
    train, _val, test = temporal_split(prepped)
    model, asm = train_champion_model(train)
    preds = predict_champions(model, asm, test)
    metrics = evaluate_topk(preds, k=3)
    assert metrics["n_groups"] == 3  # 3 leagues in test season
    base = evaluate_topk(baseline_points_leader(test), k=3)
    # persistent-strength universe: model must be competitive with the
    # points-leader baseline on top-3 (both should be near-perfect)
    assert metrics["top3_accuracy"] >= base["top3_accuracy"] - 0.34
    assert metrics["top3_accuracy"] >= 0.66


def test_previous_champion_baseline_uses_lagged_label(spark):
    """The baseline must rank the actual prior champion first, even when
    the prior points leader is a different team (goal-diff tie-break
    scenario the mislabeled version got wrong — ADVICE r1)."""
    import pyspark.sql.functions as F

    from soccer_data_pipeline_spark.ml import baseline_previous_champion

    rows = [
        # 2018: B led on points but A was champion (tie-break).
        {"league": "L", "season": "2018", "team": "A", "prev_points": 50,
         "prev_goals_for": 60, "season_points_mid": 25.0, "is_champion": True},
        {"league": "L", "season": "2018", "team": "B", "prev_points": 55,
         "prev_goals_for": 58, "season_points_mid": 27.0, "is_champion": False},
        # 2019: the baseline should predict A (the 2018 champion), not B.
        {"league": "L", "season": "2019", "team": "A", "prev_points": 48,
         "prev_goals_for": 61, "season_points_mid": 24.0, "is_champion": False},
        {"league": "L", "season": "2019", "team": "B", "prev_points": 57,
         "prev_goals_for": 59, "season_points_mid": 28.0, "is_champion": True},
    ]
    ranked = baseline_previous_champion(spark.createDataFrame(rows))
    top_2019 = (
        ranked.where((F.col("season") == "2019") & (F.col("pred_rank") == 1))
        .select("team")
        .first()[0]
    )
    assert top_2019 == "A"


def test_walk_forward_cv_emits_per_fold_metrics(spark, feature_table):
    from soccer_data_pipeline_spark.ml import walk_forward_evaluate

    folds = walk_forward_evaluate(feature_table, min_train_seasons=6, k=3)
    # seasons 2011..2019 in the fixture (2010 dropped by prev_points
    # filter) -> folds for 2017, 2018, 2019
    assert [f["test_season"] for f in folds] == [2017, 2018, 2019]
    for f in folds:
        assert f["n_groups"] == 3
        assert 0.0 <= f["top1_accuracy"] <= 1.0
        assert f["top3_accuracy"] >= f["top1_accuracy"]


def test_evaluate_topk_reports_roc_auc(spark, feature_table):
    """r8 (VERDICT r7 #4): the champion evaluator reports ROC AUC —
    the last literal reference metric (README.md:136). Checked three
    ways: model scores give a finite [0,1] AUC, the rank-only baseline
    leg also gets one (AUC is rank-invariant, score = -pred_rank), and
    a hand-built 4-row frame reproduces the exact closed-form AUC."""
    import math

    import pyspark.sql.functions as F

    prepped = feature_table.withColumn("season_key", F.col("season").cast("long"))
    train, _val, test = temporal_split(prepped)
    model, asm = train_champion_model(train)
    m = evaluate_topk(predict_champions(model, asm, test), k=3)
    assert "roc_auc" in m and 0.0 <= m["roc_auc"] <= 1.0

    b = evaluate_topk(baseline_points_leader(test), k=3)
    assert "roc_auc" in b and 0.0 <= b["roc_auc"] <= 1.0

    # closed form: scores 4>3>2>1, labels 1,0,1,0 → AUC = 3/4
    rows = [
        ("L", "2020", "a", True, 1, 4.0),
        ("L", "2020", "b", False, 2, 3.0),
        ("L", "2020", "c", True, 3, 2.0),
        ("L", "2020", "d", False, 4, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "league string, season string, team string, is_champion boolean,"
        " pred_rank int, champion_prob double",
    )
    got = evaluate_topk(df, k=3)["roc_auc"]
    assert abs(got - 0.75) < 1e-9

    # single-class frame: NaN, not an exception
    one = evaluate_topk(df.where("is_champion"), k=3)["roc_auc"]
    assert math.isnan(one)
