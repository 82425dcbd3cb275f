"""Champion prediction — the reference's BigQuery ML surface re-done
on MLlib (reference README.md:132-136: CREATE MODEL / ML.EVALUATE;
temporal evaluation README.md:141-143).

Methodology parity:

- temporal splits, never random: train ≤ T-2, validate T-1, test T
  ("walk-forward" ready via repeated calls with shifted T).
- metrics: top-1 / top-3 champion accuracy per (league, season)
  (README.md:136).
- naive baselines the model must beat: previous champion, points
  leader at feature time (README.md:143).
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

FEATURES = ["prev_points", "prev_goals_for", "season_points_mid"]


def temporal_split(
    df: DataFrame, season_col: str = "season_key"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """train ≤ T-2 | validate = T-1 | test = T (T = max season)."""
    t = df.agg(F.max(season_col)).first()[0]
    return (
        df.where(F.col(season_col) <= t - 2),
        df.where(F.col(season_col) == t - 1),
        df.where(F.col(season_col) == t),
    )


def _prep(features_df: DataFrame) -> DataFrame:
    out = features_df.withColumn(
        "season_key", F.regexp_extract("season", r"^([0-9]{4})", 1).cast("long")
    ).withColumn("label", F.col("is_champion").cast("double"))
    for c in FEATURES:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
    return out


def train_champion_model(train_df: DataFrame):
    """Fit LR on the (tiny) per-team-season feature table.

    The feature table is one row per (league, season, team) — even a
    100 TB match corpus reduces to millions of rows here, so a single
    MLlib fit is appropriate; the heavy lifting (feature extraction)
    stayed distributed upstream.
    """
    asm = VectorAssembler(inputCols=FEATURES, outputCol="features")
    lr = LogisticRegression(maxIter=50, regParam=0.01)
    prepped = asm.transform(_prep(train_df))
    model = lr.fit(prepped)
    return model, asm


def predict_champions(model, asm, df: DataFrame) -> DataFrame:
    """Rank teams per (league, season) by champion probability."""
    from pyspark.ml.functions import vector_to_array

    prob_up = F.element_at(vector_to_array(F.col("probability")), 2)
    scored = model.transform(asm.transform(_prep(df))).withColumn(
        "champion_prob", prob_up
    )
    w = Window.partitionBy("league", "season").orderBy(
        F.desc("champion_prob"), F.asc("team")
    )
    return scored.withColumn("pred_rank", F.row_number().over(w))


def evaluate_topk(predictions: DataFrame, k: int = 3) -> dict[str, float]:
    """top-1 / top-k champion accuracy per (league, season), plus ROC
    AUC (reference README.md:136 names "top-1 & top-3 accuracy, ROC" —
    this is the ROC leg).

    AUC scores come from ``champion_prob`` when the frame was scored by
    the model (a global score, so the pooled AUC is exact); for the
    rank-only baselines the score is ``-pred_rank``, a PER-GROUP rank —
    rank-invariance of AUC holds within one (league, season) group, but
    pooling ranks across groups is not order-preserving of any global
    score, so the baseline figure is a cross-group rank-pooled
    approximation, comparable to the model's pooled-probability AUC
    only as a coarse reference (ADVICE r8). Returns NaN AUC on a
    single-class frame (AUC undefined), never raises — walk-forward
    folds over short histories can be one-class.
    """
    per_group = predictions.groupBy("league", "season").agg(
        F.max(F.when((F.col("pred_rank") == 1) & F.col("is_champion"), 1).otherwise(0)).alias("hit1"),
        F.max(
            F.when((F.col("pred_rank") <= k) & F.col("is_champion"), 1).otherwise(0)
        ).alias("hitk"),
    )
    row = per_group.agg(
        F.avg("hit1").alias("top1"), F.avg("hitk").alias("topk"), F.count("*").alias("n")
    ).first()
    out = {"top1_accuracy": row.top1, f"top{k}_accuracy": row.topk, "n_groups": row.n}

    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    score = (
        F.col("champion_prob").cast("double")
        if "champion_prob" in predictions.columns
        else (-F.col("pred_rank")).cast("double")
    )
    scored = predictions.select(
        score.alias("_score"), F.col("is_champion").cast("double").alias("_label")
    )
    n_classes = scored.select("_label").distinct().count()
    if n_classes < 2:
        out["roc_auc"] = float("nan")
    else:
        ev = BinaryClassificationEvaluator(
            rawPredictionCol="_score", labelCol="_label", metricName="areaUnderROC"
        )
        out["roc_auc"] = ev.evaluate(scored)
    return out


def baseline_points_leader(features_df: DataFrame) -> DataFrame:
    """Predict the team leading on mid-season points (README.md:143)."""
    w = Window.partitionBy("league", "season").orderBy(
        F.desc("season_points_mid"), F.asc("team")
    )
    return _prep(features_df).withColumn("pred_rank", F.row_number().over(w))


def baseline_previous_champion(features_df: DataFrame) -> DataFrame:
    """Predict last season's champion wins again (README.md:143).

    Ranks by the LAGGED is_champion flag over the team's season-ordered
    history (the actual previous champion — not the previous points
    leader, which can differ under goal-difference tie-breaks), with
    prev_points as the fallback ordering for teams that have no
    prior-season label (e.g. promoted teams / first recorded season).
    """
    prepped = _prep(features_df)
    w_hist = Window.partitionBy("league", "team").orderBy("season_key")
    prev_champ = F.lag(F.col("is_champion").cast("int")).over(w_hist)
    scored = prepped.withColumn("prev_is_champion", F.coalesce(prev_champ, F.lit(0)))
    w = Window.partitionBy("league", "season").orderBy(
        F.desc("prev_is_champion"), F.desc("prev_points"), F.asc("team")
    )
    return scored.withColumn("pred_rank", F.row_number().over(w))


def walk_forward_evaluate(
    features_df: DataFrame, min_train_seasons: int = 2, k: int = 3
) -> list[dict[str, float]]:
    """Rolling-origin (walk-forward) CV (reference README.md:141-142):
    for each season T with ≥ min_train_seasons earlier seasons, fit on
    every season < T and evaluate on T. Returns one metrics dict per
    fold (test_season, top1/topk accuracy, n_groups).

    The driver-side loop is over SEASONS (a handful), not data — each
    fold's fit/score runs distributed; only the per-fold scalar metrics
    come back to the driver.
    """
    prepped = _prep(features_df)
    seasons = sorted(
        r[0] for r in prepped.select("season_key").distinct().collect()
    )
    folds: list[dict[str, float]] = []
    for t in seasons[min_train_seasons:]:
        model, asm = train_champion_model(prepped.where(F.col("season_key") < t))
        preds = predict_champions(model, asm, prepped.where(F.col("season_key") == t))
        metrics = evaluate_topk(preds, k=k)
        metrics["test_season"] = t
        folds.append(metrics)
    return folds
