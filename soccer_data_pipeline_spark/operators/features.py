"""Feature engineering for the modeling layer (reference README.md:135:
"rolling averages, prev season performance"; temporal-eval intent
README.md:141-143).

Every frame is TRAILING and excludes the current row — features at
match time must not see the match's own outcome (label leakage), the
property the reference's temporal-holdout evaluation depends on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from .aggregates import unpivot_per_team


def team_form_features(matches: DataFrame, window_n: int = 5) -> DataFrame:
    """Per (team, match): trailing form over the previous ``window_n``
    games — points/goals averages and cumulative season points
    *before* this match (W2 + W4).
    """
    per_team = unpivot_per_team(matches).where(F.col("points").isNotNull())
    w_order = Window.partitionBy("league", "season", "team").orderBy(
        "match_date", "team"
    )
    trailing = w_order.rowsBetween(-window_n, -1)
    cumulative = w_order.rowsBetween(Window.unboundedPreceding, -1)
    return per_team.select(
        "league",
        "season",
        "team",
        "match_date",
        "points",
        F.avg("points").over(trailing).alias(f"form_points_avg_{window_n}"),
        F.avg("goals_for").over(trailing).alias(f"form_gf_avg_{window_n}"),
        F.avg("goals_against").over(trailing).alias(f"form_ga_avg_{window_n}"),
        F.sum("points").over(cumulative).alias("season_points_before"),
        F.count("points").over(cumulative).alias("matches_before"),
    )


def prev_season_features(season_results: DataFrame) -> DataFrame:
    """W3/J4: previous-season performance via lag over a season-ordered
    window — the self-join-free form of the reference's
    "previous season performance" feature (README.md:135).

    Seasons order lexicographically for zero-padded year formats
    ("2015/16" < "2016/17"); numeric-prefix extraction covers mixed
    formats.
    """
    season_key = F.regexp_extract("season", r"^([0-9]{4})", 1).cast("long")
    w = Window.partitionBy("league", "team").orderBy(season_key)
    return season_results.select(
        "league",
        "season",
        "team",
        "points",
        "goals_for",
        "goals_against",
        F.lag("points").over(w).alias("prev_points"),
        F.lag("goals_for").over(w).alias("prev_goals_for"),
        (F.col("points") - F.lag("points").over(w)).alias("points_delta"),
    )
