"""Aggregation layer (SURVEY.md §2.4-2.5): season results + champion.

The reference's season_results sketch (README.md:252-266) compares a
``team`` column against ``team_home``/``team_away`` inside CASE
expressions — and its own caveat (README.md:268) admits per-team
conditional aggregation is the correctness trap. The robust form is
A4: unpivot each match into two per-team perspective rows *first*,
then a plain GROUP BY — one shuffle, no conditional-join subtleties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F


def unpivot_per_team(matches: DataFrame) -> DataFrame:
    """A4: match → (home-perspective, away-perspective) rows.

    Output grain: (league, season, team) per match with goals for /
    against and points from that team's perspective. Uses ``stack`` —
    a narrow transformation, the row doubling happens map-side before
    the aggregation shuffle.
    """
    return matches.selectExpr(
        "league",
        "season",
        "match_date",
        "winner",
        """stack(2,
             team_home, ft_home, ft_away, points_home, 'home',
             team_away, ft_away, ft_home, points_away, 'away'
           ) AS (team, goals_for, goals_against, points, side)""",
    )


def season_results(matches: DataFrame) -> DataFrame:
    """A1-A3: league table per (league, season, team)
    (reference README.md:252-266).

    Unplayed matches (null winner/points) count toward neither points
    nor W/D/L nor matches_played — mirroring the NULL-ignoring SUMs of
    the reference SQL.
    """
    per_team = unpivot_per_team(matches)
    return per_team.groupBy("league", "season", "team").agg(
        F.sum("points").alias("points"),
        F.sum(F.when(F.col("points") == 3, 1).otherwise(0))
        .cast("long")
        .alias("wins"),
        F.sum(F.when(F.col("points") == 1, 1).otherwise(0))
        .cast("long")
        .alias("draws"),
        F.sum(
            F.when(F.col("points") == 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("losses"),
        F.sum("goals_for").alias("goals_for"),
        F.sum("goals_against").alias("goals_against"),
        F.count(F.col("points")).alias("matches_played"),
    )


def add_champion(results: DataFrame) -> DataFrame:
    """A6/W1: champion label — top-1 per (league, season) by points,
    tie-break goal difference then goals_for then team name
    (reference README.md:277, 288; FIXTURES.md §A6 documents the
    tie-break order).
    """
    gd = F.col("goals_for") - F.col("goals_against")
    w = Window.partitionBy("league", "season").orderBy(
        F.desc("points"), F.desc(gd), F.desc("goals_for"), F.asc("team")
    )
    return (
        results.withColumn("goal_diff", gd)
        .withColumn("_rank", F.row_number().over(w))
        .withColumn("is_champion", F.col("_rank") == 1)
        .drop("_rank")
    )
