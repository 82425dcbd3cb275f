"""Trailing-only feature frames (no label leakage) on the soccer domain."""

from __future__ import annotations

import pytest

from soccer_data_pipeline_spark.operators.features import (
    prev_season_features,
    team_form_features,
)
from soccer_data_pipeline_spark.pipeline import run_soccer_etl
from soccer_data_pipeline_spark.sources.lookup import leagues_from_pairs

from .fixtures_soccer import LEAGUES, write_fixture_tree


@pytest.fixture(scope="module")
def matches(spark, tmp_path_factory):
    root = write_fixture_tree(str(tmp_path_factory.mktemp("raw_feat")))
    out = run_soccer_etl(spark, root, leagues_from_pairs(spark, LEAGUES))
    return out.matches_normalized.where("is_valid").cache()


def test_form_features_trailing_only(matches):
    feats = team_form_features(matches, window_n=5).collect()
    by_team = {}
    for r in sorted(feats, key=lambda r: (r.team, r.match_date)):
        by_team.setdefault((r.league, r.team), []).append(r)
    for rows in by_team.values():
        # first appearance: no history → nulls / zero counts
        first = rows[0]
        assert first.matches_before == 0
        assert first.form_points_avg_5 is None
        # later appearances: cumulative points equals sum of PRIOR rows
        running = 0
        for r in rows:
            assert (r.season_points_before or 0) == running
            running += r.points


def test_prev_season_lag(spark):
    rows = [
        ("L", "2015", "A", 10, 20, 5),
        ("L", "2016", "A", 12, 22, 6),
        ("L", "2017", "A", 9, 18, 7),
        ("L", "2016", "B", 30, 40, 10),
    ]
    df = spark.createDataFrame(
        rows, ["league", "season", "team", "points", "goals_for", "goals_against"]
    )
    out = {(r.team, r.season): r for r in prev_season_features(df).collect()}
    assert out[("A", "2015")].prev_points is None
    assert out[("A", "2016")].prev_points == 10
    assert out[("A", "2017")].prev_points == 12
    assert out[("A", "2017")].points_delta == -3
    assert out[("B", "2016")].prev_points is None
