"""Golden end-to-end tests for the soccer ETL (SURVEY.md §5.2) plus
property invariants (§5.3): points conservation, W+D+L=played,
idempotence under re-run.
"""

from __future__ import annotations

import pytest

from soccer_data_pipeline_spark.pipeline import run_soccer_etl
from soccer_data_pipeline_spark.sources.lookup import leagues_from_pairs, team_aliases

from .fixtures_soccer import ALIASES, LEAGUES, write_fixture_tree


@pytest.fixture(scope="module")
def etl(spark, tmp_path_factory):
    root = write_fixture_tree(str(tmp_path_factory.mktemp("raw")))
    leagues = leagues_from_pairs(spark, LEAGUES)
    aliases = team_aliases(spark, ALIASES)
    out = run_soccer_etl(spark, root, leagues, aliases, source_commit="abc123")
    matches = out.matches_normalized.cache()
    results = out.season_results.cache()
    return out, matches.collect(), results.collect()


def test_quarantine_routes_bad_files(spark, etl):
    out, _, _ = etl
    quarantined = out.quarantine.collect()
    # malformed fr.1.json + missing-fields es.1.json
    assert len(quarantined) == 2
    names = {r.file_name for r in quarantined}
    assert names == {"fr.1.json", "es.1.json"}


def test_normalized_matches(etl):
    _, matches, _ = etl
    # en: 5 matches from v2 (stale v1 dropped), de: 4; zz dropped by J1
    assert len(matches) == 9
    leagues = {m.league for m in matches}
    assert leagues == {"English Premier League", "Deutsche Bundesliga"}
    # stale version must not leak through
    assert not any(m.team_home == "WRONG TEAM" for m in matches)
    # alias standardization applied to both sides
    teams = {m.team_home for m in matches} | {m.team_away for m in matches}
    assert "Manchester United" in teams and "Man Utd" not in teams
    # rounds-nested round name inherited
    de = [m for m in matches if m.league == "Deutsche Bundesliga"]
    assert {m.round for m in de} == {"Spieltag 1", "Spieltag 2"}
    # winner/points derivation (README.md:79-81)
    arsenal_home = next(
        m for m in matches if m.team_home == "Arsenal" and m.round == "Matchday 1"
    )
    assert (arsenal_home.winner, arsenal_home.points_home, arsenal_home.points_away) == (
        "home",
        3,
        0,
    )
    # unplayed match: null scores → null winner, null points
    unplayed = next(m for m in matches if m.round == "Matchday 3")
    assert unplayed.winner is None and unplayed.ft_home is None
    # lineage stamps
    assert all(m.source_commit == "abc123" and m.schema_version == "1.0" for m in matches)
    # half-time access (P4): present for the one match that has ht
    assert arsenal_home.ht_home == 1 and arsenal_home.ht_away == 0


def test_season_results_and_champion(etl):
    _, _, results = etl
    table = {(r.league, r.team): r for r in results}
    ars = table[("English Premier League", "Arsenal")]
    assert (ars.points, ars.wins, ars.draws, ars.losses) == (6, 2, 0, 0)
    assert ars.matches_played == 2  # unplayed match not counted
    assert ars.is_champion
    bay = table[("Deutsche Bundesliga", "Bayern")]
    assert (bay.points, bay.goals_for, bay.goals_against) == (6, 3, 0)
    assert bay.is_champion
    champions = {r.team for r in results if r.is_champion}
    assert champions == {"Arsenal", "Bayern"}


def test_property_invariants(etl):
    _, matches, results = etl
    # points conservation: played matches award 3 (decisive) or 2 (draw)
    for m in matches:
        if m.winner is not None:
            assert m.points_home + m.points_away in (2, 3)
        else:
            assert m.points_home is None and m.points_away is None
    # W+D+L = matches_played per team
    for r in results:
        assert r.wins + r.draws + r.losses == r.matches_played


def test_idempotence_rerun(spark, tmp_path_factory):
    """README.md:96 idempotence: running the ETL twice ≡ once."""
    root = write_fixture_tree(str(tmp_path_factory.mktemp("raw2")))
    leagues = leagues_from_pairs(spark, LEAGUES)
    once = run_soccer_etl(spark, root, leagues, source_commit="c1").matches_normalized
    # same files read again and unioned = a re-run's input; dedup collapses
    from soccer_data_pipeline_spark.operators import dedup_matches

    twice = dedup_matches(once.unionByName(once))
    assert twice.count() == once.count()


def test_quarantine_reasons_and_deadletter(spark, etl, tmp_path):
    out, _, _ = etl
    reasons = {r.file_name: r.quarantine_reason for r in out.quarantine.collect()}
    assert reasons["fr.1.json"] == "malformed_json"
    assert reasons["es.1.json"] == "missing_name"

    from soccer_data_pipeline_spark.sources.json_source import write_quarantine

    dl = str(tmp_path / "deadletter")
    write_quarantine(out.quarantine, dl)
    back = spark.read.parquet(dl)
    assert back.count() == 2
    assert set(back.columns) == {
        "file_path",
        "file_name",
        "quarantine_reason",
        "corrupt_record",
    }
