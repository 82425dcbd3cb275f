from .normalize import (
    explode_matches,
    normalize_matches,
    latest_version_per_league_season,
    join_league_names,
    standardize_teams,
    dedup_matches,
    flag_invalid,
)
from .aggregates import unpivot_per_team, season_results, add_champion

__all__ = [
    "explode_matches",
    "normalize_matches",
    "latest_version_per_league_season",
    "join_league_names",
    "standardize_teams",
    "dedup_matches",
    "flag_invalid",
    "unpivot_per_team",
    "season_results",
    "add_champion",
]
