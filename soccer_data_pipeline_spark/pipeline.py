"""End-to-end soccer ETL (SURVEY.md §3 E1+E2 re-designed Spark-first).

raw JSON dir → scan (dual shape, PERMISSIVE) → quarantine routing →
latest-version-per-key → explode → normalize → league lookup join →
team-alias standardization → dedup → validity flag.

The whole chain is ONE Catalyst plan per output: the bash workflow's
per-file subprocess loops (main.yml:102-156) and the Beam ParDo
(README.md:206-228) collapse into declarative transformations; the
only wide operations are the latest-version window and the final
dedup — both hash-partitioned by (league, season)-derived keys, which
is also the downstream aggregation key, so AQE reuses the layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup_matches,
    explode_matches,
    flag_invalid,
    join_league_names,
    latest_version_per_league_season,
    normalize_matches,
    standardize_teams,
)
from .operators.aggregates import add_champion, season_results
from .sources.json_source import read_matches_raw, split_quarantine


@dataclass
class EtlOutputs:
    matches_normalized: DataFrame
    quarantine: DataFrame
    season_results: DataFrame


def run_soccer_etl(
    spark: SparkSession,
    raw_path: str,
    leagues: DataFrame,
    aliases: DataFrame | None = None,
    source_commit: str = "unknown",
) -> EtlOutputs:
    """Build the full ETL plan (lazy — caller writes/collects)."""
    raw = read_matches_raw(spark, raw_path)
    valid, quarantine = split_quarantine(raw)
    latest = latest_version_per_league_season(valid)
    normalized = normalize_matches(explode_matches(latest), source_commit)
    named = join_league_names(normalized, leagues)
    if aliases is not None:
        named = standardize_teams(named, aliases)
    deduped = flag_invalid(dedup_matches(named))
    results = add_champion(season_results(deduped.where("is_valid")))
    return EtlOutputs(
        matches_normalized=deduped,
        quarantine=quarantine,
        season_results=results,
    )
