"""Dimension/lookup sources (S5 in SURVEY.md §2.1).

The league code→name map (reference config/leagues.json:1-56, consumed
at main.yml:144) and the team-alias standardization lookup (reference
README.md:109). Both are tiny (≤ thousands of rows at any scale) —
always broadcast; the join never shuffles the fact side.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..schemas import LEAGUES, TEAM_ALIASES


def leagues_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Load a ``{"code": "League Name", ...}`` map file as a DataFrame.

    The reference's config/leagues.json is one JSON object, not
    records — parse driver-side (it is a config file, not data) and
    parallelize. Stays a broadcast dim (J1, main.yml:144-148).
    """
    with open(path) as fh:
        mapping = json.load(fh)
    rows = [(code, name) for code, name in sorted(mapping.items())]
    return spark.createDataFrame(rows, LEAGUES)


def leagues_from_pairs(spark: SparkSession, pairs: list[tuple[str, str]]) -> DataFrame:
    return spark.createDataFrame(sorted(pairs), LEAGUES)


def team_aliases(spark: SparkSession, pairs: list[tuple[str, str]]) -> DataFrame:
    """Alias lookup: raw_name → canonical_name (reference README.md:109)."""
    return spark.createDataFrame(sorted(pairs), TEAM_ALIASES)
