"""Normalization operators (SURVEY.md §2.2-2.3, §2.7-2.8).

Each operator is a pure ``DataFrame → DataFrame`` function; the whole
chain stays one Catalyst plan — no driver-side loops, no RDDs. The
reference's bash/Beam steps map as:

- dual-shape explode   ← README.md:209 (flat) + main.yml:132 (rounds)
- project/rename       ← README.md:210-216
- score array access   ← README.md:217-218
- winner/points        ← README.md:79-81
- lineage stamps       ← README.md:82-84, 219
- latest-version       ← main.yml:136-141 (`sort -V | tail -n1`)
- league lookup join   ← main.yml:144-148 + config/leagues.json
- alias standardize    ← README.md:109
- dedup                ← README.md:114
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..schemas import SCHEMA_VERSION


def explode_matches(docs: DataFrame) -> DataFrame:
    """P1/P2: one row per match, accepting BOTH document shapes.

    Flat documents carry ``matches``; rounds-nested documents carry
    ``rounds[].matches`` with the round name on the round object
    (reference main.yml:132). The two are coalesced into one match
    array before a single explode — a rounds match inherits its
    round's ``name`` when it lacks its own ``round`` field.
    """
    rounds_matches = F.flatten(
        F.transform(
            F.col("rounds"),
            lambda r: F.transform(
                r["matches"],
                lambda m: F.struct(
                    F.coalesce(m["round"], r["name"]).alias("round"),
                    m["date"].alias("date"),
                    m["time"].alias("time"),
                    m["team1"].alias("team1"),
                    m["team2"].alias("team2"),
                    m["score"].alias("score"),
                ),
            ),
        )
    )
    combined = F.coalesce(F.col("matches"), rounds_matches)
    return docs.withColumn("match", F.explode(combined)).drop(
        "matches", "rounds", "_corrupt_record"
    )


def latest_version_per_league_season(docs: DataFrame) -> DataFrame:
    """W1/O1: keep only the naturally-latest file version per
    (league_prefix, season_dir).

    The reference's ``ls | sort -V | tail -n1`` (main.yml:136-141) is a
    NATURAL version sort: ``en.1.v10.json`` beats ``en.1.v2.json``. We
    extract the numeric version (``v<digits>`` before ``.json``; absent
    → 0) and rank numerically — never lexicographically.
    """
    # regexp_extract yields '' on no-match; guard before the cast (ANSI mode).
    vstr = F.regexp_extract(F.col("file_name"), r"[.-]v([0-9]+)\.json$", 1)
    vnum = F.when(vstr == "", F.lit(0)).otherwise(vstr.cast("long"))
    w = Window.partitionBy("league_prefix", "season_dir").orderBy(
        F.desc("_version_num"), F.desc("file_name")
    )
    return (
        docs.withColumn("_version_num", vnum)
        .withColumn("_vrn", F.row_number().over(w))
        .where(F.col("_vrn") == 1)
        .drop("_version_num", "_vrn")
    )


def normalize_matches(exploded: DataFrame, source_commit: str = "unknown") -> DataFrame:
    """P3/P4 + F6-F9: project to the normalized schema
    (reference README.md:66-84).

    - league ← document ``name``; season ← document ``season`` falling
      back to the path-derived year (README.md:210-212, main.yml:110).
    - scores: null-safe array access with [None, None] default
      semantics (README.md:217-218) — Spark ``getItem`` is null-safe.
    - winner/points derived per README.md:79-81: 3/1/0 points.
    - lineage: schema_version, source_commit, ingestion_ts stamped on
      every row (README.md:82-84, 219).
    """
    m = F.col("match")
    ft_home = m["score"]["ft"].getItem(0)
    ft_away = m["score"]["ft"].getItem(1)
    winner = (
        F.when(ft_home.isNull() | ft_away.isNull(), F.lit(None).cast("string"))
        .when(ft_home > ft_away, "home")
        .when(ft_home < ft_away, "away")
        .otherwise("draw")
    )
    points_home = (
        F.when(winner == "home", 3).when(winner == "draw", 1).when(winner == "away", 0)
    )
    points_away = (
        F.when(winner == "away", 3).when(winner == "draw", 1).when(winner == "home", 0)
    )
    return exploded.select(
        F.col("name").alias("league"),
        F.coalesce(F.col("season"), F.col("season_dir")).alias("season"),
        m["round"].alias("round"),
        F.to_date(m["date"], "yyyy-MM-dd").alias("match_date"),
        m["time"].alias("match_time"),
        m["team1"].alias("team_home"),
        m["team2"].alias("team_away"),
        m["score"]["ht"].getItem(0).alias("ht_home"),
        m["score"]["ht"].getItem(1).alias("ht_away"),
        ft_home.alias("ft_home"),
        ft_away.alias("ft_away"),
        winner.alias("winner"),
        points_home.cast("long").alias("points_home"),
        points_away.cast("long").alias("points_away"),
        F.lit(SCHEMA_VERSION).alias("schema_version"),
        F.lit(source_commit).alias("source_commit"),
        F.col("file_path"),
        F.current_timestamp().alias("ingestion_ts"),
        F.col("league_prefix"),
    )


def join_league_names(df: DataFrame, leagues: DataFrame) -> DataFrame:
    """J1/P9: broadcast inner join league_prefix → canonical league name.

    Inner join drops unknown prefixes, exactly the workflow's skip of
    unmapped files (main.yml:144-148). The dim is ≤ KBs — broadcast,
    so the fact side never shuffles.
    """
    return df.join(
        F.broadcast(leagues), df.league_prefix == leagues.code, "inner"
    ).drop("code").withColumnsRenamed({"league": "league_raw", "name": "league"})


def standardize_teams(df: DataFrame, aliases: DataFrame) -> DataFrame:
    """J2: alias-standardization — broadcast LEFT join + coalesce,
    applied to home and away names (reference README.md:109, 73-74).
    Unmatched names pass through unchanged.
    """
    a_home = aliases.withColumnsRenamed(
        {"raw_name": "_h_raw", "canonical_name": "_h_canon"}
    )
    a_away = aliases.withColumnsRenamed(
        {"raw_name": "_a_raw", "canonical_name": "_a_canon"}
    )
    return (
        df.join(F.broadcast(a_home), df.team_home == a_home._h_raw, "left")
        .join(F.broadcast(a_away), df.team_away == a_away._a_raw, "left")
        .withColumn("team_home", F.coalesce(F.col("_h_canon"), F.col("team_home")))
        .withColumn("team_away", F.coalesce(F.col("_a_canon"), F.col("team_away")))
        .drop("_h_raw", "_h_canon", "_a_raw", "_a_canon")
    )


def dedup_matches(df: DataFrame) -> DataFrame:
    """U2: idempotence dedup on lineage + identity keys
    (reference README.md:96,114). Hash-shuffle on the key set; at
    scale this is the same shuffle the downstream season aggregation
    needs, so AQE can reuse locality.
    """
    return df.dropDuplicates(
        [
            "source_commit",
            "file_path",
            "league",
            "season",
            "round",
            "team_home",
            "team_away",
            "match_date",
        ]
    )


def flag_invalid(df: DataFrame) -> DataFrame:
    """P8: constraint validation flags (non-null teams, non-negative
    scores) — reference README.md:46,107 "validate & normalize".
    Kept as a flag column so callers route rather than drop.
    """
    bad = (
        F.col("team_home").isNull()
        | F.col("team_away").isNull()
        | (F.col("ft_home") < 0)
        | (F.col("ft_away") < 0)
    )
    return df.withColumn("is_valid", ~F.coalesce(bad, F.lit(False)))
