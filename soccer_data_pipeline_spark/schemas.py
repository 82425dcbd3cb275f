"""Declared schemas — the engine never infers schemas in production.

The reference mandates a fixed, versioned schema (reference
``README.md:66-84``: normalized match schema with ``schema_version``;
``README.md:107``: input validated against ``schema.json``; the Beam
Parquet writer declares its schema field-by-field, ``README.md:231-243``).
This module is the single source of truth for every table shape.
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMA_VERSION = "1.0"

# ---------------------------------------------------------------------------
# openfootball raw input (reference README.md:206-220 / main.yml:132)
# Two document shapes exist in the wild; the engine accepts both and
# coalesces them (SURVEY.md §1.3).
# ---------------------------------------------------------------------------

SCORE = T.StructType(
    [
        # ht often absent (reference README.md:61); ft may be null for
        # unplayed matches.
        T.StructField("ht", T.ArrayType(T.LongType()), True),
        T.StructField("ft", T.ArrayType(T.LongType()), True),
    ]
)

MATCH = T.StructType(
    [
        T.StructField("round", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
        T.StructField("time", T.StringType(), True),
        T.StructField("team1", T.StringType(), True),
        T.StructField("team2", T.StringType(), True),
        T.StructField("score", SCORE, True),
    ]
)

ROUND = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("matches", T.ArrayType(MATCH), True),
    ]
)

# Superset document schema covering both the flat variant
# (reference README.md:206-220: top-level ``matches``) and the
# rounds-nested variant (reference main.yml:132: ``.name and .rounds``).
# Reading with one superset schema means a single scan handles both.
MATCHES_RAW = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("season", T.StringType(), True),
        T.StructField("matches", T.ArrayType(MATCH), True),
        T.StructField("rounds", T.ArrayType(ROUND), True),
        # PERMISSIVE-mode capture of malformed documents (P5).
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Normalized warehouse schema (reference README.md:66-84)
# ---------------------------------------------------------------------------

MATCHES_NORMALIZED = T.StructType(
    [
        T.StructField("league", T.StringType(), False),
        T.StructField("season", T.StringType(), True),
        T.StructField("round", T.StringType(), True),
        T.StructField("match_date", T.DateType(), True),
        T.StructField("match_time", T.StringType(), True),
        T.StructField("team_home", T.StringType(), True),
        T.StructField("team_away", T.StringType(), True),
        T.StructField("ht_home", T.LongType(), True),
        T.StructField("ht_away", T.LongType(), True),
        T.StructField("ft_home", T.LongType(), True),
        T.StructField("ft_away", T.LongType(), True),
        T.StructField("winner", T.StringType(), True),
        T.StructField("points_home", T.LongType(), True),
        T.StructField("points_away", T.LongType(), True),
        T.StructField("schema_version", T.StringType(), False),
        T.StructField("source_commit", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("ingestion_ts", T.TimestampType(), False),
    ]
)

# Lookup dims (reference config/leagues.json:1-56; README.md:109)
LEAGUES = T.StructType(
    [
        T.StructField("code", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

TEAM_ALIASES = T.StructType(
    [
        T.StructField("raw_name", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver star schema (/root/testdata, FIXTURES.md §B) — declared so scans
# never rely on footer inference in tests/bench hot paths.
# ---------------------------------------------------------------------------

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
