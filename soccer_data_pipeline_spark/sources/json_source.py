"""Raw-zone JSON document source (S2-S5, P5-P6 in SURVEY.md §2.1-2.2).

Reads openfootball-shaped JSON documents (reference README.md:206-220
flat shape; main.yml:132 rounds-nested shape) with one superset schema,
PERMISSIVE mode and a corrupt-record column — the Spark-native form of
the workflow's `jq empty` validity filter (main.yml:127-130).

Path-derived metadata (league prefix from filename, season year from
directory — main.yml:109-120) comes from ``input_file_name()`` +
``regexp_extract``, so file layout is data, not driver-side loops. At
100 TB the listing is distributed (Spark's InMemoryFileIndex);
zero-byte files contribute no rows and are reported via the file
inventory helper rather than a per-file driver check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import MATCHES_RAW


def read_matches_raw(spark: SparkSession, path: str) -> DataFrame:
    """Scan a raw-zone directory of league-season JSON documents.

    Returns one row per document with columns: the superset schema
    (name, season, matches, rounds, _corrupt_record) plus
    ``file_path``, ``file_name``, ``league_prefix``, ``season_dir``.

    - S2 recursive discovery: glob handled by the path argument +
      ``recursiveFileLookup`` (reference main.yml:79,117).
    - S3 document scan with explicit schema (reference README.md:227).
    - S4 path metadata: league code = leading alpha run of the file
      name (main.yml:56-58,118-120); season = first 4-digit run in the
      enclosing directory (main.yml:110-115).
    - P5 malformed-JSON capture: PERMISSIVE + _corrupt_record.
    """
    df = (
        spark.read.schema(MATCHES_RAW)
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("recursiveFileLookup", "true")
        .json(path)
    )
    file_path = F.input_file_name()
    file_name = F.regexp_extract(file_path, r"([^/]+)$", 1)
    season_dir = F.regexp_extract(file_path, r"([^/]+)/[^/]+$", 1)
    return df.select(
        "*",
        file_path.alias("file_path"),
        file_name.alias("file_name"),
        F.regexp_extract(file_name, r"^([A-Za-z]+)", 1).alias("league_prefix"),
        F.regexp_extract(season_dir, r"^([0-9]{4})", 1).alias("season_dir"),
    )


def split_quarantine(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P5/P7 routing: (valid docs, quarantined docs with reasons).

    Quarantine = malformed JSON (corrupt-record populated) or missing
    the required fields — no ``name``, or neither ``matches`` nor
    ``rounds`` (reference main.yml:132-134 required-field check).
    The quarantine side carries a ``quarantine_reason`` column — the
    engine form of the workflow's warn messages (main.yml:127-134).
    Implemented as complementary filters on one scan; Catalyst reuses
    the cached plan, no second read.
    """
    malformed = F.col("_corrupt_record").isNotNull()
    no_name = F.col("name").isNull()
    no_matches = F.col("matches").isNull() & F.col("rounds").isNull()
    bad = malformed | no_name | no_matches
    reason = (
        F.when(malformed, "malformed_json")
        .when(no_name, "missing_name")
        .when(no_matches, "missing_matches_and_rounds")
    )
    return raw.where(~bad), raw.where(bad).withColumn("quarantine_reason", reason)


def write_quarantine(quarantine: DataFrame, path: str, mode: str = "append") -> None:
    """Dead-letter sink: quarantined documents land as parquet with
    their reason + path metadata so reprocessing is a filter away."""
    (
        quarantine.select(
            "file_path",
            "file_name",
            "quarantine_reason",
            F.col("_corrupt_record").alias("corrupt_record"),
        )
        .write.mode(mode)
        .parquet(path)
    )
