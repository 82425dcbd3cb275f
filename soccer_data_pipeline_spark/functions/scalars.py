"""Reusable scalar expression helpers (SURVEY.md §2.8 F-series).

All pure ``Column → Column`` builders over built-in functions — they
compose into whole-stage codegen and are safe in any operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """2-decimal double → exact integer cents.

    The engine's money representation: BIGINT sums are exact,
    shuffle-cheap, and division back by 100.0 is bit-identical across
    engines (unlike DECIMAL→DOUBLE casts; see ARCHITECTURE.md).
    """
    return F.round(col * 100).cast("long")


def hash48(col: Column) -> Column:
    """Portable 48-bit integer hash of a string column (md5-derived,
    reproducible by any engine with md5 + hex parsing)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 12), 16, 10).cast("long")


def epoch_us(col: Column) -> Column:
    """Epoch microseconds for TIMESTAMP *or* TIMESTAMP_NTZ input
    (NTZ is interpreted in the session zone — pin it to UTC)."""
    return F.unix_micros(col.cast("timestamp"))


def natural_version_key(file_name: Column) -> Column:
    """Numeric version from a ``*.v<digits>.<ext>`` file name, 0 when
    absent — the `sort -V` analog (reference main.yml:136-141)."""
    vstr = F.regexp_extract(file_name, r"[.-]v([0-9]+)\.[A-Za-z0-9]+$", 1)
    return F.when(vstr == "", F.lit(0)).otherwise(vstr.cast("long"))
