"""Query registry — the engine's declared capability surface.

Every operator from ``SURVEY.md §2`` (plus the beyond-reference
LLM-data-pipeline operators) registers here as a named query:

- a Spark callable ``(spark, sf_dir) -> DataFrame``, and
- (where SQL-expressible) an ANSI oracle SQL string that DuckDB runs on
  the same parquet tables for a hash-compared differential check.

Cross-engine determinism rules (so value hashes match bit-for-bit):

- Money/volume sums go through ``DECIMAL`` (exact, association-free)
  and are cast to ``DOUBLE`` only at the end. An exact decimal cast to
  double is identical in both engines; a float sum is not.
- Averages are computed as exact-decimal-sum / count, divided in
  IEEE double — deterministic given identical operands.
- Every computed column is aliased identically in Spark and SQL.
- Timestamps run under session timeZone=UTC (set in the table loader).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query (and its DuckDB oracle) to the registry."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    return dict(ORACLES)


# Importing the query modules populates the registry.
from . import star_queries  # noqa: E402,F401
from . import llm_queries  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
